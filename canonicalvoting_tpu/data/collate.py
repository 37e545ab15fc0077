"""Batch collation: ragged scenes -> static-shape device batches.

Replaces the reference collate_fns (train_joint.py:78-90,
train_separate.py:78-96) and adds the TPU-required padding/bucketing: the
batch's coordinate pyramid + neighbor tables are built here on the host
(ops/coords.py) and label arrays are padded to the level-0 capacity.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
from canonicalvoting_tpu.ops.voxelize import batched_coordinates


def _pad(arr: np.ndarray, cap: int, fill) -> np.ndarray:
    out = np.full((cap,) + arr.shape[1:], fill, arr.dtype)
    out[: len(arr)] = arr
    return out


def collate_joint(items: Sequence, cap_multiple: int = 4096,
                  feats_rescale: bool = True, capacities=None,
                  microbatch: int = 0, with_flat_levels: bool = False,
                  flat_grid_dims=None) -> Dict:
    """items: (id_scan, coords, feats, xyz_labels, scale_labels, class_labels).

    Returns a device-ready batch dict plus host metadata. ``capacities``
    pins the per-level pyramid capacities (identical static shapes across
    shards of a data-parallel batch; see collate_joint_sharded).
    ``microbatch=k`` returns gradient-accumulation microbatches of k
    scenes with pinned capacities (the batch-3 gather backward at ScanNet
    scale wants 19.9 GB vs 15.75 GB HBM — RESULTS_r5.md).
    ``with_flat_levels`` adds per-level dense flat ids + meta.grid_dims
    for the scatter-dense conv engine (ops/scatter_conv.py), with dims
    pinned across microbatches.
    """
    from canonicalvoting_tpu.data.dense_prep import (
        dense_grid_geometry,
        pyramid_level_flat_ids,
    )

    if microbatch:
        assert len(items) % microbatch == 0, (
            "batch size must divide by the microbatch size "
            f"({len(items)} % {microbatch})")
        groups = [list(items[i:i + microbatch])
                  for i in range(0, len(items), microbatch)]
        pyrs = [
            build_pyramid(
                batched_coordinates([it[1] for it in g]),
                PyramidSpec(cap_multiple=cap_multiple),
            )
            for g in groups
        ]
        nlev = len(pyrs[0].coords)
        caps = tuple(
            max(p.coords[lvl].shape[0] for p in pyrs)
            for lvl in range(nlev)
        )
        dims0 = None
        if with_flat_levels:
            dims0 = tuple(
                int(max(dense_grid_geometry(it[1])[1][a] for it in items))
                for a in range(3)
            )
        mbs = [
            collate_joint(g, feats_rescale=feats_rescale, capacities=caps,
                          with_flat_levels=with_flat_levels,
                          flat_grid_dims=dims0)
            for g in groups
        ]
        meta = {"ids": [it[0] for it in items]}
        if with_flat_levels:
            meta["grid_dims"] = dims0
            meta["n_scenes"] = microbatch
        return {"microbatches": mbs, "meta": meta}
    ids, coords, feats, xyz_l, scale_l, class_l = zip(*items)
    bcoords = batched_coordinates(coords)
    spec = (PyramidSpec(capacities=tuple(capacities))
            if capacities is not None
            else PyramidSpec(cap_multiple=cap_multiple))
    pyr = build_pyramid(bcoords, spec)
    cap0 = pyr.coords[0].shape[0]

    feats_b = _pad(np.concatenate(feats, 0), cap0, 0.0).astype(np.float32)
    if feats_rescale:
        # rgb channels to [-1, 1] (train_joint.py:249)
        feats_b[:, -3:] = feats_b[:, -3:] * 2.0 - 1.0
    batch = {
        "meta": {"ids": list(ids), "coords": pyr.coords[0]},
        "feats": feats_b,
        "pyramid": pyr.as_jax_inputs(),
        "xyz_labels": _pad(np.concatenate(xyz_l, 0).astype(np.float32), cap0, 0.0),
        "scale_labels": _pad(
            np.concatenate(scale_l, 0).astype(np.float32), cap0, 1.0
        ),
        "class_labels": _pad(
            np.concatenate(class_l, 0).astype(np.int32), cap0, NCLASSES
        ),
    }
    if with_flat_levels:
        geo = [dense_grid_geometry(c) for c in coords]
        dims0 = flat_grid_dims or tuple(
            int(max(g[1][a] for g in geo)) for a in range(3))
        flats, _dims = pyramid_level_flat_ids(
            pyr.coords, np.stack([g[0] for g in geo]), dims0)
        batch["flat_levels"] = tuple(flats)
        batch["meta"]["grid_dims"] = dims0
        batch["meta"]["n_scenes"] = len(items)
    return batch


def collate_joint_sharded(items: Sequence, n_shards: int,
                          cap_multiple: int = 4096,
                          feats_rescale: bool = True) -> Dict:
    """Collate one global batch into ``n_shards`` shard batches with
    IDENTICAL static shapes, stacked on a new leading device axis — the
    input format of parallel.data_parallel.make_dp_train_step. Scene-level
    data parallelism is a new capability over the reference (single-GPU,
    SURVEY §2); shapes are equalized by pinning every shard's pyramid to
    the element-wise max of the shards' natural level capacities."""
    from canonicalvoting_tpu.parallel.data_parallel import stack_scene_batches

    groups = [list(items[s::n_shards]) for s in range(n_shards)]
    if not all(groups):
        raise ValueError(
            f"need >= {n_shards} scenes per global batch, got {len(items)}")
    # pass 1: each shard's natural capacities
    pyrs = [
        build_pyramid(
            batched_coordinates([it[1] for it in g]),
            PyramidSpec(cap_multiple=cap_multiple),
        )
        for g in groups
    ]
    nlev = len(pyrs[0].coords)
    caps = tuple(
        max(p.coords[lvl].shape[0] for p in pyrs) for lvl in range(nlev)
    )
    shard_batches = [
        collate_joint(g, feats_rescale=feats_rescale, capacities=caps)
        for g in groups
    ]
    batch = stack_scene_batches(shard_batches)
    batch["meta"] = {"ids": [b["meta"]["ids"] for b in shard_batches]}
    return batch


def collate_joint_dense(items: Sequence, cap_multiple: int = 4096,
                        feats_rescale: bool = True, microbatch: int = 0,
                        grid_dims=None, cap=None) -> Dict:
    """Joint batch for the dense-execution backbone: instead of the
    coordinate pyramid, rows carry flat MARGINED cell ids into a stacked
    (B, X, Y, Z) grid (data.dense_prep.dense_flat_ids_batched). Labels and
    row order are identical to collate_joint, so the same loss applies.
    ``meta.grid_dims`` / ``meta.n_scenes`` are the step's static args.

    ``microbatch=k`` splits the batch into ceil(B/k)-scene microbatches
    with PINNED shared grid dims and row caps (one compile serves all) for
    gradient accumulation: returns {"microbatches": [batch, ...], "meta"}.
    """
    from canonicalvoting_tpu.data.dense_prep import (
        dense_flat_ids_batched,
        dense_grid_geometry,
    )

    if microbatch:
        assert len(items) % microbatch == 0, (
            "batch size must divide by the microbatch size "
            f"({len(items)} % {microbatch})")
        dims = tuple(
            int(max(dense_grid_geometry(it[1])[1][a] for it in items))
            for a in range(3)
        )
        groups = [list(items[i:i + microbatch])
                  for i in range(0, len(items), microbatch)]
        cap_nat = max(
            int(np.ceil(sum(len(it[1]) for it in g) / cap_multiple)
                * cap_multiple)
            for g in groups
        )
        mbs = [
            collate_joint_dense(g, cap_multiple=cap_multiple,
                                feats_rescale=feats_rescale,
                                grid_dims=dims, cap=cap_nat)
            for g in groups
        ]
        return {
            "microbatches": mbs,
            "meta": {"ids": [it[0] for it in items], "grid_dims": dims,
                     "n_scenes": microbatch},
        }

    ids, coords, feats, xyz_l, scale_l, class_l = zip(*items)
    flat, dims, _bases = dense_flat_ids_batched(list(coords),
                                                dims=grid_dims)
    n = len(flat)
    cap0 = cap if cap is not None \
        else int(np.ceil(n / cap_multiple) * cap_multiple)

    feats_b = _pad(np.concatenate(feats, 0), cap0, 0.0).astype(np.float32)
    if feats_rescale:
        feats_b[:, -3:] = feats_b[:, -3:] * 2.0 - 1.0
    valid = np.zeros((cap0,), np.float32)
    valid[:n] = (flat >= 0).astype(np.float32)
    return {
        "meta": {"ids": list(ids), "grid_dims": dims, "n_scenes": len(items)},
        "feats": feats_b,
        "flat_idx": _pad(flat, cap0, -1),
        "valid": valid,
        "nvalid": np.int32(n),
        "xyz_labels": _pad(np.concatenate(xyz_l, 0).astype(np.float32), cap0, 0.0),
        "scale_labels": _pad(
            np.concatenate(scale_l, 0).astype(np.float32), cap0, 1.0
        ),
        "class_labels": _pad(
            np.concatenate(class_l, 0).astype(np.int32), cap0, NCLASSES
        ),
    }


def collate_separate_sharded(items: Sequence, n_shards: int,
                             cap_multiple: int = 4096,
                             max_objects: int = 64,
                             feats_rescale: bool = True) -> Dict:
    """Collate one global separate-trainer batch into ``n_shards`` shard
    batches with IDENTICAL static shapes, stacked on a new leading device
    axis (the input of parallel.data_parallel.make_dp_train_step_separate;
    mirrors collate_joint_sharded)."""
    from canonicalvoting_tpu.parallel.data_parallel import stack_scene_batches

    groups = [list(items[s::n_shards]) for s in range(n_shards)]
    if not all(groups):
        raise ValueError(
            f"need >= {n_shards} scenes per global batch, got {len(items)}")
    pyrs = [
        build_pyramid(
            batched_coordinates([it[1] for it in g]),
            PyramidSpec(cap_multiple=cap_multiple),
        )
        for g in groups
    ]
    nlev = len(pyrs[0].coords)
    caps = tuple(
        max(p.coords[lvl].shape[0] for p in pyrs) for lvl in range(nlev)
    )
    shard_batches = [
        collate_separate(g, max_objects=max_objects,
                         feats_rescale=feats_rescale, capacities=caps)
        for g in groups
    ]
    batch = stack_scene_batches(shard_batches)
    batch["meta"] = {"ids": [b["meta"]["ids"] for b in shard_batches]}
    return batch


def collate_separate(items: Sequence, cap_multiple: int = 4096,
                     max_objects: int = 64, feats_rescale: bool = True,
                     dense: bool = False, capacities=None,
                     microbatch: int = 0, grid_dims=None,
                     cap=None, with_flat_levels: bool = False,
                     flat_grid_dims=None) -> Dict:
    """items: (id_scan, coords, feats, base_xyz, scale_labels, obj_labels,
    class_labels, obj_id, sym_codes). Object ids are offset per scene into a
    batch-global id space for the segment-reduced symmetry loss.

    ``dense=True`` emits the dense-execution backbone's row format (flat
    MARGINED cell ids + valid mask instead of the coordinate pyramid,
    mirroring collate_joint_dense) with identical labels and row order, so
    the same separate_losses applies on either backbone. ``microbatch=k``
    (dense only) splits into gradient-accumulation microbatches with
    pinned grid dims + caps, as collate_joint_dense does.
    """
    ids = [it[0] for it in items]
    coords = [it[1] for it in items]
    if dense and microbatch:
        from canonicalvoting_tpu.data.dense_prep import dense_grid_geometry

        assert len(items) % microbatch == 0, (
            "batch size must divide by the microbatch size "
            f"({len(items)} % {microbatch})")
        dims = tuple(
            int(max(dense_grid_geometry(it[1])[1][a] for it in items))
            for a in range(3)
        )
        groups = [list(items[i:i + microbatch])
                  for i in range(0, len(items), microbatch)]
        cap_nat = max(
            int(np.ceil(sum(len(it[1]) for it in g) / cap_multiple)
                * cap_multiple)
            for g in groups
        )
        mbs = [
            collate_separate(g, cap_multiple=cap_multiple,
                             max_objects=max_objects,
                             feats_rescale=feats_rescale, dense=True,
                             grid_dims=dims, cap=cap_nat)
            for g in groups
        ]
        return {
            "microbatches": mbs,
            "meta": {"ids": ids, "grid_dims": dims,
                     "n_scenes": microbatch},
        }
    if not dense and microbatch:
        # gather-backbone gradient accumulation (mirrors collate_joint):
        # pinned pyramid capacities; flat_levels for the scatter-dense
        # conv engine when requested, dims pinned across microbatches
        from canonicalvoting_tpu.data.dense_prep import dense_grid_geometry

        assert len(items) % microbatch == 0, (
            "batch size must divide by the microbatch size "
            f"({len(items)} % {microbatch})")
        groups = [list(items[i:i + microbatch])
                  for i in range(0, len(items), microbatch)]
        pyrs = [
            build_pyramid(
                batched_coordinates([it[1] for it in g]),
                PyramidSpec(cap_multiple=cap_multiple),
            )
            for g in groups
        ]
        nlev = len(pyrs[0].coords)
        caps = tuple(
            max(p.coords[lvl].shape[0] for p in pyrs)
            for lvl in range(nlev)
        )
        dims0 = None
        if with_flat_levels:
            dims0 = tuple(
                int(max(dense_grid_geometry(it[1])[1][a] for it in items))
                for a in range(3)
            )
        mbs = [
            collate_separate(g, max_objects=max_objects,
                             feats_rescale=feats_rescale,
                             capacities=caps,
                             with_flat_levels=with_flat_levels,
                             flat_grid_dims=dims0)
            for g in groups
        ]
        meta = {"ids": ids}
        if with_flat_levels:
            meta["grid_dims"] = dims0
            meta["n_scenes"] = microbatch
        return {"microbatches": mbs, "meta": meta}
    if dense:
        from canonicalvoting_tpu.data.dense_prep import dense_flat_ids_batched

        flat, dims, _bases = dense_flat_ids_batched(list(coords),
                                                    dims=grid_dims)
        n = len(flat)
        cap0 = cap if cap is not None \
            else int(np.ceil(n / cap_multiple) * cap_multiple)
    else:
        bcoords = batched_coordinates(coords)
        spec = (PyramidSpec(capacities=tuple(capacities))
                if capacities is not None
                else PyramidSpec(cap_multiple=cap_multiple))
        pyr = build_pyramid(bcoords, spec)
        cap0 = pyr.coords[0].shape[0]

    feats_b = _pad(
        np.concatenate([it[2] for it in items], 0), cap0, 0.0
    ).astype(np.float32)
    if feats_rescale:
        feats_b[:, -3:] = feats_b[:, -3:] * 2.0 - 1.0

    obj_ids = []
    sym_codes = []
    offset = 0
    for it in items:
        oid = it[7].astype(np.int32).copy()
        oid[oid >= 0] += offset
        obj_ids.append(oid)
        sym_codes.append(it[8])
        offset += len(it[8])
    num_objects = offset
    sym = np.zeros((max_objects,), np.int32)
    cat = np.concatenate(sym_codes) if sym_codes else np.zeros((0,), np.int32)
    n_keep = min(len(cat), max_objects)
    sym[:n_keep] = cat[:n_keep]
    obj_id_b = _pad(np.concatenate(obj_ids, 0), cap0, -1)
    # objects beyond capacity are dropped from the xyz loss (masked)
    obj_id_b[obj_id_b >= max_objects] = -1

    if dense:
        valid = np.zeros((cap0,), np.float32)
        valid[:n] = (flat >= 0).astype(np.float32)
        backbone_fields = {
            "meta": {"ids": ids, "grid_dims": dims,
                     "n_scenes": len(items)},
            "flat_idx": _pad(flat, cap0, -1),
            "valid": valid,
            "nvalid": np.int32(n),
        }
    else:
        backbone_fields = {
            "meta": {"ids": ids, "coords": pyr.coords[0]},
            "pyramid": pyr.as_jax_inputs(),
        }
        if with_flat_levels:
            from canonicalvoting_tpu.data.dense_prep import (
                dense_grid_geometry,
                pyramid_level_flat_ids,
            )

            geo = [dense_grid_geometry(c) for c in coords]
            dims0 = flat_grid_dims or tuple(
                int(max(g[1][a] for g in geo)) for a in range(3))
            flats, _dims = pyramid_level_flat_ids(
                pyr.coords, np.stack([g[0] for g in geo]), dims0)
            backbone_fields["flat_levels"] = tuple(flats)
            backbone_fields["meta"]["grid_dims"] = dims0
            backbone_fields["meta"]["n_scenes"] = len(items)
    return {
        **backbone_fields,
        "feats": feats_b,
        "base_xyz": _pad(
            np.concatenate([it[3] for it in items], 0).astype(np.float32), cap0, 0.0
        ),
        "scale_labels": _pad(
            np.concatenate([it[4] for it in items], 0).astype(np.float32), cap0, 1.0
        ),
        "obj_labels": _pad(
            np.concatenate([it[5] for it in items], 0).astype(np.int32), cap0, 0
        ),
        "class_labels": _pad(
            np.concatenate([it[6] for it in items], 0).astype(np.int32), cap0, 0
        ),
        "obj_id": obj_id_b,
        "sym_code": sym,
        "num_objects": np.int32(min(num_objects, max_objects)),
    }
