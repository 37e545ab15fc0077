"""Scene-parallel evaluation fan-out over a device mesh.

The third first-class distributed target from SURVEY §5 (alongside DP
training and point-sharded voting): evaluation is embarrassingly parallel
over scenes (the reference runs scenes one-by-one on one GPU,
/root/reference/eval_joint.py:163-303). Here D scenes are collated to
identical static shapes (the same cap/grid bucketing the single-chip
pipeline uses), stacked on a leading axis sharded over mesh axis 'data',
and the full backbone -> head decode -> Hough vote -> box peel chain is
vmapped over that axis — GSPMD turns the vmap into per-device scene
execution with zero cross-device traffic until the (tiny) fixed-size box
arrays are fetched.

Throughput therefore scales ~linearly with the 'data' axis: a v5e-8 runs 8
scenes per dispatch.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from canonicalvoting_tpu.decode.peeling import PeelConfig, peel_boxes
from canonicalvoting_tpu.eval.pipeline import slice_joint_heads
from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
from canonicalvoting_tpu.ops.hough_voting import compute_corners, hough_voting
from canonicalvoting_tpu.ops.sparse_conv import valid_row_mask
from canonicalvoting_tpu.ops.voxelize import batched_coordinates


def collate_eval_scenes(scenes: List, cap: int, feats_dim: int = 3,
                        res: float = 0.03) -> Dict:
    """Stack quantized scenes [(coords, feats_raw), ...] to one fixed
    capacity ``cap`` (every scene padded to the same row count so the
    stacked batch has static shape on every device)."""
    feats = np.zeros((len(scenes), cap, feats_dim), np.float32)
    coords_w = np.zeros((len(scenes), cap, 3), np.float32)
    nvalid = np.zeros((len(scenes),), np.int32)
    pyramids = []
    for s, (coords, feats_raw) in enumerate(scenes):
        n = len(coords)
        assert n <= cap, (n, cap)
        pyr = build_pyramid(
            batched_coordinates([coords]),
            PyramidSpec(capacities=(cap, cap, cap, cap, cap)),
        )
        pyramids.append(pyr.as_jax_inputs())
        feats[s, :n] = feats_raw
        feats[s, :, -3:] = feats[s, :, -3:] * 2.0 - 1.0
        coords_w[s] = pyr.coords[0][:cap, 1:].astype(np.float32) * res
        nvalid[s] = n
    pyramid = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, 0), *pyramids
    )
    return {
        "feats": feats,
        "pyramid": pyramid,
        "coords_w": coords_w,
    }


def make_sharded_votepeel_fn(mesh: Mesh, *, res: float = 0.03,
                             num_rots: int = 120, peel: PeelConfig = None,
                             grid_shape=(128, 64, 128)):
    """Scene-parallel vote -> peel with PLANTED per-point heads.

    Same fan-out as make_sharded_eval_fn but the batch carries the head
    outputs (xyz, scale, prob, class_pred) directly instead of running a
    backbone — used to drive the peeler's ACCEPT path with
    perfect-prediction inputs (an untrained model detects nothing, so the
    backbone variant only ever exercises the no-box branch; see
    __graft_entry__.dryrun_multichip)."""
    peel = peel or PeelConfig(res=res)

    def per_scene(coords_w, xyz, scale, prob, class_pred, valid):
        corners = compute_corners(coords_w, valid)
        go, gr, gs = hough_voting(
            coords_w, xyz, scale, prob, res=res, num_rots=num_rots,
            grid_shape=tuple(grid_shape), corners=corners, valid=valid,
        )
        return peel_boxes(go, gr, gs, coords_w, xyz, prob, class_pred,
                          corners[0], peel, valid=valid)

    scene_sharding = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, out_shardings=scene_sharding)
    def eval_fn(batch):
        return jax.vmap(per_scene)(
            batch["coords_w"], batch["xyz"], batch["scale"], batch["prob"],
            batch["class_pred"], batch["valid"],
        )

    def run(batch):
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, scene_sharding), batch
        )
        return eval_fn(batch)

    return run


def evaluate_scenes_sharded(model, variables, scenes, *, mesh: Mesh = None,
                            res: float = 0.03, num_rots: int = 120,
                            log_scale: bool = True, peel: PeelConfig = None,
                            nms_iou: float = 0.3, cap_multiple: int = 4096,
                            grid_multiple=(64, 32, 128)):
    """Fan a scene list over the devices: the CLI driver for
    make_sharded_eval_fn (used by eval_joint.py when >1 device is visible).

    ``scenes``: [(id_scan, coords, feats_raw), ...] with quantized int
    voxel coords. Returns {id_scan: [(classname, corners (8,3), prob)]} —
    the same format as DetectionPipeline.postprocess, so mAP scoring is
    caller-agnostic. One static shape serves every chunk: point capacity
    and vote-grid dims are maxed over all scenes (one compile), scenes are
    grouped D at a time, and the last group is padded by repetition.
    """
    from canonicalvoting_tpu.data.geometry import (
        IDX2NAME,
        NAME2CATNAME,
        NCLASSES,
    )
    from canonicalvoting_tpu.metrics.ap import nms as nms_host
    from canonicalvoting_tpu.ops.hough_voting import round_grid_shape

    if mesh is None:
        from canonicalvoting_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=len(jax.devices()), model=1)
    D = int(mesh.shape["data"])
    peel = peel or PeelConfig(res=res)

    caps = max(len(s[1]) for s in scenes)
    cap = int(np.ceil(caps / cap_multiple) * cap_multiple)
    dims = np.max(
        [(s[1].max(0) - s[1].min(0)) + 1 for s in scenes], axis=0
    ).astype(np.int32)
    grid_shape = round_grid_shape(dims, grid_multiple)

    run = make_sharded_eval_fn(
        model, mesh, res=res, num_rots=num_rots, log_scale=log_scale,
        peel=peel, grid_shape=grid_shape,
    )

    results = {}
    for start in range(0, len(scenes), D):
        chunk = list(scenes[start:start + D])
        n_real = len(chunk)
        while len(chunk) < D:  # pad the ragged tail group
            chunk.append(chunk[0])
        batch = collate_eval_scenes(
            [(c, f) for (_id, c, f) in chunk], cap=cap, res=res,
            feats_dim=chunk[0][2].shape[1],
        )
        out = jax.device_get(run(variables, batch))
        for i in range(n_real):
            id_scan = chunk[i][0]
            n = int(out["n_boxes"][i])
            boxes = np.asarray(out["boxes"][i])[:n]
            scores = np.asarray(out["scores"][i])[:n]
            classes = np.asarray(out["classes"][i])[:n]
            dets = []
            for ci in range(NCLASSES):
                sel = classes == ci
                if not sel.any():
                    continue
                b, s = boxes[sel], scores[sel]
                for j in nms_host(b, s, nms_iou):
                    dets.append(
                        (NAME2CATNAME[IDX2NAME[ci]], b[j], float(s[j])))
            results[id_scan] = dets
    return results


def make_sharded_eval_fn(model, mesh: Mesh, *, res: float = 0.03,
                         num_rots: int = 120, log_scale: bool = True,
                         peel: PeelConfig = None, grid_shape=(128, 64, 128)):
    """Jitted (variables, batch) -> stacked peel outputs, scenes sharded
    over mesh axis 'data', parameters replicated."""
    peel = peel or PeelConfig(res=res)

    def per_scene(variables, feats, pyramid, coords_w):
        out = model.apply(variables, feats, pyramid, False)
        xyz, scale, class_pred, prob = slice_joint_heads(out)
        if log_scale:
            scale = jnp.exp(scale)
        valid = valid_row_mask(feats.shape[0], pyramid["nvalid"][0])[:, 0]
        corners = compute_corners(coords_w, valid)
        go, gr, gs = hough_voting(
            coords_w, xyz, scale, prob, res=res, num_rots=num_rots,
            grid_shape=tuple(grid_shape), corners=corners, valid=valid,
        )
        return peel_boxes(go, gr, gs, coords_w, xyz, prob, class_pred,
                          corners[0], peel, valid=valid)

    scene_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, out_shardings=scene_sharding)
    def eval_fn(variables, batch):
        return jax.vmap(per_scene, in_axes=(None, 0, 0, 0))(
            variables, batch["feats"], batch["pyramid"], batch["coords_w"]
        )

    def run(variables, batch):
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, scene_sharding), batch
        )
        variables = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), variables
        )
        return eval_fn(variables, batch)

    return run
