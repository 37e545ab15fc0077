"""Point-cloud voxelization / quantization (host-side NumPy).

TPU-native replacement for ``ME.utils.sparse_quantize`` and
``ME.utils.batched_coordinates`` (used at reference utils/dataloader.py:197,
train_joint.py:82, sunrgbd/brnetcanon.py:218-225). Quantization is inherently
shape-dynamic, so — like attention-mask construction in LLM pipelines — it
runs on the host inside the data pipeline; the device only ever sees
static-shape padded arrays.

Deterministic: each occupied voxel keeps its FIRST point in input order (the
reference's unordered-map insertion keeps first occurrence too); output voxels
are sorted lexicographically by (x, y, z) for reproducibility.
"""

from __future__ import annotations

import numpy as np


def quantize_keys(coords: np.ndarray) -> np.ndarray:
    """Pack integer (N, 3) voxel coords into int64 keys (host only)."""
    coords = coords.astype(np.int64)
    mins = coords.min(0)
    shifted = coords - mins
    if np.any(shifted.max(0) >= (1 << 21)):
        raise ValueError("voxel grid exceeds 2^21 per axis")
    return (shifted[:, 0] << 42) | (shifted[:, 1] << 21) | shifted[:, 2]


def sparse_quantize(
    points: np.ndarray,
    quantization_size: float = 1.0,
    return_index: bool = True,
):
    """Quantize points to voxels of size ``quantization_size``.

    Returns (coords, index) where ``coords`` is the (M, 3) int32 array of
    unique voxel coordinates (floor(points / size)) and ``index`` selects, for
    each voxel, the first point (in input order) that landed in it —
    mirroring ``ME.utils.sparse_quantize(..., return_index=True)``.
    """
    points = np.asarray(points)
    from canonicalvoting_tpu import native

    got = native.sparse_quantize(
        np.ascontiguousarray(points[:, :3], np.float32), quantization_size
    )
    if got is not None:
        coords, index = got
        # deterministic key-sorted output (spatial locality helps the
        # device-side gathers downstream)
        keys = quantize_keys(coords.astype(np.int64))
        order = np.argsort(keys, kind="stable")
        coords = coords[order].astype(np.int32)
        index = index[order]
        if return_index:
            return coords, index
        return coords
    vox = np.floor(points[:, :3] / quantization_size).astype(np.int64)
    keys = quantize_keys(vox)
    # First occurrence per key, then sort output by key for determinism.
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    first_of_group = np.ones(len(keys), dtype=bool)
    first_of_group[1:] = sorted_keys[1:] != sorted_keys[:-1]
    index = order[first_of_group]
    coords = vox[index].astype(np.int32)
    if return_index:
        return coords, index
    return coords


def batched_coordinates(coords_list) -> np.ndarray:
    """Prepend batch indices and concatenate: [(Ni, 3)] -> (sum Ni, 4) int32.

    Equivalent of ``ME.utils.batched_coordinates`` (reference train_joint.py:82).
    """
    out = []
    for b, c in enumerate(coords_list):
        c = np.asarray(c)
        bcol = np.full((c.shape[0], 1), b, dtype=np.int32)
        out.append(np.concatenate([bcol, c.astype(np.int32)], axis=1))
    return np.concatenate(out, axis=0)


def pad_to_bucket(n: int, buckets) -> int:
    """Smallest capacity bucket >= n (limits XLA recompiles)."""
    for b in buckets:
        if n <= b:
            return b
    return int(np.ceil(n / buckets[-1]) * buckets[-1])
