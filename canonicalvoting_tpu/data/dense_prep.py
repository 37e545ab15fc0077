"""Host-side prep for the dense-execution backbone.

Computes, per scene, the L0 dense-grid geometry and each point's flat cell
id. The base voxel coordinate is aligned DOWN to the coarsest stride (16) so
dense stride-2 downsampling reproduces the raw-coordinate floor-division
semantics of the sparse pyramid (ops/coords.downsample_coords) exactly, and
grid dims are rounded up to multiples of 16 (bucketed to limit recompiles).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

STRIDE_ALIGN = 16


def dense_grid_geometry(coords: np.ndarray, dim_multiple: int = 32,
                        ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """(base (3,) int32, dims (X, Y, Z)) for raw L0 voxel coords (N, 3)."""
    c = coords[:, -3:].astype(np.int64)
    lo = c.min(0)
    hi = c.max(0)
    base = (lo // STRIDE_ALIGN) * STRIDE_ALIGN  # floor-align (negatives ok)
    m = int(np.lcm(STRIDE_ALIGN, dim_multiple))
    dims = tuple(
        int(np.ceil((h - b + 1) / m) * m) for h, b in zip(hi, base)
    )
    return base.astype(np.int32), dims


def dense_flat_ids(coords: np.ndarray, base: np.ndarray,
                   dims: Tuple[int, int, int]) -> np.ndarray:
    """Flat L0 cell index per point; -1 when outside the grid."""
    c = coords[:, -3:].astype(np.int64) - base.astype(np.int64)
    ok = np.all((c >= 0) & (c < np.asarray(dims)), axis=1)
    flat = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
    return np.where(ok, flat, -1).astype(np.int32)


def level_tiles(coords: np.ndarray, base: np.ndarray,
                dims: Tuple[int, int, int], levels=(0, 1, 2),
                tile_shape=(8, 8, 32), pad_multiple: int = 32):
    """Occupied-tile coordinates per stride level for the Pallas tiled conv.

    Returns {level: (T, 3) int32} with T padded up to ``pad_multiple``
    (bucketed to limit recompiles) by repeating the last tile — duplicate
    tiles recompute/rewrite identical values, which is benign. Levels whose
    grid dims don't divide by the tile shape are skipped.
    """
    c0 = coords[:, -3:].astype(np.int64) - base.astype(np.int64)
    c0 = c0[np.all((c0 >= 0) & (c0 < np.asarray(dims)), axis=1)]
    ts = np.asarray(tile_shape)
    out = {}
    for lvl in levels:
        d = tuple(x >> lvl for x in dims)
        if any(dd % tt for dd, tt in zip(d, ts)):
            continue
        t = np.unique((c0 >> lvl) // ts, axis=0).astype(np.int32)
        pad = int(np.ceil(len(t) / pad_multiple) * pad_multiple) - len(t)
        if pad:
            t = np.concatenate([t, np.repeat(t[-1:], pad, axis=0)], axis=0)
        out[lvl] = t
    return out
