"""Point-sharded canonical Hough voting.

Votes are additive, so a scene whose points exceed one chip's memory/compute
budget shards its points across mesh axis 'point': each device splats its
point shard into a full local grid, and a single psum over ICI reduces the
grids (SURVEY section 5 "Long-context" row). The vote op itself is
unchanged — this is a shard_map wrapper.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from canonicalvoting_tpu.ops.hough_voting import hough_voting


def hough_voting_sharded(
    points: jnp.ndarray,
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    obj: jnp.ndarray,
    corners: jnp.ndarray,
    *,
    res: float,
    num_rots: int,
    grid_shape: Tuple[int, int, int],
    mesh: Mesh,
    axis: str = "data",
    valid: jnp.ndarray = None,
    rot_chunk: int = 4,
):
    """Like ops.hough_voting but with points sharded over ``axis``.

    ``corners`` must be explicit (2, 3) — the AABB can't be derived locally
    from a point shard. Point count must divide the axis size (pad + mask).
    """
    if valid is None:
        valid = jnp.ones((points.shape[0],), points.dtype)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,  # the vote scan carry starts unvarying
    )
    def _shard_fn(p, x, s, o, v, c):
        # Each shard splats its points into a full-size local grid with
        # normalization DISABLED semantics recovered afterwards: splat raw
        # sums here by voting with the shard, then psum. hough_voting
        # normalizes internally, so un-normalize before reducing.
        go, gr, gs = hough_voting(
            p, x, s, o, res=res, num_rots=num_rots, grid_shape=grid_shape,
            corners=c, valid=v, rot_chunk=rot_chunk,
        )
        denom = go[..., None] + 1e-7
        gr_raw = gr * denom
        gs_raw = gs * denom
        go = jax.lax.psum(go, axis)
        gr_raw = jax.lax.psum(gr_raw, axis)
        gs_raw = jax.lax.psum(gs_raw, axis)
        denom = go[..., None] + 1e-7
        return go, gr_raw / denom, gs_raw / denom

    return _shard_fn(points, xyz, scale, obj, valid, corners)
