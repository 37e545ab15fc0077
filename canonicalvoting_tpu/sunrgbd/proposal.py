"""SUN RGB-D canonical-voting proposal sampler (BRNetCanon integration).

Rebuilds the reference's `HoughVotingModule` + point utilities
(reference: /root/reference/sunrgbd/brnetcanon.py:16-162) as jittable JAX:

  * `HoughVotingProposal` — explicit-corners Hough voting (the 7-arg kernel
    variant, brnetcanon.py:96-117) at res 0.05 / 60 rotation bins, followed
    by a top-down map (max over Y, pow 0.5, :123-125) and multinomial
    proposal sampling that KEEPS candidates within `reject_radius` of an
    existing vote seed (falling back to all draws when none qualify,
    :135-159). The reference's data-dependent rejection
    re-sampling while-loop becomes a fixed oversample + masked top-k
    (sampling WITH replacement from the same distribution, so the proposal
    law is identical; only the retry schedule differs).
  * `farthest_point_sample` / `square_distance` / `query_ball_point` —
    the PointNet++ utilities (:16-82) in lax-friendly form.

The mmdetection3d host detector (BRNet) is external in the reference too
(README.md:110 expects dropping files into a BRNet checkout); this module
reproduces the proposal-sampling contract that plugs into its rpn head.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from canonicalvoting_tpu.ops.hough_voting import hough_voting


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances (B, N, M)
    (reference brnetcanon.py:40-59)."""
    d = -2.0 * jnp.einsum("bnc,bmc->bnm", src, dst)
    d = d + jnp.sum(src ** 2, -1)[:, :, None]
    d = d + jnp.sum(dst ** 2, -1)[:, None, :]
    return d


def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          key: jax.Array) -> jnp.ndarray:
    """FPS indices (B, npoint) (reference brnetcanon.py:16-37)."""
    B, N, _ = xyz.shape
    start = jax.random.randint(key, (B,), 0, N)

    def body(carry, _):
        distance, farthest = carry
        centroid = jnp.take_along_axis(
            xyz, farthest[:, None, None], axis=1
        )  # (B, 1, 3)
        dist = jnp.sum((xyz - centroid) ** 2, -1)
        distance = jnp.minimum(distance, dist)
        nxt = jnp.argmax(distance, -1)
        return (distance, nxt), farthest

    init = (jnp.full((B, N), 1e10, xyz.dtype), start)
    _, idx = jax.lax.scan(body, init, None, length=npoint)
    return jnp.transpose(idx)  # (B, npoint)


def query_ball_point(radius: float, nsample: int, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Ball-query group indices (B, S, nsample)
    (reference brnetcanon.py:62-82)."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqr = square_distance(new_xyz, xyz)  # (B, S, N)
    idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2), (B, S, N)
    )
    idx = jnp.where(sqr > radius ** 2, N, idx)
    idx = jnp.sort(idx, axis=-1)[:, :, :nsample]
    first = jnp.broadcast_to(idx[:, :, :1], idx.shape)
    return jnp.where(idx == N, first, idx)


@dataclass
class HoughVotingProposal:
    """Proposal sampler (reference brnetcanon.py:104-162).

    Reference defaults for BRNetCanon: res=0.05, num_rots=60,
    num_proposal=512 (brnetcanon.py:165).
    """

    res: float = 0.03
    num_rots: int = 36
    num_proposal: int = 256
    reject_radius: float = 0.3
    oversample: int = 4
    pow: float = 0.5

    def __call__(
        self,
        pc: jnp.ndarray,
        xyz: jnp.ndarray,
        scale: jnp.ndarray,
        prob: jnp.ndarray,
        corners: jnp.ndarray,
        vote_points: jnp.ndarray,
        key: jax.Array,
        grid_shape: Tuple[int, int, int],
        valid: jnp.ndarray = None,
    ):
        """Returns (candidates (P, 3), probs (P,), scales (P, 3))."""
        hv_map, _, hv_scale = hough_voting(
            pc, xyz, scale, prob, res=self.res, num_rots=self.num_rots,
            grid_shape=grid_shape, corners=corners, valid=valid,
        )
        # top-down map: max over Y + pow (brnetcanon.py:123-125)
        hv_map_y = jnp.power(jnp.max(hv_map, axis=1) + 1e-7, self.pow)
        hv_map_yidx = jnp.argmax(hv_map, axis=1)  # (Gx, Gz)

        dist = hv_map_y.reshape(-1)
        bad = jnp.logical_or(
            jnp.logical_not(jnp.all(jnp.isfinite(dist))), jnp.sum(dist) < 1e-7
        )
        dist = jnp.where(bad, jnp.ones_like(dist), dist)  # (:128-129)

        n_draw = self.num_proposal * self.oversample
        logits = jnp.log(jnp.maximum(dist, 1e-30))
        draws = jax.random.categorical(key, logits, shape=(n_draw,))
        gx, gz = hv_map_y.shape
        ix = draws // gz
        iz = draws % gz
        iy = hv_map_yidx[ix, iz]
        world = jnp.stack([ix, iy, iz], -1).astype(jnp.float32) * self.res \
            + corners[0]
        scales = hv_scale[ix, iy, iz, :]
        vals = dist[draws]

        # rejection: KEEP candidates within reject_radius of a vote seed;
        # when no draw qualifies, fall back to accepting every draw
        # (brnetcanon.py:145-152: `loc.append(world_loc[dist2seed < 0.3])`,
        # with the `sum(dist2seed < 0.3) == 0` branch keeping all draws)
        d2seed = jnp.min(
            jnp.linalg.norm(world[:, None, :] - vote_points[None], axis=-1),
            axis=-1,
        )
        near_seed = d2seed < self.reject_radius
        keep = jnp.where(jnp.any(near_seed), near_seed,
                         jnp.ones_like(near_seed))
        # keep the first num_proposal accepted draws; if too few survive,
        # backfill with rejected ones (reference would keep resampling)
        order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
        sel = order[: self.num_proposal]
        candidates = world[sel]
        sample_vals = vals[sel]
        scales = scales[sel]
        probs = jnp.zeros_like(candidates[..., 0])  # (:161)
        return candidates, probs, scales
