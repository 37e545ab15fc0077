"""Canonical Hough voting on TPU (pure XLA, custom VJP).

TPU-native replacement for the reference's CUDA extension
(reference: /root/reference/houghvoting/src/hv_cuda_kernel.cu).

Semantics (bit-for-bit with the reference up to float association order):

  * For every point ``p`` with predicted Local Canonical Coordinates ``xyz``,
    box scale ``scale`` and objectness ``obj``, sweep ``num_rots`` yaw angles
    theta = i * 2*pi/num_rots.  The rotated offset is
    ``offset = -Rot_y(theta) @ (xyz * scale)`` (hv_cuda_kernel.cu:36-39) and
    the voted cell is ``(p + offset - corner) / res`` (:40).
  * Votes outside ``[0, dims-1)`` are skipped (:41-44).
  * Each vote is trilinearly splat onto its 8 surrounding cells, accumulating
    ``obj`` into grid_obj and obj-weighted ``(cos, sin)`` / ``scale`` into
    grid_rot / grid_scale (:45-93).
  * grid_rot and grid_scale are normalized by ``grid_obj + 1e-7`` (:100-119).
  * The backward pass propagates the *unnormalized* grid_obj cotangent only
    (grad_rot / grad_scale are discarded — reference train_joint.py:31-37)
    to xyz/scale/obj, intentionally reproducing the reference's omission of
    the 1/res chain factor (hv_cuda_kernel.cu:219-258).

Unlike the GPU kernel (float atomicAdd => nondeterministic sums), this
formulation is deterministic.

Grid shapes must be static under jit: callers pass a ``grid_shape`` capacity
(bucketed per scene; see ``round_grid_shape``).  Cells beyond the actual
extent stay zero and are skipped by the in-bounds test, so downstream box
peeling is unaffected.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * 3.141592654  # matches the kernel's constant (:35)


def compute_corners(points: jnp.ndarray, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """(2, 3) [min; max] over valid points (hv_cuda_kernel.cu:129)."""
    if valid is None:
        lo = jnp.min(points, axis=0)
        hi = jnp.max(points, axis=0)
    else:
        big = jnp.asarray(np.finfo(np.float32).max, points.dtype)
        v = valid[:, None]
        lo = jnp.min(jnp.where(v, points, big), axis=0)
        hi = jnp.max(jnp.where(v, points, -big), axis=0)
    return jnp.stack([lo, hi], axis=0)


def grid_dims_from_corners(corners: jnp.ndarray, res: float) -> jnp.ndarray:
    """int32 (3,) actual grid dims: (max-min)/res truncated + 1
    (hv_cuda_kernel.cu:131-134)."""
    diff = (corners[1] - corners[0]) / res
    return diff.astype(jnp.int32) + 1


def round_grid_shape(dims, multiple=64, cap: Optional[tuple] = None) -> tuple:
    """Host helper: bucket concrete dims up to per-axis multiples to bound
    the number of XLA recompiles across scenes. ``multiple`` may be an int
    or a per-axis tuple; the Pallas vote kernel needs the z axis to be a
    multiple of 128 (lane width)."""
    if isinstance(multiple, int):
        multiple = (multiple,) * 3
    out = []
    for i, d in enumerate(np.asarray(dims).tolist()):
        m = multiple[i]
        r = int(np.ceil(max(d, 1) / m) * m)
        if cap is not None:
            r = min(r, cap[i])
        out.append(r)
    return tuple(out)


def _theta_chunks(num_rots: int, rot_chunk: int):
    """Static list of (thetas, theta_valid) chunks covering i in [0, num_rots)."""
    n_pad = int(np.ceil(num_rots / rot_chunk) * rot_chunk)
    idx = np.arange(n_pad)
    thetas = (idx * (_TWO_PI / num_rots)).astype(np.float32)
    valid = (idx < num_rots).astype(np.float32)
    return (
        thetas.reshape(-1, rot_chunk),
        valid.reshape(-1, rot_chunk),
    )


def _vote_cells(points, corr, corner, dims, res, thetas, theta_valid):
    """Common geometry for forward and backward.

    Returns (flat_idx (N,T,8) int32 masked to -1, w8 (N,T,8) trilinear weights
    without obj, cw (N,T) cos, sw (N,T) sin) for one theta chunk.
    """
    cos_t = jnp.cos(thetas)[None, :]  # (1, T)
    sin_t = jnp.sin(thetas)[None, :]
    cx, cy, cz = corr[:, 0:1], corr[:, 1:2], corr[:, 2:3]  # (N, 1)
    # offset = -Rot_y(theta) @ (cx, cy, cz)   (hv_cuda_kernel.cu:38-39)
    off_x = -cos_t * cx + sin_t * cz
    off_y = jnp.broadcast_to(-cy, off_x.shape)
    off_z = -sin_t * cx - cos_t * cz
    center = jnp.stack(
        [
            (points[:, 0:1] + off_x - corner[0]) / res,
            (points[:, 1:2] + off_y - corner[1]) / res,
            (points[:, 2:3] + off_z - corner[2]) / res,
        ],
        axis=-1,
    )  # (N, T, 3)
    in_bounds = jnp.all(
        (center >= 0.0) & (center < (dims.astype(center.dtype) - 1.0)[None, None, :]),
        axis=-1,
    )  # (N, T)
    in_bounds = in_bounds & (theta_valid[None, :] > 0)

    fl = jnp.floor(center)
    resid = center - fl
    fl = fl.astype(jnp.int32)
    w0 = 1.0 - resid  # (N, T, 3)
    w1 = resid

    # 8 corners in the kernel's order: (x,y,z) bits, z fastest
    # lll llh lhl lhh hll hlh hhl hhh (hv_cuda_kernel.cu:52-59).
    corner_bits = np.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
         [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]],
        dtype=np.int32,
    )  # (8, 3)
    cb = jnp.asarray(corner_bits)
    idx3 = fl[:, :, None, :] + cb[None, None, :, :]  # (N, T, 8, 3)
    w_axes = jnp.where(cb[None, None, :, :] == 0, w0[:, :, None, :], w1[:, :, None, :])
    w8 = w_axes[..., 0] * w_axes[..., 1] * w_axes[..., 2]  # (N, T, 8)

    return idx3, w8, in_bounds, cos_t, sin_t


def _flatten_idx(idx3, in_bounds, grid_shape):
    gx, gy, gz = grid_shape
    flat = (idx3[..., 0] * gy + idx3[..., 1]) * gz + idx3[..., 2]
    total = gx * gy * gz
    # Out-of-bounds votes -> index `total`, dropped by scatter mode='drop'.
    return jnp.where(in_bounds[..., None], flat, total)


@functools.lru_cache(maxsize=64)
def _make_hv(
    res: float,
    num_rots: int,
    grid_shape: Tuple[int, int, int],
    rot_chunk: int,
    auto_corners: bool,
    method: str = "xla",
):
    """Build the custom-VJP'd voting function for a static configuration."""
    thetas_np, theta_valid_np = _theta_chunks(num_rots, rot_chunk)
    n_chunks = thetas_np.shape[0]
    gx, gy, gz = grid_shape
    total = gx * gy * gz

    def _corner_dims(points, valid, corners):
        if auto_corners:
            corners = compute_corners(points, None if valid is None else valid)
        dims = grid_dims_from_corners(corners, res)
        dims = jnp.minimum(dims, jnp.asarray(grid_shape, jnp.int32))
        return corners[0], dims

    def _forward(points, xyz, scale, obj, corners, valid):
        corner, dims = _corner_dims(points, valid, corners)
        if method in ("pallas", "pallas_interpret"):
            from canonicalvoting_tpu.ops.pallas.hv_splat import hv_splat_pallas

            raw = hv_splat_pallas(
                points, xyz, scale, obj, corner, dims, res,
                num_rots=num_rots, grid_shape=grid_shape, valid=valid,
                interpret=(method == "pallas_interpret"),
            )
            grid_obj = raw[..., 0]
            denom = raw[..., 0:1] + 1e-7
            grid_rot = raw[..., 1:3] / denom
            grid_scale = raw[..., 3:6] / denom
            return grid_obj, grid_rot, grid_scale
        corr = xyz * scale  # (hv_cuda_kernel.cu:29-33)
        objv = obj if valid is None else obj * valid

        thetas_all = jnp.asarray(thetas_np)
        tvalid_all = jnp.asarray(theta_valid_np)

        def body(carry, chunk):
            grid = carry
            thetas, tvalid = chunk
            idx3, w8, in_bounds, cos_t, sin_t = _vote_cells(
                points, corr, corner, dims, res, thetas, tvalid
            )
            flat = _flatten_idx(idx3, in_bounds, grid_shape)  # (N, T, 8)
            w = w8 * objv[:, None, None]  # (N, T, 8)
            # Channels: [obj, cos, sin, sx, sy, sz]  (hv_cuda_kernel.cu:61-93)
            chan = jnp.stack(
                [
                    jnp.ones_like(w8[..., 0]),
                    jnp.broadcast_to(cos_t, w8[..., 0].shape),
                    jnp.broadcast_to(sin_t, w8[..., 0].shape),
                    jnp.broadcast_to(scale[:, None, 0], w8[..., 0].shape),
                    jnp.broadcast_to(scale[:, None, 1], w8[..., 0].shape),
                    jnp.broadcast_to(scale[:, None, 2], w8[..., 0].shape),
                ],
                axis=-1,
            )  # (N, T, 6)
            updates = w[..., None] * chan[:, :, None, :]  # (N, T, 8, 6)
            grid = grid.at[flat.reshape(-1)].add(
                updates.reshape(-1, 6), mode="drop"
            )
            return grid, None

        grid0 = jnp.zeros((total, 6), jnp.float32)
        grid, _ = jax.lax.scan(body, grid0, (thetas_all, tvalid_all))

        grid_obj = grid[:, 0].reshape(gx, gy, gz)
        denom = grid[:, 0:1] + 1e-7  # (hv_cuda_kernel.cu:114-117)
        grid_rot = (grid[:, 1:3] / denom).reshape(gx, gy, gz, 2)
        grid_scale = (grid[:, 3:6] / denom).reshape(gx, gy, gz, 3)
        return grid_obj, grid_rot, grid_scale

    def _backward_obj(points, xyz, scale, obj, corners, valid, g_obj):
        """Transpose of the raw obj splat (hv_cuda_kernel.cu:168-259)."""
        corner, dims = _corner_dims(points, valid, corners)
        corr = xyz * scale
        objv = obj if valid is None else obj * valid
        g_flat = g_obj.reshape(-1)

        thetas_all = jnp.asarray(thetas_np)
        tvalid_all = jnp.asarray(theta_valid_np)

        def body(carry, chunk):
            d_obj, d_corr = carry
            thetas, tvalid = chunk
            idx3, w8, in_bounds, cos_t, sin_t = _vote_cells(
                points, corr, corner, dims, res, thetas, tvalid
            )
            flat = _flatten_idx(idx3, in_bounds, grid_shape)
            g = jnp.where(
                flat < total,
                g_flat[jnp.clip(flat, 0, total - 1)],
                0.0,
            )  # (N, T, 8)
            # d_obj: sum of grad * trilinear weights (:210-217)
            d_obj = d_obj + jnp.sum(g * w8, axis=(1, 2))

            # dgrid/dcenter per axis: +/- with the other two axes' weights
            # (:219-243). Reconstruct per-corner axis weights.
            corner_bits = np.array(
                [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
                 [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]],
                dtype=np.int32,
            )
            cb = jnp.asarray(corner_bits)  # (8, 3)
            # Recompute w0/w1 from w8 is not possible; recompute directly:
            cx, cy, cz = corr[:, 0:1], corr[:, 1:2], corr[:, 2:3]
            off_x = -cos_t * cx + sin_t * cz
            off_y = jnp.broadcast_to(-cy, off_x.shape)
            off_z = -sin_t * cx - cos_t * cz
            center = jnp.stack(
                [
                    (points[:, 0:1] + off_x - corner[0]) / res,
                    (points[:, 1:2] + off_y - corner[1]) / res,
                    (points[:, 2:3] + off_z - corner[2]) / res,
                ],
                axis=-1,
            )
            resid = center - jnp.floor(center)
            w0 = 1.0 - resid
            w1 = resid
            w_axes = jnp.where(
                cb[None, None, :, :] == 0, w0[:, :, None, :], w1[:, :, None, :]
            )  # (N, T, 8, 3)
            sign = jnp.where(cb[None, None, :, :] == 0, -1.0, 1.0)
            gm = g * in_bounds.astype(g.dtype)[..., None]
            # d/dcenter_a = sum_corners g * sign_a * prod_{b != a} w_b
            prod_other = jnp.stack(
                [
                    w_axes[..., 1] * w_axes[..., 2],
                    w_axes[..., 0] * w_axes[..., 2],
                    w_axes[..., 0] * w_axes[..., 1],
                ],
                axis=-1,
            )  # (N, T, 8, 3)
            dgrid_dcenter = jnp.sum(
                gm[..., None] * sign * prod_other, axis=2
            ) * objv[:, None, None]  # (N, T, 3)

            # d_corr = -Rot_y(theta)^T @ dgrid_dcenter  (:249-250)
            # NOTE: the reference omits the 1/res chain factor; we match it.
            gxc = dgrid_dcenter[..., 0]
            gyc = dgrid_dcenter[..., 1]
            gzc = dgrid_dcenter[..., 2]
            dc_x = -cos_t * gxc - sin_t * gzc
            dc_y = -gyc
            dc_z = sin_t * gxc - cos_t * gzc
            d_corr = d_corr + jnp.stack(
                [dc_x.sum(1), dc_y.sum(1), dc_z.sum(1)], axis=-1
            )
            return (d_obj, d_corr), None

        init = (
            jnp.zeros_like(obj),
            jnp.zeros_like(xyz),
        )
        (d_obj, d_corr), _ = jax.lax.scan(body, init, (thetas_all, tvalid_all))
        d_xyz = d_corr * scale  # (:252-254)
        d_scale = d_corr * xyz  # (:256-258)
        if valid is not None:
            d_obj = d_obj * valid
            d_xyz = d_xyz * valid[:, None]
            d_scale = d_scale * valid[:, None]
        return d_xyz, d_scale, d_obj

    @jax.custom_vjp
    def hv(points, xyz, scale, obj, corners, valid):
        return _forward(points, xyz, scale, obj, corners, valid)

    def hv_fwd(points, xyz, scale, obj, corners, valid):
        out = _forward(points, xyz, scale, obj, corners, valid)
        return out, (points, xyz, scale, obj, corners, valid)

    def hv_bwd(residuals, cotangents):
        points, xyz, scale, obj, corners, valid = residuals
        g_obj, _g_rot, _g_scale = cotangents  # rot/scale grads discarded
        d_xyz, d_scale, d_obj = _backward_obj(
            points, xyz, scale, obj, corners, valid, g_obj
        )
        zeros_pts = jnp.zeros_like(points)  # d_points disabled (:245-247)
        d_corners = None if corners is None else jnp.zeros_like(corners)
        d_valid = None if valid is None else jnp.zeros_like(valid)
        return zeros_pts, d_xyz, d_scale, d_obj, d_corners, d_valid

    hv.defvjp(hv_fwd, hv_bwd)
    return hv


def hough_voting(
    points: jnp.ndarray,
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    obj: jnp.ndarray,
    *,
    res: float,
    num_rots: int,
    grid_shape: Tuple[int, int, int],
    corners: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    rot_chunk: int = 4,
    method: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Canonical Hough voting (jit-friendly).

    Args:
      points: (N, 3) world coordinates (already multiplied by res upstream,
        see reference train_joint.py:353).
      xyz: (N, 3) predicted Local Canonical Coordinates.
      scale: (N, 3) predicted box scales (post-exp when log_scale).
      obj: (N,) objectness weights.
      res: voxel resolution of the vote grid.
      num_rots: number of yaw bins in the sweep (120 for ScanNet,
        36/60 for SUN RGB-D — reference train_joint.py:49,
        sunrgbd/brnetcanon.py:105,165).
      grid_shape: static (Gx, Gy, Gz) capacity of the vote grid.
      corners: optional explicit (2, 3) [min; max] corners — the 7-arg
        variant used by the SUN RGB-D plugin (sunrgbd/brnetcanon.py:96-117).
        When None, corners come from the (valid-masked) point AABB.
      valid: optional (N,) mask; invalid rows contribute nothing.
      rot_chunk: rotations processed per scan step (memory knob, xla path).
      method: "xla" (scatter-add scan; reference-exact, differentiable),
        "pallas" (plane-splat MXU kernel — ~15 ms vs ~6 s for the XLA
        scatter path at ScanNet scale, 66k pts x 120 rots,
        benchmarks/RESULTS_r3.md; the
        custom VJP still uses the xla transpose), "pallas_interpret"
        (Pallas interpreter, for CPU tests), or "auto" (pallas on TPU when
        the grid shape is kernel-compatible, else xla).

    Returns:
      (grid_obj (Gx,Gy,Gz), grid_rot (Gx,Gy,Gz,2), grid_scale (Gx,Gy,Gz,3)).
    """
    auto = corners is None
    if method == "auto":
        gz_ok = grid_shape[2] % 128 == 0
        on_tpu = jax.default_backend() == "tpu"
        method = "pallas" if (on_tpu and gz_ok) else "xla"
    hv = _make_hv(float(res), int(num_rots), tuple(grid_shape),
                  int(rot_chunk), auto, method)
    if valid is not None:
        valid = valid.astype(points.dtype)
    if corners is not None:
        corners = jnp.asarray(corners, points.dtype)
    return hv(points, xyz, scale, obj, corners, valid)


class HoughVoting:
    """Module-style wrapper mirroring the reference API
    (reference: train_joint.py:48-56)."""

    def __init__(self, res: float = 0.03, num_rots: int = 120, rot_chunk: int = 4):
        self.res = float(res)
        self.num_rots = int(num_rots)
        self.rot_chunk = rot_chunk

    def __call__(self, points, xyz, scale, obj, corners=None, valid=None,
                 grid_shape=None):
        if grid_shape is None:
            # Concrete (eager) call: size the grid exactly like the reference.
            pts = np.asarray(points)
            if valid is not None:
                pts = pts[np.asarray(valid) > 0]
            if corners is None:
                c = np.stack([pts.min(0), pts.max(0)])
            else:
                c = np.asarray(corners)
            dims = ((c[1] - c[0]) / self.res).astype(np.int32) + 1
            grid_shape = tuple(int(d) for d in dims)
        return hough_voting(
            points, xyz, scale, obj,
            res=self.res, num_rots=self.num_rots, grid_shape=grid_shape,
            corners=corners, valid=valid, rot_chunk=self.rot_chunk,
        )


def vote_stats_at_cell(points, xyz, scale, obj, corner, dims, res: float,
                       num_rots: int, cell, valid=None):
    """Normalized rot/scale vote channels at ONE grid cell, computed lazily.

    Returns (rot_vec (2,), scale_vec (3,)) — exactly what the dense vote
    grids would hold at ``cell`` (hv_cuda_kernel.cu:61-93 accumulation +
    :100-119 normalization) — without materializing those grids. The box
    peeler samples rot/scale only at <= max_boxes argmax cells, so with this
    the dense splat can compute the obj channel alone (6x less MXU work);
    see eval/pipeline.py.

    The trilinear 2-corner splat weight of a vote at ``u`` onto cell ``c``
    is the tent function max(0, 1 - |u - c|) per axis.
    """
    res = jnp.float32(res)
    thetas = jnp.arange(num_rots, dtype=jnp.float32) * jnp.float32(
        _TWO_PI / num_rots
    )
    c = jnp.cos(thetas)[None, :]  # (1, R)
    s = jnp.sin(thetas)[None, :]
    corr = xyz * scale
    cx, cz = corr[:, 0:1], corr[:, 2:3]
    # offset = -Rot_y(theta) @ corr (hv_cuda_kernel.cu:38-39)
    ux = (points[:, 0:1] - cx * c + cz * s - corner[0]) / res   # (N, R)
    uy = (points[:, 1] - corr[:, 1] - corner[1]) / res          # (N,)
    uz = (points[:, 2:3] - cx * s - cz * c - corner[2]) / res
    df = dims.astype(jnp.float32)
    ok = (
        (ux >= 0.0) & (ux < df[0] - 1.0)
        & (uz >= 0.0) & (uz < df[2] - 1.0)
        & ((uy >= 0.0) & (uy < df[1] - 1.0))[:, None]
    )
    cellf = cell.astype(jnp.float32)
    tx = jnp.maximum(1.0 - jnp.abs(ux - cellf[0]), 0.0)
    ty = jnp.maximum(1.0 - jnp.abs(uy - cellf[1]), 0.0)[:, None]
    tz = jnp.maximum(1.0 - jnp.abs(uz - cellf[2]), 0.0)
    w = obj[:, None] * tx * ty * tz * ok.astype(jnp.float32)
    if valid is not None:
        w = w * (valid > 0).astype(jnp.float32)[:, None]
    denom = jnp.sum(w) + 1e-7
    rot_vec = jnp.stack([jnp.sum(w * c), jnp.sum(w * s)]) / denom
    scale_vec = jnp.sum(jnp.sum(w, axis=1)[:, None] * scale, axis=0) / denom
    return rot_vec, scale_vec


def hough_voting_obj(
    points: jnp.ndarray,
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    obj: jnp.ndarray,
    *,
    res: float,
    num_rots: int,
    grid_shape: Tuple[int, int, int],
    corners: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    rot_chunk: int = 4,
    chunk_points: int = 128,
    pallas_rot_chunk: int = 8,
    method: str = "auto",
) -> jnp.ndarray:
    """Objectness vote grid ONLY (no rot/scale channels).

    ``rot_chunk`` is the XLA path's scan-memory knob; the plane-splat
    kernel uses ``pallas_rot_chunk`` (its matmul contraction depth,
    swept in bench_vote2.py; round-3 results in benchmarks/RESULTS_r3.md).

    Inference fast path: the plane-splat kernel runs with a single channel
    (1/6 the matmul width); pair with ``vote_stats_at_cell`` for the few
    cells the decoder actually samples. Forward-only (no VJP) — training
    code uses ``hough_voting``.
    """
    if method == "auto":
        gz_ok = grid_shape[2] % 128 == 0
        method = (
            "pallas" if (jax.default_backend() == "tpu" and gz_ok) else "xla"
        )
    if valid is not None:
        valid = valid.astype(points.dtype)
    if corners is None:
        corners = compute_corners(points, valid)
    else:
        corners = jnp.asarray(corners, points.dtype)
    dims = grid_dims_from_corners(corners, res)
    dims = jnp.minimum(dims, jnp.asarray(grid_shape, jnp.int32))
    if method in ("pallas", "pallas_interpret", "pallas_windowed"):
        interp = method == "pallas_interpret"
        if method == "pallas_windowed" and grid_shape[0] % 32 == 0:
            # x-bucket-windowed splat: the tent/matmul width tracks where a
            # chunk's votes can land instead of the full Gx. MEASURED SLOWER
            # than the plane splat on v5e (67.4 vs 42.6 ms at 120 rots,
            # benchmarks/bench_vote3.py: the narrow canvas halves the MXU
            # work but the per-window bookkeeping and the full-width tail
            # pass for large-radius points eat the win) — kept as an
            # explicit opt-in, NOT the auto default.
            from canonicalvoting_tpu.ops.pallas.hv_splat import (
                hv_splat_windowed)

            return hv_splat_windowed(
                points, xyz, scale, obj, corners[0], dims, res,
                num_rots=num_rots, grid_shape=grid_shape, valid=valid,
                chunk_points=chunk_points, rot_chunk=pallas_rot_chunk,
                interpret=interp,
            )
        from canonicalvoting_tpu.ops.pallas.hv_splat import hv_splat_pallas

        raw = hv_splat_pallas(
            points, xyz, scale, obj, corners[0], dims, res,
            num_rots=num_rots, grid_shape=grid_shape, valid=valid,
            channels=1, chunk_points=chunk_points,
            rot_chunk=pallas_rot_chunk,
            interpret=interp,
        )
        return raw[..., 0]
    go, _, _ = hough_voting(
        points, xyz, scale, obj, res=res, num_rots=num_rots,
        grid_shape=grid_shape, corners=corners, valid=valid,
        rot_chunk=rot_chunk, method="xla",
    )
    return go
