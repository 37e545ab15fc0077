"""Pallas TPU kernel: canonical Hough voting as per-y-plane MXU matmuls.

WHY. The voting op (reference hv_cuda_kernel.cu:12-97) is a scatter-add of
N x num_rots x 8 trilinear corner weights. GPUs do this with atomicAdd;
XLA's TPU scatter-add processes ~10-20M updates/s, which makes a realistic
ScanNet scene (66k voxels x 120 rotations x 8 corners ~ 64M updates) take
~6 s. TPUs have no fast random scatter — but they have the MXU.

HOW. Two structural facts of the rotation sweep:

  1. The Y component of every vote is rotation-INVARIANT
     (offset_y = -xyz_y*scale_y, hv_cuda_kernel.cu:39): each point writes to
     exactly two adjacent y-planes (floor/ceil) with fixed weights for all
     rotations.
  2. The trilinear splat factorizes: within a y-plane a vote contributes
     w_y * (x-tent) (x) (z-tent) — an OUTER PRODUCT of bilinear tents.

So: sort points by their FLOOR vote y-plane (one cheap N-key sort) and let
grid program j accumulate, over its own points only, a DOUBLE-WIDTH canvas

    canvas_j (2*ch*Gx, Gz) += [A*w0 | A*w1]^T @ Cz

whose left half is plane j's own (floor, weight 1-frac) contribution and
right half the spill into plane j+1 (ceil, weight frac). A final cheap XLA
pass adds the right halves shifted down one plane. Each point is therefore
processed ONCE (the previous revision swept every point twice, once per
adjacent plane — the tent/one-hot construction on the VPU is the dominant
cost and this halves it). A (V, ch*Gx) holds the x-tents scaled per channel
(obj, obj*cos, obj*sin, obj*s_{x,y,z}); Cz (V, Gz) the z-tents. Tents are
built as max(0, 1 - |col - u|), exactly the two trilinear corner weights.
Scatter becomes ~N*R*2*ch*Gx*Gz dense bf16 MACs with f32 accumulation —
tens of milliseconds instead of seconds, and deterministic.

The backward pass stays on the XLA path (ops/hough_voting.py) — training
never differentiates through the vote op in the reference pipelines
(SURVEY section 3.1), so only eval throughput matters here.

Layout notes (Mosaic): points live on the SUBLANE axis (chunks of C=128
rows); rotations are a static python unroll of Rc=8 per matmul, giving a
contraction dim V = Rc*C = 1024. All intermediates are 2D; channel scaling
builds A by lane-concatenation, avoiding 3D reshapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * 3.141592654  # matches the CUDA kernel constant

# cols of the packed per-point row
_PX, _PZ, _CORX, _CORZ, _OBJ, _SX, _SY, _SZ, _WY1 = range(9)
_NCOLS = 128  # padded to full lane width for aligned DMA slices


def _kernel(starts_ref, ends_ref, dims_ref, data_hbm, out_ref, pt_ref, sem,
            *, C: int, Rc: int, n_rot_steps: int, num_rots: int,
            gx: int, gz: int, channels: int = 6):
    j = pl.program_id(0)
    start = starts_ref[j]
    end = ends_ref[j]
    dims_x = dims_ref[0].astype(jnp.float32)
    dims_z = dims_ref[1].astype(jnp.float32)
    dtheta = jnp.float32(_TWO_PI / num_rots)

    out_ref[0] = jnp.zeros((2 * channels * gx, gz), jnp.float32)

    n = jnp.maximum(end - start, 0)
    n_chunks = pl.cdiv(n, C)

    colx = jax.lax.broadcasted_iota(jnp.int32, (C, gx), 1).astype(jnp.float32)
    colz = jax.lax.broadcasted_iota(jnp.int32, (C, gz), 1).astype(jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

    # per-rotation constants as (1, RP) lane vectors (f32 t*dtheta trig,
    # identical to the previous per-rotation scalar math)
    RP = 128
    assert n_rot_steps * Rc <= RP, "num_rots > 128 unsupported"
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, RP), 1)
    thetas = t_iota.astype(jnp.float32) * dtheta
    cosv = jnp.cos(thetas)
    sinv = jnp.sin(thetas)
    rot_ok = (t_iota < num_rots).astype(jnp.float32)  # (1, RP)

    def chunk_body(ci, _):
        row0 = start + ci * C
        cp = pltpu.make_async_copy(
            data_hbm.at[pl.ds(row0, C), :], pt_ref, sem
        )
        cp.start()
        cp.wait()

        px = pt_ref[:, _PX:_PX + 1]      # (C, 1)
        pz = pt_ref[:, _PZ:_PZ + 1]
        corx = pt_ref[:, _CORX:_CORX + 1]
        corz = pt_ref[:, _CORZ:_CORZ + 1]
        obj = pt_ref[:, _OBJ:_OBJ + 1]
        sx = pt_ref[:, _SX:_SX + 1]
        sy = pt_ref[:, _SY:_SY + 1]
        sz = pt_ref[:, _SZ:_SZ + 1]
        wy1 = pt_ref[:, _WY1:_WY1 + 1]

        row_ok = ((row0 + row_iota) < end).astype(jnp.float32)  # (C, 1)
        base0 = obj * (1.0 - wy1) * row_ok  # own (floor) plane
        base1 = obj * wy1 * row_ok          # spill to plane j+1

        # ALL-rotation precompute, full-lane batched: the per-rotation
        # (C, 1) op chain (rotate, bounds test, weight) used 1/128 of the
        # VPU lanes and dominated the kernel (~0.27 ms/rotation measured;
        # grid width barely mattered). One (C, RP) pass replaces 120
        # serial chains; the unrolled loop below only slices lanes and
        # builds tents.
        ux_all = px - corx * cosv + corz * sinv          # (C, RP)
        uz_all = pz - corx * sinv - corz * cosv
        ok_all = (
            (ux_all >= 0.0) & (ux_all < dims_x - 1.0)
            & (uz_all >= 0.0) & (uz_all < dims_z - 1.0)
        ).astype(jnp.float32) * rot_ok                    # (C, RP)
        b0_all = base0 * ok_all
        b1_all = base1 * ok_all

        # rotations fully unrolled: `t` is a python int, so the lane
        # slices below are static and the trig above is shared
        for ti in range(n_rot_steps):
            a_parts = []
            c_parts = []
            for r in range(Rc):
                t = ti * Rc + r
                ux = ux_all[:, t:t + 1]           # (C, 1) static lane slice
                uz = uz_all[:, t:t + 1]

                # bilinear tents: max(0, 1 - |col - u|) hits exactly the
                # floor/ceil cells with weights (1 - frac, frac)
                ax = jnp.maximum(1.0 - jnp.abs(colx - ux), 0.0)  # (C, gx)
                czr = jnp.maximum(1.0 - jnp.abs(colz - uz), 0.0)  # (C, gz)

                b0 = b0_all[:, t:t + 1]  # (C, 1)
                b1 = b1_all[:, t:t + 1]
                axb = ax.astype(jnp.bfloat16)
                if channels == 1:
                    # obj-only fast path (see hough_voting_obj)
                    a2r = jnp.concatenate(
                        [b0.astype(jnp.bfloat16) * axb,
                         b1.astype(jnp.bfloat16) * axb], axis=1,
                    )  # (C, 2*gx)
                else:
                    # channels: [obj, obj*cos, obj*sin, obj*sx, obj*sy,
                    # obj*sz], own plane then spill plane
                    c = cosv[:, t:t + 1]  # (1, 1)
                    s = sinv[:, t:t + 1]
                    a2r = jnp.concatenate(
                        [
                            (b0 * 1.0).astype(jnp.bfloat16) * axb,
                            (b0 * c).astype(jnp.bfloat16) * axb,
                            (b0 * s).astype(jnp.bfloat16) * axb,
                            (b0 * sx).astype(jnp.bfloat16) * axb,
                            (b0 * sy).astype(jnp.bfloat16) * axb,
                            (b0 * sz).astype(jnp.bfloat16) * axb,
                            (b1 * 1.0).astype(jnp.bfloat16) * axb,
                            (b1 * c).astype(jnp.bfloat16) * axb,
                            (b1 * s).astype(jnp.bfloat16) * axb,
                            (b1 * sx).astype(jnp.bfloat16) * axb,
                            (b1 * sy).astype(jnp.bfloat16) * axb,
                            (b1 * sz).astype(jnp.bfloat16) * axb,
                        ],
                        axis=1,
                    )  # (C, 12*gx)
                a_parts.append(a2r)
                c_parts.append(czr.astype(jnp.bfloat16))

            a2 = jnp.concatenate(a_parts, axis=0)   # (Rc*C, 2*ch*gx)
            czm = jnp.concatenate(c_parts, axis=0)  # (Rc*C, gz)
            update = jax.lax.dot_general(
                a2, czm,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2*ch*gx, gz)
            out_ref[0] += update
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_rots", "grid_shape", "chunk_points", "rot_chunk",
                     "channels", "interpret"),
)
def hv_splat_pallas(
    points: jnp.ndarray,
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    obj: jnp.ndarray,
    corner: jnp.ndarray,
    dims: jnp.ndarray,
    res: float,
    *,
    num_rots: int,
    grid_shape: Tuple[int, int, int],
    valid: jnp.ndarray = None,
    chunk_points: int = 128,
    rot_chunk: int = 8,
    channels: int = 6,
    interpret: bool = False,
):
    """Raw (unnormalized) vote grid via the plane-splat kernel.

    Args mirror ops.hough_voting internals: ``corner`` (3,) is the grid
    origin, ``dims`` (3,) int32 the ACTUAL grid dims (bounds test), ``res``
    the cell size. Returns (Gx, Gy, Gz, channels) float32 raw sums
    [obj, obj*cos, obj*sin, obj*sx, obj*sy, obj*sz] (channels=6), or just
    [obj] (channels=1 — the obj-only fast path, see hough_voting_obj).
    """
    assert channels in (1, 6)
    gx, gy, gz = grid_shape
    assert gz % 128 == 0, "Gz must be a multiple of 128 (lane dim)"
    n = points.shape[0]
    res_f = jnp.float32(res)

    corr = xyz * scale
    center_y = (points[:, 1] - corr[:, 1] - corner[1]) / res_f
    jy = jnp.floor(center_y).astype(jnp.int32)
    wy1 = center_y - jy.astype(jnp.float32)
    y_ok = (center_y >= 0.0) & (center_y < (dims[1].astype(jnp.float32) - 1.0))
    if valid is not None:
        y_ok = y_ok & (valid > 0)
    key = jnp.where(y_ok, jy, gy).astype(jnp.int32)

    data = jnp.zeros((n, _NCOLS), jnp.float32)
    data = data.at[:, _PX].set((points[:, 0] - corner[0]) / res_f)
    data = data.at[:, _PZ].set((points[:, 2] - corner[2]) / res_f)
    data = data.at[:, _CORX].set(corr[:, 0] / res_f)
    data = data.at[:, _CORZ].set(corr[:, 2] / res_f)
    data = data.at[:, _OBJ].set(obj)
    data = data.at[:, _SX].set(scale[:, 0])
    data = data.at[:, _SY].set(scale[:, 1])
    data = data.at[:, _SZ].set(scale[:, 2])
    data = data.at[:, _WY1].set(wy1)

    order = jnp.argsort(key)
    sort_keys = key[order]
    data = data[order]
    # pad so chunk DMAs never run off the end
    data = jnp.concatenate(
        [data, jnp.zeros((chunk_points, _NCOLS), jnp.float32)], axis=0
    )

    planes = jnp.arange(gy, dtype=jnp.int32)
    starts = jnp.searchsorted(sort_keys, planes, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sort_keys, planes + 1, side="left").astype(jnp.int32)
    dims_xz = jnp.stack([dims[0], dims[2]]).astype(jnp.int32)

    n_rot_steps = int(np.ceil(num_rots / rot_chunk))
    kernel = functools.partial(
        _kernel, C=chunk_points, Rc=rot_chunk, n_rot_steps=n_rot_steps,
        num_rots=num_rots, gx=gx, gz=gz, channels=channels,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, 2 * channels * gx, gz), lambda j, *_: (j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk_points, _NCOLS), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gy, 2 * channels * gx, gz),
                                       jnp.float32),
        # the unrolled rotation loop keeps more buffers live than the
        # default 16M scoped-vmem stack allows at some grid shapes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, ends, dims_xz, data)

    # combine: plane j = own(j) + spill(j - 1)
    out = out.reshape(gy, 2, channels, gx, gz)
    own, spill = out[:, 0], out[:, 1]
    grid = own + jnp.pad(spill[:-1], ((1, 0), (0, 0), (0, 0), (0, 0)))
    # (Gy, ch, Gx, Gz) -> (Gx, Gy, Gz, ch)
    return jnp.transpose(grid, (2, 0, 3, 1))


def _kernel_windowed(starts_ref, ends_ref, dims_ref, data_hbm, out_ref,
                     pt_ref, sem, *, C: int, Rc: int, n_rot_steps: int,
                     num_rots: int, gx: int, gz: int, XB: int, PAD: int):
    """Obj-only plane splat with per-x-bucket windows (see
    hv_splat_windowed). Program j owns y-plane j; its canvas is
    (2, gx + 2*PAD, gz) — [own | spill] planes with PAD x-margins that
    absorb window overhang and are trimmed by the combine step."""
    j = pl.program_id(0)
    NB = gx // XB
    W = XB + 2 * PAD
    gxm = gx + 2 * PAD
    dims_x = dims_ref[0].astype(jnp.float32)
    dims_z = dims_ref[1].astype(jnp.float32)
    dtheta = jnp.float32(_TWO_PI / num_rots)

    out_ref[0] = jnp.zeros((2, gxm, gz), jnp.float32)

    colz = jax.lax.broadcasted_iota(jnp.int32, (C, gz), 1).astype(jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

    def seg_chunks(seg, x0m, W_, colw):
        """Accumulate one (plane, bucket) segment into window [x0m, x0m+W_).

        colw: (C, W_) iota. Window-local tent center uxw = ux - x0m + PAD.
        """
        start = starts_ref[seg]
        end = ends_ref[seg]
        n = jnp.maximum(end - start, 0)
        n_chunks = pl.cdiv(n, C)

        def chunk_body(ci, _):
            row0 = start + ci * C
            cp = pltpu.make_async_copy(
                data_hbm.at[pl.ds(row0, C), :], pt_ref, sem
            )
            cp.start()
            cp.wait()

            px = pt_ref[:, _PX:_PX + 1]
            pz = pt_ref[:, _PZ:_PZ + 1]
            corx = pt_ref[:, _CORX:_CORX + 1]
            corz = pt_ref[:, _CORZ:_CORZ + 1]
            obj = pt_ref[:, _OBJ:_OBJ + 1]
            wy1 = pt_ref[:, _WY1:_WY1 + 1]

            row_ok = ((row0 + row_iota) < end).astype(jnp.float32)
            base0 = obj * (1.0 - wy1) * row_ok
            base1 = obj * wy1 * row_ok
            xoff = jnp.float32(x0m - PAD)

            def rot_step(ti, _):
                a_parts = []
                c_parts = []
                for r in range(Rc):
                    t = ti * Rc + r
                    theta = t.astype(jnp.float32) * dtheta
                    c = jnp.cos(theta)
                    s = jnp.sin(theta)
                    ux = px - c * corx + s * corz
                    uz = pz - s * corx - c * corz
                    ok = (
                        (ux >= 0.0) & (ux < dims_x - 1.0)
                        & (uz >= 0.0) & (uz < dims_z - 1.0)
                    ).astype(jnp.float32)
                    if num_rots % Rc:
                        ok = ok * (t < num_rots).astype(jnp.float32)

                    axw = jnp.maximum(1.0 - jnp.abs(colw - (ux - xoff)), 0.0)
                    czr = jnp.maximum(1.0 - jnp.abs(colz - uz), 0.0)
                    axb = axw.astype(jnp.bfloat16)
                    a_parts.append(jnp.concatenate(
                        [(base0 * ok).astype(jnp.bfloat16) * axb,
                         (base1 * ok).astype(jnp.bfloat16) * axb], axis=1,
                    ))
                    c_parts.append(czr.astype(jnp.bfloat16))

                a2 = jnp.concatenate(a_parts, axis=0)   # (Rc*C, 2*W_)
                czm = jnp.concatenate(c_parts, axis=0)  # (Rc*C, gz)
                update = jax.lax.dot_general(
                    a2, czm,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (2*W_, gz)
                u = update.reshape(2, W_, gz)
                out_ref[0, :, pl.ds(x0m, W_), :] += u
                return 0

            jax.lax.fori_loop(0, n_rot_steps, rot_step, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    colw = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1).astype(jnp.float32)
    for b in range(NB):
        seg_chunks(j * NB + b, b * XB, W, colw)
    # large-radius tail: full-width pass over this plane's big-box points
    gy = pl.num_programs(0)
    colf = jax.lax.broadcasted_iota(jnp.int32, (C, gxm), 1).astype(
        jnp.float32)
    seg_chunks(gy * NB + j, 0, gxm, colf)


@functools.partial(
    jax.jit,
    static_argnames=("num_rots", "grid_shape", "chunk_points", "rot_chunk",
                     "x_bucket", "x_pad", "interpret"),
)
def hv_splat_windowed(
    points: jnp.ndarray,
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    obj: jnp.ndarray,
    corner: jnp.ndarray,
    dims: jnp.ndarray,
    res: float,
    *,
    num_rots: int,
    grid_shape: Tuple[int, int, int],
    valid: jnp.ndarray = None,
    chunk_points: int = 128,
    rot_chunk: int = 8,
    x_bucket: int = 32,
    x_pad: int = 40,
    interpret: bool = False,
):
    """Obj-only raw vote grid, x-bucket-windowed plane splat.

    Same math as hv_splat_pallas(channels=1), restructured so the x-tent /
    matmul width tracks where a chunk's votes can actually land: points are
    sorted by (y-plane, x-bucket); a bucket's votes stay within
    bucket +- (vote radius), so chunks process a static (x_bucket +
    2*x_pad)-wide window instead of the full Gx. Points whose rotation
    radius exceeds the window margin (big boxes — rare) go through a
    full-width per-plane tail pass, so results are EXACT for all points.
    Requires Gx % x_bucket == 0.
    """
    gx, gy, gz = grid_shape
    assert gz % 128 == 0, "Gz must be a multiple of 128 (lane dim)"
    assert gx % x_bucket == 0
    NB = gx // x_bucket
    n = points.shape[0]
    res_f = jnp.float32(res)

    corr = xyz * scale
    center_y = (points[:, 1] - corr[:, 1] - corner[1]) / res_f
    jy = jnp.floor(center_y).astype(jnp.int32)
    wy1 = center_y - jy.astype(jnp.float32)
    y_ok = (center_y >= 0.0) & (center_y < (dims[1].astype(jnp.float32) - 1.0))
    if valid is not None:
        y_ok = y_ok & (valid > 0)

    px = (points[:, 0] - corner[0]) / res_f
    r = jnp.sqrt(corr[:, 0] ** 2 + corr[:, 2] ** 2) / res_f
    small = r <= jnp.float32(x_pad - 2)
    bx = jnp.clip(jnp.floor(px / x_bucket).astype(jnp.int32), 0, NB - 1)
    nseg = gy * NB + gy
    key = jnp.where(
        small, jy * NB + bx, gy * NB + jy
    ).astype(jnp.int32)
    key = jnp.where(y_ok, key, nseg)

    data = jnp.zeros((n, _NCOLS), jnp.float32)
    data = data.at[:, _PX].set(px)
    data = data.at[:, _PZ].set((points[:, 2] - corner[2]) / res_f)
    data = data.at[:, _CORX].set(corr[:, 0] / res_f)
    data = data.at[:, _CORZ].set(corr[:, 2] / res_f)
    data = data.at[:, _OBJ].set(obj)
    data = data.at[:, _WY1].set(wy1)

    order = jnp.argsort(key)
    sort_keys = key[order]
    data = data[order]
    data = jnp.concatenate(
        [data, jnp.zeros((chunk_points, _NCOLS), jnp.float32)], axis=0
    )

    segs = jnp.arange(nseg, dtype=jnp.int32)
    starts = jnp.searchsorted(sort_keys, segs, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sort_keys, segs + 1, side="left").astype(jnp.int32)
    dims_xz = jnp.stack([dims[0], dims[2]]).astype(jnp.int32)

    n_rot_steps = int(np.ceil(num_rots / rot_chunk))
    gxm = gx + 2 * x_pad
    kernel = functools.partial(
        _kernel_windowed, C=chunk_points, Rc=rot_chunk,
        n_rot_steps=n_rot_steps, num_rots=num_rots, gx=gx, gz=gz,
        XB=x_bucket, PAD=x_pad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, 2, gxm, gz), lambda j, *_: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk_points, _NCOLS), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gy, 2, gxm, gz), jnp.float32),
        interpret=interpret,
    )(starts, ends, dims_xz, data)

    # trim window margins; combine: plane j = own(j) + spill(j - 1)
    out = out[:, :, x_pad:x_pad + gx, :]
    own, spill = out[:, 0], out[:, 1]
    grid = own + jnp.pad(spill[:-1], ((1, 0), (0, 0), (0, 0)))
    # (Gy, Gx, Gz) -> (Gx, Gy, Gz)
    return jnp.transpose(grid, (1, 0, 2))
