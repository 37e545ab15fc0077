"""Pallas TPU kernel: occupied-tile submanifold Conv3D with fused epilogue.

XLA's dense Conv3D over the scene's bounding grid runs at ~15-20% MXU
utilization and computes every cell, but a surface scan occupies only
~30-40% of (8, 8, 32) tiles (and ~1-2% of cells). This kernel convolves ONLY
the occupied tiles:

  * the host lists occupied tile coordinates (scalar-prefetched);
  * each grid program DMAs its tile + halo from the zero-padded dense
    input in HBM, accumulates the k^3 kernel taps as MXU matmuls — the k^2
    (dx, dy) taps of each dz concatenated along the contraction dim so the
    MXU accumulates them internally — and DMAs the tile interior back out;
  * input, residual and occupancy DMAs are double-buffered across grid
    steps, so tile t+1's loads and tile t-1's store overlap tile t's
    matmuls;
  * an optional fused epilogue applies, in reference order (conv -> mask ->
    BN -> +residual -> relu; see /root/reference/utils/resnet.py blocks):
    per-channel affine (inference BatchNorm), the tile's occupancy mask,
    a residual-grid add, and ReLU — replacing three full-grid elementwise
    passes per block;
  * the output buffer is donated zeros (input_output_aliased), so cells in
    unoccupied tiles — which are all unoccupied cells — stay exactly zero.

Supports k=3 (halo 1) and k=5 (halo 2). Equality with the dense conv at
occupied cells is exact (same taps, same weights); see
tests/test_tiled_conv.py.

Mosaic layout notes: the DMA'd z window is 8-sublane-aligned (the host pads
z by 8; the halo sits at in-tile z offset 8-h), and the channel (lane) dim
is padded to 128. The z (sublane) shift per dz is hoisted out of the tap
loop (k relayouts instead of k^3). Occupancy comes packed per tile as
(T, TX, TY*TZ) so its DMA has a 128-multiple lane dim.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ZPAD = 8  # host-side z padding; DMA windows must be 8-sublane aligned


def _kernel(tiles_ref, *args,
            TX: int, TY: int, TZ: int, cin: int, cout: int, k: int,
            n_tiles: int, group_dz: bool, out_dtype,
            has_affine: bool, has_occ: bool, has_res: bool, relu_out: bool):
    h = k // 2
    it = iter(args)
    x_hbm = next(it)
    w_ref = next(it)
    ab_ref = next(it) if has_affine else None
    occ_hbm = next(it) if has_occ else None
    res_hbm = next(it) if has_res else None
    _zeros = next(it)
    out_ref = next(it)
    in_tile = next(it)
    acc = next(it)
    occ_tile = next(it) if has_occ else None
    res_tile = next(it) if has_res else None
    sem_in = next(it)
    sem_out = next(it)
    sem_occ = next(it) if has_occ else None
    sem_res = next(it) if has_res else None

    t = pl.program_id(0)

    def txyz(tile_idx):
        return (tiles_ref[tile_idx, 0] * TX, tiles_ref[tile_idx, 1] * TY,
                tiles_ref[tile_idx, 2] * TZ)

    def in_dma(slot, tile_idx):
        tx, ty, tz = txyz(tile_idx)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tx, TX + 2 * h), pl.ds(ty, TY + 2 * h),
                     pl.ds(tz, TZ + 2 * _ZPAD), :],
            in_tile.at[slot], sem_in.at[slot],
        )

    def occ_dma(slot, tile_idx):
        return pltpu.make_async_copy(
            occ_hbm.at[tile_idx], occ_tile.at[slot], sem_occ.at[slot]
        )

    def res_dma(slot, tile_idx):
        tx, ty, tz = txyz(tile_idx)
        return pltpu.make_async_copy(
            res_hbm.at[pl.ds(tx, TX), pl.ds(ty, TY), pl.ds(tz, TZ), :],
            res_tile.at[slot], sem_res.at[slot],
        )

    def start_in(slot, tile_idx):
        in_dma(slot, tile_idx).start()
        if has_occ:
            occ_dma(slot, tile_idx).start()
        if has_res:
            res_dma(slot, tile_idx).start()

    def out_dma(slot, tile_idx):
        tx, ty, tz = txyz(tile_idx)
        return pltpu.make_async_copy(
            acc.at[slot],
            out_ref.at[pl.ds(tx, TX), pl.ds(ty, TY), pl.ds(tz, TZ), :],
            sem_out.at[slot],
        )

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        start_in(slot, t)

    @pl.when(t + 1 < n_tiles)
    def _():
        start_in(nxt, t + 1)

    in_dma(slot, t).wait()
    if has_occ:
        occ_dma(slot, t).wait()
    if has_res:
        res_dma(slot, t).wait()

    # acc[slot] is still being stored from step t-2; wait before overwriting
    @pl.when(t >= 2)
    def _():
        out_dma(slot, t - 2).wait()

    cells = TX * TY * TZ
    z0 = _ZPAD - h  # halo start in the z window
    # hoist the z-shift out of the tap loop: slicing the z (sublane) dim at
    # a non-8-aligned offset relayouts the whole window, so do it once per
    # dz (k copies) instead of once per tap (k^3 copies); the (dx, dy)
    # leading-dim slices + reshape merges below are free
    zwin = [
        in_tile[slot, :, :, z0 + dz:z0 + dz + TZ, :] for dz in range(k)
    ]
    if group_dz:
        # kept for benchmarking: full-z-window matmuls, slice the f32
        # accumulator once per dz (measured slower than the default)
        cells_f = TX * TY * (TZ + 2 * _ZPAD)
        acc_g = jnp.zeros((TX, TY, TZ, cout), jnp.float32)
        for dz in range(k):
            part = jnp.zeros((cells_f, cout), jnp.float32)
            for dy in range(k):
                for dx in range(k):
                    tap = dx + k * dy + k * k * dz
                    patch = in_tile[slot, dx:dx + TX, dy:dy + TY, :, :]
                    part = part + jax.lax.dot_general(
                        patch.reshape(cells_f, cin), w_ref[tap],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            part = part.reshape(TX, TY, TZ + 2 * _ZPAD, cout)
            acc_g = acc_g + part[:, :, z0 + dz:z0 + dz + TZ, :]
        acc_v = acc_g.reshape(cells, cout)
    else:
        # per dz, the k^2 (dx, dy) taps are CONCATENATED along the
        # contraction dim — one (cells, k^2*cin) @ (k^2*cin, cout) matmul —
        # so the MXU accumulates them internally instead of paying a
        # (cells, cout) f32 VPU add per tap
        acc_v = jnp.zeros((cells, cout), jnp.float32)
        for dz in range(k):
            a = jnp.concatenate(
                [
                    zwin[dz][dx:dx + TX, dy:dy + TY].reshape(cells, cin)
                    for dy in range(k) for dx in range(k)
                ],
                axis=1,
            )  # (cells, k^2 * cin)
            wg = w_ref[k * k * dz:k * k * (dz + 1)].reshape(k * k * cin, cout)
            acc_v = acc_v + jax.lax.dot_general(
                a, wg,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # fused epilogue — reference order conv -> BN(mask) -> +res -> relu;
    # affine-then-mask equals mask-then-affine for occ in {0, 1}
    if has_affine:
        acc_v = acc_v * ab_ref[0:1, :] + ab_ref[1:2, :]
    if has_occ:
        # expand (TX, TY*TZ) packed occupancy to a (cells, 1) column.
        # A direct reshape is a lane->sublane redistribution Mosaic can't
        # lower; instead select each cell's row with a tiny one-hot matmul
        # and its lane with an iota compare + lane reduction.
        ot = occ_tile[slot]                       # (TX, TY*TZ)
        yz = TY * TZ
        cell = jax.lax.broadcasted_iota(jnp.int32, (cells, 1), 0)
        row_oh = (jax.lax.broadcasted_iota(jnp.int32, (cells, TX), 1)
                  == cell // yz).astype(jnp.float32)
        occ_rows = jax.lax.dot_general(
            row_oh, ot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                         # (cells, TY*TZ)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (cells, yz), 1)
               == cell % yz)
        occm = jnp.sum(jnp.where(sel, occ_rows, 0.0), axis=1, keepdims=True)
        acc_v = acc_v * occm
    if has_res:
        acc_v = acc_v + res_tile[slot].reshape(cells, cout).astype(jnp.float32)
    if relu_out:
        acc_v = jnp.maximum(acc_v, 0.0)

    acc[slot] = acc_v.astype(out_dtype).reshape(TX, TY, TZ, cout)

    out_dma(slot, t).start()

    @pl.when(t == n_tiles - 1)
    def _():
        out_dma(slot, t).wait()
        if n_tiles >= 2:
            out_dma(nxt, t - 1).wait()


@functools.partial(
    jax.jit,
    static_argnames=("tile_shape", "kernel_size", "group_dz", "relu_out",
                     "interpret"),
)
def tiled_conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    tiles: jnp.ndarray,
    *,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    occ: Optional[jnp.ndarray] = None,
    residual: Optional[jnp.ndarray] = None,
    relu_out: bool = False,
    tile_shape: Tuple[int, int, int] = (8, 8, 32),
    kernel_size: int = 3,
    group_dz: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Submanifold odd-k Conv3D over occupied tiles, with fused epilogue.

    Args:
      x: (X, Y, Z, Cin) dense activations (bf16 or f32); dims divisible by
        the tile shape.
      w: (k^3, Cin, Cout) kernel, x-fastest offsets (ops/coords.kernel_offsets).
      tiles: (T, 3) int32 occupied tile coordinates (grid-units / tile_shape).
      scale, bias: optional (Cout,) per-channel affine applied to the conv
        output (inference BatchNorm folded: scale = gamma*rsqrt(var+eps),
        bias = beta - mean*scale). Both or neither.
      occ: optional (T, TX, TY*TZ) f32 per-tile occupancy (see pack_occ);
        output cells with occ == 0 are zeroed.
      residual: optional (X, Y, Z, Cout) grid added before the ReLU.
      relu_out: apply ReLU at the end.
      tile_shape: static tile dims.
      kernel_size: 3 or 5 (halo = k//2 <= 8).
      group_dz: benchmark-only alternative accumulation (slower).

    Returns (X, Y, Z, Cout) with exact conv(+epilogue) values inside
    occupied tiles and zeros elsewhere.
    """
    X, Y, Z, cin = x.shape
    _, _, cout = w.shape
    k = kernel_size
    h = k // 2
    assert w.shape[0] == k ** 3 and k % 2 == 1 and h <= _ZPAD
    TX, TY, TZ = tile_shape
    assert X % TX == 0 and Y % TY == 0 and Z % TZ == 0
    assert TZ % 8 == 0, "z tile must be sublane-aligned"
    assert (scale is None) == (bias is None)
    n_tiles = tiles.shape[0]
    has_affine = scale is not None
    has_occ = occ is not None
    has_res = residual is not None

    # lane (channel) dim of HBM<->VMEM DMAs must be 128-aligned: pad C
    cin_p = int(np.ceil(cin / 128) * 128)
    cout_p = int(np.ceil(cout / 128) * 128)
    xp = jnp.pad(x, ((h, h), (h, h), (_ZPAD, _ZPAD), (0, cin_p - cin)))
    wp = jnp.pad(w, ((0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    out0 = jnp.zeros((X, Y, Z, cout_p), x.dtype)

    operands = [tiles.astype(jnp.int32), xp, wp.astype(x.dtype)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),   # x padded
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (whole)
    ]
    if has_affine:
        ab = jnp.stack([
            jnp.pad(scale.astype(jnp.float32), (0, cout_p - cout)),
            jnp.pad(bias.astype(jnp.float32), (0, cout_p - cout)),
        ])
        operands.append(ab)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if has_occ:
        operands.append(occ.astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    if has_res:
        rp = jnp.pad(residual.astype(x.dtype),
                     ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
        operands.append(rp)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    operands.append(out0)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # donated zeros
    zeros_index = len(operands) - 1  # + 1 for the scalar-prefetch operand

    scratch = [
        pltpu.VMEM((2, TX + 2 * h, TY + 2 * h, TZ + 2 * _ZPAD, cin_p),
                   x.dtype),
        pltpu.VMEM((2, TX, TY, TZ, cout_p), x.dtype),
    ]
    if has_occ:
        scratch.append(pltpu.VMEM((2, TX, TY * TZ), jnp.float32))
    if has_res:
        scratch.append(pltpu.VMEM((2, TX, TY, TZ, cout_p), x.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))  # sem_in
    scratch.append(pltpu.SemaphoreType.DMA((2,)))  # sem_out
    if has_occ:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if has_res:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    kernel = functools.partial(
        _kernel, TX=TX, TY=TY, TZ=TZ, cin=cin_p, cout=cout_p, k=k,
        n_tiles=n_tiles, group_dz=group_dz, out_dtype=x.dtype,
        has_affine=has_affine, has_occ=has_occ, has_res=has_res,
        relu_out=relu_out,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, cout_p), x.dtype),
        input_output_aliases={zeros_index: 0},
        interpret=interpret,
    )(*operands)[..., :cout]


def occupied_tiles(coords_or_flat, dims, tile_shape=(8, 8, 32)):
    """Host helper: unique tile coords for L0 voxel coords (N, 3) relative to
    the dense base (see data.dense_prep)."""
    c = np.asarray(coords_or_flat)
    t = np.unique(c // np.asarray(tile_shape), axis=0).astype(np.int32)
    return t


def pack_occ(occ_grid: jnp.ndarray, tiles: jnp.ndarray,
             tile_shape=(8, 8, 32)) -> jnp.ndarray:
    """Device helper: gather per-tile occupancy as (T, TX, TY*TZ) f32 from a
    dense (X, Y, Z) occupancy grid (the packing keeps the DMA lane dim a
    128 multiple)."""
    TX, TY, TZ = tile_shape
    X, Y, Z = occ_grid.shape
    o = occ_grid.reshape(X // TX, TX, Y // TY, TY, Z // TZ, TZ)
    o = jnp.transpose(o, (0, 2, 4, 1, 3, 5))  # (ntx, nty, ntz, TX, TY, TZ)
    g = o[tiles[:, 0], tiles[:, 1], tiles[:, 2]]  # (T, TX, TY, TZ)
    return g.reshape(tiles.shape[0], TX, TY * TZ).astype(jnp.float32)
