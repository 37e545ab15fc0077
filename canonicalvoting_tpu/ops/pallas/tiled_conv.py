"""Pallas TPU kernel: occupied-tile submanifold Conv3D.

XLA's dense Conv3D over the scene's bounding grid runs at ~15-20% MXU
utilization and computes every cell, but a surface scan occupies only
~30-40% of (8, 8, 32) tiles (and ~1-2% of cells). This kernel convolves ONLY
the occupied tiles:

  * the host lists occupied tile coordinates (scalar-prefetched);
  * each grid program DMAs its tile + halo from the zero-padded dense
    input in HBM, accumulates the k^3 kernel taps as (cells, Cin) @ (Cin,
    Cout) MXU matmuls from VMEM (each input cell is read once from HBM,
    vs XLA conv's repeated passes), and DMAs the tile interior back out;
  * input and output DMAs are double-buffered across grid steps, so tile
    t+1's load and tile t-1's store overlap tile t's matmuls;
  * the output buffer is donated zeros (input_output_aliased), so cells in
    unoccupied tiles — which are all unoccupied cells, whose values the
    dense-masked UNet multiplies away anyway — stay exactly zero.

Supports k=3 (halo 1) and k=5 (halo 2, the MinkUNet stem). Equality with
the dense conv at occupied cells is exact (same taps, same weights); see
tests/test_tiled_conv.py.

Mosaic layout notes: the DMA'd z window is 8-sublane-aligned (the host pads
z by 8; the halo sits at in-tile z offset 8-h), and the channel (lane) dim
is padded to 128. The dz-grouped accumulation path (``group_dz=True``)
computes each dz-plane's 9/25 (dx, dy) taps over the full aligned z window
and slices the accumulator once per dz, trading k^2-1 extra unaligned-
sublane input relayouts for (k-1) f32 output relayouts + 50% more MXU work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ZPAD = 8  # host-side z padding; DMA windows must be 8-sublane aligned


def _kernel(tiles_ref, x_hbm, w_ref, zeros_ref, out_ref, in_tile, acc,
            sem_in, sem_out,
            *, TX: int, TY: int, TZ: int, cin: int, cout: int, k: int,
            n_tiles: int, group_dz: bool, out_dtype):
    h = k // 2
    t = pl.program_id(0)

    def in_dma(slot, tile_idx):
        tx = tiles_ref[tile_idx, 0] * TX
        ty = tiles_ref[tile_idx, 1] * TY
        tz = tiles_ref[tile_idx, 2] * TZ
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tx, TX + 2 * h), pl.ds(ty, TY + 2 * h),
                     pl.ds(tz, TZ + 2 * _ZPAD), :],
            in_tile.at[slot], sem_in.at[slot],
        )

    def out_dma(slot, tile_idx):
        tx = tiles_ref[tile_idx, 0] * TX
        ty = tiles_ref[tile_idx, 1] * TY
        tz = tiles_ref[tile_idx, 2] * TZ
        return pltpu.make_async_copy(
            acc.at[slot],
            out_ref.at[pl.ds(tx, TX), pl.ds(ty, TY), pl.ds(tz, TZ), :],
            sem_out.at[slot],
        )

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        in_dma(slot, t).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        in_dma(nxt, t + 1).start()

    in_dma(slot, t).wait()

    # acc[slot] is still being stored from step t-2; wait before overwriting
    @pl.when(t >= 2)
    def _():
        out_dma(slot, t - 2).wait()

    cells = TX * TY * TZ
    z0 = _ZPAD - h  # halo start in the z window
    if group_dz:
        cells_f = TX * TY * (TZ + 2 * _ZPAD)
        acc_v = jnp.zeros((TX, TY, TZ, cout), jnp.float32)
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
            acc_v = acc_v + part[:, :, z0 + dz:z0 + dz + TZ, :]
    else:
        acc_v = jnp.zeros((cells, cout), jnp.float32)
        for dz in range(k):
            for dy in range(k):
                for dx in range(k):
                    tap = dx + k * dy + k * k * dz
                    patch = in_tile[slot, dx:dx + TX, dy:dy + TY,
                                    z0 + dz:z0 + dz + TZ, :]
                    acc_v = acc_v + jax.lax.dot_general(
                        patch.reshape(cells, cin), w_ref[tap],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        acc_v = acc_v.reshape(TX, TY, TZ, cout)
    acc[slot] = acc_v.astype(out_dtype)

    out_dma(slot, t).start()

    @pl.when(t == n_tiles - 1)
    def _():
        out_dma(slot, t).wait()
        if n_tiles >= 2:
            out_dma(nxt, t - 1).wait()


@functools.partial(
    jax.jit,
    static_argnames=("tile_shape", "kernel_size", "group_dz", "interpret"),
)
def tiled_conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    tiles: jnp.ndarray,
    *,
    tile_shape: Tuple[int, int, int] = (8, 8, 32),
    kernel_size: int = 3,
    group_dz: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Submanifold odd-k Conv3D over occupied tiles.

    Args:
      x: (X, Y, Z, Cin) dense activations (bf16 or f32); dims divisible by
        the tile shape.
      w: (k^3, Cin, Cout) kernel, x-fastest offsets (ops/coords.kernel_offsets).
      tiles: (T, 3) int32 occupied tile coordinates (grid-units / tile_shape).
      tile_shape: static tile dims.
      kernel_size: 3 or 5 (halo = k//2 <= 8).
      group_dz: use the dz-grouped accumulation (fewer unaligned input
        slices, +2*ZPAD/TZ extra MXU work).

    Returns (X, Y, Z, Cout) with exact conv values inside occupied tiles and
    zeros elsewhere.
    """
    X, Y, Z, cin = x.shape
    _, _, cout = w.shape
    k = kernel_size
    h = k // 2
    assert w.shape[0] == k ** 3 and k % 2 == 1 and h <= _ZPAD
    TX, TY, TZ = tile_shape
    assert X % TX == 0 and Y % TY == 0 and Z % TZ == 0
    assert TZ % 8 == 0, "z tile must be sublane-aligned"
    n_tiles = tiles.shape[0]

    # lane (channel) dim of HBM<->VMEM DMAs must be 128-aligned: pad C
    cin_p = int(np.ceil(cin / 128) * 128)
    cout_p = int(np.ceil(cout / 128) * 128)
    xp = jnp.pad(x, ((h, h), (h, h), (_ZPAD, _ZPAD), (0, cin_p - cin)))
    wp = jnp.pad(w, ((0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    out0 = jnp.zeros((X, Y, Z, cout_p), x.dtype)

    kernel = functools.partial(
        _kernel, TX=TX, TY=TY, TZ=TZ, cin=cin_p, cout=cout_p, k=k,
        n_tiles=n_tiles, group_dz=group_dz, out_dtype=x.dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # x padded
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (whole)
            pl.BlockSpec(memory_space=pltpu.HBM),   # donated zeros
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, TX + 2 * h, TY + 2 * h, TZ + 2 * _ZPAD, cin_p),
                       x.dtype),
            pltpu.VMEM((2, TX, TY, TZ, cout_p), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, cout_p), x.dtype),
        input_output_aliases={3: 0},  # donated zeros -> output (incl. prefetch idx)
        interpret=interpret,
    )(tiles.astype(jnp.int32), xp, wp.astype(x.dtype), out0)[..., :cout]


def occupied_tiles(coords_or_flat, dims, tile_shape=(8, 8, 32)):
    """Host helper: unique tile coords for L0 voxel coords (N, 3) relative to
    the dense base (see data.dense_prep)."""
    c = np.asarray(coords_or_flat)
    t = np.unique(c // np.asarray(tile_shape), axis=0).astype(np.int32)
    return t
