"""Pallas TPU kernel: occupied-tile submanifold Conv3D with fused epilogue.

XLA's dense Conv3D over the scene's bounding grid runs at ~15-20% MXU
utilization and computes every cell, but a surface scan occupies only ~2% of
L0 cells. This kernel convolves ONLY the occupied tiles:

  * the host lists occupied tile coordinates (scalar-prefetched, flat
    encoded — SMEM lane-pads 2D operands to 128 lanes, so a (T, 3) list
    overflows the 1 MB SMEM beyond ~2k tiles);
  * each grid step processes a GROUP of G tiles (small tiles track the
    occupied surface 2-3x more tightly than large ones — (4, 4, 8) covers
    2.4x fewer cells than (8, 8, 32) on ScanNet-scale scenes — and batching
    G of them keeps the matmul rows MXU-sized). Per-tile DMA issue cost
    (~1 us each) is the limiting factor at fine tiles, so each tile moves
    with exactly ONE input DMA and ONE output DMA;
  * the k^3 taps reach the MXU as k accumulating matmuls over contiguous
    zero-copy views: TX is the OUTERMOST scratch dim so the k dx-shifted
    operands are dense, and the (dz, dy) taps are folded into the lane dim
    by k^2 in-VMEM window copies into a (rows, k^2*cin) buffer (the VPU
    relayout cost of those copies is ~1/3 of an im2col done at matmul
    operand granularity);
  * ALL activation grids carry baked-in zero margins (MX, MY, MZ) = (2, 2, 16)
    and 128-multiple lane counts: windows never go out of bounds (no
    per-conv jnp.pad full-grid copies), and the z margin keeps every DMA's
    sublane (z) start 8-aligned, which Mosaic requires;
  * input, residual and occupancy DMAs are double-buffered across grid
    steps, so group t+1's loads and group t-1's stores overlap group t's
    matmuls;
  * an optional fused epilogue applies, in reference order (conv -> mask ->
    BN -> +residual -> relu; see /root/reference/utils/resnet.py blocks):
    per-channel affine (inference BatchNorm), the tile's occupancy mask,
    a residual add — either a plain grid or a fused 1x1-conv + BN-affine
    "downsample" branch computed from the residual window — and ReLU,
    replacing three full-grid elementwise passes per block;
  * the output buffer is donated zeros (input_output_aliased), so cells in
    unoccupied tiles — which are all unoccupied cells — stay exactly zero.

Modes: kernel_size 3/5 (halo via margins), kernel_size 1 (pointwise, no
fold), and ``prefolded`` for the cin=3 k=5 stem — the (dy, dz) taps are
folded into lanes by one cheap XLA pass over the 3-channel input
(fold_dydz), and the kernel only expands dx; a 125-tap in-kernel unroll at
128 padded lanes would be ~40x wasted DMA.

Equality with the dense conv at occupied cells is exact (same taps, same
weights); see tests/test_tiled_conv.py. Duplicate tiles in the list (host
padding to a group multiple) are benign: they recompute and rewrite
identical bytes.

Replaces the reference's MinkowskiEngine sparse convolution execution
(reference: /root/reference/utils/minkunet.py:122-180 uses
ME.MinkowskiConvolution; the kernel-map gather->GEMM->scatter of
MinkowskiEngine maps poorly to TPU row-gather throughput).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# baked grid margins (x, y, z): zero borders around the interior so conv
# windows stay in bounds and z windows stay 8-sublane aligned. MZ is 16 so
# the grid's z-PAIR view (a free reshape folding (z, c) -> (z/2, 2c), used
# by the stride-2 level-transition kernels to express parity selection as
# lane blocks — Mosaic has no strided vector slicing) keeps 8-aligned pair
# offsets: interior pair start = MZ/2 = 8.
MX, MY, MZ = 2, 2, 16


def margined_shape(dims: Tuple[int, int, int], channels: int):
    """Storage shape for an interior (X, Y, Z) grid with C real channels."""
    cp = int(np.ceil(max(channels, 1) / 128) * 128)
    return (dims[0] + 2 * MX, dims[1] + 2 * MY, dims[2] + 2 * MZ, cp)


def _lanes(c: int) -> int:
    return int(np.ceil(c / 128) * 128)


def _kernel(txs_ref, tys_ref, tzs_ref, *args,
            TX: int, TY: int, TZ: int, cin_p: int, cin_r: int, cout: int,
            k: int, n_steps: int, G: int, NTY: int, NTZ: int, out_dtype,
            prefolded: bool, compact: bool, has_affine: bool, has_occ: bool,
            has_res: bool, has_res_w: bool, res_cp: int, relu_out: bool,
            ZR: int = 1, occ_group: bool = False,
            res_from_out: bool = False, replicated: bool = False):
    h = k // 2
    # z-run: each tile-list entry covers ZR z-adjacent tiles with ONE DMA
    # (entry z-coord in base-TZ units); extents scale, strides/origins don't
    TZe = ZR * TZ
    it = iter(args)
    x_hbm = next(it)
    w_ref = next(it)
    ab_ref = next(it) if has_affine else None
    occ_hbm = next(it) if has_occ else None
    res_hbm = next(it) if (has_res and not res_from_out) else None
    rw_ref = next(it) if has_res_w else None
    rab_ref = next(it) if has_res_w else None
    _zeros = next(it)
    out_ref = next(it)
    in_tile = next(it)
    zbuf = next(it) if (k > 1 and not prefolded) else None
    acc = next(it)
    occ_tile = next(it) if has_occ else None
    res_tile = next(it) if has_res else None
    sem_in = next(it)
    sem_out = next(it)
    sem_occ = next(it) if has_occ else None
    sem_res = next(it) if has_res else None

    t = pl.program_id(0)
    pointwise = (k == 1) or prefolded
    # window extents: prefolded/k=1 need no y/z halo (folded / pointwise)
    wx = TX + 2 * h
    wy = TY if pointwise else TY + 2 * h
    wz = TZe if pointwise else TZe + 16

    def txyz(step, g):
        # tile INDICES are SMEM-prefetched (three 1D arrays): kills the
        # per-tile scalar-core div/mod chain of the flat-id decode (part of
        # the ~0.2us/tile issue cost that binds fine-tile plans). Origins
        # are built by in-kernel MULTIPLICATION with the constant extents —
        # a premultiplied origin read from SMEM is opaque to Mosaic and
        # defeats its z-divisibility (8) proof for the DMA slices.
        i = step * G + g
        return txs_ref[i] * TX, tys_ref[i] * TY, tzs_ref[i] * TZ

    def in_dma(slot, step, g):
        tx, ty, tz = txyz(step, g)
        y0 = ty + MY if pointwise else ty + MY - h
        # [tz + MZ - 8, ..+ TZ + 16) is 8-aligned and covers the +-h halo
        z0 = tz + MZ if pointwise else tz + MZ - 8
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tx + MX - h, wx), pl.ds(y0, wy), pl.ds(z0, wz), :],
            in_tile.at[slot, :, g], sem_in.at[slot, g],
        )

    def occ_dma(slot, step):
        # one DMA covers the whole group: group-major pack stores one row
        # block per STEP; the legacy per-tile pack stores G consecutive rows
        if occ_group:
            return pltpu.make_async_copy(
                occ_hbm.at[step], occ_tile.at[slot], sem_occ.at[slot],
            )
        return pltpu.make_async_copy(
            occ_hbm.at[pl.ds(step * G, G)], occ_tile.at[slot],
            sem_occ.at[slot],
        )

    def res_dma(slot, step, g):
        tx, ty, tz = txyz(step, g)
        # res_from_out: the residual lives in the ALIASED output buffer
        # (tiled_conv3d's out=residual). Safe for UNIQUE entries: this
        # tile's region is read here before its out_dma write, and every
        # other in-flight write targets a different tile. Tile lists are
        # padded by REPEATING the last tile, though — a padding duplicate
        # would read the region the first copy's in-flight write targets
        # (residual double-add), so duplicates skip both DMAs (is_pad_dup).
        src = out_ref if res_from_out else res_hbm
        return pltpu.make_async_copy(
            src.at[pl.ds(tx + MX, TX), pl.ds(ty + MY, TY),
                   pl.ds(tz + MZ, TZe), :],
            res_tile.at[slot, :, g], sem_res.at[slot, g],
        )

    def is_pad_dup(step, g):
        # padding repeats the LAST real tile, so a consecutive-equal entry
        # is a pad duplicate (real lists are np.unique'd: unique + sorted)
        i = step * G + g
        j = jnp.maximum(i - 1, 0)
        same = jnp.logical_and(
            txs_ref[i] == txs_ref[j],
            jnp.logical_and(tys_ref[i] == tys_ref[j],
                            tzs_ref[i] == tzs_ref[j]))
        return jnp.logical_and(i > 0, same)

    def res_start(slot, step, g):
        if not res_from_out:
            res_dma(slot, step, g).start()
            return

        @pl.when(jnp.logical_not(is_pad_dup(step, g)))
        def _():
            res_dma(slot, step, g).start()

    def res_wait(slot, step, g):
        if not res_from_out:
            res_dma(slot, step, g).wait()
            return

        @pl.when(jnp.logical_not(is_pad_dup(step, g)))
        def _():
            res_dma(slot, step, g).wait()

    def start_in(slot, step):
        for g in range(G):
            in_dma(slot, step, g).start()
            if has_res:
                res_start(slot, step, g)
        if has_occ:
            occ_dma(slot, step).start()

    def out_dma(slot, step, g):
        tx, ty, tz = txyz(step, g)
        return pltpu.make_async_copy(
            acc.at[slot, :, g],
            out_ref.at[pl.ds(tx + MX, TX), pl.ds(ty + MY, TY),
                       pl.ds(tz + MZ, TZe), :],
            sem_out.at[slot, g],
        )

    def out_start(slot, step, g):
        if not res_from_out:
            out_dma(slot, step, g).start()
            return

        @pl.when(jnp.logical_not(is_pad_dup(step, g)))
        def _():
            out_dma(slot, step, g).start()

    def out_wait(slot, step, g):
        if not res_from_out:
            out_dma(slot, step, g).wait()
            return

        @pl.when(jnp.logical_not(is_pad_dup(step, g)))
        def _():
            out_dma(slot, step, g).wait()

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        start_in(slot, t)

    @pl.when(t + 1 < n_steps)
    def _():
        start_in(nxt, t + 1)

    for g in range(G):
        in_dma(slot, t, g).wait()
        if has_res:
            res_wait(slot, t, g)
    if has_occ:
        occ_dma(slot, t).wait()

    # acc[slot] is still being stored from step t-2; wait before overwriting
    @pl.when(t >= 2)
    def _():
        for g in range(G):
            out_wait(slot, t - 2, g)

    cells = TX * TY * TZe
    rows = G * cells
    if k > 1 and not prefolded:
        # (dz, dy) lane fold: k^2 window copies; dx stays a free view below.
        # compact mode (k^2*cin_real <= 128, e.g. the cin=3 stem) packs the
        # blocks at the REAL channel stride so even a 125-tap k=5 fold fits
        # one 128-lane matmul operand. (Real-stride packing for WIDE
        # channels was tried and is a net loss: non-128-aligned lane-offset
        # writes force slow VPU relayouts that outweigh the width savings.)
        z0 = 8 - h  # halo offset within the [tz + MZ - 8, ...) window
        stride = cin_r if compact else cin_p
        used = k * k * stride
        if used < zbuf.shape[-1]:
            # zero the pad lanes once: scratch is uninitialized and a NaN
            # bit pattern would survive 0-weight rows (0 * NaN = NaN)
            @pl.when(t == 0)
            def _():
                zbuf[:, :, :, :, used:] = jnp.zeros(
                    zbuf.shape[:-1] + (zbuf.shape[-1] - used,), zbuf.dtype)
        for dz in range(k):
            for dy in range(k):
                blk = (dz * k + dy) * stride
                # replicated: the grid stores each cell's cin channels
                # copied at ALL k^2 tap offsets, so this store's source
                # lanes coincide with its destination lanes — a masked
                # move instead of a lane ROTATE (rotations made the
                # 25-tap stem fold its dominant cost)
                src_lo = blk if replicated else 0
                zbuf[:, :, :, :, blk:blk + stride] = (
                    in_tile[slot, :, :, dy:dy + TY, z0 + dz:z0 + dz + TZe,
                            src_lo:src_lo + stride]
                )
        src = zbuf
        kw = zbuf.shape[-1]
    else:
        src = in_tile[slot]
        kw = cin_p

    acc_v = None
    for dx in range(k):
        a = src[dx:dx + TX].reshape(rows, kw)
        part = jax.lax.dot_general(
            a, w_ref[dx],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_v = part if acc_v is None else acc_v + part

    # fused epilogue — reference order conv -> BN(mask) -> +res -> relu;
    # affine-then-mask equals mask-then-affine for occ in {0, 1}
    if has_affine:
        acc_v = acc_v * ab_ref[0:1, :] + ab_ref[1:2, :]
    if has_occ:
        # expand packed occupancy to a (rows, 1) column in row order
        # (x, g, y, z). A direct reshape is a lane->sublane redistribution
        # Mosaic can't lower; instead select each row's packed slab with a
        # tiny one-hot matmul and its lane with an iota compare + lane
        # reduction. Group-major packs (pack_occ_group) store rows already
        # in (x, g, y, z) order, so the slab is just r // 128 — and tiles
        # smaller than 128 cells become legal (only G*cells % 128 needed).
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        if occ_group:
            ot = occ_tile[slot].reshape(rows // 128, 128)
            slab = r // 128
            cell = r  # lane selector below uses cell % 128
        else:
            S = cells // 128
            TYZ = TY * TZe
            ot = occ_tile[slot].reshape(G * S, 128)
            cell = (r // (G * TYZ)) * TYZ + r % TYZ  # tile-local cell id
            g_idx = (r // TYZ) % G
            slab = g_idx * S + cell // 128
        slab_oh = (jax.lax.broadcasted_iota(jnp.int32, (rows, ot.shape[0]), 1)
                   == slab).astype(jnp.float32)
        occ_rows = jax.lax.dot_general(
            slab_oh, ot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                         # (rows, 128)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
               == cell % 128)
        occm = jnp.sum(jnp.where(sel, occ_rows, 0.0), axis=1, keepdims=True)
        acc_v = acc_v * occm
    if has_res:
        rrows = res_tile[slot].reshape(rows, res_cp)
        if has_res_w:
            # fused downsample branch: 1x1 conv + BN affine + mask
            rv = jax.lax.dot_general(
                rrows, rw_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rv = rv * rab_ref[0:1, :] + rab_ref[1:2, :]
            if has_occ:
                rv = rv * occm
        else:
            rv = rrows.astype(jnp.float32)
        acc_v = acc_v + rv
    if relu_out:
        acc_v = jnp.maximum(acc_v, 0.0)

    acc[slot] = acc_v.astype(out_dtype).reshape(TX, G, TY, TZe, cout)

    for g in range(G):
        out_start(slot, t, g)

    @pl.when(t == n_steps - 1)
    def _():
        for g in range(G):
            out_wait(slot, t, g)
            if n_steps >= 2:
                out_wait(nxt, t - 1, g)


def fold_dydz(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(dy, dz) tap fold for ``prefolded`` mode (the stem).

    x: margined grid (Xm, Ym, Zm, C). Returns (Xm, Ym, Zm, pad128(C*k^2))
    with lane c*k*k + dz*k + dy holding channel c of x shifted by
    (dy - h, dz - h) in (y, z) — CHANNEL-major block order, matching
    _fold_w. Interior rows read at most one margin row, which is zero, so
    boundary taps are correct; the grid margins (>= h for k <= 5) absorb
    all shifts.

    Why this construction: every intermediate is a SCALAR 3D grid whose
    minor dim is Zm — shifted slices of a (..., C) grid, or per-block
    (..., 1) columns, would each be lane-padded to 128 PHYSICALLY by the
    TPU layout (a (228, 132, 272, 3) slice occupies 2 GB; k^2 of them OOM
    the chip). Stacking on the LEADING axis keeps Zm minor (true 16 MB per
    block); a single native transpose then moves the block axis into lanes,
    so only the final buffer carries the 128-lane padding.
    """
    Xm, Ym, Zm, C = x.shape
    h = k // 2
    blocks = []
    for c in range(C):
        xc = jnp.pad(x[..., c], ((0, 0), (h, h), (h, h)))
        for dz in range(k):
            for dy in range(k):
                blocks.append(xc[:, dy:dy + Ym, dz:dz + Zm])
    stacked = jnp.concatenate(
        [b.reshape(1, Xm, Ym, Zm) for b in blocks], axis=0)
    # layout break: without it XLA propagates the transpose's lane-major
    # layout back through the concat, putting the size-1 block axis minor on
    # every input — each then lane-pads 128x physically (k^2*C x ~2 GB OOM)
    stacked = jax.lax.optimization_barrier(stacked)
    xf = jnp.transpose(stacked, (1, 2, 3, 0))
    lanes = _lanes(k * k * C)
    return jnp.pad(xf, ((0, 0), (0, 0), (0, 0), (0, lanes - k * k * C)))


def _fold_w(w, k, cin, cin_p, cout_p, dtype, prefolded):
    """(k^3, Cin, Cout) x-fastest -> (k_dx, rows, Cout_p) per-dx matrices.

    Normal mode rows are (dz, dy, cin_p) — each (dz, dy) block zero-padded
    to cin_p — matching the zbuf lane blocks. Prefolded rows are
    (c, dz, dy) — matching fold_dydz's channel-major lane order — padded
    once at the end.
    """
    cout = w.shape[-1]
    wk = w.reshape(k, k, k, cin, cout)           # (dz, dy, dx, c, co)
    if prefolded:
        wk = jnp.transpose(wk, (2, 3, 0, 1, 4))  # (dx, c, dz, dy, co)
        wk = wk.reshape(k, k * k * cin, cout)
        wk = jnp.pad(wk, ((0, 0), (0, _lanes(k * k * cin) - k * k * cin),
                          (0, cout_p - cout)))
    elif k * k * cin <= 128:
        # compact fold: rows (dz, dy, c) at the real channel stride
        wk = jnp.transpose(wk, (2, 0, 1, 3, 4))  # (dx, dz, dy, c, co)
        wk = wk.reshape(k, k * k * cin, cout)
        wk = jnp.pad(wk, ((0, 0), (0, _lanes(k * k * cin) - k * k * cin),
                          (0, cout_p - cout)))
    else:
        wk = jnp.transpose(wk, (2, 0, 1, 3, 4))  # (dx, dz, dy, c, co)
        wk = jnp.pad(wk, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin),
                          (0, cout_p - cout)))
        wk = wk.reshape(k, k * k * cin_p, cout_p)
    return wk.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_shape", "kernel_size", "group", "relu_out",
                     "prefolded", "zrun", "out_dtype", "res_in_place",
                     "replicated", "interpret"),
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
    res_w: Optional[jnp.ndarray] = None,
    res_scale: Optional[jnp.ndarray] = None,
    res_bias: Optional[jnp.ndarray] = None,
    res_in_place: bool = False,
    replicated: bool = False,
    relu_out: bool = False,
    tile_shape: Tuple[int, int, int] = (4, 4, 8),
    kernel_size: int = 3,
    group: int = 16,
    prefolded: bool = False,
    zrun: int = 1,
    out: Optional[jnp.ndarray] = None,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Submanifold odd-k Conv3D over occupied tiles, with fused epilogue.

    Args:
      x: MARGINED grid (X + 2*MX, Y + 2*MY, Z + 2*MZ, Cp) — see
        margined_shape — bf16 or f32, 128-multiple lanes, zero margins.
        In ``prefolded`` mode x is fold_dydz's output and only dx expands.
      w: (k^3, Cin, Cout) kernel, x-fastest offsets
        (ops/coords.kernel_offsets); Cin = real input channels.
      tiles: (T, 3) int32 occupied tile coordinates over the INTERIOR
        (grid-units / tile_shape); T must be a multiple of ``group`` (pad by
        repeating entries).
      scale, bias: optional (Cout,) per-channel affine applied to the conv
        output (inference BatchNorm folded: scale = gamma*rsqrt(var+eps),
        bias = beta - mean*scale). Both or neither.
      occ: optional (T, cells/128, 128) f32 per-tile occupancy (see
        pack_occ); output cells with occ == 0 are zeroed.
      residual: optional margined grid added before the ReLU. With
        ``res_w`` (Cr, Cout), the residual rows first pass through a fused
        1x1 conv + ``res_scale``/``res_bias`` affine + occupancy mask —
        the BasicBlock "downsample" branch in one kernel.
      relu_out: apply ReLU at the end.
      tile_shape: static tile dims; TZ % 8 == 0, and TX*TY*TZ % 128 == 0
        when ``occ`` is used.
      kernel_size: odd (1, 3 or 5); halo k//2 must fit the margins.
      group: tiles per grid step, batched into one set of matmuls.

    Returns the margined (X + 2*MX, Y + 2*MY, Z + 2*MZ, Cout_p) grid with
    exact conv(+epilogue) values inside occupied tiles and zeros elsewhere
    (including the lane padding and margins).
    """
    Xm, Ym, Zm, cp = x.shape
    X, Y, Z = Xm - 2 * MX, Ym - 2 * MY, Zm - 2 * MZ
    cin, cout = w.shape[1], w.shape[2]
    k = kernel_size
    h = k // 2
    assert w.shape[0] == k ** 3 and k % 2 == 1 and h <= min(MX, MY, MZ)
    assert cp % 128 == 0, "grids must be stored with 128-multiple lanes"
    if not prefolded:
        assert cp == _lanes(cin), (cp, cin)
    TX, TY, TZ = tile_shape
    assert X % TX == 0 and Y % TY == 0 and Z % TZ == 0, (x.shape, tile_shape)
    assert TZ % 8 == 0, "z tile must be sublane-aligned"
    assert (scale is None) == (bias is None)
    assert res_w is None or residual is not None or res_in_place
    assert (res_scale is None) == (res_bias is None)
    assert res_scale is None or res_w is not None
    n_tiles = tiles.shape[0]
    G = group
    assert n_tiles % G == 0, "pad the tile list to a group multiple"
    n_steps = n_tiles // G
    TZe = zrun * TZ
    has_occ = occ is not None
    has_res = residual is not None or res_in_place
    has_res_w = res_w is not None
    if res_in_place:
        # the residual IS the donated output buffer: the kernel reads each
        # tile's region from `out` before overwriting it (single-use buffer
        # => true aliasing, no copy-insertion, no zero fill)
        assert residual is None and out is not None, \
            "res_in_place reads the residual from the donated out buffer"
    cells_t = TX * TY * TZe
    occ_group = False
    if has_occ:
        # two pack layouts, told apart by dim 0: per-tile (n_tiles, S, 128)
        # needs cells % 128 == 0; group-major (n_steps, G*cells/128, 128)
        # (pack_occ_group) only needs G*cells % 128 == 0, legalizing
        # sub-128-cell tiles like (2, 2, 8)
        assert (G * cells_t) % 128 == 0, "occ needs G*cells % 128 == 0"
        if occ.shape == (n_steps, (G * cells_t) // 128, 128) \
                and not (G == 1 and cells_t % 128 == 0):
            occ_group = True
        else:
            assert cells_t % 128 == 0, \
                "per-tile occ pack needs cells % 128 == 0 (use pack_occ_group)"
            assert occ.shape == (n_tiles, cells_t // 128, 128), occ.shape

    cin_p = cp  # DMA lane width (already padded/folded by the caller)
    cout_p = _lanes(cout)

    if out_dtype is None:
        out_dtype = x.dtype
    eff_scale, eff_bias = scale, bias

    wf = _fold_w(w, k, cin, cin_p, cout_p, x.dtype, prefolded)
    # chainable output: z-run decomposition runs one pallas_call per run
    # length, each donating the previous call's output and writing only its
    # own tiles
    out0 = out if out is not None \
        else jnp.zeros((Xm, Ym, Zm, cout_p), out_dtype)
    assert out0.shape == (Xm, Ym, Zm, cout_p) and out0.dtype == out_dtype

    NTY, NTZ = Y // TY, Z // TZ
    txs = tiles[:, 0].astype(jnp.int32)
    tys = tiles[:, 1].astype(jnp.int32)
    tzs = tiles[:, 2].astype(jnp.int32)

    operands = [txs, tys, tzs, x, wf]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),   # x (margined)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (whole)
    ]
    has_affine = eff_scale is not None
    if has_affine:
        ab = jnp.stack([
            jnp.pad(eff_scale.astype(jnp.float32), (0, cout_p - cout)),
            jnp.pad(eff_bias.astype(jnp.float32), (0, cout_p - cout)),
        ])
        operands.append(ab)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if has_occ:
        operands.append(occ.astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    res_cp = 0
    if res_in_place:
        res_cp = cout_p
        if has_res_w:
            assert res_w.shape[0] <= cout_p
    elif has_res:
        res_cp = residual.shape[-1]
        assert res_cp % 128 == 0, "residual grid needs 128-multiple lanes"
        if not has_res_w:
            assert res_cp == cout_p, (res_cp, cout_p)
        operands.append(residual.astype(x.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    if has_res_w:
        cr = res_w.shape[0]
        rs = (res_scale.astype(jnp.float32) if res_scale is not None
              else jnp.ones((cout,), jnp.float32))
        rb = (res_bias.astype(jnp.float32) if res_bias is not None
              else jnp.zeros((cout,), jnp.float32))
        rw = jnp.pad(res_w, ((0, res_cp - cr), (0, cout_p - cout)))
        operands.append(rw.astype(x.dtype)[None])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        rab = jnp.stack([
            jnp.pad(rs.astype(jnp.float32), (0, cout_p - cout)),
            jnp.pad(rb.astype(jnp.float32), (0, cout_p - cout)),
        ])
        operands.append(rab)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    operands.append(out0)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # donated zeros
    zeros_index = len(operands) - 1  # includes the scalar-prefetch operand

    pointwise = (k == 1) or prefolded
    compact = (k > 1 and not prefolded and k * k * cin <= 128)
    # replicated input mode: x's lanes hold each cell's cin channels
    # copied at every (dz, dy) tap offset (lane blk*cin .. blk*cin+cin),
    # making the compact fold's stores rotation-free (see _kernel)
    assert not replicated or compact, \
        "replicated input lanes only pair with the compact fold"
    assert not replicated or cp >= _lanes(k * k * cin)
    wy = TY if pointwise else TY + 2 * h
    wz = TZe if pointwise else TZe + 16
    scratch = [
        pltpu.VMEM((2, TX + 2 * h, G, wy, wz, cin_p), x.dtype),
    ]
    if k > 1 and not prefolded:
        zb_lanes = _lanes(k * k * cin) if compact else k * k * cin_p
        scratch.append(
            pltpu.VMEM((TX + 2 * h, G, TY, TZe, zb_lanes), x.dtype))
    scratch.append(pltpu.VMEM((2, TX, G, TY, TZe, cout_p), out_dtype))
    if has_occ:
        occ_vmem = ((2, (G * cells_t) // 128, 128) if occ_group
                    else (2, G, cells_t // 128, 128))
        scratch.append(pltpu.VMEM(occ_vmem, jnp.float32))
    if has_res:
        res_dt = out_dtype if res_in_place else x.dtype
        scratch.append(pltpu.VMEM((2, TX, G, TY, TZe, res_cp), res_dt))
    scratch.append(pltpu.SemaphoreType.DMA((2, G)))  # sem_in
    scratch.append(pltpu.SemaphoreType.DMA((2, G)))  # sem_out
    if has_occ:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if has_res:
        scratch.append(pltpu.SemaphoreType.DMA((2, G)))

    kernel = functools.partial(
        _kernel, TX=TX, TY=TY, TZ=TZ, cin_p=cin_p, cin_r=cin, cout=cout_p,
        k=k, n_steps=n_steps, G=G, NTY=NTY, NTZ=NTZ, out_dtype=out_dtype,
        prefolded=prefolded, compact=compact, has_affine=has_affine,
        has_occ=has_occ, has_res=has_res, has_res_w=has_res_w,
        res_cp=res_cp, relu_out=relu_out, ZR=zrun, occ_group=occ_group,
        res_from_out=res_in_place, replicated=replicated,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Xm, Ym, Zm, cout_p), out_dtype),
        input_output_aliases={zeros_index: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def occupied_tiles(coords_or_flat, dims, tile_shape=(4, 4, 8),
                   pad_multiple: int = 1):
    """Host helper: unique tile coords for L0 voxel coords (N, 3) relative to
    the dense base (see data.dense_prep), padded by repeating the last tile
    to a multiple of ``pad_multiple``. Coordinates are INTERIOR (margins are
    applied inside the kernel)."""
    c = np.asarray(coords_or_flat)
    t = np.unique(c // np.asarray(tile_shape), axis=0).astype(np.int32)
    pad = -len(t) % pad_multiple
    if pad:
        t = np.concatenate([t, np.repeat(t[-1:], pad, axis=0)], axis=0)
    return t


def pack_occ(occ_grid, tiles, tile_shape=(4, 4, 8), zrun: int = 1,
             xp=jnp):
    """Device helper: gather per-tile occupancy as (T, cells/128, 128) f32
    from a MARGINED (Xm, Ym, Zm) occupancy grid (the packing keeps the DMA
    lane dim a 128 multiple). With ``zrun`` = R, each tile entry covers R
    z-adjacent tiles (cells = TX*TY*R*TZ, z contiguous)."""
    TX, TY, TZ = tile_shape
    o = occ_grid[MX:occ_grid.shape[0] - MX, MY:occ_grid.shape[1] - MY,
                 MZ:occ_grid.shape[2] - MZ]
    X, Y, Z = o.shape
    o = o.reshape(X // TX, TX, Y // TY, TY, Z // TZ, TZ)
    o = xp.transpose(o, (0, 2, 4, 1, 3, 5))  # (ntx, nty, ntz, TX, TY, TZ)
    if zrun == 1:
        g = o[tiles[:, 0], tiles[:, 1], tiles[:, 2]]  # (T, TX, TY, TZ)
    else:
        parts = [o[tiles[:, 0], tiles[:, 1], tiles[:, 2] + r]
                 for r in range(zrun)]
        g = xp.stack(parts, axis=3)           # (T, TX, TY, R, TZ)
    return g.reshape(tiles.shape[0], (TX * TY * zrun * TZ) // 128,
                     128).astype(np.float32)


def pack_occ_group(occ_grid, tiles, tile_shape=(4, 4, 8), group: int = 16,
                   zrun: int = 1, xp=jnp):
    """Group-major occupancy pack: (n_steps, G*cells/128, 128) f32.

    Rows within a step are laid out in the conv kernel's row order
    (x, g, y, z), so the in-kernel expansion is a plain r // 128 slab
    select. Unlike :func:`pack_occ`, tiles smaller than 128 cells are
    legal — only ``group * cells % 128 == 0`` is required (e.g. the
    (2, 2, 8) x G64 plan at L0)."""
    TX, TY, TZ = tile_shape
    TZe = zrun * TZ
    cells = TX * TY * TZe
    G = group
    T = tiles.shape[0]
    assert T % G == 0 and (G * cells) % 128 == 0
    o = occ_grid[MX:occ_grid.shape[0] - MX, MY:occ_grid.shape[1] - MY,
                 MZ:occ_grid.shape[2] - MZ]
    X, Y, Z = o.shape
    o = o.reshape(X // TX, TX, Y // TY, TY, Z // TZ, TZ)
    o = xp.transpose(o, (0, 2, 4, 1, 3, 5))  # (ntx, nty, ntz, TX, TY, TZ)
    if zrun == 1:
        g = o[tiles[:, 0], tiles[:, 1], tiles[:, 2]]  # (T, TX, TY, TZ)
    else:
        parts = [o[tiles[:, 0], tiles[:, 1], tiles[:, 2] + r]
                 for r in range(zrun)]
        g = xp.stack(parts, axis=3)           # (T, TX, TY, R, TZ)
    g = g.reshape(T // G, G, TX, TY * TZe)
    g = xp.transpose(g, (0, 2, 1, 3))         # (steps, TX, G, TY*TZe)
    return g.reshape(T // G, (G * cells) // 128, 128).astype(np.float32)


# ---------------------------------------------------------------------------
# Fused residual-block kernel: a whole BasicBlock — conv1 -> mask/BN/relu ->
# conv2 -> mask/BN -> (+ residual | + fused 1x1-downsample(residual)) ->
# relu — in ONE pallas_call. conv1 is computed over a one-cell-expanded
# region per tile so conv2's taps read conv1 outputs straight from VMEM;
# the residual is the tile's own input window (already resident). Per tile
# this costs ONE input DMA and ONE output DMA where two tiled_conv3d calls
# pay five (2 in + 1 res + 2 out) — the per-tile DMA issue rate is the
# binding constraint of the backbone (see module docstring), so the block
# kernel is ~2x on DMA-bound levels at the price of ~(ex*ey*ez)/(TX*TY*TZ)
# conv1 overcompute on the idle MXU.
# ---------------------------------------------------------------------------


def _block_kernel(tiles_ref, *args,
                  TX, TY, TZ, cin_r, cin_p, mid_r, mid_p, cout_r, cout_p,
                  n_steps, G, NTY, NTZ, out_dtype, has_res_w, Se,
                  ex, ey, ez):
    it = iter(args)
    x_hbm = next(it)
    w1_ref = next(it)        # (3, L1, mid_p)
    w2_ref = next(it)        # (3, L2, cout_p)
    ab1_ref = next(it)       # (2, mid_p)
    ab2_ref = next(it)       # (2, cout_p)
    occe_hbm = next(it)      # (T, Se, 128) expanded-region occupancy
    rw_ref = next(it) if has_res_w else None
    rab_ref = next(it) if has_res_w else None
    _zeros = next(it)
    out_ref = next(it)
    in_tile = next(it)       # (2, wx, G, wy, wz, cin_p)
    zbuf1 = next(it)         # (wx, G, ey, ez, L1)
    mid_s = next(it)         # (ex, G, ey, ez, mid_p)
    zbuf2 = next(it)         # (ex, G, TY, TZ, L2)
    acc = next(it)           # (2, TX, G, TY, TZ, cout_p)
    occe_tile = next(it)     # (2, G, Se, 128)
    sem_in = next(it)
    sem_out = next(it)
    sem_occ = next(it)

    t = pl.program_id(0)
    TZe = TZ  # no z-run support in the block kernel
    wx = TX + 4
    wy = TY + 4
    wz = TZ + 16

    def txyz(step, g):
        i = tiles_ref[step * G + g]
        return ((i // (NTY * NTZ)) * TX, ((i // NTZ) % NTY) * TY,
                (i % NTZ) * TZ)

    def in_dma(slot, step, g):
        tx, ty, tz = txyz(step, g)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tx + MX - 2, wx), pl.ds(ty + MY - 2, wy),
                     pl.ds(tz + MZ - 8, wz), :],
            in_tile.at[slot, :, g], sem_in.at[slot, g],
        )

    def occ_dma(slot, step):
        return pltpu.make_async_copy(
            occe_hbm.at[pl.ds(step * G, G)], occe_tile.at[slot],
            sem_occ.at[slot],
        )

    def start_in(slot, step):
        for g in range(G):
            in_dma(slot, step, g).start()
        occ_dma(slot, step).start()

    def out_dma(slot, step, g):
        tx, ty, tz = txyz(step, g)
        return pltpu.make_async_copy(
            acc.at[slot, :, g],
            out_ref.at[pl.ds(tx + MX, TX), pl.ds(ty + MY, TY),
                       pl.ds(tz + MZ, TZe), :],
            sem_out.at[slot, g],
        )

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        start_in(slot, t)

    @pl.when(t + 1 < n_steps)
    def _():
        start_in(nxt, t + 1)

    for g in range(G):
        in_dma(slot, t, g).wait()
    occ_dma(slot, t).wait()

    @pl.when(t >= 2)
    def _():
        for g in range(G):
            out_dma(slot, t - 2, g).wait()

    # --- conv1 over the expanded (ex, ey, ez) region
    # (fold stride rule matches _kernel: real stride only when compact —
    # non-128-aligned lane-offset writes are slow VPU relayouts)
    s1 = cin_r if 9 * cin_r <= 128 else cin_p
    L1 = zbuf1.shape[-1]
    used1 = 9 * s1
    if used1 < L1:
        @pl.when(t == 0)
        def _():
            zbuf1[:, :, :, :, used1:] = jnp.zeros(
                zbuf1.shape[:-1] + (L1 - used1,), zbuf1.dtype)
    for dz in range(3):
        for dy in range(3):
            blk = (dz * 3 + dy) * s1
            zbuf1[:, :, :, :, blk:blk + s1] = (
                in_tile[slot, :, :, dy:dy + ey, dz + 6:dz + 6 + ez, :s1]
            )
    rows1 = ex * G * ey * ez
    acc1 = None
    for dx in range(3):
        a = zbuf1[dx:dx + ex].reshape(rows1, L1)
        part = jax.lax.dot_general(
            a, w1_ref[dx], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc1 = part if acc1 is None else acc1 + part
    acc1 = acc1 * ab1_ref[0:1, :] + ab1_ref[1:2, :]

    # expanded-region occupancy mask (same one-hot expansion as _kernel,
    # over the padded Se*128 cell pack in (x, y, z) order)
    eyz = ey * ez
    ot = occe_tile[slot].reshape(G * Se, 128)
    r = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0)
    cell = (r // (G * eyz)) * eyz + r % eyz
    g_idx = (r // eyz) % G
    slab = g_idx * Se + cell // 128
    slab_oh = (jax.lax.broadcasted_iota(jnp.int32, (rows1, G * Se), 1)
               == slab).astype(jnp.float32)
    occ_rows = jax.lax.dot_general(
        slab_oh, ot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sel = (jax.lax.broadcasted_iota(jnp.int32, (rows1, 128), 1)
           == cell % 128)
    occ1 = jnp.sum(jnp.where(sel, occ_rows, 0.0), axis=1, keepdims=True)
    acc1 = jnp.maximum(acc1 * occ1, 0.0)
    mid_s[:] = acc1.astype(mid_s.dtype).reshape(ex, G, ey, ez, mid_p)

    # --- conv2 over the core, taps read from mid_s
    s2 = mid_r if 9 * mid_r <= 128 else mid_p
    L2 = zbuf2.shape[-1]
    used2 = 9 * s2
    if used2 < L2:
        @pl.when(t == 0)
        def _():
            zbuf2[:, :, :, :, used2:] = jnp.zeros(
                zbuf2.shape[:-1] + (L2 - used2,), zbuf2.dtype)
    for dz in range(3):
        for dy in range(3):
            blk = (dz * 3 + dy) * s2
            zbuf2[:, :, :, :, blk:blk + s2] = (
                mid_s[:, :, dy:dy + TY, dz:dz + TZ, :s2]
            )
    rows2 = TX * G * TY * TZ
    acc2 = None
    for dx in range(3):
        a = zbuf2[dx:dx + TX].reshape(rows2, L2)
        part = jax.lax.dot_general(
            a, w2_ref[dx], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc2 = part if acc2 is None else acc2 + part
    acc2 = acc2 * ab2_ref[0:1, :] + ab2_ref[1:2, :]

    # core occupancy = the center cells of the expanded pack: core cell
    # (i, j, l) is expanded cell (i+1, j+1, l+1)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (rows2, 1), 0)
    i_x = r2 // (G * TY * TZ)
    g2 = (r2 // (TY * TZ)) % G
    j_y = (r2 // TZ) % TY
    l_z = r2 % TZ
    cell2 = ((i_x + 1) * ey + (j_y + 1)) * ez + (l_z + 1)
    slab2 = g2 * Se + cell2 // 128
    slab2_oh = (jax.lax.broadcasted_iota(jnp.int32, (rows2, G * Se), 1)
                == slab2).astype(jnp.float32)
    occ_rows2 = jax.lax.dot_general(
        slab2_oh, ot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sel2 = (jax.lax.broadcasted_iota(jnp.int32, (rows2, 128), 1)
            == cell2 % 128)
    occ2 = jnp.sum(jnp.where(sel2, occ_rows2, 0.0), axis=1, keepdims=True)
    acc2 = acc2 * occ2

    # --- residual from the resident input window's core
    rrows = in_tile[slot, 2:2 + TX, :, 2:2 + TY, 8:8 + TZ, :].reshape(
        rows2, cin_p)
    if has_res_w:
        rv = jax.lax.dot_general(
            rrows, rw_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rv = (rv * rab_ref[0:1, :] + rab_ref[1:2, :]) * occ2
    else:
        rv = rrows[:, :cout_p].astype(jnp.float32)
    acc2 = jnp.maximum(acc2 + rv, 0.0)

    acc[slot] = acc2.astype(out_dtype).reshape(TX, G, TY, TZ, cout_p)

    for g in range(G):
        out_dma(slot, t, g).start()

    @pl.when(t == n_steps - 1)
    def _():
        for g in range(G):
            out_dma(slot, t, g).wait()
            if n_steps >= 2:
                out_dma(nxt, t - 1, g).wait()


def pack_occ_expanded(occ_grid: jnp.ndarray, tiles: jnp.ndarray,
                      tile_shape=(4, 4, 8)) -> jnp.ndarray:
    """Per-tile occupancy over the ONE-CELL-EXPANDED region
    (TX + 2, TY + 2, TZ + 2), gathered from a MARGINED (Xm, Ym, Zm)
    occupancy grid and padded to (T, Se, 128) for the block kernel."""
    TX, TY, TZ = tile_shape
    ex, ey, ez = TX + 2, TY + 2, TZ + 2
    xi = tiles[:, 0:1] * TX + MX - 1 + jnp.arange(ex)[None]   # (T, ex)
    yi = tiles[:, 1:2] * TY + MY - 1 + jnp.arange(ey)[None]
    zi = tiles[:, 2:3] * TZ + MZ - 1 + jnp.arange(ez)[None]
    g = occ_grid[xi[:, :, None, None], yi[:, None, :, None],
                 zi[:, None, None, :]]                        # (T, ex, ey, ez)
    cells_e = ex * ey * ez
    Se = -(-cells_e // 128)
    flat = g.reshape(tiles.shape[0], cells_e)
    flat = jnp.pad(flat, ((0, 0), (0, Se * 128 - cells_e)))
    return flat.reshape(tiles.shape[0], Se, 128).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("tile_shape", "group", "interpret"),
)
def tiled_block3d(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    tiles: jnp.ndarray,
    *,
    scale1: jnp.ndarray,
    bias1: jnp.ndarray,
    scale2: jnp.ndarray,
    bias2: jnp.ndarray,
    occ_e: jnp.ndarray,
    res_w: Optional[jnp.ndarray] = None,
    res_scale: Optional[jnp.ndarray] = None,
    res_bias: Optional[jnp.ndarray] = None,
    tile_shape: Tuple[int, int, int] = (4, 4, 8),
    group: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole BasicBlock over occupied tiles (inference path).

    x: MARGINED input grid (128-mult lanes). w1: (27, Cin, Mid),
    w2: (27, Mid, Cout), x-fastest offsets. scale/bias pairs: folded
    inference BN affines for norm1/norm2. occ_e: pack_occ_expanded of the
    level's occupancy over the same tiles. res_w (+ res_scale/res_bias):
    the 1x1 downsample branch when Cin != Cout; otherwise the identity
    residual is taken from the input window. Returns the margined
    (.., Cout_p) output grid, exact vs the two-conv XLA path at occupied
    cells and zero elsewhere.
    """
    Xm, Ym, Zm, cin_p = x.shape
    X, Y, Z = Xm - 2 * MX, Ym - 2 * MY, Zm - 2 * MZ
    cin, mid = w1.shape[1], w1.shape[2]
    mid2, cout = w2.shape[1], w2.shape[2]
    assert mid2 == mid and w1.shape[0] == 27 and w2.shape[0] == 27
    assert cin_p == _lanes(cin), (cin_p, cin)
    TX, TY, TZ = tile_shape
    assert X % TX == 0 and Y % TY == 0 and Z % TZ == 0
    assert TZ % 8 == 0
    assert (res_w is None) == (res_scale is None) == (res_bias is None)
    if res_w is None:
        assert cin == cout, "identity residual needs cin == cout"
    ex, ey, ez = TX + 2, TY + 2, TZ + 2
    cells_e = ex * ey * ez
    Se = -(-cells_e // 128)
    n_tiles = tiles.shape[0]
    G = group
    assert n_tiles % G == 0, "pad the tile list to a group multiple"
    n_steps = n_tiles // G
    assert occ_e.shape == (n_tiles, Se, 128), (occ_e.shape, (n_tiles, Se, 128))

    mid_p = _lanes(mid)
    cout_p = _lanes(cout)
    L1 = _lanes(9 * cin) if 9 * cin <= 128 else 9 * cin_p
    L2 = _lanes(9 * mid) if 9 * mid <= 128 else 9 * mid_p
    w1f = _fold_w(w1, 3, cin, cin_p, mid_p, x.dtype, False)
    w2f = _fold_w(w2, 3, mid, mid_p, cout_p, x.dtype, False)

    def _ab(s, b, cp, c):
        return jnp.stack([
            jnp.pad(s.astype(jnp.float32), (0, cp - c)),
            jnp.pad(b.astype(jnp.float32), (0, cp - c)),
        ])

    ab1 = _ab(scale1, bias1, mid_p, mid)
    ab2 = _ab(scale2, bias2, cout_p, cout)
    out0 = jnp.zeros((Xm, Ym, Zm, cout_p), x.dtype)

    NTY, NTZ = Y // TY, Z // TZ
    tiles_flat = ((tiles[:, 0].astype(jnp.int32) * NTY
                   + tiles[:, 1]) * NTZ + tiles[:, 2])

    operands = [tiles_flat, x, w1f, w2f, ab1, ab2, occ_e.astype(jnp.float32)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),   # x
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ab1
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ab2
        pl.BlockSpec(memory_space=pltpu.HBM),   # occ_e
    ]
    has_res_w = res_w is not None
    if has_res_w:
        rw = jnp.pad(res_w, ((0, cin_p - cin), (0, cout_p - cout)))
        operands.append(rw.astype(x.dtype)[None])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(_ab(res_scale, res_bias, cout_p, cout))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    operands.append(out0)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    zeros_index = len(operands) - 1

    wx, wy, wz = TX + 4, TY + 4, TZ + 16
    scratch = [
        pltpu.VMEM((2, wx, G, wy, wz, cin_p), x.dtype),       # in_tile
        pltpu.VMEM((wx, G, ey, ez, L1), x.dtype),              # zbuf1
        pltpu.VMEM((ex, G, ey, ez, mid_p), x.dtype),           # mid
        pltpu.VMEM((ex, G, TY, TZ, L2), x.dtype),              # zbuf2
        pltpu.VMEM((2, TX, G, TY, TZ, cout_p), x.dtype),       # acc
        pltpu.VMEM((2, G, Se, 128), jnp.float32),              # occ_e tiles
        pltpu.SemaphoreType.DMA((2, G)),                        # sem_in
        pltpu.SemaphoreType.DMA((2, G)),                        # sem_out
        pltpu.SemaphoreType.DMA((2,)),                          # sem_occ
    ]

    kernel = functools.partial(
        _block_kernel, TX=TX, TY=TY, TZ=TZ, cin_r=cin, cin_p=cin_p,
        mid_r=mid, mid_p=mid_p, cout_r=cout, cout_p=cout_p,
        n_steps=n_steps, G=G, NTY=NTY, NTZ=NTZ, out_dtype=x.dtype,
        has_res_w=has_res_w, Se=Se, ex=ex, ey=ey, ez=ez,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Xm, Ym, Zm, cout_p), x.dtype),
        input_output_aliases={zeros_index: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Strided level-transition kernels: stride-2 k=2 "down" conv and its
# transpose ("up"), over occupied tiles of the OUTPUT level, with the same
# fused BN-affine / occupancy-mask / ReLU epilogue as tiled_conv3d. The up
# kernel additionally fuses the U-Net skip concatenation: it copies the skip
# grid's channels into its output lanes after the conv block, producing the
# next block's input grid directly (the XLA concat alone was a full-L0-grid
# copy pass). Replaces reference MinkowskiConvolution(stride=2) /
# MinkowskiConvolutionTranspose (utils/minkunet.py:57-118).
# ---------------------------------------------------------------------------


def _down2_kernel(txs_ref, tys_ref, tzs_ref, *args,
                  TX, TY, TZ, cin_p, cout, n_steps, G, NTY, NTZ, out_dtype,
                  has_affine, has_occ, relu_out, pair_dma):
    TZe = TZ  # no z-run support in the down kernel
    it = iter(args)
    x_hbm = next(it)        # margined FINE grid
    w_ref = next(it)        # (8*cin_p, cout)
    ab_ref = next(it) if has_affine else None
    occ_hbm = next(it) if has_occ else None
    _zeros = next(it)
    out_ref = next(it)
    in_tile = next(it)      # (2, 2TX, G, 2TY, 2TZ, cin_p)
    zbuf = next(it)         # (TX, G, TY, TZ, 8*cin_p)
    acc = next(it)
    occ_tile = next(it) if has_occ else None
    sem_in = next(it)
    sem_out = next(it)
    sem_occ = next(it) if has_occ else None

    t = pl.program_id(0)

    def txyz(step, g):
        # prefetched tile INDICES; multiplication form keeps Mosaic's
        # z-divisibility proof (see _kernel.txyz)
        i = step * G + g
        return txs_ref[i] * TX, tys_ref[i] * TY, tzs_ref[i] * TZ

    def in_dma(slot, step, g):
        tx, ty, tz = txyz(step, g)
        # one fine z-pair per coarse cell: the window's pair extent is
        # exactly TZ and its offset tz + MZ/2 stays 8-aligned
        if pair_dma:
            # TPU path: x_hbm is the UNFOLDED fine grid; its z-pair view
            # is a row-major reshape of the REF — (z, c) is contiguous, so
            # the merged-lane (z/2, 2c) view reads the same bytes and the
            # z-pair fold that used to be a full-grid XLA relayout (~7 ms
            # at L0) costs nothing
            Xm, Ym, Zm, _ = x_hbm.shape
            xv = x_hbm.reshape(Xm, Ym, Zm // 2, 2 * cin_p)
        else:
            # interpret path (reshaped-ref DMAs unsupported there): x_hbm
            # arrives as the materialized z-PAIR view
            xv = x_hbm
        return pltpu.make_async_copy(
            xv.at[pl.ds(2 * tx + MX, 2 * TX), pl.ds(2 * ty + MY, 2 * TY),
                  pl.ds(tz + MZ // 2, TZ), :],
            in_tile.at[slot, :, g], sem_in.at[slot, g],
        )

    def occ_dma(slot, step):
        return pltpu.make_async_copy(
            occ_hbm.at[pl.ds(step * G, G)], occ_tile.at[slot],
            sem_occ.at[slot],
        )

    def start_in(slot, step):
        for g in range(G):
            in_dma(slot, step, g).start()
        if has_occ:
            occ_dma(slot, step).start()

    def out_dma(slot, step, g):
        tx, ty, tz = txyz(step, g)
        return pltpu.make_async_copy(
            acc.at[slot, :, g],
            out_ref.at[pl.ds(tx + MX, TX), pl.ds(ty + MY, TY),
                       pl.ds(tz + MZ, TZe), :],
            sem_out.at[slot, g],
        )

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        start_in(slot, t)

    @pl.when(t + 1 < n_steps)
    def _():
        start_in(nxt, t + 1)

    for g in range(G):
        in_dma(slot, t, g).wait()
    if has_occ:
        occ_dma(slot, t).wait()

    @pl.when(t >= 2)
    def _():
        for g in range(G):
            out_dma(slot, t - 2, g).wait()

    cells = TX * TY * TZe
    rows = G * cells
    # stride 2 == kernel 2: taps partition the window — fold all 8 into
    # lanes, one matmul total, no halo. Parity selection must avoid strided
    # vector slicing (Mosaic can't lower it): x/y parities come from a free
    # leading-dim reshape-split + integer index, and the z parity is a lane
    # block of the grid's z-pair view
    wr = in_tile[slot].reshape(TX, 2, G, TY, 2, TZ, 2 * cin_p)
    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                d = dx + 2 * dy + 4 * dz
                zbuf[:, :, :, :, d * cin_p:(d + 1) * cin_p] = (
                    wr[:, dx, :, :, dy, :, dz * cin_p:(dz + 1) * cin_p]
                )
    acc_v = jax.lax.dot_general(
        zbuf[...].reshape(rows, 8 * cin_p), w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if has_affine:
        acc_v = acc_v * ab_ref[0:1, :] + ab_ref[1:2, :]
    if has_occ:
        S = cells // 128
        TYZ = TY * TZe
        ot = occ_tile[slot].reshape(G * S, 128)
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        cell = (r // (G * TYZ)) * TYZ + r % TYZ
        g_idx = (r // TYZ) % G
        slab = g_idx * S + cell // 128
        slab_oh = (jax.lax.broadcasted_iota(jnp.int32, (rows, G * S), 1)
                   == slab).astype(jnp.float32)
        occ_rows = jax.lax.dot_general(
            slab_oh, ot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sel = (jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
               == cell % 128)
        occm = jnp.sum(jnp.where(sel, occ_rows, 0.0), axis=1, keepdims=True)
        acc_v = acc_v * occm
    if relu_out:
        acc_v = jnp.maximum(acc_v, 0.0)

    acc[slot] = acc_v.astype(out_dtype).reshape(TX, G, TY, TZe, cout)

    for g in range(G):
        out_dma(slot, t, g).start()

    @pl.when(t == n_steps - 1)
    def _():
        for g in range(G):
            out_dma(slot, t, g).wait()
            if n_steps >= 2:
                out_dma(nxt, t - 1, g).wait()


@functools.partial(
    jax.jit,
    static_argnames=("tile_shape", "group", "relu_out", "interpret",
                     "pair_dma"),
)
def tiled_down2(
    x: jnp.ndarray,
    w: jnp.ndarray,
    tiles: jnp.ndarray,
    *,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    occ: Optional[jnp.ndarray] = None,
    relu_out: bool = False,
    tile_shape: Tuple[int, int, int] = (8, 8, 8),
    group: int = 8,
    interpret: bool = False,
    pair_dma: str = "auto",
) -> jnp.ndarray:
    """Stride-2 k=2 conv over occupied COARSE tiles with fused epilogue.

    x: margined FINE grid (2X + 2MX, 2Y + 2MY, 2Z + 2MZ, cin_p) with
    128-multiple lanes; w: (8, Cin, Cout) x-fastest offsets
    (idx = dx + 2dy + 4dz, semantics out[o] = sum_d W[d] @ in[2o + d] —
    reference stride-2 MinkowskiConvolution). tiles index the coarse
    interior. Returns the margined coarse grid (..., Cout_p).
    """
    Xm, Ym, Zm, cp = x.shape
    Xf, Yf, Zf = Xm - 2 * MX, Ym - 2 * MY, Zm - 2 * MZ
    X, Y, Z = Xf // 2, Yf // 2, Zf // 2
    cin, cout = w.shape[1], w.shape[2]
    assert w.shape[0] == 8 and cp == _lanes(cin)
    TX, TY, TZ = tile_shape
    assert X % TX == 0 and Y % TY == 0 and Z % TZ == 0
    assert TZ % 8 == 0
    assert (scale is None) == (bias is None)
    n_tiles = tiles.shape[0]
    G = group
    assert n_tiles % G == 0
    n_steps = n_tiles // G
    has_affine = scale is not None
    has_occ = occ is not None
    if has_occ:
        assert (TX * TY * TZ) % 128 == 0

    cin_p = cp
    cout_p = _lanes(cout)
    # (8, cin, cout) -> (8*cin_p, cout_p), row blocks (d, c)
    wf = jnp.pad(w, ((0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    wf = wf.reshape(8 * cin_p, cout_p).astype(x.dtype)[None]
    # TPU: the kernel folds z-pairs in the DMA engine (per-parity copies
    # through a reshaped ref view) — the full-grid XLA z-pair relayout
    # this reshape costs (~7 ms at L0) then only remains on the interpret
    # path. CAVEAT (measured, RESULTS_r5.md): the reshaped-ref DMA is
    # WRONG on real hardware when the grid has more than one 128-lane
    # page (cin_p > 128, e.g. the 256-channel L3->L4 down) — those
    # configs materialize the z-pair view instead (grids at those levels
    # are small, so the relayout is cheap).
    if pair_dma == "auto":
        use_pair = (not interpret) and cin_p <= 128
    else:
        use_pair = bool(pair_dma) and not interpret
    if not use_pair:
        x = x.reshape(Xm, Ym, Zm // 2, 2 * cp)  # z-pair view
    out0 = jnp.zeros((X + 2 * MX, Y + 2 * MY, Z + 2 * MZ, cout_p), x.dtype)

    NTY, NTZ = Y // TY, Z // TZ
    txs = tiles[:, 0].astype(jnp.int32)
    tys = tiles[:, 1].astype(jnp.int32)
    tzs = tiles[:, 2].astype(jnp.int32)

    operands = [txs, tys, tzs, x, wf]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
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
    operands.append(out0)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    zeros_index = len(operands) - 1

    scratch = [
        pltpu.VMEM((2, 2 * TX, G, 2 * TY, TZ, 2 * cin_p), x.dtype),
        pltpu.VMEM((TX, G, TY, TZ, 8 * cin_p), x.dtype),
        pltpu.VMEM((2, TX, G, TY, TZ, cout_p), x.dtype),
    ]
    if has_occ:
        scratch.append(pltpu.VMEM((2, G, (TX * TY * TZ) // 128, 128),
                                  jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2, G)))
    scratch.append(pltpu.SemaphoreType.DMA((2, G)))
    if has_occ:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    kernel = functools.partial(
        _down2_kernel, TX=TX, TY=TY, TZ=TZ, cin_p=cin_p, cout=cout_p,
        n_steps=n_steps, G=G, NTY=NTY, NTZ=NTZ, out_dtype=x.dtype,
        has_affine=has_affine, has_occ=has_occ, relu_out=relu_out,
        pair_dma=use_pair,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out0.shape, x.dtype),
        input_output_aliases={zeros_index: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def _up2_kernel(txs_ref, tys_ref, tzs_ref, *args,
                TX, TY, TZ, cin_p, cout, cout_r, out_lanes, skip_c, skl,
                n_steps, G, NTY, NTZ, out_dtype, has_affine, has_occ,
                has_skip, relu_out, pair_dma):
    it = iter(args)
    x_hbm = next(it)        # margined COARSE grid (plain view)
    w_ref = next(it)        # (8, cin_p, cout)
    ab_ref = next(it) if has_affine else None
    occ_hbm = next(it) if has_occ else None    # parity-major pack
    skip_hbm = next(it) if has_skip else None  # fine grid z-PAIR view
    _zeros = next(it)
    out_ref = next(it)      # fine grid full-PAIR (6D) view
    in_tile = next(it)      # (2, HX, G, HY, HZ, cin_p)
    acc = next(it)          # (2, HX, 2, G, HY, 2, HZ, 2*out_lanes)
    occ_tile = next(it) if has_occ else None
    skip_tile = next(it) if has_skip else None
    sem_in = next(it)
    sem_out = next(it)
    sem_occ = next(it) if has_occ else None
    sem_skip = next(it) if has_skip else None

    t = pl.program_id(0)
    HX, HY, HZ = TX // 2, TY // 2, TZ // 2

    def txyz(step, g):
        # prefetched tile INDICES; full- and half-scale origins by in-kernel
        # MULTIPLICATION with constant extents (premultiplied origins read
        # from SMEM are opaque to Mosaic's z-divisibility proof)
        i = step * G + g
        return txs_ref[i] * TX, tys_ref[i] * TY, tzs_ref[i] * TZ

    def txyz_half(step, g):
        i = step * G + g
        return txs_ref[i] * HX, tys_ref[i] * HY, tzs_ref[i] * HZ

    def in_dma(slot, step, g):
        txh, tyh, tzh = txyz_half(step, g)
        # TZ % 16 == 0 keeps the coarse z offset tzh + MZ 8-aligned
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(txh + MX, HX), pl.ds(tyh + MY, HY),
                     pl.ds(tzh + MZ, HZ), :],
            in_tile.at[slot, :, g], sem_in.at[slot, g],
        )

    def occ_dma(slot, step):
        return pltpu.make_async_copy(
            occ_hbm.at[pl.ds(step * G, G)], occ_tile.at[slot],
            sem_occ.at[slot],
        )

    def skip_dma(slot, step, g):
        tx, ty, tz = txyz(step, g)
        _, _, tzh = txyz_half(step, g)
        if pair_dma:
            # TPU path: skip_hbm is the UNFOLDED fine grid; its z-pair
            # view is a free row-major ref reshape ((z, c) is contiguous),
            # so the fold that used to be a full-grid XLA relayout
            # (~3 ms at L0) costs nothing
            Xs, Ys, Zs, _ = skip_hbm.shape
            sv = skip_hbm.reshape(Xs, Ys, Zs // 2, 2 * skl)
        else:
            # interpret path: skip_hbm arrives as the materialized z-PAIR
            # view (reshaped-ref DMAs unsupported there)
            sv = skip_hbm
        return pltpu.make_async_copy(
            sv.at[pl.ds(tx + MX, TX), pl.ds(ty + MY, TY),
                  pl.ds(tzh + MZ // 2, HZ), :],
            skip_tile.at[slot, :, g], sem_skip.at[slot, g],
        )

    def start_in(slot, step):
        for g in range(G):
            in_dma(slot, step, g).start()
            if has_skip:
                skip_dma(slot, step, g).start()
        if has_occ:
            occ_dma(slot, step).start()

    def out_dma(slot, step, g):
        txh, tyh, tzh = txyz_half(step, g)
        # 6D pair view dest: (x-pair, dx, y-pair, dy, z-pair, (dz, c)) in
        # row-major IS the 4D fine grid; interior starts are even in x/y
        # and the z-pair offset tzh + MZ/2 is 8-aligned. On TPU the view
        # comes from a free ref reshape of the UNFOLDED out grid (kills
        # the ~7 ms full-grid XLA unfold at L0); interpret gets the
        # materialized 6D view.
        if pair_dma:
            Xf, Yf, Zf, _ = out_ref.shape
            ov = out_ref.reshape(Xf // 2, 2, Yf // 2, 2, Zf // 2,
                                 2 * out_lanes)
        else:
            ov = out_ref
        return pltpu.make_async_copy(
            acc.at[slot, :, :, g],
            ov.at[pl.ds(txh + MX // 2, HX), :,
                  pl.ds(tyh + MY // 2, HY), :,
                  pl.ds(tzh + MZ // 2, HZ), :],
            sem_out.at[slot, g],
        )

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        start_in(slot, t)

    @pl.when(t + 1 < n_steps)
    def _():
        start_in(nxt, t + 1)

    for g in range(G):
        in_dma(slot, t, g).wait()
        if has_skip:
            skip_dma(slot, t, g).wait()
    if has_occ:
        occ_dma(slot, t).wait()

    @pl.when(t >= 2)
    def _():
        for g in range(G):
            out_dma(slot, t - 2, g).wait()

    cpp = HX * HY * HZ          # cells per parity per tile
    prows = G * cpp
    parents = in_tile[slot].reshape(prows, cin_p)
    if has_skip:
        skp = skip_tile[slot].reshape(HX, 2, G, HY, 2, HZ, 2 * skl)
    if has_occ:
        S = (8 * cpp) // 128    # packed slabs per tile (parity-major)
        TYZc = HY * HZ
        r = jax.lax.broadcasted_iota(jnp.int32, (prows, 1), 0)
        cell_p = (r // (G * TYZc)) * TYZc + r % TYZc
        g_idx = (r // TYZc) % G

    # transposed stride-2 k=2: every fine cell has exactly one parent,
    # selected by its parity — 8 matmuls with per-parity epilogue, placed
    # through the pair views (Mosaic has no strided vector slicing)
    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                d = dx + 2 * dy + 4 * dz
                part = jax.lax.dot_general(
                    parents, w_ref[d],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (prows, cout)
                if has_affine:
                    part = part * ab_ref[0:1, :] + ab_ref[1:2, :]
                if has_occ:
                    flat = d * cpp + cell_p
                    slab = g_idx * S + flat // 128
                    slab_oh = (jax.lax.broadcasted_iota(
                        jnp.int32, (prows, G * S), 1) == slab
                    ).astype(jnp.float32)
                    ot = occ_tile[slot].reshape(G * S, 128)
                    occ_rows = jax.lax.dot_general(
                        slab_oh, ot,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    sel = (jax.lax.broadcasted_iota(
                        jnp.int32, (prows, 128), 1) == flat % 128)
                    occm = jnp.sum(jnp.where(sel, occ_rows, 0.0), axis=1,
                                   keepdims=True)
                    part = part * occm
                if relu_out:
                    part = jnp.maximum(part, 0.0)
                pv = part.astype(out_dtype).reshape(HX, G, HY, HZ, cout)
                base = dz * out_lanes
                acc[slot, :, dx, :, :, dy, :, base:base + cout] = pv
                if out_lanes > cout:
                    acc[slot, :, dx, :, :, dy, :,
                        base + cout:base + out_lanes] = jnp.zeros(
                        (HX, G, HY, HZ, out_lanes - cout), out_dtype)
                if has_skip:
                    # fused U-Net concat: overlay the skip grid's channels
                    # after the REAL conv width (post-activation values)
                    acc[slot, :, dx, :, :, dy, :,
                        base + cout_r:base + cout_r + skip_c] = (
                        skp[:, dx, :, :, dy, :,
                            dz * skl:dz * skl + skip_c]
                    )

    for g in range(G):
        out_dma(slot, t, g).start()

    @pl.when(t == n_steps - 1)
    def _():
        for g in range(G):
            out_dma(slot, t, g).wait()
            if n_steps >= 2:
                out_dma(nxt, t - 1, g).wait()


def pack_occ_parity(occ_grid, tiles, tile_shape, xp=jnp):
    """Per-tile occupancy for tiled_up2, parity-major: entry [t] is the
    8 * cells/8 occupancies ordered (dz, dy, dx)-parity major, (xc, yc, zc)
    within, packed as (T, cells/128, 128) f32."""
    TX, TY, TZ = tile_shape
    o = occ_grid[MX:occ_grid.shape[0] - MX, MY:occ_grid.shape[1] - MY,
                 MZ:occ_grid.shape[2] - MZ]
    X, Y, Z = o.shape
    o = o.reshape(X // TX, TX // 2, 2, Y // TY, TY // 2, 2, Z // TZ,
                  TZ // 2, 2)
    # -> (ntx, nty, ntz, dz, dy, dx, xc, yc, zc)
    o = xp.transpose(o, (0, 3, 6, 8, 5, 2, 1, 4, 7))
    g = o[tiles[:, 0], tiles[:, 1], tiles[:, 2]]
    return g.reshape(tiles.shape[0], (TX * TY * TZ) // 128,
                     128).astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("tile_shape", "group", "skip_c", "relu_out",
                     "interpret", "pair_dma"),
)
def tiled_up2(
    x: jnp.ndarray,
    w: jnp.ndarray,
    tiles: jnp.ndarray,
    *,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    occ: Optional[jnp.ndarray] = None,
    skip: Optional[jnp.ndarray] = None,
    skip_c: int = 0,
    relu_out: bool = False,
    tile_shape: Tuple[int, int, int] = (8, 8, 32),
    group: int = 2,
    out: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    pair_dma: str = "auto",
) -> jnp.ndarray:
    """Transposed stride-2 k=2 conv over occupied FINE tiles, with fused
    epilogue and OPTIONAL fused skip concatenation.

    x: margined COARSE grid (X//2 + 2MX, ..., cin_p); w: (8, Cin, Cout)
    x-fastest offsets (semantics out[2p + d] += W[d] @ in[p] — reference
    MinkowskiConvolutionTranspose). tiles index the FINE interior;
    TX, TY even and TZ % 16 == 0 (coarse z DMA alignment). ``occ`` must be
    pack_occ_parity's output for these tiles. With ``skip`` (a margined
    fine grid) and ``skip_c``, the output carries
    [conv epilogue result (Cout) | skip[..., :skip_c] | zeros] — the next
    block's concatenated input, skipping the full-grid XLA concat pass.

    Returns the margined fine grid (..., lanes(Cout + skip_c)).
    """
    Xm, Ym, Zm, cp = x.shape
    Xc, Yc, Zc = Xm - 2 * MX, Ym - 2 * MY, Zm - 2 * MZ
    X, Y, Z = Xc * 2, Yc * 2, Zc * 2
    cin, cout = w.shape[1], w.shape[2]
    assert w.shape[0] == 8 and cp == _lanes(cin)
    TX, TY, TZ = tile_shape
    assert X % TX == 0 and Y % TY == 0 and Z % TZ == 0
    assert TX % 2 == 0 and TY % 2 == 0 and TZ % 16 == 0
    assert (scale is None) == (bias is None)
    assert (skip is None) == (skip_c == 0)
    n_tiles = tiles.shape[0]
    G = group
    assert n_tiles % G == 0
    n_steps = n_tiles // G
    has_affine = scale is not None
    has_occ = occ is not None
    has_skip = skip is not None
    if has_occ:
        assert (TX * TY * TZ) % 128 == 0

    cin_p = cp
    cout_p = _lanes(cout)
    out_lanes = _lanes(cout + skip_c)
    wf = jnp.pad(w, ((0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    wf = wf.astype(x.dtype)
    Xf, Yf, Zf = X + 2 * MX, Y + 2 * MY, Z + 2 * MZ
    # TPU: z-pair fold/unfold rides the DMA engine through reshaped ref
    # views (see _up2_kernel.out_dmas/skip_dmas); the full-grid XLA pair
    # relayouts (~10 ms at L0: output unfold + skip fold) only remain on
    # the interpret path. `out` optionally donates a DEAD same-shape grid
    # (zero outside this tile list's coverage) to skip the full-grid
    # zero fill, as tiled_conv3d does.
    # CAVEAT (measured, RESULTS_r5.md): with a multi-128-lane-page coarse
    # input (cin_p > 128, the 256-channel decoder ups into L2/L3) the
    # real-hardware kernel returns wrong values; those configs take the
    # materialized-view path (cheap at the small deep-level grids).
    if pair_dma == "auto":
        use_pair = (not interpret) and cin_p <= 128
    else:
        use_pair = bool(pair_dma) and not interpret
    pair_dma = use_pair
    if out is not None and out.shape == (Xf, Yf, Zf, out_lanes) \
            and out.dtype == x.dtype and pair_dma:
        out0 = out
    else:
        out0 = jnp.zeros((Xf, Yf, Zf, out_lanes), x.dtype)
    if not pair_dma:
        # full pair (6D) view: row-major (x-pair, dx, y-pair, dy, z-pair,
        # (dz, c)) is bit-identical to the 4D fine grid
        out0 = out0.reshape(Xf // 2, 2, Yf // 2, 2, Zf // 2, 2 * out_lanes)

    NTY, NTZ = Y // TY, Z // TZ
    txs = tiles[:, 0].astype(jnp.int32)
    tys = tiles[:, 1].astype(jnp.int32)
    tzs = tiles[:, 2].astype(jnp.int32)

    operands = [txs, tys, tzs, x, wf]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
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
    skl = 0
    if has_skip:
        assert skip.shape[:3] == (Xf, Yf, Zf)
        skl = skip.shape[-1]
        assert skl % 128 == 0 and skip_c <= skl
        skip2 = skip.astype(x.dtype)
        if not pair_dma:
            skip2 = skip2.reshape(Xf, Yf, Zf // 2, 2 * skl)
        operands.append(skip2)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    operands.append(out0)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    zeros_index = len(operands) - 1

    HX, HY, HZ = TX // 2, TY // 2, TZ // 2
    scratch = [
        pltpu.VMEM((2, HX, G, HY, HZ, cin_p), x.dtype),
        pltpu.VMEM((2, HX, 2, G, HY, 2, HZ, 2 * out_lanes), x.dtype),
    ]
    if has_occ:
        scratch.append(pltpu.VMEM((2, G, (TX * TY * TZ) // 128, 128),
                                  jnp.float32))
    if has_skip:
        scratch.append(pltpu.VMEM((2, TX, G, TY, HZ, 2 * skl), x.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, G)))
    scratch.append(pltpu.SemaphoreType.DMA((2, G)))
    if has_occ:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if has_skip:
        scratch.append(pltpu.SemaphoreType.DMA((2, G)))

    kernel = functools.partial(
        _up2_kernel, TX=TX, TY=TY, TZ=TZ, cin_p=cin_p, cout=cout_p,
        cout_r=cout, out_lanes=out_lanes, skip_c=skip_c, skl=skl,
        n_steps=n_steps, G=G, NTY=NTY, NTZ=NTZ, out_dtype=x.dtype,
        has_affine=has_affine, has_occ=has_occ, has_skip=has_skip,
        relu_out=relu_out, pair_dma=pair_dma,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out0.shape, x.dtype),
        input_output_aliases={zeros_index: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    if not pair_dma:
        return res.reshape(Xf, Yf, Zf, out_lanes)
    return res


def pack_occ_updma(occ_grid, tiles, tile_shape, group: int, xp=jnp):
    """Per-step occupancy for tiled_up2_into, coarse-cell-row-major.

    Entry [s, row, d] (row = (xc, g, yc, zc) — the kernel's parent-matmul
    row order) is the occupancy of fine cell (2*(tile_x + xc) + dx, ...)
    for parity d = (dx*2 + dy)*2 + dz, matching the kernel's weight column
    blocks. Lanes are padded 8 -> 128 (a sub-128 minor dim is not a legal
    HBM DMA source) and the pack is bf16 ({0, 1} exact) to halve traffic.
    Shape (T/group, group * cells/8, 128).
    """
    TX, TY, TZ = tile_shape
    HX, HY, HZ = TX // 2, TY // 2, TZ // 2
    o = occ_grid[MX:occ_grid.shape[0] - MX, MY:occ_grid.shape[1] - MY,
                 MZ:occ_grid.shape[2] - MZ]
    X, Y, Z = o.shape
    # per-parity stride-2 slices (cheap XLA lowering; a 9-axis transpose
    # with three size-2 minor axes compiles to an element-copy crawl):
    # o8[x, y, z, d] = occ[2x + dx, 2y + dy, 2z + dz]
    o8 = xp.stack(
        [o[dx::2, dy::2, dz::2]
         for dx in range(2) for dy in range(2) for dz in range(2)],
        axis=-1)                                   # (X/2, Y/2, Z/2, 8)
    o8 = o8.reshape(X // TX, HX, Y // TY, HY, Z // TZ, HZ, 8)
    o8 = xp.transpose(o8, (0, 2, 4, 1, 3, 5, 6))
    g = o8[tiles[:, 0], tiles[:, 1], tiles[:, 2]]  # (T, HX, HY, HZ, 8)
    T = tiles.shape[0]
    g = g.reshape(T // group, group, HX, HY, HZ, 8)
    g = xp.transpose(g, (0, 2, 1, 3, 4, 5))
    g = g.reshape(T // group, group * HX * HY * HZ, 8)
    g = xp.pad(g, ((0, 0), (0, 0), (0, 120)))
    return g.astype(jnp.bfloat16)


def _up2v2_kernel(txs_ref, tys_ref, tzs_ref, *args, TX, TY, TZ, cin_p, skip_c, cout,
                  n_steps, G, NTY, NTZ, out_dtype, has_affine, has_occ,
                  has_skip, relu_out):
    it = iter(args)
    x_hbm = next(it)        # margined COARSE grid (plain view)
    w_ref = next(it)        # (1, cin_p, 8*128) packed (dx, dy, dz, c) cols
    ab_ref = next(it) if has_affine else None   # (2, 8*128)
    occ_hbm = next(it) if has_occ else None     # pack_occ_updma output
    _dest = next(it)
    out_ref = next(it)      # dest grid 6D pair view (Xf/2, 2, Yf/2, 2, Zf/2, 256)
    in_tile = next(it)      # (2, HX, G, HY, HZ, cin_p)
    acc = next(it)          # (2, HX, G, HY, HZ, 8*128)
    occ_tile = next(it) if has_occ else None    # (2, rows, 128) bf16
    skv = next(it) if has_skip else None        # (2, HX, G, HY, HZ, 8*128)
    sem_in = next(it)
    sem_out = next(it)      # (2, G, 8)
    sem_occ = next(it) if has_occ else None
    sem_skip = next(it) if has_skip else None   # (2, G, 8)

    t = pl.program_id(0)
    HX, HY, HZ = TX // 2, TY // 2, TZ // 2

    def txyz_half(step, g):
        # prefetched tile INDICES (no per-DMA div/mod scalar work);
        # multiplication form keeps Mosaic's z-divisibility proof
        i = step * G + g
        return txs_ref[i] * HX, tys_ref[i] * HY, tzs_ref[i] * HZ

    def in_dma(slot, step, g):
        txh, tyh, tzh = txyz_half(step, g)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(txh + MX, HX), pl.ds(tyh + MY, HY),
                     pl.ds(tzh + MZ, HZ), :],
            in_tile.at[slot, :, g], sem_in.at[slot, g],
        )

    def occ_dma(slot, step):
        return pltpu.make_async_copy(
            occ_hbm.at[step], occ_tile.at[slot], sem_occ.at[slot],
        )

    def _dst7(step, g, b):
        dx, dy, dz = b >> 2, (b >> 1) & 1, b & 1
        txh, tyh, tzh = txyz_half(step, g)
        # 6D pair view slice: x/y-pair starts are txh + MX/2 etc; MZ/2 = 8
        # keeps the z-pair offset 8-aligned; dz selects the aligned 128-lane
        # half of the (dz, c) 256-lane minor dim (a 7D view's dz axis sits
        # inside the HBM (2, 128) tile and cannot be sliced)
        return out_ref.at[pl.ds(txh + MX // 2, HX), dx,
                          pl.ds(tyh + MY // 2, HY), dy,
                          pl.ds(tzh + MZ // 2, HZ),
                          pl.ds(dz * 128, 128)]

    def skip_dma(slot, step, g, b):
        # the DONATED dest still holds the producer's [skip | zero] rows:
        # read parity b's fine cells into lane block b of skv. Reading full
        # 128-lane blocks keeps every DMA lane-aligned (sub-128 lane slices
        # of VMEM are not lowerable).
        return pltpu.make_async_copy(
            _dst7(step, g, b),
            skv.at[slot, :, g, :, :, pl.ds(b * 128, 128)],
            sem_skip.at[slot, g, b],
        )

    def out_dma(slot, step, g, b):
        return pltpu.make_async_copy(
            acc.at[slot, :, g, :, :, pl.ds(b * 128, 128)],
            _dst7(step, g, b),
            sem_out.at[slot, g, b],
        )

    def start_in(slot, step):
        for g in range(G):
            in_dma(slot, step, g).start()
            if has_skip:
                for b in range(8):
                    skip_dma(slot, step, g, b).start()
        if has_occ:
            occ_dma(slot, step).start()

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        start_in(slot, t)

    @pl.when(t + 1 < n_steps)
    def _():
        start_in(nxt, t + 1)

    for g in range(G):
        in_dma(slot, t, g).wait()
        if has_skip:
            for b in range(8):
                skip_dma(slot, t, g, b).wait()
    if has_occ:
        occ_dma(slot, t).wait()

    @pl.when(t >= 2)
    def _():
        for g in range(G):
            for b in range(8):
                out_dma(slot, t - 2, g, b).wait()

    rows = HX * G * HY * HZ
    parents = in_tile[slot].reshape(rows, cin_p)
    # ONE wide matmul: all 8 (dx, dy, dz) parities as 128-col lane blocks
    # (cols [skip_c : skip_c + cout] of each block hold W[d], the rest are
    # zero). The per-parity results leave through full-lane-block DMAs
    # instead of the old kernel's 8 strided VPU scatters (which bound it at
    # ~40x its MXU cost, round-3 sweep, benchmarks/RESULTS_r3.md).
    res = jax.lax.dot_general(
        parents, w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, 8 * 128)
    if has_affine:
        res = res * ab_ref[0:1, :] + ab_ref[1:2, :]
    if has_occ:
        occ8 = occ_tile[slot].astype(jnp.float32)  # (rows, 128), 8 used
        # per-parity mask: lane-column broadcast per 128-block (no relayout)
        mask = jnp.concatenate(
            [jnp.broadcast_to(occ8[:, b:b + 1], (rows, 128))
             for b in range(8)], axis=1)
        res = res * mask
    if relu_out:
        res = jnp.maximum(res, 0.0)
    resc = res.astype(out_dtype)
    if has_skip:
        # skv lane blocks hold [skip | zeros]; res holds [zeros | conv]:
        # one full-width add completes the fused concat. The readback is
        # masked to the skip lanes so DUPLICATE tiles (tile-list padding)
        # stay idempotent — an unmasked re-read of an already-written tile
        # would re-add its conv lanes.
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 8 * 128), 1)
        keep = (jax.lax.rem(lane, 128) < skip_c).astype(out_dtype)
        resc = resc + skv[slot].reshape(rows, 8 * 128) * keep
    acc[slot] = resc.reshape(HX, G, HY, HZ, 8 * 128)

    for g in range(G):
        for b in range(8):
            out_dma(slot, t, g, b).start()

    @pl.when(t == n_steps - 1)
    def _():
        for g in range(G):
            for b in range(8):
                out_dma(slot, t, g, b).wait()
                if n_steps >= 2:
                    out_dma(nxt, t - 1, g, b).wait()


@functools.partial(
    jax.jit,
    static_argnames=("skip_c", "relu_out", "tile_shape", "group",
                     "interpret"),
)
def tiled_up2_into(
    x: jnp.ndarray,
    w: jnp.ndarray,
    tiles: jnp.ndarray,
    *,
    dest: jnp.ndarray,
    skip_c: int = 0,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    occ: Optional[jnp.ndarray] = None,
    relu_out: bool = False,
    tile_shape: Tuple[int, int, int] = (8, 8, 32),
    group: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Transposed stride-2 k=2 conv written IN-PLACE into ``dest``.

    The successor of tiled_up2 for the hot L0/L1 decoder levels: ``dest``
    (a margined fine grid, 128 lanes, holding the U-Net SKIP features at
    lanes [0 : skip_c] and zeros elsewhere — i.e. the skip producer's own
    buffer) is DONATED and returned with lanes [skip_c : skip_c + cout]
    filled by the conv epilogue over the occupied tiles. The fused concat
    layout is therefore [skip | conv] — callers must permute the NEXT
    conv's input-channel rows (reference order is [conv | skip]).

    Design: one wide matmul per step with the 8 (dx, dy, dz) parities as
    128-col lane blocks, a full-width add of the skip rows (read back from
    the donated buffer through per-parity pair-view DMAs), and full
    lane-block DMAs both ways — no strided VPU scatters (the old kernel's
    binding cost) and no separate concat pass or output memset. ``occ``
    must be pack_occ_updma's output. Requires skip_c + cout <= 128 and
    TZ % 16 == 0.
    """
    Xm, Ym, Zm, cp = x.shape
    Xc, Yc, Zc = Xm - 2 * MX, Ym - 2 * MY, Zm - 2 * MZ
    X, Y, Z = Xc * 2, Yc * 2, Zc * 2
    cin, cout = w.shape[1], w.shape[2]
    assert w.shape[0] == 8 and cp == _lanes(cin)
    TX, TY, TZ = tile_shape
    assert X % TX == 0 and Y % TY == 0 and Z % TZ == 0
    assert TX % 2 == 0 and TY % 2 == 0 and TZ % 16 == 0
    assert (scale is None) == (bias is None)
    n_tiles = tiles.shape[0]
    G = group
    assert n_tiles % G == 0
    n_steps = n_tiles // G
    has_affine = scale is not None
    has_occ = occ is not None
    has_skip = skip_c > 0

    Xf, Yf, Zf = X + 2 * MX, Y + 2 * MY, Z + 2 * MZ
    assert dest.shape == (Xf, Yf, Zf, 128) and dest.dtype == x.dtype
    assert skip_c + cout <= 128, "one parity per 128-lane block"

    cin_p = cp
    # packed weights: col block b = (dx*2 + dy)*2 + dz holds W[d] at cols
    # [skip_c : skip_c + cout], d = dx + 2*dy + 4*dz (x-fastest offsets)
    wp = jnp.pad(w, ((0, 0), (0, cin_p - cin),
                     (skip_c, 128 - skip_c - cout)))
    order = [dx + 2 * dy + 4 * dz
             for dx in range(2) for dy in range(2) for dz in range(2)]
    wf = jnp.transpose(wp[jnp.asarray(order)], (1, 0, 2))  # (cin_p, 8, 128)
    wf = wf.reshape(cin_p, 8 * 128).astype(x.dtype)[None]

    out7 = dest.reshape(Xf // 2, 2, Yf // 2, 2, Zf // 2, 256)

    NTY, NTZ = Y // TY, Z // TZ
    txs = tiles[:, 0].astype(jnp.int32)
    tys = tiles[:, 1].astype(jnp.int32)
    tzs = tiles[:, 2].astype(jnp.int32)

    operands = [txs, tys, tzs, x, wf]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if has_affine:
        pad1 = jnp.zeros((skip_c,), jnp.float32)
        pad2 = jnp.zeros((128 - skip_c - cout,), jnp.float32)
        sc8 = jnp.tile(jnp.concatenate(
            [pad1, scale.astype(jnp.float32), pad2]), 8)
        bi8 = jnp.tile(jnp.concatenate(
            [pad1, bias.astype(jnp.float32), pad2]), 8)
        operands.append(jnp.stack([sc8, bi8]))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    HX, HY, HZ = TX // 2, TY // 2, TZ // 2
    if has_occ:
        assert occ.shape == (n_steps, G * HX * HY * HZ, 128), occ.shape
        operands.append(occ.astype(jnp.bfloat16))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    operands.append(out7)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    dest_index = len(operands) - 1

    scratch = [
        pltpu.VMEM((2, HX, G, HY, HZ, cin_p), x.dtype),
        pltpu.VMEM((2, HX, G, HY, HZ, 8 * 128), x.dtype),
    ]
    if has_occ:
        scratch.append(pltpu.VMEM((2, G * HX * HY * HZ, 128), jnp.bfloat16))
    if has_skip:
        scratch.append(pltpu.VMEM((2, HX, G, HY, HZ, 8 * 128), x.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, G)))
    scratch.append(pltpu.SemaphoreType.DMA((2, G, 8)))
    if has_occ:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if has_skip:
        scratch.append(pltpu.SemaphoreType.DMA((2, G, 8)))

    kernel = functools.partial(
        _up2v2_kernel, TX=TX, TY=TY, TZ=TZ, cin_p=cin_p, skip_c=skip_c,
        cout=cout, n_steps=n_steps, G=G, NTY=NTY, NTZ=NTZ,
        out_dtype=x.dtype, has_affine=has_affine, has_occ=has_occ,
        has_skip=has_skip, relu_out=relu_out,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out7.shape, x.dtype),
        input_output_aliases={dest_index: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out.reshape(Xf, Yf, Zf, 128)
