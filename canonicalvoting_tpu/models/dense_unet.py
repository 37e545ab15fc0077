"""Dense-execution MinkUNet: masked dense 3D convolutions on the MXU.

MOTIVATION. The gather-form sparse conv (ops/sparse_conv.py) is bound by
TPU row-gather throughput (~15M rows/s): a ScanNet scene costs ~35M gathered
rows per forward => ~900 ms, with the kernel-5 stem alone ~670 ms. At 3 cm
resolution a scan occupies only ~1-2% of its bounding grid, but dense
convolution runs on the MXU at near-peak: the FLOP overcompute is ~6-9x
CHEAPER than the gathers — and the Pallas occupied-tile kernel
(ops/pallas/tiled_conv.py) then removes most of the overcompute too.

EXACTNESS. Submanifold sparse convolution == dense convolution + occupancy
masking:
  * empty cells hold zero features, so they contribute nothing to any
    output sum (matching the missing-neighbor semantics of the kernel map);
  * multiplying each conv's output by the level's occupancy mask removes the
    values convs write into empty cells, so nothing ever propagates through
    unoccupied sites (matching outputs-only-at-occupied semantics);
  * stride-2 occupancy = max-pool of fine occupancy == the coordinate
    downsample unique(floor(c/2)*2) (ops/coords.downsample_coords);
  * BatchNorm statistics are computed over occupied cells only.

GRID LAYOUT. Every dense grid is MARGINED — stored with (MX, MY, MZ) =
(2, 2, 16) zero borders around the interior (ops/pallas/tiled_conv.py) — so
Pallas conv windows never go out of bounds (no per-conv full-grid pads) and
z DMA starts stay 8-sublane aligned. The XLA strided/transposed convs are
given padding configs that map margined inputs to margined outputs directly
(margin outputs are exact zeros because margins are zero). In the tiled
path, activation grids additionally carry 128-multiple lane counts (real
channels first, zero lanes after) as the DMA engine requires.

The parameter tree is IDENTICAL to models/minkunet.MinkUNetBase (same module
names, same (K, Cin, Cout) kernel shapes with the x-fastest offset
enumeration of ops/coords.kernel_offsets), so weights — including converted
reference .pth checkpoints — load into either execution path unchanged.

Grid alignment: the host supplies a base voxel coordinate aligned to the
coarsest stride (16) so floor-division downsampling matches the raw-coord
semantics of the reference pipeline exactly (see data.dense_prep).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import os as _os

from canonicalvoting_tpu.models.norm import MaskedBatchNorm
from canonicalvoting_tpu.models.resnet import BLOCKS, kernel_init
from canonicalvoting_tpu.ops.pallas.tiled_conv import MX, MY, MZ, _lanes

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _to_dense_kernel(w: jnp.ndarray, k: int) -> jnp.ndarray:
    """(K, Cin, Cout) with x-fastest offsets -> (kx, ky, kz, Cin, Cout)."""
    cin, cout = w.shape[1], w.shape[2]
    # offset index = ix + k*iy + k*k*iz  =>  reshape exposes (iz, iy, ix)
    w = w.reshape(k, k, k, cin, cout)  # (iz, iy, ix, ...)
    return jnp.transpose(w, (2, 1, 0, 3, 4))


def pad_lanes(x: jnp.ndarray, lanes: int) -> jnp.ndarray:
    """Zero-pad the channel dim up to ``lanes`` (no-op when already there)."""
    c = x.shape[-1]
    if c == lanes:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, lanes - c)])


class DenseBatchNorm(nn.Module):
    """MaskedBatchNorm over occupied cells of a dense (1, Xm, Ym, Zm, C)
    margined grid. Same parameter/stat names as MaskedBatchNorm so variables
    interchange. Margins (occ == 0 there) contribute nothing and stay zero.
    """

    features: int
    eps: float = 1e-5
    axis_name: str = ""

    @nn.compact
    def __call__(self, x, occ, train: bool, momentum=0.1,
                 return_affine: bool = False):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if return_affine:
            # inference-mode affine folding (y = x*A + B, to be fused into a
            # conv epilogue); only valid with running stats
            assert not train
            inv = jax.lax.rsqrt(ra_var.value + self.eps)
            a = inv * scale
            return a, bias - ra_mean.value * a

        if occ is not None and occ.ndim == x.ndim - 1:
            occ = occ[..., None]
        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            n = jnp.sum(occ)
            s1 = jnp.sum(xf * occ, axis=axes)
            s2 = jnp.sum((xf * xf) * occ, axis=axes)
            if self.axis_name:
                n = jax.lax.psum(n, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value
        inv = jax.lax.rsqrt(var + self.eps)
        # re-mask: normalization shifts empty cells off zero
        out = (x.astype(jnp.float32) - mean) * inv * scale * occ + bias * occ
        return out.astype(x.dtype)


class DenseConv(nn.Module):
    """Dense conv layer storing the sparse-format (K, Cin, Cout) kernel.

    All grid inputs/outputs are MARGINED (see module docstring).

    ``conv_impl`` selects the stride-1 execution path: "xla"
    (lax.conv_general_dilated over the full grid) or "tiled"/
    "tiled_interpret" (the Pallas occupied-tile kernel; requires ``tiles``
    and ``ts_group`` at call time and returns 128-multiple lanes). Strided
    and transposed convs always take the XLA path, with padding configs
    that keep grids margined.
    """

    in_channels: int
    out_channels: int
    kernel_size: int  # 1, 2, 3 or 5
    stride: int = 1
    transpose: bool = False
    use_bias: bool = False
    compute_dtype: str = "bfloat16"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, tiles=None, ts_group=None, scale=None, bias=None,
                 occ=None, residual=None, res_w=None, res_scale=None,
                 res_bias=None, relu_out: bool = False, rows: bool = False,
                 return_kernel: bool = False, in_perm=None,
                 prefold: bool = False, prefolded_input: bool = False,
                 replicated: bool = False, donate=None):
        k = self.kernel_size
        w = self.param(
            "kernel", kernel_init, (k ** 3, self.in_channels, self.out_channels)
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) \
            if self.use_bias else None
        if in_perm is not None:
            # input grid in a permuted channel layout (e.g. the [skip|conv]
            # order tiled_up2_into leaves behind): reorder kernel rows at
            # trace time; the stored parameter keeps the reference layout
            w = w[:, in_perm, :]
        if return_kernel:
            # weights-only access for epilogue fusion into another kernel
            return w
        bf16 = self.compute_dtype == "bfloat16"
        dt = jnp.bfloat16 if bf16 else jnp.float32
        # activations stay in the compute dtype end-to-end: at L0 the
        # elementwise mask/BN/relu chains are HBM-bound, so bf16 halves the
        # dominant traffic (MXU accumulation is f32 internally either way)
        pe = jnp.bfloat16 if bf16 else jnp.float32
        xc = x.astype(dt)

        if rows:
            # (N, C>=cin) point rows through the 1x1 head
            assert k == 1
            out = jax.lax.dot_general(
                xc[:, :self.in_channels],
                w.astype(dt).reshape(self.in_channels, self.out_channels),
                (((1,), (0,)), ((), ())),
                preferred_element_type=pe,
            )
            return out + b if b is not None else out

        if (tiles is not None and self.conv_impl != "xla"
                and self.stride == 1 and not self.transpose):
            from canonicalvoting_tpu.ops.pallas.tiled_conv import (
                fold_dydz, tiled_conv3d)

            assert b is None, "fused tiled conv folds bias via scale/bias"
            ts, group = ts_group
            if prefold and prefolded_input:
                # the caller already holds fold_dydz's output (the fold is
                # weight-independent, so multi-model evals hoist it out of
                # the per-category scan via shared_scene_grids)
                xin = xc[0]
            elif prefold:
                # (dy, dz) taps folded into lanes by an XLA pass; the
                # kernel then runs pointwise windows (only dx expands)
                xin = fold_dydz(xc[0, ..., :self.in_channels], k)
            else:
                xin = pad_lanes(xc[0], _lanes(self.in_channels))
            res = None
            if residual is not None:
                res = residual[0].astype(dt)
                if res_w is None:
                    res = pad_lanes(res, _lanes(self.out_channels))
            # tiles: a plain (T, 3) array, or a z-run decomposition
            # [(R, group, chunks), ...] (data.dense_prep.level_tile_runs) —
            # one pallas_call per run length, chained through a donated
            # output buffer; occ then carries the per-R pack list
            if isinstance(tiles, (list, tuple)):
                run_list = tiles
                occ_list = occ if occ is not None else [None] * len(run_list)
            else:
                run_list = [(1, group, tiles)]
                occ_list = [occ]
            # grid-buffer reuse: a DEAD same-shape grid seeds the donated
            # output (pallas input_output_aliasing), skipping the ~3 ms
            # full-grid zero fill at L0. Safe because (a) the kernel fully
            # overwrites every covered tile and the donor (a producer over
            # the SAME tile list) is zero elsewhere, and (b) XLA's
            # copy-insertion protects any liveness mistake. When the donor
            # IS the residual (res_in_place), the kernel reads each tile's
            # residual from the aliased out buffer before overwriting it,
            # so the grid has a single use and aliasing is copy-free.
            # Shape/dtype mismatches fall back to fresh zeros.
            outbuf = None
            res_ip = False
            if _os.environ.get("CV_NO_DONATE"):
                donate = None
            if donate is not None:
                cand = donate[0] if donate.ndim == 5 else donate
                if (cand.shape == xin.shape[:3]
                        + (_lanes(self.out_channels),)
                        and cand.dtype == dt):
                    outbuf = cand
                    if residual is not None and donate is residual:
                        res_ip = True
                        res = None
            for (R, Gr, t), occ_c in zip(run_list, occ_list):
                outbuf = tiled_conv3d(
                    xin, w.astype(dt), t, kernel_size=k,
                    scale=scale, bias=bias, occ=occ_c, residual=res,
                    res_w=res_w, res_scale=res_scale, res_bias=res_bias,
                    res_in_place=res_ip,
                    relu_out=relu_out, tile_shape=ts, group=Gr, zrun=R,
                    out=outbuf, prefolded=prefold, replicated=replicated,
                    interpret=(self.conv_impl == "tiled_interpret"),
                )
            return outbuf[None]
        assert scale is None and occ is None and residual is None \
            and not relu_out, "epilogue fusion requires the tiled path"
        if k == 1:
            out = jax.lax.dot_general(
                xc.reshape(-1, xc.shape[-1])[:, :self.in_channels],
                w.astype(dt).reshape(self.in_channels, self.out_channels),
                (((1,), (0,)), ((), ())),
                preferred_element_type=pe,
            ).reshape(x.shape[:-1] + (self.out_channels,))
        else:
            wk = _to_dense_kernel(w, k).astype(dt)
            # inputs may carry zero lane padding: pad kernel rows to match
            wk = jnp.pad(wk, ((0, 0),) * 3
                         + ((0, xc.shape[-1] - self.in_channels), (0, 0)))
            if self.transpose:
                # margined-in -> margined-out transposed conv as a dilated
                # conv: out[o] = sum_d W[flip(d)] in[(o - d + lo) / s] with
                # negative padding 1 - margin trimming the dilated borders;
                # margin outputs read only zero margins => stay zero
                assert k == 2 and self.stride == 2
                out = jax.lax.conv_general_dilated(
                    xc, wk[::-1, ::-1, ::-1],
                    window_strides=(1, 1, 1),
                    padding=((1 - MX, 1 - MX), (1 - MY, 1 - MY),
                             (1 - MZ, 1 - MZ)),
                    lhs_dilation=(2, 2, 2),
                    dimension_numbers=_DN,
                    preferred_element_type=pe,
                )
            elif self.stride > 1:
                # margined-in -> margined-out strided conv: pad by the
                # margin so out interior o maps to input start s*(o-M)+M
                assert k == 2 and self.stride == 2
                out = jax.lax.conv_general_dilated(
                    xc, wk, (2, 2, 2),
                    [(MX, MX), (MY, MY), (MZ, MZ)],
                    dimension_numbers=_DN,
                    preferred_element_type=pe,
                )
            else:
                out = jax.lax.conv_general_dilated(
                    xc, wk, (1, 1, 1), [(k // 2, k // 2)] * 3,
                    dimension_numbers=_DN,
                    preferred_element_type=pe,
                )
        if b is not None:
            out = out + b
        return out


class DenseBasicBlock(nn.Module):
    expansion = 1
    in_channels: int
    planes: int
    compute_dtype: str = "bfloat16"
    bn_axis: str = ""
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, occ, train: bool, momentum=0.1, tiles=None,
                 ts_group=None, occp=None, occe=None, block_group=None,
                 in_perm=None, c1_buf=None):
        conv1 = DenseConv(self.in_channels, self.planes, 3,
                          compute_dtype=self.compute_dtype,
                          conv_impl=self.conv_impl, name="conv1")
        norm1 = DenseBatchNorm(self.planes, axis_name=self.bn_axis,
                               name="norm1")
        conv2 = DenseConv(self.planes, self.planes, 3,
                          compute_dtype=self.compute_dtype,
                          conv_impl=self.conv_impl, name="conv2")
        norm2 = DenseBatchNorm(self.planes, axis_name=self.bn_axis,
                               name="norm2")
        downsample = self.in_channels != self.planes
        if downsample:
            ds_conv = DenseConv(self.in_channels, self.planes, 1,
                                compute_dtype=self.compute_dtype,
                                name="downsample_conv")
            ds_norm = DenseBatchNorm(self.planes, axis_name=self.bn_axis,
                                     name="downsample_norm")

        fused = (tiles is not None and occp is not None and not train
                 and self.conv_impl != "xla")
        assert in_perm is None or fused, \
            "permuted-input layout only occurs on the fused tiled path"
        if fused:
            a1, b1 = norm1(None, None, False, return_affine=True)
            a2, b2 = norm2(None, None, False, return_affine=True)
            wds = ars = brs = None
            if downsample:
                wds = ds_conv(None, return_kernel=True,
                              in_perm=in_perm)  # (1, Cin, planes)
                wds = wds.reshape(self.in_channels, self.planes)
                ars, brs = ds_norm(None, None, False, return_affine=True)
            use_block = False  # measured 2.2x slower than two-conv at L0
            if use_block and occe is not None and block_group is not None:
                # whole block in ONE kernel: 1 in + 1 out DMA per tile
                # instead of the two-conv path's 5 (see tiled_block3d)
                from canonicalvoting_tpu.ops.pallas.tiled_conv import (
                    tiled_block3d)

                dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" \
                    else jnp.float32
                w1 = conv1(None, return_kernel=True).astype(dt)
                w2 = conv2(None, return_kernel=True).astype(dt)
                xin = pad_lanes(x[0].astype(dt), _lanes(self.in_channels))
                return tiled_block3d(
                    xin, w1, w2, tiles,
                    scale1=a1, bias1=b1, scale2=a2, bias2=b2, occ_e=occe,
                    res_w=None if wds is None else wds.astype(dt),
                    res_scale=ars, res_bias=brs,
                    tile_shape=ts_group[0], group=block_group,
                    interpret=(self.conv_impl == "tiled_interpret"),
                )[None]
            # two-conv fused path: BN folded to per-channel affine +
            # occupancy mask + (1x1-downsampled) residual add + relu in
            # the conv kernels' epilogues. Buffer reuse: conv1 writes into
            # the previous block's conv1 grid (dead once that block's
            # conv2 read it; threaded via the c1_buf slot), conv2 into its
            # residual x (same-region read-before-write in the kernel, and
            # x is dead after this block in every stack).
            d1 = c1_buf[0] if c1_buf else None
            out = conv1(x, tiles, ts_group, scale=a1, bias=b1, occ=occp,
                        relu_out=True, in_perm=in_perm, donate=d1)
            if c1_buf is not None:
                c1_buf[0] = out
            if downsample:
                return conv2(out, tiles, ts_group, scale=a2, bias=b2,
                             occ=occp, residual=x,
                             res_w=wds, res_scale=ars, res_bias=brs,
                             relu_out=True, donate=x)
            return conv2(out, tiles, ts_group, scale=a2, bias=b2, occ=occp,
                         residual=x, relu_out=True, donate=x)

        def residual():
            if downsample:
                res = ds_conv(x)
                return ds_norm(res, occ, train, momentum)
            return x[..., :self.planes]

        def trim(o):
            # the tiled kernel returns 128-multiple lanes; the explicit
            # mask/BN path operates on real channels
            return o[..., :self.planes] if o.shape[-1] != self.planes else o

        # occ is f32; cast the mask to the activation dtype — a bare
        # multiply promotes the whole train-path activation chain to f32,
        # which doubles the backward's saved-activation memory (measured
        # 46 GB at ScanNet scale, RESULTS_r5.md)
        out = trim(conv1(x, tiles, ts_group))
        out = out * occ[..., None].astype(out.dtype)
        out = norm1(out, occ, train, momentum)
        out = nn.relu(out)
        out = trim(conv2(out, tiles, ts_group))
        out = out * occ[..., None].astype(out.dtype)
        out = norm2(out, occ, train, momentum)
        return nn.relu(out + residual())


class DenseBottleneck(nn.Module):
    expansion = 4
    in_channels: int
    planes: int
    compute_dtype: str = "bfloat16"
    bn_axis: str = ""
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, occ, train: bool, momentum=0.1, tiles=None,
                 ts_group=None, occp=None):
        e = self.expansion
        fused = (tiles is not None and occp is not None and not train
                 and self.conv_impl != "xla")

        def trim(o, c):
            return o[..., :c] if o.shape[-1] != c else o

        out = DenseConv(self.in_channels, self.planes, 1,
                        compute_dtype=self.compute_dtype, name="conv1")(x)
        out = DenseBatchNorm(self.planes, axis_name=self.bn_axis,
                             name="norm1")(out, occ, train, momentum)
        out = nn.relu(out)
        conv2 = DenseConv(self.planes, self.planes, 3,
                          compute_dtype=self.compute_dtype,
                          conv_impl=self.conv_impl, name="conv2")
        norm2 = DenseBatchNorm(self.planes, axis_name=self.bn_axis,
                               name="norm2")
        if fused:
            a2, b2 = norm2(None, None, False, return_affine=True)
            out = conv2(out, tiles, ts_group, scale=a2, bias=b2, occ=occp,
                        relu_out=True)
            out = trim(out, self.planes)
        else:
            out = trim(conv2(out, tiles, ts_group), self.planes)
            out = out * occ[..., None].astype(out.dtype)
            out = norm2(out, occ, train, momentum)
            out = nn.relu(out)
        out = DenseConv(self.planes, self.planes * e, 1,
                        compute_dtype=self.compute_dtype, name="conv3")(out)
        out = DenseBatchNorm(self.planes * e, axis_name=self.bn_axis,
                             name="norm3")(out, occ, train, momentum)
        if self.in_channels != self.planes * e:
            res = DenseConv(self.in_channels, self.planes * e, 1,
                            compute_dtype=self.compute_dtype,
                            name="downsample_conv")(x)
            res = DenseBatchNorm(self.planes * e, axis_name=self.bn_axis,
                                 name="downsample_norm")(res, occ, train,
                                                         momentum)
        else:
            res = x[..., :self.planes * e]
        return nn.relu(out + res)


_DENSE_BLOCKS = {"basic": DenseBasicBlock, "bottleneck": DenseBottleneck}



def build_occ_packs(occ_levels, tiles, tsg, tile_runs=None, block="basic",
                    xp=jnp):
    """Packed per-tile occupancy for every tiled kernel, keyed like `tiles`.

    occ_levels: margined (X, Y, Z) {0,1} occupancy arrays per stride level
    (numpy or jax — `xp` selects the backend). Returns a dict with
    "occp" (conv/stem group or plain packs), "occp_up" (tiled_up2
    parity-major), "occp_up2" (tiled_up2_into DMA pack, CV_UP2V2 only) and
    "conv_occ" (z-run pack lists). Computable on the HOST during scene
    prep (the in-graph pack transposes cost ~7 ms/scene on TPU); the
    device path calls it with xp=jnp as a fallback.
    """
    import os as _os

    from canonicalvoting_tpu.data.dense_prep import (
        CONV_KEY_OFF, STEM_KEY, TRANS_KEYS, TRANS_LEVEL)
    from canonicalvoting_tpu.ops.pallas.tiled_conv import (
        pack_occ, pack_occ_group, pack_occ_parity, pack_occ_updma)

    occp = {}
    occp_up = {}
    occp_up2 = {}
    conv_occ = {}
    up_keys = {TRANS_KEYS[k] for k in TRANS_KEYS if k[0] == "up"}
    # v2 up kernel (tiled_up2_into, in-place [skip|conv] concat): wins in
    # isolation (21.5 -> 17.8 ms at up0, bench_up2v2.py) but LOSES ~100 ms
    # e2e (3.55 vs 5.53 scenes/s) — the donated skip grid defeats XLA's
    # buffer reuse in the full graph and its consumers pay trace-time row
    # permutes. Opt-in via CV_UP2V2=1; default is the old tiled_up2.
    v2_keys = set()
    if block == "basic" and _os.environ.get("CV_UP2V2"):
        v2_keys = {TRANS_KEYS.get(("up", 0), 0), 1} & set(tiles)
    for key, t in tiles.items():
        # STEM_KEY (-1) packs L0 occupancy; TRANS keys (-2..) pack their
        # TRANS_LEVEL; conv keys (CONV_KEY_OFF + lvl) use the group-major
        # pack, which legalizes sub-128-cell tiles
        if key >= CONV_KEY_OFF:
            lvl = key - CONV_KEY_OFF
        elif key in TRANS_LEVEL:
            lvl = TRANS_LEVEL[key]
        else:
            lvl = max(key, 0)
        ts, g = tsg[key]
        if key in v2_keys and ts[2] % 16 == 0:
            occp_up2[key] = pack_occ_updma(occ_levels[lvl], t, ts, g, xp=xp)
            if key < 0:
                continue  # dedicated v2 list serves nothing else
        if key >= CONV_KEY_OFF or key == STEM_KEY:
            # group-major pack legalizes sub-128-cell tiles (the fine conv
            # plans and the (4, 2, 8) stem plan)
            occp[key] = pack_occ_group(occ_levels[lvl], t, ts, group=g,
                                       xp=xp)
            continue
        if key in up_keys:  # old tiled_up2 parity-major pack
            occp_up[key] = pack_occ_parity(occ_levels[lvl], t, ts, xp=xp)
            continue
        occp[key] = pack_occ(occ_levels[lvl], t, ts, xp=xp)
        if key >= 1 and key not in v2_keys and ts[2] % 16 == 0:
            # usable by the old tiled_up2 (L2/L3 decoder ups)
            occp_up[key] = pack_occ_parity(occ_levels[lvl], t, ts, xp=xp)
        # the fused block kernel's expanded pack is intentionally absent:
        # the block kernel measured slower than the two-conv path
        # (benchmarks/bench_block.py) and is disabled
    for key, lst in (tile_runs or {}).items():
        if key not in tiles:
            continue
        lvl = max(key, 0)
        conv_occ[key] = [
            pack_occ(occ_levels[lvl], t, tsg[key][0], zrun=R, xp=xp)
            for (R, _G, t) in lst
        ]
    return {"occp": occp, "occp_up": occp_up, "occp_up2": occp_up2,
            "conv_occ": conv_occ}


def shared_scene_grids(feats, flat_idx, valid, grid_dims, *, in_channels,
                       stem_kernel=5, compute_dtype="bfloat16",
                       stem_impl="tiled"):
    """Scene-shared device prep for MULTI-MODEL evaluation over one scene
    (eval/separate.py): the input scatter grid and the occupancy pyramid
    depend only on the scene, not on model weights, so the 9-category scan
    computes them ONCE here and passes them to every ``DenseMinkUNet``
    apply via ``shared=`` (the reference instead re-enters the full
    per-model pipeline 9x, eval_separate.py:165-186).

    Returns {"x": scatter grid (1, Xm, Ym, Zm, C), "occ": pyramid list};
    with stem_impl == "prefold" additionally "x_folded", the fold_dydz
    output — the stem fold is weight-INDEPENDENT, so folding once here
    turns every category's k=5 stem into a pointwise tiled conv (the
    in-kernel 25-tap fold was the tiled stem's dominant cost and would
    otherwise repeat 9x inside the scan).
    Layout matches what __call__ builds internally (replicated stem lanes
    when stem_impl == "tiled" and the k^2 tap blocks fit 128 lanes).
    """
    dx, dy, dz = grid_dims
    dxm, dym, dzm = dx + 2 * MX, dy + 2 * MY, dz + 2 * MZ
    n_cells = dxm * dym * dzm
    in_dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    vmask = (valid > 0)
    safe_idx = jnp.where(
        vmask, flat_idx,
        n_cells + jnp.arange(flat_idx.shape[0], dtype=flat_idx.dtype))
    frows = jnp.where(vmask[:, None], feats, 0.0)
    stem_tiled = stem_impl in ("tiled", "prefold")
    stem_prefold = stem_impl == "prefold"
    scat_c = _lanes(in_channels) if (stem_tiled and not stem_prefold) \
        else in_channels
    ksq = stem_kernel * stem_kernel
    stem_rep = (stem_tiled and not stem_prefold
                and ksq * in_channels <= scat_c)
    scat_rows = frows.astype(in_dt)
    if stem_rep:
        scat_rows = jnp.tile(scat_rows, (1, ksq))
    dense = jnp.zeros((n_cells, scat_c), in_dt)
    dense = dense.at[safe_idx].set(
        pad_lanes(scat_rows, scat_c), mode="drop",
        unique_indices=True, indices_are_sorted=True)
    occ0_flat = jnp.zeros((n_cells,), jnp.float32).at[safe_idx].set(
        1.0, mode="drop", unique_indices=True, indices_are_sorted=True)
    x = dense.reshape(1, dxm, dym, dzm, scat_c)
    occ = [occ0_flat.reshape(1, dxm, dym, dzm)]
    for _ in range(4):
        o = occ[-1][:, MX:-MX, MY:-MY, MZ:-MZ]
        o = jax.lax.reduce_window(
            o, -jnp.inf, jax.lax.max, (1, 2, 2, 2), (1, 2, 2, 2), "VALID")
        occ.append(jnp.pad(o, ((0, 0), (MX, MX), (MY, MY), (MZ, MZ))))
    shared = {"x": x, "occ": occ}
    if stem_prefold:
        from canonicalvoting_tpu.ops.pallas.tiled_conv import fold_dydz

        shared["x_folded"] = fold_dydz(x[0], stem_kernel)
    return shared


def fresh_l0_donors(grid_dims, compute_dtype="bfloat16"):
    """Two zeroed L0-shaped (1, Xm, Ym, Zm, 128) grids to seed the scan
    carry of a multi-model eval: iteration c's stem and up-into-L0 kernels
    write into iteration c-1's dead grids (returned by __call__ when
    ``donors`` is passed), so only these two zero fills run per SCENE
    instead of two per CATEGORY. Valid because every tile list covers every
    occupied cell and every kernel epilogue masks by occupancy, so any
    retired grid is zero outside any kernel's covered tiles."""
    dx, dy, dz = grid_dims
    shape = (1, dx + 2 * MX, dy + 2 * MY, dz + 2 * MZ, 128)
    dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    return (jnp.zeros(shape, dt), jnp.zeros(shape, dt))


class DenseMinkUNet(nn.Module):
    """Dense-execution twin of models.minkunet.MinkUNetBase.

    Inputs: ``feats`` (N, Cin) point rows + ``flat_idx`` (N,) int32 MARGINED
    cell ids into the L0 grid (data.dense_prep.dense_flat_ids) + ``valid``
    (N,) mask + static ``grid_dims`` (X, Y, Z) INTERIOR dims with every dim
    a multiple of 16. Returns (N, Cout) rows at the same point order
    (gathered back from the dense grid).

    ``shared=`` (from ``shared_scene_grids``) skips the in-graph scatter +
    occupancy build; ``donors=`` (a pair of dead L0 grids, see
    ``fresh_l0_donors``) seeds the stem and up-into-L0 outputs and makes
    __call__ return ``(rows, new_donors)`` — both are the multi-model-scan
    fast path used by eval/separate.py.
    """

    in_channels: int
    out_channels: int
    block: str = "basic"
    layers: Tuple[int, ...] = (2, 3, 4, 6, 2, 2, 2, 2)
    planes: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    init_dim: int = 32
    stem_kernel: int = 5
    compute_dtype: str = "bfloat16"
    bn_axis: str = ""
    # "xla" or "tiled": stride-1 convs via the Pallas occupied-tile kernel
    # when per-level tiles are passed to __call__
    conv_impl: str = "xla"
    # the k=5 stem: "tiled" (Pallas compact fold on STEM_TILE_PLAN tiles)
    # or "xla" (dense conv)
    stem_impl: str = "tiled"
    # rematerialize each residual block in the TRAIN backward pass
    # (jax.checkpoint via nn.remat): the XLA dense backward at ScanNet
    # scale otherwise stores every conv activation grid (measured 129.7 GB
    # wanted vs 15.75 GB HBM at batch 3 — RESULTS_r5.md); with per-block
    # remat only block inputs are stored and internals recompute
    remat: bool = False

    def _blocks(self, name, x, occ, in_ch, planes, n_blocks, train, mom,
                tiles=None, ts_group=None, occp=None, occe=None,
                block_group=None, in_perm=None,
                donate_first=None, return_c1=False):
        blk = _DENSE_BLOCKS[self.block]
        exp = blk.expansion
        ch = in_ch
        kw = {}
        if blk is DenseBasicBlock:
            kw = dict(occe=occe, block_group=block_group)
        # seed the conv1-reuse slot with a DEAD same-shape grid from the
        # caller (e.g. the up's consumed skip) so even the stack's first
        # conv1 skips its full-grid zero fill
        c1_buf = [donate_first]
        use_remat = self.remat and train

        def call_rematted(mdl, x, occ, mom):
            # train path: no tile/occ-pack kwargs; `train` baked via closure
            return mdl(x, occ, True, mom)

        for j in range(n_blocks):
            if blk is DenseBasicBlock:
                # only the group's first block sees the up kernel's
                # [skip|conv] concat layout
                kw["in_perm"] = in_perm if j == 0 else None
                # conv1 buffer reuse across the stack (see DenseBasicBlock)
                kw["c1_buf"] = c1_buf
            mdl = blk(ch, planes, compute_dtype=self.compute_dtype,
                      bn_axis=self.bn_axis, conv_impl=self.conv_impl,
                      name=f"{name}_{j}")
            if use_remat:
                x = nn.remat(call_rematted)(mdl, x, occ, mom)
            else:
                x = mdl(x, occ, train, mom, tiles=tiles, ts_group=ts_group,
                        occp=occp, **kw)
            ch = planes * exp
        assert not isinstance(x, tuple)
        if return_c1:
            return x, ch, c1_buf[0]
        return x, ch

    @nn.compact
    def __call__(self, feats, flat_idx, valid, grid_dims: Tuple[int, int, int],
                 train: bool = False, bn_momentum=0.1, tiles=None,
                 n_scenes: int = 1, tile_runs=None,
                 occ_packs=None, shared=None, donors=None):
        from canonicalvoting_tpu.data.dense_prep import (
            CONV_KEY_OFF, CONV_TILE_PLAN, STEM_KEY, STEM_TILE_PLAN,
            TILE_PLAN, TRANS_KEYS, TRANS_LEVEL, TRANS_TILE_PLAN)

        tiles = tiles or {}
        dx, dy, dz = grid_dims
        assert dx % 16 == 0 and dy % 16 == 0 and dz % 16 == 0
        dxm, dym, dzm = dx + 2 * MX, dy + 2 * MY, dz + 2 * MZ
        mom = bn_momentum
        dt = self.compute_dtype
        pl_ = self.planes
        ly = self.layers
        exp = _DENSE_BLOCKS[self.block].expansion
        tiled = bool(tiles) and self.conv_impl != "xla" and not train
        assert not (tiled and n_scenes != 1), \
            "the tiled path is single-scene; batched grids use the XLA path"

        def _plan(key):
            if key == STEM_KEY:
                return STEM_TILE_PLAN
            if key in TRANS_TILE_PLAN:
                return TRANS_TILE_PLAN[key]
            if key >= CONV_KEY_OFF:
                return CONV_TILE_PLAN[key - CONV_KEY_OFF]
            return TILE_PLAN[key]

        tsg = {key: _plan(key) for key in tiles}

        # with n_scenes > 1, flat_idx must already carry the per-scene
        # offset s * n_cells into the stacked (B * n_cells) id space
        # (data.dense_prep.dense_flat_ids_batched)
        B = n_scenes
        n_cells = dxm * dym * dzm
        vmask = (valid > 0)
        # invalid rows get DISTINCT out-of-range ids (dropped by the
        # scatter) so the unique_indices fast-path hint below stays
        # honest even across the padded tail
        safe_idx = jnp.where(
            vmask, flat_idx,
            B * n_cells + jnp.arange(flat_idx.shape[0], dtype=flat_idx.dtype))
        frows = jnp.where(vmask[:, None], feats, 0.0)
        in_dt = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
        stem_tiled = (self.stem_impl in ("tiled", "prefold") and tiled
                      and STEM_KEY in tiles)
        stem_prefold = stem_tiled and self.stem_impl == "prefold"
        # tiled (compact-fold) stem: scatter straight into the 128-lane
        # grid the DMA wants (padding a (..., 3) grid afterwards would be a
        # 2 GB copy). The prefold stem instead scatters into the COMPACT
        # (..., Cin) grid and fold_dydz builds the 128-lane folded grid —
        # no 128-lane zero-init and 42x fewer stem window bytes.
        scat_c = _lanes(self.in_channels) \
            if (stem_tiled and not stem_prefold) else self.in_channels
        # replicated stem lanes: when the k^2 (dz, dy) tap blocks fit one
        # 128-lane operand, store each cell's Cin channels at EVERY tap
        # offset (scatter rows are 128-lane either way) — the stem fold's
        # 25 lane-block stores then become rotation-free masked moves
        # (tiled_conv3d replicated=True), which were its dominant cost
        ksq = self.stem_kernel * self.stem_kernel
        stem_rep = (stem_tiled and not stem_prefold
                    and ksq * self.in_channels <= scat_c)
        assert donors is None or (tiled and stem_tiled and B == 1), \
            "donor threading is a tiled single-scene eval optimization"
        if shared is not None:
            # multi-model scan: the scatter grid + occupancy pyramid were
            # built ONCE by shared_scene_grids; they outlive this apply, so
            # the scatter grid cannot be donated to a decoder kernel
            assert B == 1
            x = shared["x"]
            assert x.shape[-1] == scat_c
            occ = shared["occ"]
            scat_donor = None
        else:
            scat_rows = frows.astype(in_dt)
            if stem_rep:
                scat_rows = jnp.tile(scat_rows, (1, ksq))
            dense = jnp.zeros((B * n_cells, scat_c), in_dt)
            # voxel ids are unique (sparse_quantize dedups via np.unique)
            # and ascending (np.unique sorts; flat ids are monotone in
            # (x, y, z)), with invalid rows parked at the out-of-range
            # sentinel B*n_cells at the tail — both scatter fast-path hints
            # hold. Without them the scatter lowers to the generic
            # ~30 ns/row path (~4.6 ms).
            sorted_hint = B == 1  # multi-scene concat breaks global order
            dense = dense.at[safe_idx].set(
                pad_lanes(scat_rows, scat_c), mode="drop",
                unique_indices=True, indices_are_sorted=sorted_hint)
            occ0_flat = jnp.zeros((B * n_cells,), jnp.float32).at[
                safe_idx].set(
                1.0, mode="drop", unique_indices=True,
                indices_are_sorted=sorted_hint,
            )
            x = dense.reshape(B, dxm, dym, dzm, scat_c)
            # the scatter grid dies after the stem reads it, and — being
            # zero everywhere outside occupied cells — it is a valid
            # donated output for a later L0-grid-producing kernel (skips
            # one ~3 ms full-grid zero fill); claimed by the decoder's
            # up-into-L0 below
            scat_donor = x if (stem_tiled and not stem_prefold
                               and scat_c == 128) else None
            # margined occupancy pyramid as (1, X, Y, Z) — a trailing
            # size-1 channel dim would be lane-padded 128x physically;
            # broadcasts at the use sites fuse and never materialize
            occ = [occ0_flat.reshape(B, dxm, dym, dzm)]
            for _ in range(4):
                o = occ[-1][:, MX:-MX, MY:-MY, MZ:-MZ]
                o = jax.lax.reduce_window(
                    o, -jnp.inf, jax.lax.max, (1, 2, 2, 2), (1, 2, 2, 2),
                    "VALID")
                occ.append(jnp.pad(
                    o, ((0, 0), (MX, MX), (MY, MY), (MZ, MZ))))
        # per-tile packed occupancy for the fused tiled-conv epilogue;
        # the up kernel needs a parity-major pack of the same lists, the
        # fused block kernel a one-cell-expanded pack
        from canonicalvoting_tpu.data.dense_prep import BLOCK_GROUP

        occp_e = {}
        conv_tiles = {}   # k=3 conv tile source: z-run lists when available
        if tiled:
            for key, lst in (tile_runs or {}).items():
                if key in tiles:
                    conv_tiles[key] = lst
            if occ_packs is None:
                # device-side packing (CPU/interpret paths and tests);
                # serving pipelines precompute these on the HOST instead
                # (eval.pipeline.prepare_scene_args) — the in-graph pack
                # transposes cost ~7 ms/scene on TPU
                occ_packs = build_occ_packs(
                    [o[0] for o in occ], tiles, tsg, tile_runs=tile_runs,
                    block=self.block)
            occp = occ_packs["occp"]
            occp_up = occ_packs["occp_up"]
            occp_up2 = occ_packs["occp_up2"]
            conv_occ = occ_packs["conv_occ"]
        else:
            occp, occp_up, occp_up2, conv_occ = {}, {}, {}, {}

        def conv_sel(lvl):
            """(tiles, (ts, group), occ) for a level's k=3 block convs:
            the fine CONV_TILE_PLAN list when present, else z-run lists,
            else the level-transition list."""
            ck = CONV_KEY_OFF + lvl
            if ck in tiles:
                return tiles[ck], tsg[ck], occp[ck]
            if lvl in conv_tiles:
                return conv_tiles[lvl], tsg.get(lvl), conv_occ[lvl]
            return tiles.get(lvl), tsg.get(lvl), occp.get(lvl)

        # --- stem
        stem = DenseConv(self.in_channels, self.init_dim, self.stem_kernel,
                         compute_dtype=dt, conv_impl=self.conv_impl,
                         name="conv0p1s1")
        bn0 = DenseBatchNorm(self.init_dim, axis_name=self.bn_axis,
                             name="bn0")
        # stem_impl "tiled": the k=5 cin=3 conv through the Pallas kernel's
        # compact fold (the 125 taps fit one 128-lane operand at the real
        # channel stride), on the coarser STEM_TILE_PLAN tiles
        no_donate = bool(_os.environ.get("CV_NO_DONATE"))
        if no_donate:
            scat_donor = None
            donors = None
        if stem_tiled:
            a0, b0 = bn0(None, None, False, return_affine=True)
            stem_in = x
            pre_in = False
            if stem_prefold and shared is not None \
                    and "x_folded" in shared:
                # fold hoisted out of the per-category scan (see
                # shared_scene_grids): the stem runs pointwise on the
                # scene's shared folded grid
                stem_in = shared["x_folded"][None]
                pre_in = True
            out_p1 = stem(stem_in, tiles[STEM_KEY], tsg[STEM_KEY], scale=a0,
                          bias=b0, occ=occp[STEM_KEY], relu_out=True,
                          prefold=stem_prefold, prefolded_input=pre_in,
                          replicated=stem_rep,
                          donate=donors[0] if donors is not None else None)
        else:
            x = stem(x, None)
            x = x * occ[0][..., None].astype(x.dtype)
            x = bn0(x, occ[0], train, mom)
            out_p1 = nn.relu(x)

        # --- encoder
        dt_j = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
        interp = self.conv_impl == "tiled_interpret"
        skips = []
        ch = self.init_dim
        x = out_p1
        for i in range(4):
            dn = DenseConv(ch, ch, 2, stride=2, compute_dtype=dt,
                           name=f"conv{i + 1}p{1 << i}s2")
            bn = DenseBatchNorm(ch, axis_name=self.bn_axis,
                                name=f"bn{i + 1}")
            # down into level i+1 rides its dedicated fine TRANS list when
            # present (round-3 sweep, RESULTS_r3.md), else the level's TILE_PLAN list
            key = TRANS_KEYS.get(("down", i + 1), i + 1)
            if key not in tiles:
                key = i + 1
            if tiled and key in tiles:
                from canonicalvoting_tpu.ops.pallas.tiled_conv import (
                    tiled_down2)

                # fused stride-2 down conv + mask + BN + relu over the
                # coarse level's occupied tiles
                wd = dn(None, return_kernel=True)
                a, b = bn(None, None, False, return_affine=True)
                ts, g = tsg[key]
                x = tiled_down2(
                    pad_lanes(x[0].astype(dt_j), _lanes(ch)),
                    wd.astype(dt_j), tiles[key], scale=a, bias=b,
                    occ=occp[key], relu_out=True, tile_shape=ts, group=g,
                    interpret=interp)[None]
            else:
                x = dn(x)
                x = x * occ[i + 1][..., None].astype(x.dtype)
                x = bn(x, occ[i + 1], train, mom)
                x = nn.relu(x)
                if tiled and (i + 1) in tiles:
                    x = pad_lanes(x, _lanes(ch))
            ct, cts, cocc = conv_sel(i + 1)
            x, ch = self._blocks(
                f"block{i + 1}", x, occ[i + 1], ch, pl_[i], ly[i], train,
                mom, tiles=ct, ts_group=cts, occp=cocc,
                occe=occp_e.get(i + 1),
                block_group=BLOCK_GROUP.get(i + 1))
            skips.append(x)

        # --- decoder
        skip_chs = [self.init_dim] + [pl_[i] * exp for i in range(3)]
        x = skips[3]
        last_c1 = None
        for d in range(4):
            lvl = 3 - d
            up = DenseConv(ch, pl_[4 + d], 2, stride=2, transpose=True,
                           compute_dtype=dt,
                           name=f"convtr{4 + d}p{1 << (lvl + 1)}s2")
            bn = DenseBatchNorm(pl_[4 + d], axis_name=self.bn_axis,
                                name=f"bntr{4 + d}")
            skip = skips[lvl - 1] if lvl >= 1 else out_p1
            # up into L0/L1: tiled_up2_into writes the conv output straight
            # into the DONATED skip grid at lanes [skip_c:] — the concat is
            # free and the result layout is [skip | conv] (the next block's
            # first conv permutes its input rows). L2/L3 concats exceed one
            # 128-lane block and keep the old tiled_up2.
            v2_key = TRANS_KEYS.get(("up", lvl), lvl)
            in_perm = None
            donate_first = None
            up_key = TRANS_KEYS.get(("up", lvl), lvl)
            if up_key not in occp_up:
                up_key = lvl
            if tiled and v2_key in occp_up2:
                from canonicalvoting_tpu.ops.pallas.tiled_conv import (
                    tiled_up2_into)

                wu = up(None, return_kernel=True)
                a, b = bn(None, None, False, return_affine=True)
                ts, g = tsg[v2_key]
                skc = skip_chs[lvl]
                cout_up = pl_[4 + d]
                x = tiled_up2_into(
                    pad_lanes(x[0].astype(dt_j), _lanes(ch)),
                    wu.astype(dt_j), tiles[v2_key],
                    dest=pad_lanes(skip[0].astype(dt_j), 128),
                    skip_c=skc, scale=a, bias=b, occ=occp_up2[v2_key],
                    relu_out=True, tile_shape=ts, group=g,
                    interpret=interp)[None]
                # new lane c holds: skip channel c (c < skc, ref row
                # cout + c) or conv channel c - skc (ref row c - skc)
                in_perm = np.concatenate(
                    [np.arange(cout_up, cout_up + skc), np.arange(cout_up)])
            elif tiled and up_key in occp_up:
                from canonicalvoting_tpu.ops.pallas.tiled_conv import (
                    tiled_up2)

                # fused transposed conv + mask + BN + relu + skip concat
                wu = up(None, return_kernel=True)
                a, b = bn(None, None, False, return_affine=True)
                ts, g = tsg[up_key]
                up_out = None
                if lvl == 0 and not interp and not no_donate:
                    if donors is not None:
                        up_out = donors[1][0]
                    elif scat_donor is not None:
                        up_out = scat_donor[0]
                x = tiled_up2(
                    pad_lanes(x[0].astype(dt_j), _lanes(ch)),
                    wu.astype(dt_j), tiles[up_key], scale=a, bias=b,
                    occ=occp_up[up_key],
                    skip=pad_lanes(skip[0].astype(dt_j),
                                   _lanes(skip.shape[-1])),
                    skip_c=skip_chs[lvl], relu_out=True, tile_shape=ts,
                    group=g, out=up_out, interpret=interp)[None]
                # the skip grid dies with the up's fused concat read —
                # seed the level's first block conv with it (donated out)
                donate_first = None if no_donate else skip
            else:
                x = up(x)
                x = x * occ[lvl][..., None].astype(x.dtype)
                x = bn(x, occ[lvl], train, mom)
                x = nn.relu(x)
                x = jnp.concatenate([x, skip[..., :skip_chs[lvl]]], axis=-1)
                if tiled and lvl in tiles:
                    x = pad_lanes(x, _lanes(pl_[4 + d] + skip_chs[lvl]))
            ch = pl_[4 + d] + skip_chs[lvl]
            ct, cts, cocc = conv_sel(lvl)
            want_c1 = donors is not None and lvl == 0
            res = self._blocks(
                f"block{5 + d}", x, occ[lvl], ch, pl_[4 + d], ly[4 + d],
                train, mom, tiles=ct, ts_group=cts, occp=cocc,
                occe=occp_e.get(lvl),
                block_group=BLOCK_GROUP.get(lvl), in_perm=in_perm,
                donate_first=donate_first, return_c1=want_c1)
            if want_c1:
                x, ch, last_c1 = res
            else:
                x, ch = res

        # gather the point rows FIRST, then apply the 1x1 head to just those
        # rows — the head on the full grid would be a (n_cells, ch) matmul
        # plus a full-grid write for values 99% of which are discarded
        rows_in = x.reshape(B * n_cells, x.shape[-1])[
            jnp.clip(flat_idx, 0, B * n_cells - 1)]
        out = DenseConv(ch, self.out_channels, 1, use_bias=True,
                        compute_dtype=dt, name="final")(rows_in, rows=True)
        out = jnp.where(vmask[:, None], out.astype(jnp.float32), 0.0)
        if donors is None:
            return out
        # retire two dead L0 grids for the NEXT model in the scan: the last
        # L0 block's conv1 output (dead once its conv2 read it) seeds the
        # stem, and the final L0 grid (dead after the row gather above)
        # seeds the up-into-L0. Zero outside occupied cells by the epilogue
        # occupancy masks, so they are valid donated outputs for ANY tile
        # list covering the occupied set. Fall back to the incoming donors
        # when a branch did not produce a suitable grid.
        d0 = donors[0]
        if last_c1 is not None and last_c1.shape == d0.shape \
                and last_c1.dtype == d0.dtype:
            d0 = last_c1
        d1 = donors[1]
        xg = x
        if xg.shape == d1.shape and xg.dtype == d1.dtype:
            d1 = xg
        return out, (d0, d1)


def DenseMinkUNet34C(in_channels, out_channels, **kw):
    return DenseMinkUNet(
        in_channels=in_channels, out_channels=out_channels, block="basic",
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        planes=(32, 64, 128, 256, 256, 128, 96, 96), **kw,
    )
