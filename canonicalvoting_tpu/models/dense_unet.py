"""Dense-execution MinkUNet: masked dense 3D convolutions on the MXU.

MOTIVATION. The gather-form sparse conv (ops/sparse_conv.py) is bound by
TPU row-gather throughput (~15M rows/s): a ScanNet scene costs ~35M gathered
rows per forward => ~900 ms, with the kernel-5 stem alone ~670 ms. At 3 cm
resolution a scan occupies only ~1-2% of its bounding grid, but XLA's dense
Conv3D runs on the MXU at near-peak: the 50x FLOP overcompute is ~6-9x
CHEAPER than the gathers.

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

from canonicalvoting_tpu.models.norm import MaskedBatchNorm
from canonicalvoting_tpu.models.resnet import BLOCKS, kernel_init

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _to_dense_kernel(w: jnp.ndarray, k: int) -> jnp.ndarray:
    """(K, Cin, Cout) with x-fastest offsets -> (kx, ky, kz, Cin, Cout)."""
    cin, cout = w.shape[1], w.shape[2]
    # offset index = ix + k*iy + k*k*iz  =>  reshape exposes (iz, iy, ix)
    w = w.reshape(k, k, k, cin, cout)  # (iz, iy, ix, ...)
    return jnp.transpose(w, (2, 1, 0, 3, 4))


class DenseBatchNorm(nn.Module):
    """MaskedBatchNorm over occupied cells of a dense (1, X, Y, Z, C) grid.

    Same parameter/stat names as MaskedBatchNorm so variables interchange.
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

    ``conv_impl`` selects the stride-1 odd-k execution path: "xla"
    (lax.conv_general_dilated over the full grid) or "tiled"/
    "tiled_interpret" (the Pallas occupied-tile kernel,
    ops/pallas/tiled_conv.py; requires ``tiles`` at call time). Strided,
    transposed and 1x1 convs always take the XLA path.
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
    def __call__(self, x, tiles=None, scale=None, bias=None, occ=None,
                 residual=None, relu_out: bool = False):
        k = self.kernel_size
        w = self.param(
            "kernel", kernel_init, (k ** 3, self.in_channels, self.out_channels)
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) \
            if self.use_bias else None
        bf16 = self.compute_dtype == "bfloat16"
        dt = jnp.bfloat16 if bf16 else jnp.float32
        # activations stay in the compute dtype end-to-end: at L0 the
        # elementwise mask/BN/relu chains are HBM-bound, so bf16 halves the
        # dominant traffic (MXU accumulation is f32 internally either way)
        pe = jnp.bfloat16 if bf16 else jnp.float32
        xc = x.astype(dt)
        # k=5 (the stem) stays on XLA: 125 unrolled taps overflow scoped
        # VMEM in the Mosaic kernel (40 MB stack vs 16 MB limit)
        if (tiles is not None and self.conv_impl != "xla" and k == 3
                and self.stride == 1 and not self.transpose):
            from canonicalvoting_tpu.ops.pallas.tiled_conv import tiled_conv3d

            assert b is None, "fused tiled conv folds bias via scale/bias"
            out = tiled_conv3d(
                xc[0], w.astype(dt), tiles, kernel_size=k,
                scale=scale, bias=bias, occ=occ,
                residual=None if residual is None else residual[0],
                relu_out=relu_out,
                interpret=(self.conv_impl == "tiled_interpret"),
            )[None]
            return out
        assert scale is None and occ is None and residual is None \
            and not relu_out, "epilogue fusion requires the tiled path"
        if k == 1:
            out = jax.lax.dot_general(
                xc.reshape(-1, self.in_channels),
                w.astype(dt).reshape(self.in_channels, self.out_channels),
                (((1,), (0,)), ((), ())),
                preferred_element_type=pe,
            ).reshape(x.shape[:-1] + (self.out_channels,))
        else:
            wk = _to_dense_kernel(w, k).astype(dt)
            if self.transpose:
                # conv_transpose('VALID') computes out[s*p + d] = K[flip(d)] @
                # in[p]; flip the spatial axes so offset d uses kernel W[d],
                # matching the reversed down-map semantics (ops/coords.py).
                out = jax.lax.conv_transpose(
                    xc, wk[::-1, ::-1, ::-1], (self.stride,) * 3, "VALID",
                    dimension_numbers=_DN,
                    preferred_element_type=pe,
                )
            else:
                if k % 2 == 1:
                    pad = [(k // 2, k // 2)] * 3
                else:
                    pad = [(0, self.stride - 1)] * 3  # offsets {0..k-1}
                out = jax.lax.conv_general_dilated(
                    xc, wk, (self.stride,) * 3, pad,
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
                 occp=None):
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

        fused = (tiles is not None and occp is not None and not train
                 and self.conv_impl != "xla")

        def residual():
            if self.in_channels != self.planes:
                res = DenseConv(self.in_channels, self.planes, 1,
                                compute_dtype=self.compute_dtype,
                                name="downsample_conv")(x)
                res = DenseBatchNorm(self.planes, axis_name=self.bn_axis,
                                     name="downsample_norm")(
                    res, occ, train, momentum)
                return res
            return x

        if fused:
            # inference path: BN folded to per-channel affine + occupancy
            # mask + residual add + relu run in the conv kernels' epilogues
            a1, b1 = norm1(None, None, False, return_affine=True)
            out = conv1(x, tiles, scale=a1, bias=b1, occ=occp, relu_out=True)
            a2, b2 = norm2(None, None, False, return_affine=True)
            return conv2(out, tiles, scale=a2, bias=b2, occ=occp,
                         residual=residual(), relu_out=True)

        out = conv1(x, tiles)
        out = out * occ
        out = norm1(out, occ, train, momentum)
        out = nn.relu(out)
        out = conv2(out, tiles)
        out = out * occ
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
                 occp=None):
        e = self.expansion
        fused = (tiles is not None and occp is not None and not train
                 and self.conv_impl != "xla")
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
            out = conv2(out, tiles, scale=a2, bias=b2, occ=occp,
                        relu_out=True)
        else:
            out = conv2(out, tiles)
            out = out * occ
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
                                 name="downsample_norm")(res, occ, train, momentum)
        else:
            res = x
        return nn.relu(out + res)


_DENSE_BLOCKS = {"basic": DenseBasicBlock, "bottleneck": DenseBottleneck}


class DenseMinkUNet(nn.Module):
    """Dense-execution twin of models.minkunet.MinkUNetBase.

    Inputs: ``feats`` (N, Cin) point rows + ``flat_idx`` (N,) int32 cell ids
    into the L0 grid + ``valid`` (N,) mask + static ``grid_dims`` (X, Y, Z)
    with every dim a multiple of 16. Returns (N, Cout) rows at the same
    point order (gathered back from the dense grid).
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
    # "xla" or "tiled": stride-1 k=3/5 convs via the Pallas occupied-tile
    # kernel when per-level tiles are passed to __call__
    conv_impl: str = "xla"

    def _blocks(self, name, x, occ, in_ch, planes, n_blocks, train, mom,
                tiles=None, occp=None):
        blk = _DENSE_BLOCKS[self.block]
        exp = blk.expansion
        ch = in_ch
        for j in range(n_blocks):
            x = blk(ch, planes, compute_dtype=self.compute_dtype,
                    bn_axis=self.bn_axis, conv_impl=self.conv_impl,
                    name=f"{name}_{j}")(
                x, occ, train, mom, tiles=tiles, occp=occp)
            ch = planes * exp
        return x, ch

    @nn.compact
    def __call__(self, feats, flat_idx, valid, grid_dims: Tuple[int, int, int],
                 train: bool = False, bn_momentum=0.1, tiles=None):
        tiles = tiles or {}
        dx, dy, dz = grid_dims
        assert dx % 16 == 0 and dy % 16 == 0 and dz % 16 == 0
        mom = bn_momentum
        dt = self.compute_dtype
        pl_ = self.planes
        ly = self.layers
        exp = _DENSE_BLOCKS[self.block].expansion

        n_cells = dx * dy * dz
        vmask = (valid > 0)
        safe_idx = jnp.where(vmask, flat_idx, n_cells)
        frows = jnp.where(vmask[:, None], feats, 0.0)
        in_dt = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
        dense = jnp.zeros((n_cells, self.in_channels), in_dt)
        dense = dense.at[safe_idx].set(frows.astype(in_dt), mode="drop")
        occ0_flat = jnp.zeros((n_cells, 1), jnp.float32).at[safe_idx].set(
            1.0, mode="drop"
        )
        x = dense.reshape(1, dx, dy, dz, self.in_channels)
        occ = [occ0_flat.reshape(1, dx, dy, dz, 1)]
        for _ in range(4):
            occ.append(
                nn.max_pool(occ[-1], (2, 2, 2), strides=(2, 2, 2))
            )
        # per-tile packed occupancy for the fused tiled-conv epilogue
        occp = {}
        if not train and self.conv_impl != "xla":
            from canonicalvoting_tpu.ops.pallas.tiled_conv import pack_occ

            for lvl, t in tiles.items():
                occp[lvl] = pack_occ(occ[lvl][0, ..., 0], t)

        # --- stem
        x = DenseConv(self.in_channels, self.init_dim, self.stem_kernel,
                      compute_dtype=dt, conv_impl=self.conv_impl,
                      name="conv0p1s1")(x, tiles.get(0))
        x = x * occ[0]
        x = DenseBatchNorm(self.init_dim, axis_name=self.bn_axis,
                           name="bn0")(x, occ[0], train, mom)
        out_p1 = nn.relu(x)

        # --- encoder
        skips = []
        ch = self.init_dim
        x = out_p1
        for i in range(4):
            x = DenseConv(ch, ch, 2, stride=2, compute_dtype=dt,
                          name=f"conv{i + 1}p{1 << i}s2")(x)
            x = x * occ[i + 1]
            x = DenseBatchNorm(ch, axis_name=self.bn_axis,
                               name=f"bn{i + 1}")(x, occ[i + 1], train, mom)
            x = nn.relu(x)
            x, ch = self._blocks(f"block{i + 1}", x, occ[i + 1], ch, pl_[i],
                                 ly[i], train, mom, tiles=tiles.get(i + 1),
                                 occp=occp.get(i + 1))
            skips.append(x)

        # --- decoder
        skip_chs = [self.init_dim] + [pl_[i] * exp for i in range(3)]
        x = skips[3]
        for d in range(4):
            lvl = 3 - d
            x = DenseConv(ch, pl_[4 + d], 2, stride=2, transpose=True,
                          compute_dtype=dt,
                          name=f"convtr{4 + d}p{1 << (lvl + 1)}s2")(x)
            x = x * occ[lvl]
            x = DenseBatchNorm(pl_[4 + d], axis_name=self.bn_axis,
                               name=f"bntr{4 + d}")(x, occ[lvl], train, mom)
            x = nn.relu(x)
            skip = skips[lvl - 1] if lvl >= 1 else out_p1
            x = jnp.concatenate([x, skip], axis=-1)
            ch = pl_[4 + d] + skip_chs[lvl]
            x, ch = self._blocks(f"block{5 + d}", x, occ[lvl], ch, pl_[4 + d],
                                 ly[4 + d], train, mom, tiles=tiles.get(lvl),
                                 occp=occp.get(lvl))

        # gather the point rows FIRST, then apply the 1x1 head to just those
        # rows — the head on the full grid would be a (n_cells, ch) matmul
        # plus a full-grid write for values 99% of which are discarded
        rows_in = x.reshape(n_cells, ch)[jnp.clip(flat_idx, 0, n_cells - 1)]
        out = DenseConv(ch, self.out_channels, 1, use_bias=True,
                        compute_dtype=dt, name="final")(rows_in)
        return jnp.where(vmask[:, None], out.astype(jnp.float32), 0.0)


def DenseMinkUNet34C(in_channels, out_channels, **kw):
    return DenseMinkUNet(
        in_channels=in_channels, out_channels=out_channels, block="basic",
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        planes=(32, 64, 128, 256, 256, 128, 96, 96), **kw,
    )
