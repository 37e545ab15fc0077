"""MinkUNet family in Flax over the TPU sparse-conv engine.

Architecture transcribed from the reference
(/root/reference/utils/minkunet.py:36-249): a 3D sparse U-Net with a
kernel-5 stem, four stride-2 down stages with residual-block stacks, four
transposed-conv up stages with skip concats, and a 1x1 head. Channel plans /
layer counts for every published variant (14/18/34/50/101 x A/B/C/D) are
reproduced below; the detection pipeline uses MinkUNet34C
(reference train_joint.py:218).

The forward takes the host-built coordinate ``pyramid``
(ops/coords.py: neighbor tables + per-level valid counts); every conv is a
gather + one MXU GEMM, every transposed conv reuses the reversed down table,
and skip connections are channel concats at identical coordinate sets
(= ``ME.cat``, reference utils/minkunet.py:153).

Module names mirror the reference attribute names (conv0p1s1, bn0, block1,
convtr4p16s2, ...) so torch checkpoints map 1:1 (see utils/torch_convert.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from canonicalvoting_tpu.models.norm import MaskedBatchNorm
from canonicalvoting_tpu.models.resnet import BLOCKS, SparseConv


class MinkUNetBase(nn.Module):
    in_channels: int
    out_channels: int
    block: str = "basic"
    layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    planes: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    init_dim: int = 32
    stem_kernel: int = 5
    compute_dtype: str = "bfloat16"
    return_endpoints: bool = False
    bn_axis: str = ""
    # rematerialize each residual block in the TRAIN backward: the saved
    # per-conv (N, K*Cin) gather operands otherwise push the ScanNet-scale
    # backward past HBM (19.9 GB at batch 3; RESULTS_r5.md)
    remat: bool = False

    def _blocks(self, name, x, in_ch, planes, n_blocks, nbr, nvalid, train, mom):
        blk = BLOCKS[self.block]
        exp = blk.expansion
        ch = in_ch
        use_remat = self.remat and train

        def call_rematted(mdl, x, nbr, nvalid, mom):
            return mdl(x, nbr, nvalid, True, mom)

        for j in range(n_blocks):
            mdl = blk(ch, planes, compute_dtype=self.compute_dtype,
                      bn_axis=self.bn_axis, name=f"{name}_{j}")
            if use_remat:
                x = nn.remat(call_rematted)(mdl, x, nbr, nvalid, mom)
            else:
                x = mdl(x, nbr, nvalid, train, mom)
            ch = planes * exp
        return x, ch

    @nn.compact
    def __call__(self, feats, pyramid: Dict[str, Any], train: bool = False,
                 bn_momentum=0.1, dense_plans: Dict = None):
        """feats: (N0, in_channels); pyramid: PyramidArrays.as_jax_inputs().

        ``dense_plans``: optional {site: ops.scatter_conv.DensePlan}
        routing selected convs through the scatter->dense-conv->gather MXU
        engine instead of the K-tap row gathers (the train-throughput
        winner at ScanNet scale — RESULTS_r5.md). Sites: "stem",
        ("conv", lvl), ("down", i), ("up", lvl). Unlisted sites keep the
        gather engine; outputs are identical either way.
        """
        P = pyramid
        dp = dense_plans or {}
        nv = P["nvalid"]
        mom = bn_momentum
        dt = self.compute_dtype
        exp = BLOCKS[self.block].expansion
        pl = self.planes
        ly = self.layers
        endpoints = []

        # --- stem (utils/minkunet.py:53-56, forward :123-125)
        stem_nbr = dp.get("stem", P["nbr_stem"])
        x = SparseConv(self.in_channels, self.init_dim,
                       stem_nbr.shape[1], compute_dtype=dt,
                       name="conv0p1s1")(feats, stem_nbr)
        x = MaskedBatchNorm(self.init_dim, axis_name=self.bn_axis,
                            name="bn0")(x, nv[0], train, mom)
        out_p1 = nn.relu(x)

        # --- encoder (:127-146)
        skips = []
        ch = self.init_dim
        x = out_p1
        for i in range(4):
            x_in = x
            x = SparseConv(ch, ch, 8, compute_dtype=dt,
                           name=f"conv{i + 1}p{1 << i}s2")(
                x_in, dp.get(("down", i), P["nbr_down"][i]))
            if self.return_endpoints and i == 3:
                # stride-16 encoder conv output, pre-BN — the FIRST of 34CF's
                # five endpoints (reference utils/minkunet.py:273-274)
                endpoints.append(x)
            x = MaskedBatchNorm(ch, axis_name=self.bn_axis,
                                name=f"bn{i + 1}")(x, nv[i + 1], train, mom)
            x = nn.relu(x)
            x, ch = self._blocks(
                f"block{i + 1}", x, ch, pl[i], ly[i],
                dp.get(("conv", i + 1), P["nbr_conv"][i + 1]), nv[i + 1],
                train, mom)
            skips.append(x)
        # skips: [b1p2 (L1), b2p4 (L2), b3p8 (L3), block4 out (L4)]

        # --- decoder (:149-180)
        skip_chs = [self.init_dim] + [pl[i] * exp for i in range(3)]
        x = skips[3]
        for d in range(4):
            lvl = 3 - d  # output level of this up stage
            x_up = SparseConv(ch, pl[4 + d], 8, compute_dtype=dt,
                              name=f"convtr{4 + d}p{1 << (lvl + 1)}s2")(
                x, dp.get(("up", lvl), P["nbr_up"][lvl]))
            if self.return_endpoints:
                endpoints.append(x_up)
            x_up = MaskedBatchNorm(pl[4 + d], axis_name=self.bn_axis,
                                   name=f"bntr{4 + d}")(
                x_up, nv[lvl], train, mom)
            x_up = nn.relu(x_up)
            skip = skips[lvl - 1] if lvl >= 1 else out_p1
            x = jnp.concatenate([x_up, skip], axis=-1)
            ch = pl[4 + d] + skip_chs[lvl]
            x, ch = self._blocks(
                f"block{5 + d}", x, ch, pl[4 + d], ly[4 + d],
                dp.get(("conv", lvl), P["nbr_conv"][lvl]), nv[lvl], train,
                mom)

        out = SparseConv(ch, self.out_channels, 1, use_bias=True,
                         compute_dtype=dt, name="final")(x, None)
        if self.return_endpoints:
            return endpoints, out
        return out


def _variant(name, block, layers, planes):
    def make(in_channels, out_channels, **kw):
        return MinkUNetBase(
            in_channels=in_channels, out_channels=out_channels,
            block=block, layers=layers, planes=planes, **kw,
        )

    make.__name__ = name
    return make


_L14 = (1, 1, 1, 1, 1, 1, 1, 1)
_L18 = (2, 2, 2, 2, 2, 2, 2, 2)
_L34 = (2, 3, 4, 6, 2, 2, 2, 2)
_L101 = (2, 3, 4, 23, 2, 2, 2, 2)
_P_DEFAULT = (32, 64, 128, 256, 256, 128, 96, 96)

# Variant zoo (reference utils/minkunet.py:183-249)
MinkUNet14 = _variant("MinkUNet14", "basic", _L14, _P_DEFAULT)
MinkUNet18 = _variant("MinkUNet18", "basic", _L18, _P_DEFAULT)
MinkUNet34 = _variant("MinkUNet34", "basic", _L34, _P_DEFAULT)
MinkUNet50 = _variant("MinkUNet50", "bottleneck", _L34, _P_DEFAULT)
MinkUNet101 = _variant("MinkUNet101", "bottleneck", _L101, _P_DEFAULT)

MinkUNet14A = _variant("MinkUNet14A", "basic", _L14, (32, 64, 128, 256, 128, 128, 96, 96))
MinkUNet14B = _variant("MinkUNet14B", "basic", _L14, (32, 64, 128, 256, 128, 128, 128, 128))
MinkUNet14C = _variant("MinkUNet14C", "basic", _L14, (32, 64, 128, 256, 192, 192, 128, 128))
MinkUNet14D = _variant("MinkUNet14D", "basic", _L14, (32, 64, 128, 256, 384, 384, 384, 384))
MinkUNet18A = _variant("MinkUNet18A", "basic", _L18, (32, 64, 128, 256, 128, 128, 96, 96))
MinkUNet18B = _variant("MinkUNet18B", "basic", _L18, (32, 64, 128, 256, 128, 128, 128, 128))
MinkUNet18D = _variant("MinkUNet18D", "basic", _L18, (32, 64, 128, 256, 384, 384, 384, 384))
MinkUNet34A = _variant("MinkUNet34A", "basic", _L34, (32, 64, 128, 256, 256, 128, 64, 64))
MinkUNet34B = _variant("MinkUNet34B", "basic", _L34, (32, 64, 128, 256, 256, 128, 64, 32))
MinkUNet34C = _variant("MinkUNet34C", "basic", _L34, (32, 64, 128, 256, 256, 128, 96, 96))


def MinkUNet34CF(in_channels, out_channels, **kw):
    """34C variant returning decoder endpoints
    (reference utils/minkunet.py:248-315)."""
    return MinkUNetBase(
        in_channels=in_channels, out_channels=out_channels, block="basic",
        layers=_L34, planes=(32, 64, 128, 256, 256, 128, 96, 96),
        return_endpoints=True, **kw,
    )
