"""Sparse ResNet blocks over the gather-form implicit GEMM.

Rebuilds MinkowskiEngine's BasicBlock / Bottleneck (used via
reference utils/minkunet.py:30 and utils/resnet.py:118-154) on top of
ops/sparse_conv.py. All convs inside a block are stride 1, so they share one
neighbor table per pyramid level; the 1x1 downsample shortcut is a plain
matmul.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from canonicalvoting_tpu.models.norm import MaskedBatchNorm
from canonicalvoting_tpu.ops.sparse_conv import sparse_conv1x1, sparse_conv_apply


def kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming-normal fan_out on (K, Cin, Cout) kernels
    (reference utils/resnet.py:109-116)."""
    fan_out = shape[0] * shape[2]
    std = (2.0 / fan_out) ** 0.5
    import jax

    return std * jax.random.normal(key, shape, dtype)


class SparseConv(nn.Module):
    """kernel-size-K sparse conv layer (no bias by default, like ME)."""

    in_channels: int
    out_channels: int
    kernel_volume: int
    use_bias: bool = False
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, nbr):
        w = self.param(
            "kernel", kernel_init,
            (self.kernel_volume, self.in_channels, self.out_channels),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) \
            if self.use_bias else None
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        if self.kernel_volume == 1:
            return sparse_conv1x1(x, w, b, compute_dtype=dt)
        from canonicalvoting_tpu.ops.scatter_conv import (
            DensePlan,
            scatter_dense_conv,
        )

        if isinstance(nbr, DensePlan):
            # row-format MXU engine: scatter -> dense conv -> gather
            # (ops/scatter_conv.py) instead of the K-tap row gathers
            return scatter_dense_conv(x, w, b, nbr, compute_dtype=dt)
        return sparse_conv_apply(x, nbr, w, b, compute_dtype=dt)


class BasicBlock(nn.Module):
    """conv3-bn-relu-conv3-bn + shortcut, expansion 1."""

    expansion = 1
    in_channels: int
    planes: int
    compute_dtype: str = "bfloat16"
    bn_axis: str = ""

    @nn.compact
    def __call__(self, x, nbr, nvalid, train: bool, momentum=0.1):
        out = SparseConv(self.in_channels, self.planes, nbr.shape[1],
                         compute_dtype=self.compute_dtype, name="conv1")(x, nbr)
        out = MaskedBatchNorm(self.planes, axis_name=self.bn_axis, name="norm1")(out, nvalid, train, momentum)
        out = nn.relu(out)
        out = SparseConv(self.planes, self.planes, nbr.shape[1],
                         compute_dtype=self.compute_dtype, name="conv2")(out, nbr)
        out = MaskedBatchNorm(self.planes, axis_name=self.bn_axis, name="norm2")(out, nvalid, train, momentum)

        if self.in_channels != self.planes * self.expansion:
            res = SparseConv(self.in_channels, self.planes * self.expansion, 1,
                             compute_dtype=self.compute_dtype,
                             name="downsample_conv")(x, None)
            res = MaskedBatchNorm(self.planes * self.expansion,
                                  axis_name=self.bn_axis,
                                  name="downsample_norm")(res, nvalid, train, momentum)
        else:
            res = x
        return nn.relu(out + res)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 with expansion 4 (MinkUNet50/101)."""

    expansion = 4
    in_channels: int
    planes: int
    compute_dtype: str = "bfloat16"
    bn_axis: str = ""

    @nn.compact
    def __call__(self, x, nbr, nvalid, train: bool, momentum=0.1):
        out = SparseConv(self.in_channels, self.planes, 1,
                         compute_dtype=self.compute_dtype, name="conv1")(x, None)
        out = MaskedBatchNorm(self.planes, axis_name=self.bn_axis, name="norm1")(out, nvalid, train, momentum)
        out = nn.relu(out)
        out = SparseConv(self.planes, self.planes, nbr.shape[1],
                         compute_dtype=self.compute_dtype, name="conv2")(out, nbr)
        out = MaskedBatchNorm(self.planes, axis_name=self.bn_axis, name="norm2")(out, nvalid, train, momentum)
        out = nn.relu(out)
        out = SparseConv(self.planes, self.planes * self.expansion, 1,
                         compute_dtype=self.compute_dtype, name="conv3")(out, None)
        out = MaskedBatchNorm(self.planes * self.expansion, axis_name=self.bn_axis, name="norm3")(
            out, nvalid, train, momentum)

        if self.in_channels != self.planes * self.expansion:
            res = SparseConv(self.in_channels, self.planes * self.expansion, 1,
                             compute_dtype=self.compute_dtype,
                             name="downsample_conv")(x, None)
            res = MaskedBatchNorm(self.planes * self.expansion,
                                  axis_name=self.bn_axis,
                                  name="downsample_norm")(res, nvalid, train, momentum)
        else:
            res = x
        return nn.relu(out + res)


BLOCKS: dict = {"basic": BasicBlock, "bottleneck": Bottleneck}


def block_expansion(block: str) -> int:
    return BLOCKS[block].expansion
