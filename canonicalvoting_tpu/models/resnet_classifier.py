"""Sparse ResNet classifier scaffolding.

Equivalent of the reference's ResNetBase demo network
(reference utils/resnet.py:67-172): stem conv (k=5, stride 2), pooling, four
stride-2 residual stages, global pooling, linear head. The reference's final
stride-3 conv5 is realized as a stride-2 stage here (the host coordinate
manager builds power-of-two pyramids; the classifier is demo scaffolding, not
part of the detection pipeline). Includes the toy point-pattern data loader
in the spirit of utils/resnet.py:42-64.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.models.norm import MaskedBatchNorm
from canonicalvoting_tpu.models.resnet import BLOCKS, SparseConv
from canonicalvoting_tpu.ops.coords import (
    PyramidSpec,
    build_nbr_table,
    build_pyramid,
    downsample_coords,
    kernel_offsets,
)
from canonicalvoting_tpu.ops.sparse_conv import masked_global_pool


class SparseResNetClassifier(nn.Module):
    """ResNetBase-style classifier over the sparse-conv engine."""

    in_channels: int
    num_classes: int
    block: str = "basic"
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    planes: Tuple[int, ...] = (64, 128, 256, 512)
    init_dim: int = 64
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, feats, pyramid, train: bool = False, bn_momentum=0.1):
        P = pyramid
        nv = P["nvalid"]
        blk = BLOCKS[self.block]
        exp = blk.expansion

        # stem at L0 -> features at L1 (stride-2 conv, k=5 offsets on L0)
        x = SparseConv(self.in_channels, self.init_dim,
                       P["nbr_stem"].shape[1], compute_dtype=self.compute_dtype,
                       name="conv1")(feats, P["nbr_stem"])
        x = MaskedBatchNorm(self.init_dim, name="bn1")(x, nv[0], train, bn_momentum)
        x = nn.relu(x)

        ch = self.init_dim
        for i, (planes, n_blocks) in enumerate(zip(self.planes, self.layers)):
            # stride-2 transition into level i+1
            x = SparseConv(ch, ch, 8, compute_dtype=self.compute_dtype,
                           name=f"down{i + 1}")(x, P["nbr_down"][i])
            for j in range(n_blocks):
                x = blk(ch if j == 0 else planes * exp, planes,
                        compute_dtype=self.compute_dtype,
                        name=f"layer{i + 1}_{j}")(
                    x, P["nbr_conv"][i + 1], nv[i + 1], train, bn_momentum)
            ch = planes * exp

        pooled = masked_global_pool(x, nv[4], mode="max")
        return nn.Dense(self.num_classes, name="final")(pooled)


def toy_pattern_batch(rng: np.random.RandomState, n_classes: int = 3,
                      n_points: int = 120):
    """Synthetic 2.5D point-pattern fixture (spirit of utils/resnet.py:42-64):
    each class is a distinct planar shape; returns (coords (N,4), feats,
    label)."""
    label = rng.randint(n_classes)
    t = rng.uniform(0, 2 * np.pi, n_points)
    if label == 0:  # ring
        pts = np.stack([np.cos(t), np.sin(t)], -1) * 8
    elif label == 1:  # cross
        a = rng.uniform(-8, 8, n_points)
        pts = np.stack([a, np.where(rng.rand(n_points) > 0.5, a, -a)], -1)
    else:  # bar
        pts = np.stack([rng.uniform(-8, 8, n_points),
                        rng.uniform(-1, 1, n_points)], -1)
    pts = pts + rng.randn(n_points, 2) * 0.3
    coords3 = np.concatenate(
        [np.round(pts).astype(np.int32),
         np.zeros((n_points, 1), np.int32)], -1
    )
    coords = np.concatenate(
        [np.zeros((n_points, 1), np.int32), coords3], -1
    )
    # dedup voxels
    _, idx = np.unique(coords, axis=0, return_index=True)
    coords = coords[np.sort(idx)]
    feats = rng.randn(len(coords), 1).astype(np.float32)
    return coords, feats, label
