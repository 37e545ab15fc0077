"""Sparse (masked) BatchNorm with PyTorch momentum semantics.

Replaces ``ME.MinkowskiBatchNorm`` (reference utils/minkunet.py:56 etc.) —
batch statistics are computed over VALID rows only (padding rows excluded),
running stats follow torch's convention
``running = (1 - momentum) * running + momentum * batch_stat`` with the
unbiased variance in the running update, so the BN-momentum decay schedule of
the reference trainers (train_joint.py:93-125, 224-225) transfers directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """When ``axis_name`` is set (data-parallel training over a vmapped /
    sharded scene axis), batch statistics are synchronized across that axis —
    sync-BN, matching the reference's full-batch statistics even when the
    batch is sharded over devices."""

    features: int
    eps: float = 1e-5
    axis_name: str = ""

    @nn.compact
    def __call__(self, x, nvalid, train: bool, momentum=0.1):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if train:
            idx = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
            mask = (idx < nvalid).astype(x.dtype)
            n = jnp.sum(mask)
            s1 = jnp.sum(x * mask, axis=0)
            s2 = jnp.sum((x * x) * mask, axis=0)
            if self.axis_name:
                n = jax.lax.psum(n, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)  # biased
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * scale + bias
