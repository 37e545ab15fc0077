"""Device-side sparse convolution: gather-form implicit GEMM.

The MXU-native replacement for MinkowskiEngine's kernel-map
gather -> GEMM -> scatter (reference backbone ops in utils/minkunet.py).

Given a host-built neighbor table ``nbr (N_out, K)`` (see ops/coords.py),
a sparse convolution is:

    gathered[m, k] = feats[nbr[m, k]]          (0 where nbr[m, k] == -1)
    out[m]         = sum_k gathered[m, k] @ W[k]

which XLA fuses into one gather + one (N_out, K*Cin) x (K*Cin, Cout) matmul —
output-stationary, so the FORWARD pass has no scatter at all. The backward
pass autodiffs to a scatter-add through the gather (standard embedding-grad
pattern) plus the transposed matmul; both map well to TPU.

Compute runs in a configurable dtype (bfloat16 by default) with float32
accumulation on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sparse_conv_apply(
    feats: jnp.ndarray,
    nbr: jnp.ndarray,
    weights: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Apply a sparse convolution.

    Args:
      feats: (N_in, Cin) input features (padding rows must be zero or will be
        masked by the nbr == -1 test anyway).
      nbr: (N_out, K) int32 neighbor table, -1 = missing.
      weights: (K, Cin, Cout).
      bias: optional (Cout,).
      compute_dtype: matmul dtype (accumulation is float32).

    Returns (N_out, Cout) float32.
    """
    n_in = feats.shape[0]
    k, cin, cout = weights.shape
    safe = jnp.clip(nbr, 0, n_in - 1)
    gathered = feats[safe]  # (N_out, K, Cin)
    gathered = jnp.where((nbr >= 0)[..., None], gathered, 0.0)
    out = jax.lax.dot_general(
        gathered.astype(compute_dtype).reshape(-1, k * cin),
        weights.astype(compute_dtype).reshape(k * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out


def sparse_conv1x1(
    feats: jnp.ndarray,
    weights: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """kernel_size=1 convolution == plain dense matmul (no neighbor table)."""
    w = weights.reshape(weights.shape[-2], weights.shape[-1])
    out = jax.lax.dot_general(
        feats.astype(compute_dtype),
        w.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out


def valid_row_mask(n_rows: int, nvalid) -> jnp.ndarray:
    """(n_rows, 1) float mask of real (non-padding) rows."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    return (idx < nvalid).astype(jnp.float32)


def masked_global_pool(feats, nvalid, mode: str = "max"):
    """Global pooling over valid rows (ME.MinkowskiGlobalMaxPooling /
    AvgPooling equivalents, reference utils/resnet.py:90,105)."""
    mask = valid_row_mask(feats.shape[0], nvalid)
    if mode == "max":
        big = jnp.finfo(feats.dtype).min
        return jnp.max(jnp.where(mask > 0, feats, big), axis=0)
    s = jnp.sum(feats * mask, axis=0)
    return s / jnp.maximum(jnp.sum(mask), 1.0)
