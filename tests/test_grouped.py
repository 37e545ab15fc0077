"""Grouped (lane-packed) multi-category evaluation == per-category models.

The grouped DenseMinkUNet (eval/grouped.py) runs N categories as one net
with block-diagonal kernels; its math must match running each category's
net independently (reference eval_separate.py:165-186 runs them one by
one).  Checked on the XLA dense path (CPU) with random weights AND random
running BN stats, through the full U-Net including skip concats, the
downsample branches, and the 1x1 head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalvoting_tpu.data.dense_prep import (
    dense_flat_ids, dense_grid_geometry)
from canonicalvoting_tpu.eval.grouped import (
    build_grouped_variables, grouped_model_config, slice_group_head)
from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet


def _rand_like(key, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, leaf in zip(keys, leaves):
        v = jax.random.normal(k, leaf.shape, jnp.float32) * 0.3
        out.append(v)
    return jax.tree_util.tree_unflatten(treedef, out)


def _fix_bn_stats(variables, key):
    """Random but VALID running stats (var > 0)."""
    bs = variables.get("batch_stats")
    if bs is None:
        return variables
    def fix(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name == "var":
            return jnp.abs(leaf) + 0.5
        return leaf
    bs = jax.tree_util.tree_map_with_path(fix, bs)
    return {**variables, "batch_stats": bs}


@pytest.mark.parametrize("n", [2, 3])
def test_grouped_matches_percategory(n):
    rng = np.random.RandomState(0)
    model_kw = dict(
        in_channels=3, out_channels=8, block="basic",
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        planes=(4, 8, 8, 16, 16, 8, 4, 4), init_dim=4,
        compute_dtype="float32", conv_impl="xla", stem_impl="xla",
    )
    single = DenseMinkUNet(**model_kw)
    gkw = grouped_model_config(single, n)
    grouped = DenseMinkUNet(conv_impl="xla", stem_impl="xla", **gkw)

    npts = 120
    coords = np.unique(
        rng.randint(0, 14, size=(npts, 3)).astype(np.int64), axis=0)
    base, gdims = dense_grid_geometry(coords)
    dims = tuple(int(d) for d in gdims)
    flat = dense_flat_ids(coords, base, gdims)
    cap = 128
    feats = np.zeros((cap, 3), np.float32)
    feats[: len(coords)] = rng.randn(len(coords), 3)
    valid = np.zeros((cap,), np.int32)
    valid[: len(coords)] = 1
    flat_p = np.zeros((cap,), np.int32)
    flat_p[: len(coords)] = flat
    fj, vj, flj = jnp.asarray(feats), jnp.asarray(valid), jnp.asarray(flat_p)

    var0 = single.init(jax.random.PRNGKey(0), fj, flj, vj, dims, False)
    vars_list = []
    for c in range(n):
        v = _rand_like(jax.random.PRNGKey(10 + c), var0)
        vars_list.append(_fix_bn_stats(v, jax.random.PRNGKey(50 + c)))

    gvars = build_grouped_variables(vars_list, single)
    # shape check against a real grouped init
    gvar0 = grouped.init(jax.random.PRNGKey(1), fj, flj, vj, dims, False)
    jax.tree_util.tree_map(
        lambda a, b: (_ for _ in ()).throw(
            AssertionError((a.shape, b.shape)))
        if a.shape != b.shape else None, gvar0, gvars)

    outs_single = [
        np.asarray(single.apply(v, fj, flj, vj, dims, False))
        for v in vars_list
    ]
    out_g = np.asarray(grouped.apply(gvars, fj, flj, vj, dims, False))
    assert out_g.shape == (cap, n * 8)
    for c in range(n):
        got = np.asarray(slice_group_head(jnp.asarray(out_g), n, c, 8))
        np.testing.assert_allclose(got, outs_single[c], rtol=2e-4,
                                   atol=2e-4)
