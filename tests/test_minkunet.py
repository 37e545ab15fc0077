import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalvoting_tpu.models import MinkUNet14A, MinkUNet34C, MinkUNet34CF, MinkUNet50
from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
from canonicalvoting_tpu.ops.voxelize import batched_coordinates, sparse_quantize


def _make_inputs(rng, n_pts=400, batches=2, caps=None):
    coords_list = []
    for _ in range(batches):
        pts = rng.uniform(0, 1.2, (n_pts, 3)).astype(np.float32)
        c, _ = sparse_quantize(pts, 0.03)
        coords_list.append(c)
    coords = batched_coordinates(coords_list)
    pyr = build_pyramid(
        coords, PyramidSpec(capacities=caps, cap_multiple=64)
    )
    n0 = pyr.coords[0].shape[0]
    feats = np.zeros((n0, 3), np.float32)
    feats[: pyr.nvalid[0]] = rng.rand(pyr.nvalid[0], 3).astype(np.float32)
    return coords, pyr, feats


def test_minkunet34c_forward_shapes(rng):
    _, pyr, feats = _make_inputs(rng)
    model = MinkUNet34C(3, 64, compute_dtype="float32")
    variables = model.init(
        jax.random.PRNGKey(0), feats, pyr.as_jax_inputs(), False
    )
    out = model.apply(variables, feats, pyr.as_jax_inputs(), False)
    assert out.shape == (feats.shape[0], 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_minkunet_variants_build(rng):
    _, pyr, feats = _make_inputs(rng, n_pts=150, caps=None)
    for ctor, out_ch in [(MinkUNet14A, 8), (MinkUNet50, 8)]:
        model = ctor(3, out_ch, compute_dtype="float32")
        variables = model.init(
            jax.random.PRNGKey(1), feats, pyr.as_jax_inputs(), False
        )
        out = model.apply(variables, feats, pyr.as_jax_inputs(), False)
        assert out.shape == (feats.shape[0], out_ch)


def test_minkunet34cf_endpoints(rng):
    _, pyr, feats = _make_inputs(rng, n_pts=150, caps=None)
    model = MinkUNet34CF(3, 8, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), feats, pyr.as_jax_inputs(), False)
    endpoints, out = model.apply(variables, feats, pyr.as_jax_inputs(), False)
    # reference utils/minkunet.py:273-308 returns FIVE endpoints: the
    # stride-16 encoder conv output first, then the 4 transposed-conv outputs
    assert len(endpoints) == 5
    assert out.shape == (feats.shape[0], 8)
    # endpoint 0 is conv4p8s2's output at stride 16: 128 channels (the
    # inplanes entering block4, before it expands to 256); endpoints 1..4
    # are the up-conv outputs at strides 8/4/2/1
    assert endpoints[0].shape[-1] == 128
    for ep, ch in zip(endpoints[1:], (256, 128, 96, 96)):
        assert ep.shape[-1] == ch


def test_train_mode_updates_batch_stats(rng):
    _, pyr, feats = _make_inputs(rng, n_pts=150, caps=None)
    model = MinkUNet14A(3, 4, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), feats, pyr.as_jax_inputs(), True)
    out, updates = model.apply(
        variables, feats, pyr.as_jax_inputs(), True, 0.5,
        mutable=["batch_stats"],
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed


def test_padding_rows_do_not_affect_valid_outputs(rng):
    """Same scene with different padding capacity -> identical valid outputs."""
    coords_list = []
    pts = rng.uniform(0, 1.0, (200, 3)).astype(np.float32)
    c, _ = sparse_quantize(pts, 0.05)
    coords = batched_coordinates([c])
    pyr1 = build_pyramid(coords, PyramidSpec(cap_multiple=32))
    pyr2 = build_pyramid(coords, PyramidSpec(cap_multiple=100))
    model = MinkUNet14A(3, 4, compute_dtype="float32")

    def run(pyr):
        n0 = pyr.coords[0].shape[0]
        feats = np.zeros((n0, 3), np.float32)
        nv = pyr.nvalid[0]
        feats[:nv] = np.linspace(0, 1, nv * 3).reshape(nv, 3)
        variables = model.init(
            jax.random.PRNGKey(7), feats, pyr.as_jax_inputs(), False
        )
        return variables, np.asarray(
            model.apply(variables, feats, pyr.as_jax_inputs(), False)
        )[: pyr.nvalid[0]]

    v1, out1 = run(pyr1)
    # re-apply v1's params on the larger padding to isolate padding effects
    n0 = pyr2.coords[0].shape[0]
    feats2 = np.zeros((n0, 3), np.float32)
    nv = pyr2.nvalid[0]
    feats2[:nv] = np.linspace(0, 1, nv * 3).reshape(nv, 3)
    out2 = np.asarray(
        model.apply(v1, feats2, pyr2.as_jax_inputs(), False)
    )[:nv]
    np.testing.assert_allclose(out1, out2, atol=2e-4)


def test_gradients_flow(rng):
    _, pyr, feats = _make_inputs(rng, n_pts=120, caps=None)
    model = MinkUNet14A(3, 4, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), feats, pyr.as_jax_inputs(), True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, pyr.as_jax_inputs(), True, 0.1, mutable=["batch_stats"],
        )
        return jnp.mean(out[: pyr.nvalid[0]] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0
