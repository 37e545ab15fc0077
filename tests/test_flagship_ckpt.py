"""Checkpoint conversion round trips at the EXACT published flagship shapes.

The published checkpoints the reference evaluates are:

  * joint:    MinkUNet34C(3, 64)   (/root/reference/train_joint.py:216-218 —
              out = 6*9 + 9 + 1 = 64)
  * separate: 9x MinkUNet34C(3, 8) (/root/reference/train_separate.py:210),
              stacked for eval (/root/reference/eval_separate.py:136-143)
  * SUN RGB-D: MinkUNet34C(3, 8) nested under ['model_state_dict']
              (/root/reference/sunrgbd/brnetcanon.py:167)

tests/test_e2e.py covers the .pth mechanics at MinkUNet14A/8-ch scale; these
tests close the parity chain at the real shapes: a genuine ``torch.save``d
file in each layout loads through ``load_torch_checkpoint`` and reproduces
the exact forward pass.
"""

import numpy as np
import pytest

import jax

from canonicalvoting_tpu.ops.voxelize import batched_coordinates, sparse_quantize

torch = pytest.importorskip("torch")


def _tiny_scene(rng, n=300, res=0.05):
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    coords, _ = sparse_quantize(pts, res)
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid

    pyr = build_pyramid(batched_coordinates([coords]),
                        PyramidSpec(cap_multiple=64))
    feats = rng.uniform(-1, 1, (pyr.coords[0].shape[0], 3)).astype(np.float32)
    return feats, pyr


def _roundtrip_and_check(model, variables, feats, pyr, tmp_path, name,
                         wrap_nested=False):
    from canonicalvoting_tpu.train.checkpoint import export_torch_style
    from canonicalvoting_tpu.utils.torch_convert import load_torch_checkpoint

    path = str(tmp_path / f"{name}.pth")
    export_torch_style(path, variables)
    if wrap_nested:
        # re-save in the SUN RGB-D layout: the full training state dict with
        # the model under 'model_state_dict' (brnetcanon.py:167)
        sd = torch.load(path, map_location="cpu", weights_only=True)
        torch.save({"model_state_dict": sd, "epoch": 160}, path)

    params, stats = load_torch_checkpoint(path)
    loaded = {"params": params, "batch_stats": stats}
    out_ref = model.apply(variables, feats, pyr.as_jax_inputs(), False)
    out_loaded = model.apply(loaded, feats, pyr.as_jax_inputs(), False)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_loaded),
                               atol=0.0)
    return loaded


def test_joint_flagship_34c64_pth_round_trip(rng, tmp_path):
    """MinkUNet34C(3, 64) — the joint checkpoint's exact shape."""
    from canonicalvoting_tpu.models import MinkUNet34C

    feats, pyr = _tiny_scene(rng)
    model = MinkUNet34C(3, 64, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(1), feats, pyr.as_jax_inputs(),
                           False)
    # the reference state dict must carry 34C's full block plan
    from canonicalvoting_tpu.utils.torch_convert import (
        reference_state_dict_template,
    )

    sd = reference_state_dict_template(jax.device_get(variables))
    assert any(k.startswith("block1.1.") for k in sd)      # LAYERS[0] = 2
    assert any(k.startswith("block4.5.") for k in sd)      # LAYERS[3] = 6
    assert sd["final.kernel"].shape[-1] == 64
    _roundtrip_and_check(model, variables, feats, pyr, tmp_path, "joint")


def test_separate_flagship_9x34c8_stacked_round_trip(rng, tmp_path):
    """9x MinkUNet34C(3, 8) .pth files -> load -> stack_variables, as
    eval_separate does (eval_separate.py:136-143): every stacked leaf slice
    must equal its source model, and the category-0 forward must match."""
    from canonicalvoting_tpu.eval.separate import stack_variables
    from canonicalvoting_tpu.models import MinkUNet34C

    feats, pyr = _tiny_scene(rng)
    model = MinkUNet34C(3, 8, compute_dtype="float32")
    base = model.init(jax.random.PRNGKey(2), feats, pyr.as_jax_inputs(), False)

    # 9 distinct models: per-category index-dependent perturbation
    variables_list = []
    for c in range(9):
        variables_list.append(jax.tree_util.tree_map(
            lambda x, c=c: x + 0.01 * (c + 1) * np.sign(x + 0.5), base))

    loaded_list = []
    for c, variables in enumerate(variables_list):
        loaded_list.append(_roundtrip_and_check(
            model, variables, feats, pyr, tmp_path, f"cat{c}"))

    stacked = jax.device_get(stack_variables(loaded_list))
    for c in (0, 4, 8):
        want = jax.device_get(variables_list[c])
        got = jax.tree_util.tree_map(lambda x, c=c: x[c], stacked)
        leaves_w = jax.tree_util.tree_leaves(want)
        leaves_g = jax.tree_util.tree_leaves(got)
        assert len(leaves_w) == len(leaves_g)
        for w, g in zip(leaves_w, leaves_g):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_sunrgbd_nested_34c8_round_trip(rng, tmp_path):
    """The SUN RGB-D checkpoint nests the model under ['model_state_dict']
    (brnetcanon.py:167); load_torch_checkpoint must unwrap it."""
    from canonicalvoting_tpu.models import MinkUNet34C

    feats, pyr = _tiny_scene(rng)
    model = MinkUNet34C(3, 8, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(3), feats, pyr.as_jax_inputs(),
                           False)
    _roundtrip_and_check(model, variables, feats, pyr, tmp_path, "sunrgbd",
                         wrap_nested=True)
