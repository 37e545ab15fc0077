"""int8 (quantized) dense backbone vs the bf16/f32 tiled path.

The quantize=True DenseMinkUNet runs its basic-block conv stacks in int8
(per-channel weight + activation quantization, requant fused into the conv
epilogues — see ops/pallas/tiled_conv.py and models/dense_unet.py). The
chain is: init (zero absmax) -> calibration forward (mutable "quant",
records per-channel activation absmax) -> int8 forward. Against the float
tiled path the outputs must agree to quantization tolerance, and the
detection head ordering (argmax class) should be stable for the vast
majority of points.
"""

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.dense_prep import (
    dense_flat_ids,
    dense_grid_geometry,
    level_tiles,
)
from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet
from canonicalvoting_tpu.ops.voxelize import sparse_quantize

TINY_PLANES = (8, 16, 32, 32, 32, 32, 16, 16)


def _scene(rng, n_pts=250, extent=0.8):
    pts = rng.uniform(0, extent, (n_pts, 3)).astype(np.float32)
    pts[: n_pts // 4] -= extent / 2
    coords, _ = sparse_quantize(pts, 0.03)
    return coords, rng.rand(len(coords), 3).astype(np.float32)


def test_quantized_blocks_match_float_path(rng):
    coords, feats_raw = _scene(rng)
    n = len(coords)
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    valid = np.ones((n,), np.float32)
    tiles = level_tiles(coords, base, dims)

    kw = dict(in_channels=3, out_channels=8, block="basic",
              layers=(1, 1, 1, 1, 1, 1, 1, 1), planes=TINY_PLANES,
              init_dim=8, compute_dtype="float32",
              conv_impl="tiled_interpret")
    m_f = DenseMinkUNet(**kw)
    m_q = DenseMinkUNet(quantize=True, **kw)

    variables = m_q.init(jax.random.PRNGKey(1), feats_raw, flat, valid,
                         dims, False)
    assert "quant" in variables
    absmax0 = jax.tree_util.tree_leaves(variables["quant"])
    assert all(np.all(np.asarray(a) == 0) for a in absmax0)

    # float reference: same params through the non-quantized tiled path
    float_vars = {k: v for k, v in variables.items() if k != "quant"}
    out_f = np.asarray(m_f.apply(float_vars, feats_raw, flat, valid, dims,
                                 False, tiles=tiles))

    # calibration forward fills the absmax variables
    out_cal, upd = m_q.apply(variables, feats_raw, flat, valid, dims, False,
                             tiles=tiles, calibrate=True, mutable=["quant"])
    np.testing.assert_allclose(np.asarray(out_cal), out_f, atol=1e-4)
    variables = {**variables, "quant": upd["quant"]}
    absmax1 = jax.tree_util.tree_leaves(variables["quant"])
    assert any(np.any(np.asarray(a) > 0) for a in absmax1)

    # int8 forward
    out_q = np.asarray(m_q.apply(variables, feats_raw, flat, valid, dims,
                                 False, tiles=tiles))
    assert out_q.shape == out_f.shape
    # quantization tolerance: per-point outputs stay close in absolute
    # terms relative to the activation range
    ref_mag = np.abs(out_f).max()
    err = np.abs(out_q - out_f)
    assert err.max() < 0.15 * ref_mag, (err.max(), ref_mag)
    assert np.median(err) < 0.02 * ref_mag, (np.median(err), ref_mag)
    # and the per-point argmax over the (mock) head channels is stable for
    # nearly all points
    agree = (out_q.argmax(-1) == out_f.argmax(-1)).mean()
    assert agree > 0.95, agree


def test_pipeline_int8_calibrate_and_run(rng):
    """DetectionPipeline(quantize=True): calibrate_scene fills the quant
    collection and the int8 run produces boxes near the float pipeline's
    (reference e2e chain eval_joint.py:163-280, here at toy scale)."""
    from canonicalvoting_tpu.data.geometry import NCLASSES
    from canonicalvoting_tpu.decode.peeling import PeelConfig
    from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
    from canonicalvoting_tpu.models.minkunet import MinkUNetBase

    pts = rng.uniform(0, 0.9, (400, 3)).astype(np.float32)
    rgb = rng.rand(400, 3).astype(np.float32)

    def mk(quantize):
        model = MinkUNetBase(
            in_channels=3, out_channels=6 * NCLASSES + NCLASSES + 1,
            block="basic", layers=(1,) * 8, planes=TINY_PLANES, init_dim=8,
            compute_dtype="float32")
        return DetectionPipeline(
            model=model, variables=None, res=0.03, num_rots=12,
            peel=PeelConfig(res=0.03, max_boxes=4, max_iters=8),
            cap_multiple=512, backbone="dense",
            conv_impl="tiled_interpret", lazy_rot_scale=False,
            quantize=quantize)

    pipe_f, pipe_q = mk(False), mk(True)
    args = pipe_q.prepare_scene(pts, rgb)
    (_, feats, flat, valid, _cw, _gs, dense_dims, *_rest) = args
    var_q = pipe_q._dense_model.init(
        jax.random.PRNGKey(0), feats, flat, valid, tuple(dense_dims), False)
    pipe_q.variables = var_q
    pipe_f.variables = {k: v for k, v in var_q.items() if k != "quant"}

    out_f = jax.device_get(pipe_f.run_scene(args))

    pipe_q.calibrate_scene(args)
    mx = max(float(np.max(np.asarray(a)))
             for a in jax.tree_util.tree_leaves(pipe_q.variables["quant"]))
    assert mx > 0.0
    out_q = jax.device_get(pipe_q.run_scene(args))

    # untrained net -> few/no boxes either way; the chain must agree on the
    # box count and the vote-grid peak locations must survive quantization
    assert int(out_q["n_boxes"]) == int(out_f["n_boxes"])
