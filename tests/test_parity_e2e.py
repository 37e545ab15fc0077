"""End-to-end parity proof: the production tail chain (head slicing ->
Hough voting -> box peeling -> NMS -> mAP) against a pure float64
transliteration of the reference inference pass (eval_joint.py:163-312).

Two branches per scene:
  * planted head rows (perfect predictions encoded as raw model outputs) —
    boxes exist, so every accept-path branch is exercised and the box sets
    must match;
  * a real MinkUNet34C(3, 64) forward with random weights ROUND-TRIPPED
    through a genuine ``torch.save``d .pth file — closes the
    checkpoint-conversion link of the chain (no boxes above threshold, but
    the two tails must agree on that too).

The remaining untested gap to real-data parity is the data itself —
see PARITY.md for the playbook once ScanNet + published checkpoints are
available. The TPU-config twin of this test (dense tiled backbone + plane
splat at ScanNet scale) is tests_tpu/test_parity_e2e_tpu.py.
"""

import numpy as np
import pytest

import jax

from canonicalvoting_tpu.data.geometry import IDX2NAME, NAME2CATNAME, NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene, perfect_predictions
from canonicalvoting_tpu.decode.peeling import PeelConfig
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
from canonicalvoting_tpu.metrics.ap import compute_map
from canonicalvoting_tpu.models import MinkUNet34C
from canonicalvoting_tpu.ops.sparse_conv import valid_row_mask

from tests.reference_impls import (
    hv_forward_numpy,
    hv_forward_numpy_vec,
    reference_eval_joint_tail,
)


def test_hv_vec_oracle_matches_loop_oracle(rng):
    """The vectorized f64 oracle == the point-loop transliteration."""
    n = 60
    pts = rng.uniform(0, 1.2, (n, 3)).astype(np.float64)
    xyz = rng.uniform(-1, 1, (n, 3))
    scl = rng.uniform(0.1, 0.4, (n, 3))
    obj = rng.uniform(0, 1, (n,))
    a = hv_forward_numpy(pts, xyz, scl, obj, 0.1, 12)
    b = hv_forward_numpy_vec(pts, xyz, scl, obj, 0.1, 12)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-11)


# canonical implementation lives in the package (also feeds the planted
# bench tail); re-exported here for the parity tests and tests_tpu
from canonicalvoting_tpu.data.synthetic import (  # noqa: E402
    encode_joint_head_rows as encode_head_rows,
)


def _pipeline(res):
    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1,
                        compute_dtype="float32")
    return DetectionPipeline(
        model=model, variables=None, res=res, num_rots=24,
        peel=PeelConfig(res=res, max_boxes=16, max_iters=48),
        grid_multiple=16, cap_multiple=1024, backbone="sparse",
    )


def test_joint_chain_matches_reference_oracle(rng, tmp_path):
    torch = pytest.importorskip("torch")
    res = 0.05
    scene = make_scene(rng, extent=(4.0, 2.0, 4.0), n_background=9000,
                       n_boxes=3, pts_per_box=2000)
    pipe = _pipeline(res)
    args = pipe.prepare_scene(scene.points, scene.rgb)
    assert args[0] == "sparse"
    _, feats, pyr, coords_w, grid_shape = args
    valid = np.asarray(
        valid_row_mask(feats.shape[0], pyr["nvalid"][0]))[:, 0] > 0
    points_w = np.asarray(coords_w)[valid]
    cap = feats.shape[0]

    # ---- planted branch: boxes exist; full accept path exercised --------
    xyz, scl, prob, cls = perfect_predictions(scene, points_w)
    rows = encode_head_rows(points_w, xyz, scl, prob > 0.5, cls, cap)
    out = pipe._tail_fn(rows, coords_w, valid.astype(np.float32), grid_shape)
    got = pipe.postprocess(out)

    peel_cfg = pipe.peel
    map_ref, boxes_ref, scores_ref, classes_ref = reference_eval_joint_tail(
        rows[:len(points_w)], points_w, res, pipe.num_rots, peel_cfg)

    assert len(boxes_ref) == 3, "oracle must find every planted box"
    n = int(out["n_boxes"])
    assert n == len(boxes_ref)
    np.testing.assert_array_equal(np.asarray(out["classes"])[:n], classes_ref)
    # f32 (device) vs f64 (oracle): borderline |inv|=1 cells can flip during
    # elimination, shifting later argmaxes by <= 1 cell
    np.testing.assert_allclose(np.asarray(out["boxes"])[:n], boxes_ref,
                               atol=8e-3)
    np.testing.assert_allclose(np.asarray(out["scores"])[:n], scores_ref,
                               atol=1e-5)

    # identical post-NMS detection sets and identical mAP
    assert len(got) == len(map_ref)
    assert sorted(c for c, _, _ in got) == sorted(c for c, _, _ in map_ref)
    gt_map = [(NAME2CATNAME[IDX2NAME[ci]], c8) for ci, c8 in
              scene.gt_corners()]
    d_got = compute_map({"s": got}, {"s": gt_map}, ovthresh=0.5, processes=1)
    d_ref = compute_map({"s": map_ref}, {"s": gt_map}, ovthresh=0.5,
                        processes=1)
    assert d_got["mAP"] == pytest.approx(d_ref["mAP"], abs=1e-9)
    assert d_got["AR"] == pytest.approx(d_ref["AR"], abs=1e-9)
    assert d_got["mAP"] > 0.99

    # ---- real-backbone branch through a .pth round trip -----------------
    from canonicalvoting_tpu.train.checkpoint import export_torch_style
    from canonicalvoting_tpu.utils.torch_convert import load_torch_checkpoint

    variables = jax.jit(pipe.model.init)(
        jax.random.PRNGKey(0), feats, pyr)
    path = str(tmp_path / "joint.pth")
    export_torch_style(path, variables)
    params, stats = load_torch_checkpoint(path)
    pipe.variables = {"params": params, "batch_stats": stats}

    rows_model = np.asarray(pipe._backbone_fn(pipe.variables, feats, pyr))
    out2 = pipe._tail_fn(rows_model, coords_w, valid.astype(np.float32),
                         grid_shape)
    map_ref2, boxes2, _, _ = reference_eval_joint_tail(
        rows_model[:len(points_w)].astype(np.float64), points_w, res,
        pipe.num_rots, peel_cfg)
    # untrained weights produce no boxes above thresh_high=60 — both tails
    # must agree on that
    assert int(out2["n_boxes"]) == len(boxes2)
    assert not bool(out2["truncated"])
