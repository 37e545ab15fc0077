"""End-to-end tests: synthetic scene -> vote -> peel -> NMS -> mAP, and the
full pipeline (with a random backbone) for shape/compile coverage."""

import jax
import numpy as np
import pytest

from canonicalvoting_tpu.data.geometry import IDX2NAME, NAME2CATNAME
from canonicalvoting_tpu.data.synthetic import make_scene, perfect_predictions
from canonicalvoting_tpu.decode.peeling import PeelConfig, peel_boxes
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
from canonicalvoting_tpu.metrics.ap import compute_map, nms
from canonicalvoting_tpu.models import MinkUNet34C
from canonicalvoting_tpu.ops.hough_voting import hough_voting, round_grid_shape
from canonicalvoting_tpu.ops.voxelize import sparse_quantize


def test_perfect_predictions_reach_full_map(rng):
    """With ideal per-point predictions the detection chain must reach
    mAP = 1.0 on the synthetic GT at IoU 0.5."""
    res = 0.05
    scene = make_scene(rng, extent=(5.0, 2.0, 5.0), n_background=12000,
                       n_boxes=3, pts_per_box=2500)
    coords, idx = sparse_quantize(scene.points, res)
    points_w = coords.astype(np.float32) * res
    xyz, scl, prob, cls = perfect_predictions(scene, points_w)

    corners = np.stack([points_w.min(0), points_w.max(0)])
    dims = ((corners[1] - corners[0]) / res).astype(np.int32) + 1
    gshape = round_grid_shape(dims, 16)
    go, gr, gs = hough_voting(points_w, xyz, scl, prob, res=res, num_rots=60,
                              grid_shape=gshape)
    cfg = PeelConfig(res=res, max_boxes=16, max_iters=48)
    out = peel_boxes(go, gr, gs, points_w, xyz, prob, cls,
                     corners[0].astype(np.float32), cfg)

    n = int(out["n_boxes"])
    assert n >= 3
    boxes = np.asarray(out["boxes"])[:n]
    scores = np.asarray(out["scores"])[:n]
    classes = np.asarray(out["classes"])[:n]

    pred_map = []
    for i in range(9):
        sel = classes == i
        if sel.sum() == 0:
            continue
        pick = nms(boxes[sel], scores[sel], 0.3)
        for j in pick:
            pred_map.append((NAME2CATNAME[IDX2NAME[i]], boxes[sel][j],
                             float(scores[sel][j])))
    gt_map = [
        (NAME2CATNAME[IDX2NAME[ci]], corners8)
        for ci, corners8 in scene.gt_corners()
    ]
    d = compute_map({"s0": pred_map}, {"s0": gt_map}, ovthresh=0.5, processes=1)
    assert d["mAP"] > 0.99, d
    assert d["AR"] > 0.99, d


def test_detection_pipeline_random_weights_smoke(rng):
    """Full pipeline with an untrained backbone: compiles, runs, and returns
    a (possibly empty) detection list without NaNs or crashes."""
    scene = make_scene(rng, extent=(2.0, 1.5, 2.0), n_background=3000,
                       n_boxes=1, pts_per_box=500)
    model = MinkUNet34C(3, 64, compute_dtype="float32")

    # init with a tiny dummy scene of the same capacity profile
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
    from canonicalvoting_tpu.ops.voxelize import batched_coordinates

    coords, idx = sparse_quantize(scene.points, 0.03)
    pyr = build_pyramid(batched_coordinates([coords]), PyramidSpec(cap_multiple=512))
    feats0 = np.zeros((pyr.coords[0].shape[0], 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0, pyr.as_jax_inputs(), False)

    pipe = DetectionPipeline(
        model=model, variables=variables, res=0.03, num_rots=24,
        peel=PeelConfig(res=0.03, max_boxes=8, max_iters=16),
        grid_multiple=16, cap_multiple=512,
    )
    dets = pipe.detect(scene.points, scene.rgb)
    assert isinstance(dets, list)
    for name, box, score in dets:
        assert box.shape == (8, 3)
        assert np.all(np.isfinite(box))


def test_torch_convert_round_trip(rng):
    """state_dict template -> converter reproduces our param tree exactly."""
    import jax.tree_util as jtu

    from canonicalvoting_tpu.models import MinkUNet14A
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
    from canonicalvoting_tpu.ops.voxelize import batched_coordinates
    from canonicalvoting_tpu.utils.torch_convert import (
        convert_state_dict,
        reference_state_dict_template,
    )

    pts = rng.uniform(0, 1, (300, 3)).astype(np.float32)
    coords, _ = sparse_quantize(pts, 0.05)
    pyr = build_pyramid(batched_coordinates([coords]), PyramidSpec(cap_multiple=64))
    feats = np.zeros((pyr.coords[0].shape[0], 3), np.float32)
    model = MinkUNet14A(3, 8, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(3), feats, pyr.as_jax_inputs(), False)

    sd = reference_state_dict_template(variables)
    # keys look like the reference layout
    assert any(k.startswith("conv0p1s1.") for k in sd)
    assert any(".bn.running_mean" in k for k in sd)
    assert any(k.startswith("block1.0.conv1.") for k in sd)

    params, stats = convert_state_dict(sd)
    ref_params = jax.device_get(variables["params"])
    ref_stats = jax.device_get(variables["batch_stats"])

    flat_ref = dict(jtu.tree_flatten_with_path(ref_params)[0])
    flat_got = dict(jtu.tree_flatten_with_path(params)[0])

    def norm_keys(d):
        return {tuple(str(p) for p in k): v for k, v in d.items()}

    fr, fg = norm_keys(flat_ref), norm_keys(flat_got)
    assert set(fr.keys()) == set(fg.keys()), (
        set(fr) - set(fg), set(fg) - set(fr))
    for k in fr:
        np.testing.assert_allclose(fr[k], fg[k], atol=1e-7)

    sr = norm_keys(dict(jtu.tree_flatten_with_path(ref_stats)[0]))
    sg = norm_keys(dict(jtu.tree_flatten_with_path(stats)[0]))
    assert set(sr.keys()) == set(sg.keys())


def test_torch_pth_file_round_trip(rng, tmp_path):
    """A REAL ``torch.save``d .pth file (the reference's checkpoint format,
    /root/reference/eval_joint.py:151-152 contract) loads through
    ``load_torch_checkpoint`` and reproduces the exact forward pass."""
    torch = pytest.importorskip("torch")

    from canonicalvoting_tpu.models import MinkUNet14A
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
    from canonicalvoting_tpu.ops.voxelize import batched_coordinates
    from canonicalvoting_tpu.train.checkpoint import export_torch_style
    from canonicalvoting_tpu.utils.torch_convert import load_torch_checkpoint

    pts = rng.uniform(0, 1, (300, 3)).astype(np.float32)
    coords, _ = sparse_quantize(pts, 0.05)
    pyr = build_pyramid(batched_coordinates([coords]),
                        PyramidSpec(cap_multiple=64))
    feats = rng.uniform(-1, 1, (pyr.coords[0].shape[0], 3)).astype(np.float32)
    model = MinkUNet14A(3, 8, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(7), feats, pyr.as_jax_inputs(),
                           False)

    path = str(tmp_path / "model.pth")
    export_torch_style(path, variables)

    # the file is a genuine torch checkpoint: torch itself can read it and
    # every value is a torch.Tensor
    sd = torch.load(path, map_location="cpu", weights_only=True)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())

    params, stats = load_torch_checkpoint(path)
    loaded = {"params": params, "batch_stats": stats}
    out_ref = model.apply(variables, feats, pyr.as_jax_inputs(), False)
    out_loaded = model.apply(loaded, feats, pyr.as_jax_inputs(), False)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_loaded),
                               atol=0.0)


def test_lazy_rot_scale_peel_matches_eager(rng):
    """obj-only splat + lazy per-cell rot/scale sampling must decode the
    same boxes as the dense-grid path."""
    from canonicalvoting_tpu.ops.hough_voting import (
        compute_corners,
        grid_dims_from_corners,
        hough_voting_obj,
        vote_stats_at_cell,
    )

    res = 0.05
    scene = make_scene(rng, extent=(5.0, 2.0, 5.0), n_background=12000,
                       n_boxes=3, pts_per_box=2500)
    coords, idx = sparse_quantize(scene.points, res)
    points_w = coords.astype(np.float32) * res
    xyz, scl, prob, cls = perfect_predictions(scene, points_w)

    corners = np.stack([points_w.min(0), points_w.max(0)])
    dims = ((corners[1] - corners[0]) / res).astype(np.int32) + 1
    gshape = round_grid_shape(dims, 16)
    cfg = PeelConfig(res=res, max_boxes=16, max_iters=48)

    go, gr, gs = hough_voting(points_w, xyz, scl, prob, res=res, num_rots=60,
                              grid_shape=gshape)
    eager = peel_boxes(go, gr, gs, points_w, xyz, prob, cls,
                       corners[0].astype(np.float32), cfg)

    go2 = hough_voting_obj(points_w, xyz, scl, prob, res=res, num_rots=60,
                           grid_shape=gshape)
    import jax.numpy as jnp
    corners_j = compute_corners(jnp.asarray(points_w), None)
    dims_j = jnp.minimum(grid_dims_from_corners(corners_j, res),
                         jnp.asarray(gshape, np.int32))

    def rot_scale_fn(cand):
        return vote_stats_at_cell(
            jnp.asarray(points_w), jnp.asarray(xyz), jnp.asarray(scl),
            jnp.asarray(prob), corners_j[0], dims_j, res, 60, cand,
        )

    lazy = peel_boxes(go2, None, None, points_w, xyz, prob, cls,
                      corners[0].astype(np.float32), cfg,
                      rot_scale_fn=rot_scale_fn)

    n_e, n_l = int(eager["n_boxes"]), int(lazy["n_boxes"])
    assert n_e == n_l
    np.testing.assert_allclose(
        np.asarray(lazy["boxes"])[:n_l], np.asarray(eager["boxes"])[:n_e],
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(lazy["scores"])[:n_l], np.asarray(eager["scores"])[:n_e],
        atol=1e-5,
    )
