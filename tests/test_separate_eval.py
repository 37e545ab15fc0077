"""Separate (per-category) evaluation: the multi-model scan's shared-grid +
donor-threading fast path must be a pure optimization — bit-for-bit the
same model outputs as independent per-category applies.

The scan in eval/separate.py hoists the input scatter grid + occupancy
pyramid out of the 9-category loop (shared_scene_grids) and threads two
dead L0 grids through the scan carry as donated kernel outputs
(fresh_l0_donors). The reference instead re-enters the full per-model
pipeline 9x (reference eval_separate.py:165-186).
"""

import jax
import numpy as np

from canonicalvoting_tpu.data.dense_prep import (
    dense_flat_ids,
    dense_grid_geometry,
    level_tiles,
)
from canonicalvoting_tpu.eval.pipeline import prepare_scene_args
from canonicalvoting_tpu.eval.separate import (
    SeparateDetectionPipeline,
    stack_variables,
)
from canonicalvoting_tpu.models.dense_unet import (
    DenseMinkUNet,
    build_occ_packs,
    fresh_l0_donors,
    shared_scene_grids,
)
from canonicalvoting_tpu.models.minkunet import MinkUNetBase
from canonicalvoting_tpu.ops.voxelize import sparse_quantize

TINY_PLANES = (8, 16, 32, 32, 32, 32, 16, 16)


def _scene(rng, n_pts=250, extent=0.8):
    pts = rng.uniform(0, extent, (n_pts, 3)).astype(np.float32)
    pts[: n_pts // 4] -= extent / 2
    coords, idx = sparse_quantize(pts, 0.03)
    return coords, rng.rand(len(coords), 3).astype(np.float32)


def test_shared_and_donor_scan_matches_plain_applies(rng):
    """apply(shared=, donors=) chained across two different weight sets ==
    two independent plain applies (exact)."""
    coords, feats_raw = _scene(rng)
    n = len(coords)
    model = DenseMinkUNet(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=TINY_PLANES, init_dim=8, compute_dtype="float32",
        conv_impl="tiled_interpret", stem_impl="tiled",
    )
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    valid = np.ones((n,), np.float32)
    tiles = level_tiles(coords, base, dims)
    va = model.init(jax.random.PRNGKey(0), feats_raw, flat, valid, dims,
                    False, tiles=tiles)
    vb = model.init(jax.random.PRNGKey(1), feats_raw, flat, valid, dims,
                    False, tiles=tiles)

    plain_a = np.asarray(model.apply(va, feats_raw, flat, valid, dims,
                                     False, tiles=tiles))
    plain_b = np.asarray(model.apply(vb, feats_raw, flat, valid, dims,
                                     False, tiles=tiles))

    shared = shared_scene_grids(
        feats_raw, flat, valid, dims, in_channels=3,
        compute_dtype="float32", stem_impl="tiled")
    donors = fresh_l0_donors(dims, "float32")
    out_a, donors = model.apply(va, feats_raw, flat, valid, dims, False,
                                tiles=tiles, shared=shared, donors=donors)
    # second category consumes the FIRST category's retired grids — the
    # cross-category contamination case the donor invariant must survive
    out_b, donors2 = model.apply(vb, feats_raw, flat, valid, dims, False,
                                 tiles=tiles, shared=shared, donors=donors)
    np.testing.assert_array_equal(np.asarray(out_a), plain_a)
    np.testing.assert_array_equal(np.asarray(out_b), plain_b)
    for d in donors2:
        assert d.shape == donors[0].shape


def test_separate_pipeline_dense_scan_runs(rng):
    """SeparateDetectionPipeline's dense scan path (shared + donors under
    lax.scan) compiles and returns per-category peel outputs."""
    coords, feats_raw = _scene(rng, n_pts=220)
    cats = ["chair", "table", "sofa"]
    model = MinkUNetBase(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=TINY_PLANES, init_dim=8, compute_dtype="float32",
    )
    pipe = SeparateDetectionPipeline(
        model=model, stacked_variables=None, categories=cats, res=0.03,
        num_rots=8, backbone="dense", conv_impl="tiled_interpret",
        grid_multiple=16, cap_multiple=256,
    )
    args = pipe.prepare_quantized(coords, feats_raw)
    assert args[0] == "dense"
    _, feats, flat, valid = args[:4]
    dense_dims = args[6]
    dm = pipe._dense_model
    vs = [dm.init(jax.random.PRNGKey(i), feats, flat, valid,
                  tuple(dense_dims), False) for i in range(len(cats))]
    pipe.stacked_variables = stack_variables(vs)
    out = pipe.run_scene(args)
    n_boxes = np.asarray(out["n_boxes"])
    assert n_boxes.shape == (len(cats),)
    assert np.all(n_boxes >= 0)
    assert np.asarray(out["truncated"]).shape == (len(cats),)
    dets = pipe.postprocess(out)
    assert isinstance(dets, list)


def test_separate_pipeline_grouped_matches_single(rng):
    """group_size=2 (lane-packed block-diagonal groups, eval/grouped.py)
    must produce the same detections as the per-category scan, including
    the padded tail group (3 categories -> groups [0,1] + [2,2])."""
    coords, feats_raw = _scene(rng, n_pts=220)
    cats = ["chair", "table", "sofa"]
    model = MinkUNetBase(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=TINY_PLANES, init_dim=8, compute_dtype="float32",
    )
    kw = dict(model=model, stacked_variables=None, categories=cats,
              res=0.03, num_rots=8, backbone="dense",
              conv_impl="tiled_interpret", grid_multiple=16,
              cap_multiple=256)
    pipe1 = SeparateDetectionPipeline(group_size=1, **kw)
    pipe2 = SeparateDetectionPipeline(group_size=2, **kw)
    args = pipe1.prepare_quantized(coords, feats_raw)
    _, feats, flat, valid = args[:4]
    dense_dims = args[6]
    dm = pipe1._dense_model
    vs = [dm.init(jax.random.PRNGKey(i), feats, flat, valid,
                  tuple(dense_dims), False) for i in range(len(cats))]
    pipe1.set_variables_list(vs)
    pipe2.set_variables_list(vs)
    out1 = pipe1.run_scene(args)
    out2 = pipe2.run_scene(args)
    n1 = np.asarray(out1["n_boxes"])
    n2 = np.asarray(out2["n_boxes"])[: len(cats)]
    np.testing.assert_array_equal(n1, n2)
    b1, b2 = np.asarray(out1["boxes"]), np.asarray(out2["boxes"])
    s1, s2 = np.asarray(out1["scores"]), np.asarray(out2["scores"])
    for ci in range(len(cats)):
        k = int(n1[ci])
        np.testing.assert_allclose(b2[ci, :k], b1[ci, :k], rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(s2[ci, :k], s1[ci, :k], rtol=1e-4,
                                   atol=1e-4)
    d1 = pipe1.postprocess(out1)
    d2 = pipe2.postprocess(out2)
    assert len(d1) == len(d2)


def test_shared_prefold_stem_matches_plain_applies(rng):
    """stem_impl="prefold" with the fold HOISTED into shared_scene_grids
    (x_folded) == the plain per-model apply (which folds inside), exactly —
    and matches the tiled-stem path numerically. The hoist makes the 25-tap
    stem fold run once per scene instead of once per category."""
    coords, feats_raw = _scene(rng)
    n = len(coords)
    model = DenseMinkUNet(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=TINY_PLANES, init_dim=8, compute_dtype="float32",
        conv_impl="tiled_interpret", stem_impl="prefold",
    )
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    valid = np.ones((n,), np.float32)
    tiles = level_tiles(coords, base, dims)
    va = model.init(jax.random.PRNGKey(0), feats_raw, flat, valid, dims,
                    False, tiles=tiles)

    plain = np.asarray(model.apply(va, feats_raw, flat, valid, dims,
                                   False, tiles=tiles))

    shared = shared_scene_grids(
        feats_raw, flat, valid, dims, in_channels=3,
        compute_dtype="float32", stem_impl="prefold")
    assert "x_folded" in shared
    hoisted = np.asarray(model.apply(va, feats_raw, flat, valid, dims,
                                     False, tiles=tiles, shared=shared))
    np.testing.assert_array_equal(hoisted, plain)

    # numerically equivalent to the tiled-stem execution (different lane
    # order in the fold => reassociated sums; tolerance, not bitwise)
    model_t = DenseMinkUNet(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=TINY_PLANES, init_dim=8, compute_dtype="float32",
        conv_impl="tiled_interpret", stem_impl="tiled",
    )
    tiled = np.asarray(model_t.apply(va, feats_raw, flat, valid, dims,
                                     False, tiles=tiles))
    np.testing.assert_allclose(hoisted, tiled, atol=2e-4, rtol=1e-4)


def test_separate_planted_rows_detect_boxes(rng):
    """run_scene(planted=...) decodes the planted per-category heads (the
    honest-bench hook): category c detects its planted class-c box while
    the other categories stay empty."""
    from canonicalvoting_tpu.data.synthetic import (
        encode_separate_head_rows,
        make_scene,
        perfect_predictions,
    )
    from canonicalvoting_tpu.decode.peeling import PeelConfig
    from canonicalvoting_tpu.eval.separate import (
        SeparateDetectionPipeline,
        stack_variables,
    )

    res = 0.05
    sc = make_scene(rng, extent=(2.0, 1.2, 2.0), n_background=4000,
                    n_boxes=2, pts_per_box=1500)
    coords, idx = sparse_quantize(sc.points, res)
    cats = ["c0", "c1", "c2"]
    model = MinkUNetBase(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=TINY_PLANES, init_dim=8, compute_dtype="float32",
    )
    pipe = SeparateDetectionPipeline(
        model=model, stacked_variables=None, categories=cats, res=res,
        num_rots=24, backbone="dense", conv_impl="tiled_interpret",
        grid_multiple=16, cap_multiple=512,
        peel=PeelConfig(res=res, max_boxes=8, max_iters=24,
                        elimination_inclusive=False),
    )
    args = pipe.prepare_quantized(coords, rng.rand(len(coords), 3)
                                  .astype(np.float32))
    _, feats, flat, valid = args[:4]
    dm = pipe._dense_model
    vs = [dm.init(jax.random.PRNGKey(i), feats, flat, valid,
                  tuple(args[6]), False) for i in range(len(cats))]
    pipe.set_variables_list(vs)

    coords_w = np.asarray(args[4])
    vmask = np.asarray(args[3]) > 0
    points_w = coords_w[vmask]
    xyz, scl, prob, cls = perfect_predictions(sc, points_w)
    # plant box classes into categories 0/1 by scene box order
    cls_cat = np.zeros_like(cls)
    for bi, b in enumerate(sc.boxes):
        cls_cat[cls == b.class_idx] = bi
    rows = np.stack([
        encode_separate_head_rows(points_w, xyz, scl,
                                  (prob > 0.5) & (cls_cat == c),
                                  len(vmask))
        for c in range(len(cats))
    ])
    out = pipe.run_scene(args, planted=rows)
    n_boxes = np.asarray(out["n_boxes"])
    assert n_boxes[0] >= 1 and n_boxes[1] >= 1
    assert n_boxes[2] == 0
    dets = pipe.postprocess(out)
    assert all(c in ("c0", "c1") for c, _b, _s in dets)
