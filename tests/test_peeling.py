import jax
import numpy as np

from canonicalvoting_tpu.data.geometry import rotmat_y
from canonicalvoting_tpu.decode.peeling import (
    PeelConfig,
    peel_boxes,
    peel_boxes_numpy_reference,
)
from canonicalvoting_tpu.ops.hough_voting import hough_voting


def _scene_with_boxes(rng, box_specs, n_bg=2000, res=0.03):
    """Dense synthetic scene with perfectly-predicted planted boxes."""
    pts = [rng.uniform([0, 0, 0], [4.0, 2.0, 4.0], (n_bg, 3)).astype(np.float32)]
    for center, scale, yaw in box_specs:
        # sample points on the box volume so votes concentrate
        n = 800
        lcc = rng.uniform(-0.95, 0.95, (n, 3)).astype(np.float32)
        world = (rotmat_y(yaw) @ (lcc * scale).T).T + center
        pts.append(world.astype(np.float32))
    points = np.concatenate(pts, 0)

    xyz = np.zeros_like(points)
    scl = np.full_like(points, 0.2)
    prob = np.full((len(points),), 0.01, np.float32)
    cls = np.zeros((len(points),), np.int32)
    for bi, (center, scale, yaw) in enumerate(box_specs):
        R = rotmat_y(yaw)
        inv = ((points - center) @ R) / scale
        inside = np.all(np.abs(inv) < 1.0, axis=-1)
        xyz[inside] = inv[inside]
        scl[inside] = scale
        prob[inside] = 0.95
        cls[inside] = bi % 9
    return points, xyz.astype(np.float32), scl.astype(np.float32), prob, cls


def test_peeling_matches_numpy_reference(rng):
    res = 0.06
    specs = [
        (np.array([1.0, 0.6, 1.0], np.float32), np.array([0.45, 0.5, 0.35], np.float32), 0.4),
        (np.array([3.0, 0.5, 2.8], np.float32), np.array([0.5, 0.4, 0.5], np.float32), -0.9),
    ]
    points, xyz, scl, prob, cls = _scene_with_boxes(rng, specs)
    corners = np.stack([points.min(0), points.max(0)])
    dims = ((corners[1] - corners[0]) / res).astype(np.int32) + 1
    gshape = tuple(int(d) for d in dims)

    go, gr, gs = hough_voting(
        points, xyz, scl, prob, res=res, num_rots=24, grid_shape=gshape
    )
    go, gr, gs = map(np.asarray, (go, gr, gs))

    cfg = PeelConfig(res=res, max_boxes=16, max_iters=64)
    ref_boxes, ref_scores, ref_classes = peel_boxes_numpy_reference(
        go, gr, gs, points, xyz, prob, cls, corners[0], cfg
    )
    assert len(ref_boxes) == 2, f"oracle should find both boxes, got {len(ref_boxes)}"

    out = jax.jit(
        lambda *a: peel_boxes(*a, corner=corners[0].astype(np.float32), config=cfg)
    )(go, gr, gs, points, xyz, prob, cls)
    n = int(out["n_boxes"])
    assert n == len(ref_boxes)
    got_boxes = np.asarray(out["boxes"])[:n]
    got_scores = np.asarray(out["scores"])[:n]
    got_classes = np.asarray(out["classes"])[:n]
    # f32 (device) vs f64 (oracle) can flip a borderline |inv|=1 cell during
    # grid elimination, shifting a later argmax by one cell -> small box shift
    np.testing.assert_allclose(got_boxes, np.array(ref_boxes), atol=8e-3)
    np.testing.assert_allclose(got_scores, np.array(ref_scores), atol=1e-5)
    np.testing.assert_array_equal(got_classes, np.array(ref_classes))

    # boxes recover the planted geometry
    for center, scale, yaw in specs:
        centers = got_boxes.mean(1)
        d = np.linalg.norm(centers - center, axis=-1)
        assert d.min() < 0.1, f"planted box at {center} not recovered"


def test_peeling_empty_grid(rng):
    cfg = PeelConfig(max_boxes=8, max_iters=16)
    go = np.zeros((32, 16, 32), np.float32)
    gr = np.zeros((32, 16, 32, 2), np.float32)
    gs = np.ones((32, 16, 32, 3), np.float32)
    pts = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    out = peel_boxes(
        go, gr, gs, pts, pts * 0, np.ones(100, np.float32),
        np.zeros(100, np.int32), np.zeros(3, np.float32), cfg,
    )
    assert int(out["n_boxes"]) == 0


def test_peeling_rejects_low_quality(rng):
    """A vote peak whose points have garbage LCC predictions is rejected."""
    res = 0.05
    points = rng.uniform(0, 2, (3000, 3)).astype(np.float32)
    # all points vote for one center but xyz_pred is random (high error)
    center = np.array([1.0, 1.0, 1.0], np.float32)
    xyz = rng.uniform(-1, 1, (3000, 3)).astype(np.float32)
    scl = np.full_like(points, 0.5)
    prob = np.full((3000,), 0.9, np.float32)
    # hand-build a grid with a huge peak at the center cell
    corners = np.stack([points.min(0), points.max(0)])
    dims = ((corners[1] - corners[0]) / res).astype(np.int32) + 1
    go = np.zeros(tuple(dims), np.float32)
    ci = ((center - corners[0]) / res).astype(int)
    go[tuple(ci)] = 500.0
    gr = np.zeros(tuple(dims) + (2,), np.float32)
    gr[..., 0] = 1.0
    gs = np.full(tuple(dims) + (3,), 0.5, np.float32)
    cfg = PeelConfig(res=res, max_boxes=8, max_iters=8)
    out = peel_boxes(
        go, gr, gs, points, xyz, prob, np.zeros(3000, np.int32),
        corners[0].astype(np.float32), cfg,
    )
    assert int(out["n_boxes"]) == 0  # rejected by the LCC error check


def test_peeling_padded_points_masked(rng):
    """Padded (invalid) points must not affect acceptance statistics."""
    res = 0.06
    specs = [(np.array([1.0, 0.6, 1.0], np.float32),
              np.array([0.45, 0.5, 0.35], np.float32), 0.4)]
    points, xyz, scl, prob, cls = _scene_with_boxes(rng, specs, n_bg=1000)
    corners = np.stack([points.min(0), points.max(0)])
    dims = ((corners[1] - corners[0]) / res).astype(np.int32) + 1
    gshape = tuple(int(d) for d in dims)
    go, gr, gs = hough_voting(
        points, xyz, scl, prob, res=res, num_rots=24, grid_shape=gshape
    )
    cfg = PeelConfig(res=res, max_boxes=8, max_iters=32)
    base = peel_boxes(
        np.asarray(go), np.asarray(gr), np.asarray(gs), points, xyz, prob, cls,
        corners[0].astype(np.float32), cfg,
    )
    # pad with garbage points marked invalid
    pad = 500
    points_p = np.concatenate([points, np.full((pad, 3), 1.0, np.float32)])
    xyz_p = np.concatenate([xyz, np.zeros((pad, 3), np.float32)])
    prob_p = np.concatenate([prob, np.ones(pad, np.float32)])
    cls_p = np.concatenate([cls, np.full(pad, 7, np.int32)])
    valid = np.concatenate([np.ones(len(points), np.float32), np.zeros(pad, np.float32)])
    padded = peel_boxes(
        np.asarray(go), np.asarray(gr), np.asarray(gs), points_p, xyz_p,
        prob_p, cls_p, corners[0].astype(np.float32), cfg, valid=valid,
    )
    assert int(padded["n_boxes"]) == int(base["n_boxes"])
    n = int(base["n_boxes"])
    np.testing.assert_allclose(
        np.asarray(padded["boxes"])[:n], np.asarray(base["boxes"])[:n], atol=1e-5
    )


def _many_peak_grid(n_side=6, res=0.05):
    """Adversarial vote grid: an n_side^2 lattice of high peaks whose
    back-projection stats all REJECT (garbage LCC) — every peak burns one
    peel iteration with no box written (the truncation scenario of the
    reference's unbounded loop, eval_joint.py:204)."""
    dims = (8 * n_side, 16, 8 * n_side)
    go = np.zeros(dims, np.float32)
    for i in range(n_side):
        for j in range(n_side):
            go[4 + 8 * i, 8, 4 + 8 * j] = 500.0
    gr = np.zeros(dims + (2,), np.float32)
    gr[..., 0] = 1.0
    gs = np.full(dims + (3,), 0.1, np.float32)
    rng = np.random.RandomState(0)
    points = rng.uniform(0, res * 8 * n_side, (4000, 3)).astype(np.float32)
    xyz = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
    prob = np.full((4000,), 0.9, np.float32)
    cls = np.zeros((4000,), np.int32)
    return go, gr, gs, points, xyz, prob, cls


def test_peel_budget_exit_reporting():
    """max_iters below the peak count => budget exit is reported; a
    sufficient budget exits on the threshold like the reference."""
    go, gr, gs, points, xyz, prob, cls = _many_peak_grid(n_side=6)
    corner = np.zeros(3, np.float32)

    short = PeelConfig(res=0.05, max_boxes=8, max_iters=8)
    out = peel_boxes(go, gr, gs, points, xyz, prob, cls, corner, short)
    assert bool(out["truncated"])
    assert not bool(out["exit_on_threshold"])
    assert int(out["n_boxes"]) == 0

    enough = PeelConfig(res=0.05, max_boxes=8, max_iters=64)
    out = peel_boxes(go, gr, gs, points, xyz, prob, cls, corner, enough)
    assert not bool(out["truncated"])
    assert bool(out["exit_on_threshold"])


def test_peel_drop_reporting(rng):
    """Accepted boxes beyond max_boxes are counted in n_dropped."""
    res = 0.06
    specs = [
        (np.array([c, 0.6, c2], np.float32),
         np.array([0.3, 0.4, 0.3], np.float32), 0.2)
        for c in (0.8, 2.6) for c2 in (0.8, 2.6)
    ]
    points, xyz, scl, prob, cls = _scene_with_boxes(rng, specs)
    corners = np.stack([points.min(0), points.max(0)])
    dims = ((corners[1] - corners[0]) / res).astype(np.int32) + 1
    go, gr, gs = hough_voting(
        points, xyz, scl, prob, res=res, num_rots=24,
        grid_shape=tuple(int(d) for d in dims))
    full = PeelConfig(res=res, max_boxes=16, max_iters=64)
    out_full = peel_boxes(np.asarray(go), np.asarray(gr), np.asarray(gs),
                          points, xyz, prob, cls, corners[0], full)
    n_all = int(out_full["n_boxes"])
    assert n_all == 4 and not bool(out_full["truncated"])

    tight = PeelConfig(res=res, max_boxes=2, max_iters=64)
    out = peel_boxes(np.asarray(go), np.asarray(gr), np.asarray(gs),
                     points, xyz, prob, cls, corners[0], tight)
    assert int(out["n_boxes"]) == 2
    assert int(out["n_dropped"]) == n_all - 2
    assert bool(out["truncated"])


def test_peel_retry_escalation_recovers():
    """The pipelines' retry loop (run_scene_with_retry: 4x max_iters, 2x
    max_boxes per escalation) reaches a threshold exit on an adversarial
    many-peak grid within two escalations."""
    go, gr, gs, points, xyz, prob, cls = _many_peak_grid(n_side=6)
    corner = np.zeros(3, np.float32)
    cfg = PeelConfig(res=0.05, max_boxes=8, max_iters=4)
    out = peel_boxes(go, gr, gs, points, xyz, prob, cls, corner, cfg)
    n_retries = 0
    while bool(out["truncated"]):
        assert n_retries < 3, "escalation did not converge"
        import dataclasses

        cfg = dataclasses.replace(cfg, max_iters=cfg.max_iters * 4,
                                  max_boxes=cfg.max_boxes * 2)
        out = peel_boxes(go, gr, gs, points, xyz, prob, cls, corner, cfg)
        n_retries += 1
    assert bool(out["exit_on_threshold"])
    assert n_retries <= 2
