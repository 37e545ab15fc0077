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
