"""Peel-cost guard (VERDICT round 2, item 8).

``vote_stats_at_cell`` (the lazy per-box rotation/scale refit inside the
peel while_loop, ops/hough_voting.py) recomputes an O(N*R) sweep per
peeled box. That is measured-cheap while it overlaps the backbone, but it
would surface as the backbone shrinks — this guard times the peel phase's
in-graph increment (the profile_bisect methodology: identical dispatch
patterns, value-fetch barriers) and fails if it exceeds its budget, so a
regression shows up as a red TPU test instead of a silent e2e slowdown.

Run: python -m pytest tests_tpu/test_peel_budget.py -s
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="timing guard; needs the TPU backend",
)

PEEL_BUDGET_MS = 8.0  # exposed peel+refit increment per scene


@jax.jit
def _red(tree):
    return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(tree))


def _fetch(x):
    np.asarray(jax.device_get(_red(x)))


def _timeit(fn, *args, iters=8):
    _fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def test_peel_increment_within_budget():
    from canonicalvoting_tpu.data.geometry import NCLASSES
    from canonicalvoting_tpu.data.synthetic import make_scene
    from canonicalvoting_tpu.decode.peeling import PeelConfig, peel_boxes
    from canonicalvoting_tpu.eval.pipeline import (
        DetectionPipeline, slice_joint_heads)
    from canonicalvoting_tpu.models import MinkUNet34C
    from canonicalvoting_tpu.ops.hough_voting import (
        compute_corners, grid_dims_from_corners, hough_voting_obj,
        vote_stats_at_cell)

    rng = np.random.RandomState(0)
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
    pipe = DetectionPipeline(
        model=model, variables=None, res=0.03, num_rots=120,
        peel=PeelConfig(res=0.03, max_boxes=64, max_iters=96),
        cap_multiple=8192, backbone="dense")
    args = pipe.prepare_scene(scene.points, scene.rgb)
    (_, feats, flat, valid, coords_w, grid_shape, dense_dims,
     tiles, _rs, _rt, occ_packs) = args
    dm = pipe._dense_model
    dd = tuple(int(d) for d in dense_dims)
    variables = jax.jit(
        lambda r, f, fi, v: dm.init(r, f, fi, v, dd, False, tiles=tiles,
                                    occ_packs=occ_packs)
    )(jax.random.PRNGKey(0), feats, flat, valid)
    cfg = pipe.peel

    def backbone(vs, f, fi, v):
        return dm.apply(vs, f, fi, v, dd, False, tiles=tiles,
                        occ_packs=occ_packs)

    def heads_vote(out, cw, v):
        xyz, scale, class_pred, prob = slice_joint_heads(out)
        scale = jnp.exp(scale)
        corners = compute_corners(cw, v)
        go = hough_voting_obj(cw, xyz, scale, prob, res=0.03, num_rots=120,
                              grid_shape=grid_shape, corners=corners,
                              valid=v)
        return go, corners, xyz, scale, prob, class_pred

    def full(vs, f, fi, v, cw):
        out = backbone(vs, f, fi, v)
        go, corners, xyz, scale, prob, class_pred = heads_vote(out, cw, v)
        corner = corners[0]
        dims = jnp.minimum(grid_dims_from_corners(corners, 0.03),
                           jnp.asarray(grid_shape, jnp.int32))

        def rot_scale_fn(cand):
            return vote_stats_at_cell(cw, xyz, scale, prob, corner, dims,
                                      0.03, 120, cand, valid=v)

        return peel_boxes(go, None, None, cw, xyz, prob, class_pred,
                          corner, cfg, valid=v, rot_scale_fn=rot_scale_fn)

    p_vote = jax.jit(lambda vs, f, fi, v, cw: heads_vote(
        backbone(vs, f, fi, v), cw, v)[0])
    p_full = jax.jit(full)

    t_vote = _timeit(p_vote, variables, feats, flat, valid, coords_w)
    t_full = _timeit(p_full, variables, feats, flat, valid, coords_w)
    peel_ms = t_full - t_vote
    print(f"backbone+vote {t_vote:.1f} ms; +peel {t_full:.1f} ms "
          f"(peel increment {peel_ms:.1f} ms, budget {PEEL_BUDGET_MS})")
    assert peel_ms < PEEL_BUDGET_MS, (
        f"peel/refit increment {peel_ms:.1f} ms exceeds "
        f"{PEEL_BUDGET_MS} ms — vote_stats_at_cell's O(N*R)-per-box sweep "
        f"has surfaced; batch it across boxes or precompute the argmax "
        f"pyramid (ops/hough_voting.py)"
    )
