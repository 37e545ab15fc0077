"""In-graph phase costs: time jit(backbone), jit(backbone+vote),
jit(backbone+vote+peel) with identical dispatch patterns; the increments
give the true in-graph cost of each phase (standalone phase timings carry
relay dispatch overhead that the fused program amortizes).

Usage: python benchmarks/profile_bisect.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.decode.peeling import PeelConfig, peel_boxes
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline, slice_joint_heads
from canonicalvoting_tpu.models import MinkUNet34C
from canonicalvoting_tpu.ops.hough_voting import (
    compute_corners, grid_dims_from_corners, hough_voting_obj,
    vote_stats_at_cell)


@jax.jit
def _red(tree):
    return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(tree))


def fetch(x):
    np.asarray(jax.device_get(_red(x)))


def timeit(fn, *args, iters=8, **kw):
    fetch(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
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
     tiles, run_spec, run_tiles, occ_packs) = args
    dm = pipe._dense_model
    variables = jax.jit(
        lambda r, f, fi, v: dm.init(r, f, fi, v, tuple(dense_dims), False,
                                    tiles=tiles)
    )(jax.random.PRNGKey(0), feats, flat, valid)
    cfg = pipe.peel
    dd = tuple(int(d) for d in dense_dims)

    def backbone(vs, f, fi, v):
        return dm.apply(vs, f, fi, v, dd, False, tiles=tiles)

    def heads_vote(out, cw, v):
        xyz, scale, class_pred, prob = slice_joint_heads(out)
        scale = jnp.exp(scale)
        corners = compute_corners(cw, v)
        go = hough_voting_obj(cw, xyz, scale, prob, res=0.03, num_rots=120,
                              grid_shape=grid_shape, corners=corners, valid=v)
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

        return peel_boxes(go, None, None, cw, xyz, prob, class_pred, corner,
                          cfg, valid=v, rot_scale_fn=rot_scale_fn)

    p1 = jax.jit(backbone)
    p2 = jax.jit(lambda vs, f, fi, v, cw: heads_vote(
        backbone(vs, f, fi, v), cw, v)[0])
    p3 = jax.jit(full)

    t1 = timeit(p1, variables, feats, flat, valid)
    t2 = timeit(p2, variables, feats, flat, valid, coords_w)
    t3 = timeit(p3, variables, feats, flat, valid, coords_w)
    print(f"backbone              {t1:7.1f} ms")
    print(f"+ vote (obj)          {t2:7.1f} ms   (vote ~ {t2 - t1:.1f})")
    print(f"+ peel (lazy r/s)     {t3:7.1f} ms   (peel ~ {t3 - t2:.1f})")


if __name__ == "__main__":
    main()
