"""Per-phase TPU timing of the detection pipeline (value-fetch barriers).

Usage: python benchmarks/profile_e2e.py
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
from canonicalvoting_tpu.ops.hough_voting import hough_voting


@jax.jit
def _reduce(tree):
    return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(tree))


def fetch(x):
    # tiny scalar fetch: don't pull big arrays through the relay
    np.asarray(jax.device_get(_reduce(x)))


def timeit(fn, *args, iters=5, **kw):
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
        cap_multiple=8192, backbone="dense",
    )
    t0 = time.perf_counter()
    args = pipe.prepare_scene(scene.points, scene.rgb)
    t_prep = (time.perf_counter() - t0) * 1000
    (_, feats, flat, valid, coords_w, grid_shape, dense_dims,
     _tiles, _rs, _rt, _op) = args
    print(f"host prep {t_prep:.0f} ms | n={int(valid.sum())} cap={len(valid)} "
          f"dense_dims={dense_dims} grid_shape={grid_shape}")

    dm = pipe._dense_model
    variables = jax.jit(
        lambda r, f, fi, v: dm.init(r, f, fi, v, tuple(dense_dims), False)
    )(jax.random.PRNGKey(0), feats, flat, valid)
    pipe.variables = variables

    # phase 1: backbone
    fwd = jax.jit(
        lambda vs, f, fi, v: dm.apply(vs, f, fi, v, tuple(dense_dims), False)
    )
    t_fwd = timeit(fwd, variables, feats, flat, valid)
    out = fwd(variables, feats, flat, valid)

    # phase 2: head slice + hough voting
    @jax.jit
    def vote(out, coords_w, valid):
        xyz, scale, class_pred, prob = slice_joint_heads(out)
        scale = jnp.exp(scale)
        return hough_voting(coords_w, xyz, scale, prob, res=0.03,
                            num_rots=120, grid_shape=grid_shape, valid=valid)
    t_vote = timeit(vote, out, coords_w, valid)
    go, gr, gs = vote(out, coords_w, valid)

    # phase 3: peel
    @jax.jit
    def peel(go, gr, gs, coords_w, out, valid):
        xyz, scale, class_pred, prob = slice_joint_heads(out)
        corner = jnp.min(
            jnp.where(valid[:, None] > 0, coords_w, jnp.float32(3e38)), axis=0)
        return peel_boxes(go, gr, gs, coords_w, xyz, prob, class_pred, corner,
                          pipe.peel, valid=valid)
    t_peel = timeit(peel, go, gr, gs, coords_w, out, valid)

    # full fused scene fn (as bench.py runs it)
    t_full = timeit(lambda: pipe.run_scene(args), iters=3)

    print(f"backbone fwd  {t_fwd:8.1f} ms")
    print(f"vote          {t_vote:8.1f} ms")
    print(f"peel          {t_peel:8.1f} ms")
    print(f"fused total   {t_full:8.1f} ms")


if __name__ == "__main__":
    main()


def upload_test():
    import jax
    x = np.random.randn(65536, 3).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        xd = jax.device_put(x)
        xd.block_until_ready()
    print(f"device_put 780KB: {(time.perf_counter()-t0)/5*1000:.1f} ms")
