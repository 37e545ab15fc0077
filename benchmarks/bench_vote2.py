"""TPU diagnostic 9: vote kernel knobs — chunk_points, gx trim, rot_chunk.

Usage: python benchmarks/bench_vote2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.dense_prep import dense_grid_geometry
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.ops.hough_voting import hough_voting_obj
from canonicalvoting_tpu.ops.voxelize import sparse_quantize


@jax.jit
def _red(x):
    return jnp.sum(x.astype(jnp.float32))


def fetch(x):
    np.asarray(jax.device_get(_red(x)))


def timeit(fn, *args, iters=20, **kw):
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
    coords, _ = sparse_quantize(scene.points, 0.03)
    n = coords.shape[0]
    cap = int(np.ceil(n / 8192) * 8192)
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = coords * 0.03
    valid = np.zeros((cap,), np.int32)
    valid[:n] = 1
    xyz = rng.randn(cap, 3).astype(np.float32) * 0.2
    scl = np.abs(rng.randn(cap, 3)).astype(np.float32) * 0.5 + 0.1
    obj = rng.rand(cap).astype(np.float32)
    dims_w = coords.max(0) - coords.min(0) + 1
    print("n =", n, "dims_w =", dims_w, flush=True)
    pts, xyz, scl, obj, valid = jax.device_put((pts, xyz, scl, obj, valid))

    def gs_for(mx):
        g = tuple(int(np.ceil(d / m) * m) for d, m in zip(dims_w, mx))
        return (g[0], g[1], int(np.ceil(g[2] / 128) * 128))

    # production bucketing (64, 32, 128) vs tighter (32, 32, 128)
    for mx, cp, rc in [
        ((64, 32, 128), 128, 8),
        ((32, 32, 128), 128, 8),
        ((32, 32, 128), 256, 8),
        ((32, 32, 128), 256, 4),
        ((32, 32, 128), 512, 8),
    ]:
        gs = gs_for(mx)

        @jax.jit
        def vfn(p, x, s, o, v, gs=gs, cp=cp, rc=rc):
            return hough_voting_obj(p, x, s, o, res=0.03, num_rots=120,
                                    grid_shape=gs, valid=v,
                                    pallas_rot_chunk=rc, chunk_points=cp)

        ms = timeit(vfn, pts, xyz, scl, obj, valid)
        print(f"grid {gs} chunk={cp:<4} rc={rc}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
