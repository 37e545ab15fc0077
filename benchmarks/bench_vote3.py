"""TPU diagnostic 10: windowed vote kernel vs plane-splat — parity + speed.

Usage: python benchmarks/bench_vote3.py            (TPU)
       JAX_PLATFORMS=cpu python benchmarks/bench_vote3.py --interpret
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.ops.hough_voting import compute_corners, grid_dims_from_corners
from canonicalvoting_tpu.ops.pallas.hv_splat import (
    hv_splat_pallas, hv_splat_windowed)
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
    interp = "--interpret" in sys.argv
    rng = np.random.RandomState(0)
    if interp:
        n, cap = 600, 1024
        coords = rng.randint(0, 60, size=(n, 3)).astype(np.int32)
        gs = (64, 16, 128)
    else:
        scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                           n_boxes=6, pts_per_box=3000)
        coords, _ = sparse_quantize(scene.points, 0.03)
        n = coords.shape[0]
        cap = int(np.ceil(n / 8192) * 8192)
        dims_w = coords.max(0) - coords.min(0) + 1
        gs = tuple(int(np.ceil(d / m) * m)
                   for d, m in zip(dims_w, (32, 32, 128)))
        gs = (gs[0], gs[1], int(np.ceil(gs[2] / 128) * 128))
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = coords * 0.03
    valid = np.zeros((cap,), np.float32)
    valid[:n] = 1.0
    xyz = rng.randn(cap, 3).astype(np.float32) * 0.2
    scl = np.abs(rng.randn(cap, 3)).astype(np.float32) * 0.5 + 0.1
    # a few big boxes so the large-radius tail path is exercised
    big = rng.rand(cap) < 0.03
    scl[big] *= 6.0
    obj = rng.rand(cap).astype(np.float32)
    pts, xyz, scl, obj, valid = jax.device_put((pts, xyz, scl, obj, valid))
    valid_j = valid
    corners = compute_corners(pts, valid_j)
    dims = jnp.minimum(grid_dims_from_corners(corners, 0.03),
                       jnp.asarray(gs, jnp.int32))
    print("n =", n, "grid =", gs, flush=True)

    @jax.jit
    def base(p, x, s, o, v):
        return hv_splat_pallas(p, x, s, o, corners[0], dims, 0.03,
                               num_rots=120, grid_shape=gs, valid=v,
                               channels=1, interpret=interp)[..., 0]

    @jax.jit
    def wind(p, x, s, o, v):
        return hv_splat_windowed(p, x, s, o, corners[0], dims, 0.03,
                                 num_rots=120, grid_shape=gs, valid=v,
                                 interpret=interp)

    g0 = base(pts, xyz, scl, obj, valid_j)
    g1 = wind(pts, xyz, scl, obj, valid_j)
    d = jax.device_get(jnp.max(jnp.abs(g0 - g1)))
    rel = jax.device_get(jnp.max(jnp.abs(g0 - g1))
                         / (jnp.max(jnp.abs(g0)) + 1e-9))
    print(f"max|diff| = {float(d):.3e} (rel {float(rel):.3e})", flush=True)
    assert float(d) < 2e-2, float(d)

    if not interp:
        print(f"plane-splat : {timeit(base, pts, xyz, scl, obj, valid_j):7.2f} ms",
              flush=True)
        print(f"windowed    : {timeit(wind, pts, xyz, scl, obj, valid_j):7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
