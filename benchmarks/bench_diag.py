"""TPU diagnostic: what binds tiled_conv3d at L0 — fold, DMA, or cells?

Times, at the bench scene's L0 geometry (96->96, the dominant conv):
  A. k=3 on the production (4,4,8)xG16 plan          (baseline)
  B. k=1 on the SAME tiles (no fold, same DMA/cells) (isolates fold)
  C. k=3 with the production z-run decomposition      (DMA sharing)
  D. k=3 at finer tile shapes (overcompute reduction)

Usage: python benchmarks/bench_diag.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.dense_prep import (
    dense_grid_geometry, level_tile_runs)
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    margined_shape, occupied_tiles, tiled_conv3d)
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
    base, dims = dense_grid_geometry(coords)
    c0 = coords - base
    key = jax.random.PRNGKey(0)
    cin = cout = 96

    xm = jax.random.normal(key, margined_shape(dims, cin), jnp.bfloat16)
    w3 = jax.random.normal(key, (27, cin, cout), jnp.bfloat16) * 0.05
    w1 = jax.random.normal(key, (1, cin, cout), jnp.bfloat16) * 0.05

    def run(ts, G, k, label, zruns=None, iters=20):
        w = w3 if k == 3 else w1
        if zruns is not None:
            def fn():
                out = None
                for (R, Gr, t) in zruns:
                    out = tiled_conv3d(xm, w, t, tile_shape=ts, group=Gr,
                                       kernel_size=k, zrun=R, out=out)
                return out
            ms = timeit(fn, iters=iters)
            nt = sum(len(t) for (_r, _g, t) in zruns)
        else:
            t = occupied_tiles(c0, dims, ts, pad_multiple=G)
            t = jnp.asarray(t)
            ms = timeit(
                lambda: tiled_conv3d(xm, w, t, tile_shape=ts, group=G,
                                     kernel_size=k), iters=iters)
            nt = len(t)
        cells = nt * int(np.prod(ts))
        print(f"{label:<28} {ms:7.2f} ms  ({nt} dma-ents, "
              f"{cells/1e3:.0f}k cells)", flush=True)
        return ms

    run((4, 4, 8), 16, 3, "A k=3 (4,4,8) G16")
    run((4, 4, 8), 16, 1, "B k=1 (4,4,8) G16")
    runs = [(R, G, jnp.asarray(t))
            for (R, G, t) in level_tile_runs(coords, base, dims)[0]]
    run((4, 4, 8), None, 3, "C k=3 z-runs prod", zruns=runs)
    run((4, 4, 4), 32, 3, "D k=3 (4,4,4) G32")
    run((2, 4, 8), 32, 3, "D k=3 (2,4,8) G32")
    run((4, 2, 8), 32, 3, "D k=3 (4,2,8) G32")
    run((2, 2, 8), 64, 3, "D k=3 (2,2,8) G64")


if __name__ == "__main__":
    main()
