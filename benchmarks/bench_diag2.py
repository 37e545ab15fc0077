"""TPU diagnostic 2: in-jit z-run chains, finer tiles, group sweep at L0.

All variants run INSIDE one jit so chained donated outputs alias instead of
copying (bench_diag.py's cross-jit chain artifact).

Usage: python benchmarks/bench_diag2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

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

    def run_plain(ts, G, label):
        t = jnp.asarray(occupied_tiles(c0, dims, ts, pad_multiple=G))

        @jax.jit
        def fn(xm, w):
            return tiled_conv3d(xm, w, t, tile_shape=ts, group=G)

        ms = timeit(fn, xm, w3)
        cells = len(t) * int(np.prod(ts))
        print(f"{label:<30} {ms:7.2f} ms ({len(t)} tiles, "
              f"{cells/1e3:.0f}k cells)", flush=True)

    def run_zrun(ts, plan, label):
        runs = level_tile_runs(coords, base, dims,
                               run_plan={0: plan},
                               tile_plan={0: (ts, 16)})[0]
        runs = [(R, G, jnp.asarray(t)) for (R, G, t) in runs]

        @jax.jit
        def fn(xm, w):
            out = None
            for (R, G, t) in runs:
                out = tiled_conv3d(xm, w, t, tile_shape=ts, group=G,
                                   zrun=R, out=out)
            return out

        ms = timeit(fn, xm, w3)
        nd = sum(len(t) for (_r, _g, t) in runs)
        cells = sum(len(t) * R for (R, _g, t) in runs) * int(np.prod(ts))
        print(f"{label:<30} {ms:7.2f} ms ({nd} dma-ents, "
              f"{cells/1e3:.0f}k cells)", flush=True)

    run_plain((4, 4, 8), 16, "plain (4,4,8) G16")
    run_zrun((4, 4, 8), ((8, 2), (4, 4), (2, 8), (1, 16)),
             "zrun (4,4,8) R8/4/2/1")
    run_zrun((4, 4, 8), ((4, 4), (1, 16)), "zrun (4,4,8) R4/1")
    run_plain((4, 4, 8), 32, "plain (4,4,8) G32")
    run_plain((2, 4, 8), 32, "plain (2,4,8) G32")
    run_plain((4, 2, 8), 32, "plain (4,2,8) G32")
    run_plain((2, 2, 8), 64, "plain (2,2,8) G64")
    run_zrun((2, 4, 8), ((8, 4), (4, 8), (2, 16), (1, 32)),
             "zrun (2,4,8) R8/4/2/1")
    run_zrun((2, 2, 8), ((8, 8), (4, 16), (2, 32), (1, 64)),
             "zrun (2,2,8) R8/4/2/1")


if __name__ == "__main__":
    main()
