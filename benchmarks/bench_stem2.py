"""TPU diagnostic 11: stem compact-fold vs prefolded on the fine tile plan.

The compact stem reads 128-lane windows with only 3 real lanes (42x DMA
byte waste) and pays the 25-tap in-kernel fold; prefolded mode reads a
fold_dydz'd grid (75 real lanes) pointwise with no y/z halo, trading a
one-time full-grid XLA fold pass. Usage: python benchmarks/bench_stem2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.dense_prep import (
    STEM_TILE_PLAN, dense_grid_geometry)
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    MX, MY, MZ, fold_dydz, margined_shape, occupied_tiles, pack_occ_group,
    tiled_conv3d)
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
    key = jax.random.PRNGKey(0)
    cc0 = coords - base

    og = np.zeros(dims, np.float32)
    og[cc0[:, 0], cc0[:, 1], cc0[:, 2]] = 1.0
    om0 = jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))
    w5 = jax.random.normal(key, (125, 3, 32), jnp.bfloat16) * 0.05
    sc = jnp.ones((32,), jnp.float32)
    bi = jnp.zeros((32,), jnp.float32)
    x3 = jax.random.normal(
        key, tuple(d + 2 * m for d, m in zip(dims, (MX, MY, MZ))) + (3,),
        jnp.bfloat16)
    x3p = jnp.pad(x3, ((0, 0),) * 3 + ((0, 125),))  # 128-lane storage

    for ts, G in [STEM_TILE_PLAN, ((4, 4, 8), 16), ((8, 8, 16), 4)]:
        t = jnp.asarray(occupied_tiles(cc0, dims, ts, pad_multiple=G))
        op = pack_occ_group(om0, t, ts, group=G)

        @jax.jit
        def compact(xm, w, t=t, op=op, ts=ts, G=G):
            return tiled_conv3d(xm, w, t, tile_shape=ts, group=G,
                                kernel_size=5, scale=sc, bias=bi, occ=op,
                                relu_out=True)

        @jax.jit
        def prefold(x3, w, t=t, op=op, ts=ts, G=G):
            xf = fold_dydz(x3, 5)
            return tiled_conv3d(xf, w, t, tile_shape=ts, group=G,
                                kernel_size=5, prefolded=True, scale=sc,
                                bias=bi, occ=op, relu_out=True)

        print(f"{ts} G{G}: compact {timeit(compact, x3p, w5):7.2f} ms | "
              f"prefold(e2e) {timeit(prefold, x3, w5):7.2f} ms "
              f"({len(t)} tiles)", flush=True)


if __name__ == "__main__":
    main()
