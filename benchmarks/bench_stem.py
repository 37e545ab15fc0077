"""TPU sweep: k=5 cin=3 stem tile shapes (production compact in-kernel fold).

Usage: python benchmarks/bench_stem.py
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
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ, tiled_conv3d)
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
    cc = coords - base
    key = jax.random.PRNGKey(0)

    og = np.zeros(dims, np.float32)
    og[cc[:, 0], cc[:, 1], cc[:, 2]] = 1.0
    og = jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))
    xm = jax.random.normal(key, margined_shape(dims, 3), jnp.bfloat16)
    w = jax.random.normal(key, (125, 3, 32), jnp.bfloat16) * 0.05
    sc = jnp.ones((32,), jnp.float32)
    bi = jnp.zeros((32,), jnp.float32)

    for ts, G in [((8, 8, 32), 2), ((8, 8, 16), 4), ((8, 8, 8), 8),
                  ((4, 4, 16), 8), ((4, 4, 8), 16), ((8, 4, 8), 8),
                  ((4, 8, 8), 8)]:
        t = jnp.asarray(occupied_tiles(cc, dims, ts, pad_multiple=G))
        op = pack_occ(og, t, ts)

        @jax.jit
        def fn(xm, w, t=t, op=op, ts=ts, G=G):
            return tiled_conv3d(xm, w, t, tile_shape=ts, group=G,
                                kernel_size=5, scale=sc, bias=bi, occ=op,
                                relu_out=True)

        ms = timeit(fn, xm, w)
        cells = len(t) * int(np.prod(ts))
        print(f"stem {str(ts):<12} G{G:<3} {ms:7.2f} ms "
              f"({len(t)} tiles, {cells/1e3:.0f}k cells)", flush=True)


if __name__ == "__main__":
    main()
