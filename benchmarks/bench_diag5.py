"""TPU diagnostic 5: fine tile shapes for the down/up transition kernels.

Usage: python benchmarks/bench_diag5.py
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
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ, pack_occ_parity,
    tiled_down2, tiled_up2)
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

    c = coords - base
    d = np.array(dims)
    lv = {}
    for lvl in range(3):
        lv[lvl] = (c.copy(), tuple(int(x) for x in d))
        c = np.unique(c // 2, axis=0)
        d = d // 2

    def occ_m(lvl):
        cc, dd = lv[lvl]
        og = np.zeros(dd, np.float32)
        og[cc[:, 0], cc[:, 1], cc[:, 2]] = 1.0
        return jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))

    # down L0->L1, cin 32
    cc1, dd1 = lv[1]
    om1 = occ_m(1)
    x0 = jax.random.normal(key, margined_shape(lv[0][1], 32), jnp.bfloat16)
    wd = jax.random.normal(key, (8, 32, 32), jnp.bfloat16) * 0.1
    sc = jnp.ones((32,), jnp.float32)
    bi = jnp.zeros((32,), jnp.float32)
    for ts, G in [((8, 8, 16), 4), ((4, 4, 8), 16), ((8, 4, 8), 8),
                  ((4, 4, 16), 8)]:
        t = jnp.asarray(occupied_tiles(cc1, dd1, ts, pad_multiple=G))
        op = pack_occ(om1, t, ts)

        @jax.jit
        def fn(xm, w, t=t, op=op, ts=ts, G=G):
            return tiled_down2(xm, w, t, scale=sc, bias=bi, occ=op,
                               relu_out=True, tile_shape=ts, group=G)

        ms = timeit(fn, x0, wd)
        print(f"down1 {str(ts):<11} G{G:<3} {ms:7.2f} ms ({len(t)} tiles)",
              flush=True)

    # up L1->L0 (c128 -> 96 + skip 32), fine-tile variants (z % 16)
    cc0, dd0 = lv[0]
    om0 = occ_m(0)
    x1 = jax.random.normal(key, margined_shape(lv[1][1], 128), jnp.bfloat16)
    skip0 = jax.random.normal(key, margined_shape(dd0, 32), jnp.bfloat16)
    wu = jax.random.normal(key, (8, 128, 96), jnp.bfloat16) * 0.1
    sc96 = jnp.ones((96,), jnp.float32)
    bi96 = jnp.zeros((96,), jnp.float32)
    for ts, G in [((8, 8, 32), 2), ((8, 8, 16), 4), ((4, 4, 16), 8),
                  ((4, 2, 16), 16), ((2, 4, 16), 16)]:
        t = jnp.asarray(occupied_tiles(cc0, dd0, ts, pad_multiple=G))
        op = pack_occ_parity(om0, t, ts)

        @jax.jit
        def fn(xm, w, sk, t=t, op=op, ts=ts, G=G):
            return tiled_up2(xm, w, t, scale=sc96, bias=bi96, occ=op,
                             skip=sk, skip_c=32, relu_out=True,
                             tile_shape=ts, group=G)

        ms = timeit(fn, x1, wu, skip0)
        print(f"up0   {str(ts):<11} G{G:<3} {ms:7.2f} ms ({len(t)} tiles)",
              flush=True)

    # up L2->L1 (c256 -> 96 + skip 64)
    x2 = jax.random.normal(key, margined_shape(lv[2][1], 256), jnp.bfloat16)
    skip1 = jax.random.normal(key, margined_shape(dd1, 64), jnp.bfloat16)
    wu1 = jax.random.normal(key, (8, 256, 96), jnp.bfloat16) * 0.1
    for ts, G in [((8, 8, 16), 4), ((4, 4, 16), 8)]:
        t = jnp.asarray(occupied_tiles(cc1, dd1, ts, pad_multiple=G))
        op = pack_occ_parity(om1, t, ts)

        @jax.jit
        def fn(xm, w, sk, t=t, op=op, ts=ts, G=G):
            return tiled_up2(xm, w, t, scale=sc96, bias=bi96, occ=op,
                             skip=sk, skip_c=64, relu_out=True,
                             tile_shape=ts, group=G)

        ms = timeit(fn, x2, wu1, skip1)
        print(f"up1   {str(ts):<11} G{G:<3} {ms:7.2f} ms ({len(t)} tiles)",
              flush=True)


if __name__ == "__main__":
    main()
