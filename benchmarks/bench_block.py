"""TPU microbenchmark: fused residual-block kernel vs two tiled_conv3d.

Real ScanNet-scale tile lists at L0/L1. Usage:
  python benchmarks/bench_block.py [L0_group ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.dense_prep import TILE_PLAN, dense_grid_geometry
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ, pack_occ_expanded,
    tiled_block3d, tiled_conv3d)
from canonicalvoting_tpu.ops.voxelize import sparse_quantize


@jax.jit
def _red(x):
    return jnp.sum(x.astype(jnp.float32))


def fetch(x):
    np.asarray(jax.device_get(_red(x)))


def timeit(fn, iters=10):
    fetch(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rng = np.random.RandomState(0)
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
    coords, _ = sparse_quantize(scene.points, 0.03)
    base, dims = dense_grid_geometry(coords)
    c = coords - base

    levels = {0: c, 1: np.unique(c // 2, axis=0)}
    bgroups = {0: [int(a) for a in sys.argv[1:]] or [4, 8], 1: [1, 2]}

    cases = {"0": [(0, 96)], "1": [(1, 96), (1, 32)]}[
        os.environ.get("BENCH_LEVEL", "0")]
    for lvl, ch in cases:
        d = tuple(x >> lvl for x in dims)
        ts, G = TILE_PLAN[lvl]
        tiles = occupied_tiles(levels[lvl], d, ts, pad_multiple=32)
        key = jax.random.PRNGKey(lvl)
        xm = jax.random.normal(key, margined_shape(d, ch), jnp.bfloat16)
        occg = (jax.random.uniform(key, xm.shape[:3]) < 0.3).astype(
            jnp.float32)
        occ = pack_occ(occg, jnp.asarray(tiles), ts)
        occ_e = pack_occ_expanded(occg, jnp.asarray(tiles), ts)
        w1 = jax.random.normal(key, (27, ch, ch), jnp.bfloat16) * 0.1
        w2 = jax.random.normal(key, (27, ch, ch), jnp.bfloat16) * 0.1
        a = jnp.ones((ch,), jnp.float32)
        b = jnp.zeros((ch,), jnp.float32)
        tj = jnp.asarray(tiles)

        def two_conv():
            h = tiled_conv3d(xm, w1, tj, scale=a, bias=b, occ=occ,
                             relu_out=True, tile_shape=ts, group=G)
            return tiled_conv3d(h, w2, tj, scale=a, bias=b, occ=occ,
                                residual=xm, relu_out=True, tile_shape=ts,
                                group=G)

        t2 = timeit(two_conv)
        print(f"L{lvl} ch={ch:3d}: two-conv ({G=}) {t2:7.2f} ms "
              f"({len(tiles)} tiles {ts})", flush=True)
        for bg in bgroups[lvl]:
            if len(tiles) % bg:
                continue

            def blk():
                return tiled_block3d(
                    xm, w1, w2, tj, scale1=a, bias1=b, scale2=a, bias2=b,
                    occ_e=occ_e, tile_shape=ts, group=bg)

            tb = timeit(blk)
            print(f"L{lvl} ch={ch:3d}: block G={bg}   {tb:7.2f} ms "
                  f"({t2 / tb:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
