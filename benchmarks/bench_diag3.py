"""TPU diagnostic 3: L2 64-ch anomaly, stem production cost, fine-tile L1.

Usage: python benchmarks/bench_diag3.py
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
    margined_shape, occupied_tiles, pack_occ, tiled_conv3d)
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
    c = coords - base
    d = np.array(dims)
    lv = {}
    for lvl in range(3):
        lv[lvl] = (c.copy(), tuple(int(x) for x in d))
        c = np.unique(c // 2, axis=0)
        d = d // 2
    key = jax.random.PRNGKey(0)

    def conv(lvl, cin, cout, ts, G, label, occd=True):
        cc, dd = lv[lvl]
        t = jnp.asarray(occupied_tiles(cc, dd, ts, pad_multiple=G))
        xm = jax.random.normal(key, margined_shape(dd, cin), jnp.bfloat16)
        w = jax.random.normal(key, (27, cin, cout), jnp.bfloat16) * 0.05
        og = np.zeros(dd, np.float32)
        og[cc[:, 0], cc[:, 1], cc[:, 2]] = 1.0
        og = jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))
        op = pack_occ(og, t, ts) if occd else None
        sc = jnp.ones((cout,), jnp.float32)
        bi = jnp.zeros((cout,), jnp.float32)

        @jax.jit
        def fn(xm, w):
            return tiled_conv3d(xm, w, t, tile_shape=ts, group=G,
                                scale=sc, bias=bi, occ=op, relu_out=True)

        ms = timeit(fn, xm, w)
        print(f"{label:<34} {ms:7.2f} ms ({len(t)} tiles)", flush=True)

    from canonicalvoting_tpu.ops.pallas.tiled_conv import MX, MY, MZ  # noqa

    # L2 anomaly: same tiles, 64 vs 128 channels, repeated twice
    conv(2, 128, 128, (8, 8, 16), 2, "L2 128->128 (8,8,16) G2")
    conv(2, 64, 64, (8, 8, 16), 2, "L2  64-> 64 (8,8,16) G2")
    conv(2, 128, 128, (8, 8, 16), 2, "L2 128->128 again")
    conv(2, 64, 64, (8, 8, 16), 2, "L2  64-> 64 again")
    conv(2, 64, 64, (4, 4, 8), 8, "L2  64-> 64 (4,4,8) G8")
    # L1 fine tiles vs plan
    conv(1, 96, 96, (8, 8, 16), 4, "L1  96-> 96 (8,8,16) G4 (plan)")
    conv(1, 96, 96, (4, 4, 8), 16, "L1  96-> 96 (4,4,8) G16")
    conv(1, 32, 32, (4, 4, 8), 16, "L1  32-> 32 (4,4,8) G16")

    # stem: production config — k=5 cin=3 compact in-kernel fold
    cc, dd = lv[0]
    ts, G = STEM_TILE_PLAN
    t = jnp.asarray(occupied_tiles(cc, dd, ts, pad_multiple=G))
    xm = jax.random.normal(key, margined_shape(dd, 3), jnp.bfloat16)
    w = jax.random.normal(key, (125, 3, 32), jnp.bfloat16) * 0.05
    og = np.zeros(dd, np.float32)
    og[cc[:, 0], cc[:, 1], cc[:, 2]] = 1.0
    og = jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))
    op = pack_occ(og, t, ts)
    sc = jnp.ones((32,), jnp.float32)
    bi = jnp.zeros((32,), jnp.float32)

    @jax.jit
    def stem_fn(xm, w):
        return tiled_conv3d(xm, w, t, tile_shape=ts, group=G, kernel_size=5,
                            scale=sc, bias=bi, occ=op, relu_out=True)

    ms = timeit(stem_fn, xm, w)
    print(f"{'stem k=5 compact (prod)':<34} {ms:7.2f} ms ({len(t)} tiles)")


if __name__ == "__main__":
    main()
