"""Per-layer TPU timing of the dense UNet's tiled convs (margined API).

Usage: python benchmarks/profile_layers.py
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
    MX, MY, MZ, fold_dydz, margined_shape, occupied_tiles, pack_occ,
    tiled_conv3d)
from canonicalvoting_tpu.ops.voxelize import sparse_quantize


@jax.jit
def _red(x):
    return jnp.sum(x.astype(jnp.float32))


def fetch(x):
    np.asarray(jax.device_get(_red(x)))


def timeit(fn, *args, iters=10, **kw):
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
    levels = {}
    for lvl in range(3):
        levels[lvl] = (tuple(int(x) for x in d), c.copy())
        c = np.unique(c // 2, axis=0)
        d = d // 2

    def setup(lvl, cin):
        dlv, cc = levels[lvl]
        ts, G = TILE_PLAN[lvl]
        t = occupied_tiles(cc, dlv, ts, pad_multiple=G)
        og = np.zeros(dlv, np.float32)
        og[cc[:, 0], cc[:, 1], cc[:, 2]] = 1.0
        og = jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))
        tt = jnp.asarray(t)
        op = pack_occ(og, tt, ts)
        xm = jax.random.normal(key, margined_shape(dlv, cin), jnp.bfloat16)
        return xm, tt, op, ts, G, len(t)

    total = 0.0
    # (lvl, cin, cout, count) k=3 tiled convs in MinkUNet34C inference
    for lvl, cin, cout, cnt in [
        (0, 128, 96, 1), (0, 96, 96, 3),
        (1, 128, 96, 1), (1, 96, 96, 3), (1, 32, 32, 4),
        (2, 192, 128, 1), (2, 128, 128, 3), (2, 64, 64, 6),
    ]:
        xm, tt, op, ts, G, nt = setup(lvl, cin)
        w = jax.random.normal(key, (27, cin, cout), jnp.bfloat16) * 0.05
        sc = jnp.ones((cout,), jnp.float32)
        bi = jnp.zeros((cout,), jnp.float32)
        ms = timeit(tiled_conv3d, xm, w, tt, scale=sc, bias=bi, occ=op,
                    relu_out=True, tile_shape=ts, group=G)
        total += ms * cnt
        print(f"tiled L{lvl} {cin:3d}->{cout:3d} x{cnt}  {ms:7.2f} ms "
              f"({nt} tiles {ts} G={G})")
    print(f"{'TOTAL tiled k=3':34s} {total:7.2f} ms")

    # stem: fold + prefolded k=5
    xm, tt, op, ts, G, nt = setup(0, 3)
    xm3 = xm[..., :3]
    w5 = jax.random.normal(key, (125, 3, 32), jnp.bfloat16) * 0.05
    sc = jnp.ones((32,), jnp.float32)
    bi = jnp.zeros((32,), jnp.float32)
    ms_fold = timeit(jax.jit(lambda x: fold_dydz(x, 5)), xm3)
    xf = fold_dydz(xm3, 5)

    def stem(xf):
        return tiled_conv3d(xf, w5, tt, kernel_size=5, prefolded=True,
                            scale=sc, bias=bi, occ=op, relu_out=True,
                            tile_shape=ts, group=G)

    ms_stem = timeit(stem, xf)
    print(f"stem fold {ms_fold:6.2f} ms + kernel {ms_stem:6.2f} ms")


if __name__ == "__main__":
    main()
