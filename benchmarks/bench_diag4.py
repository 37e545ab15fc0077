"""TPU diagnostic 4: stem fine tiles (group pack), down/up kernels, vote.

Usage: python benchmarks/bench_diag4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.dense_prep import (
    TILE_PLAN, TRANS_TILE_PLAN, dense_grid_geometry)
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.ops.hough_voting import (
    hough_voting_obj, round_grid_shape)
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ, pack_occ_group,
    pack_occ_parity, tiled_conv3d, tiled_down2, tiled_up2)
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
    for lvl in range(5):
        lv[lvl] = (c.copy(), tuple(int(x) for x in d))
        c = np.unique(c // 2, axis=0)
        d = d // 2

    def occ_m(lvl):
        cc, dd = lv[lvl]
        og = np.zeros(dd, np.float32)
        og[cc[:, 0], cc[:, 1], cc[:, 2]] = 1.0
        return jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))

    # --- stem fine-tile variants (group pack now legalizes (2,2,8))
    cc0, dd0 = lv[0]
    w5 = jax.random.normal(key, (125, 3, 32), jnp.bfloat16) * 0.05
    x3 = jax.random.normal(key, margined_shape(dd0, 3), jnp.bfloat16)
    sc32 = jnp.ones((32,), jnp.float32)
    bi32 = jnp.zeros((32,), jnp.float32)
    om0 = occ_m(0)
    for ts, G in [((4, 4, 8), 16), ((2, 2, 8), 64), ((4, 2, 8), 32)]:
        t = jnp.asarray(occupied_tiles(cc0, dd0, ts, pad_multiple=G))
        op = pack_occ_group(om0, t, ts, group=G)

        @jax.jit
        def fn(xm, w, t=t, op=op, ts=ts, G=G):
            return tiled_conv3d(xm, w, t, tile_shape=ts, group=G,
                                kernel_size=5, scale=sc32, bias=bi32,
                                occ=op, relu_out=True)

        ms = timeit(fn, x3, w5)
        print(f"stem {str(ts):<10} G{G:<3} grp-occ {ms:7.2f} ms "
              f"({len(t)} tiles)", flush=True)

    # --- down kernels (production: level key = output level)
    chans = {1: 32, 2: 64, 3: 128, 4: 256}
    for lvl in (1, 2, 3, 4):
        cin = chans[lvl]
        ccl, ddl = lv[lvl]
        ts, G = TILE_PLAN[lvl]
        t = jnp.asarray(occupied_tiles(ccl, ddl, ts, pad_multiple=G))
        op = pack_occ(occ_m(lvl), t, ts)
        fine_dims = lv[lvl - 1][1]
        xm = jax.random.normal(key, margined_shape(fine_dims, cin),
                               jnp.bfloat16)
        wd = jax.random.normal(key, (8, cin, cin), jnp.bfloat16) * 0.1
        sc = jnp.ones((cin,), jnp.float32)
        bi = jnp.zeros((cin,), jnp.float32)

        @jax.jit
        def fn(xm, wd, t=t, op=op, ts=ts, G=G):
            return tiled_down2(xm, wd, t, scale=sc, bias=bi, occ=op,
                               relu_out=True, tile_shape=ts, group=G)

        ms = timeit(fn, xm, wd)
        print(f"down L{lvl-1}->L{lvl} c{cin:<4} {ms:7.2f} ms "
              f"({len(t)} tiles)", flush=True)

    # --- up kernels (fine level = output; UP0 for L1->L0)
    ups = [(0, 128, 96, 32), (1, 256, 96, 64), (2, 256, 128, 128)]
    for lvl, cin, cout, skc in ups:
        ccl, ddl = lv[lvl]
        ts, G = TRANS_TILE_PLAN[-2] if lvl == 0 else TILE_PLAN[lvl]
        t = jnp.asarray(occupied_tiles(ccl, ddl, ts, pad_multiple=G))
        op = pack_occ_parity(occ_m(lvl), t, ts)
        xm = jax.random.normal(key, margined_shape(lv[lvl + 1][1], cin),
                               jnp.bfloat16)
        skip = jax.random.normal(
            key, margined_shape(ddl, skc), jnp.bfloat16)
        wu = jax.random.normal(key, (8, cin, cout), jnp.bfloat16) * 0.1
        sc = jnp.ones((cout,), jnp.float32)
        bi = jnp.zeros((cout,), jnp.float32)

        @jax.jit
        def fn(xm, wu, skip, t=t, op=op, ts=ts, G=G, skc=skc):
            return tiled_up2(xm, wu, t, scale=sc, bias=bi, occ=op,
                             skip=skip, skip_c=skc, relu_out=True,
                             tile_shape=ts, group=G)

        ms = timeit(fn, xm, wu, skip)
        print(f"up   L{lvl+1}->L{lvl} c{cin}->{cout}+{skc} {ms:7.2f} ms "
              f"({len(t)} tiles)", flush=True)

    # --- vote: full op at rot_chunk 4/8/16, and prep alone
    n = coords.shape[0]
    cap = int(np.ceil(n / 8192) * 8192)
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = coords * 0.03
    valid = np.zeros((cap,), np.int32)
    valid[:n] = 1
    xyz = rng.randn(cap, 3).astype(np.float32) * 0.2
    scl = np.abs(rng.randn(cap, 3)).astype(np.float32) * 0.5 + 0.1
    obj = rng.rand(cap).astype(np.float32)
    gs = round_grid_shape(
        (np.asarray(dims) + 32).tolist(), 64)
    gs = (gs[0], gs[1], int(np.ceil(gs[2] / 128) * 128))
    pts, xyz, scl, obj, valid = jax.device_put(
        (pts, xyz, scl, obj, valid))

    for rc in (4, 8, 16):
        @jax.jit
        def vfn(p, x, s, o, v, rc=rc):
            return hough_voting_obj(p, x, s, o, res=0.03, num_rots=120,
                                    grid_shape=gs, valid=v, rot_chunk=rc)

        ms = timeit(vfn, pts, xyz, scl, obj, valid)
        print(f"vote obj rot_chunk={rc:<3} {ms:7.2f} ms (grid {gs})",
              flush=True)


if __name__ == "__main__":
    main()
