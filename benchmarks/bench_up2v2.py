"""TPU diagnostic 8: tiled_up2_into (one-matmul + parity DMAs, in-place
skip) vs tiled_up2 (strided VPU scatters) — correctness + speed.

Usage: python benchmarks/bench_up2v2.py           (TPU perf + parity)
       JAX_PLATFORMS=cpu python benchmarks/bench_up2v2.py --interpret
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
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ_parity,
    pack_occ_updma, tiled_up2, tiled_up2_into)
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
        dims = (32, 32, 32)
        coords = rng.randint(0, 32, size=(300, 3)).astype(np.int32)
        base = np.zeros((3,), np.int32)
    else:
        scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                           n_boxes=6, pts_per_box=3000)
        coords, _ = sparse_quantize(scene.points, 0.03)
        base, dims = dense_grid_geometry(coords)
    key = jax.random.PRNGKey(0)
    cc0 = coords - base
    dd1 = tuple(int(x) // 2 for x in dims)

    og = np.zeros(dims, np.float32)
    og[cc0[:, 0], cc0[:, 1], cc0[:, 2]] = 1.0
    om0 = jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))

    cin, cout, skc = 128, 96, 32
    x1 = jax.random.normal(key, margined_shape(dd1, cin), jnp.bfloat16)
    # margined_shape already lane-pads to 128; zero the pad lanes so the
    # [skip | conv] in-place write starts from a clean buffer
    skip0 = jax.random.normal(key, margined_shape(dims, skc), jnp.bfloat16)
    skip0 = skip0.at[..., skc:].set(0.0)
    wu = jax.random.normal(key, (8, cin, cout), jnp.bfloat16) * 0.1
    sc = jnp.abs(jax.random.normal(key, (cout,), jnp.float32)) + 0.5
    bi = jax.random.normal(key, (cout,), jnp.float32) * 0.1

    # old kernel reference on its own (z%16) list
    ts_o, G_o = ((8, 8, 32), 2) if not interp else ((4, 4, 16), 2)
    t_o = jnp.asarray(occupied_tiles(cc0, dims, ts_o, pad_multiple=G_o))
    op_o = pack_occ_parity(om0, t_o, ts_o)

    @jax.jit
    def old(xm, w, sk):
        return tiled_up2(xm, w, t_o, scale=sc, bias=bi, occ=op_o,
                         skip=sk, skip_c=skc, relu_out=True,
                         tile_shape=ts_o, group=G_o, interpret=interp)

    ref = old(x1, wu, skip0) if (interp or "--sweep" not in sys.argv) \
        else None

    for ts, G in ([((8, 8, 32), 2)] if not interp
                  else [((4, 4, 16), 2)]):
        if ref is None:
            break
        t = jnp.asarray(occupied_tiles(cc0, dims, ts, pad_multiple=G))
        op = pack_occ_updma(om0, t, ts, G)

        @jax.jit
        def new(xm, w, sk, t=t, op=op, ts=ts, G=G):
            return tiled_up2_into(xm, w, t, dest=sk, skip_c=skc,
                                  scale=sc, bias=bi, occ=op, relu_out=True,
                                  tile_shape=ts, group=G, interpret=interp)

        got = new(x1, wu, skip0)
        # old kernel writes only inside ITS tiles; compare there via mask.
        # diffs reduced ON DEVICE (full grids are ~GB over the relay)
        cov = np.zeros(dims, np.float32)
        TXo, TYo, TZo = ts_o
        for (tx, ty, tz) in np.asarray(t_o):
            cov[tx * TXo:(tx + 1) * TXo, ty * TYo:(ty + 1) * TYo,
                tz * TZo:(tz + 1) * TZo] = 1.0
        covm = jnp.asarray(
            np.pad(cov, ((MX, MX), (MY, MY), (MZ, MZ)))[..., None])

        @jax.jit
        def maxdiff(got, ref, covm):
            # new layout [skip | conv]; old [conv | skip]
            g_conv = got[..., skc:skc + cout].astype(jnp.float32)
            g_skip = got[..., :skc].astype(jnp.float32)
            r_conv = ref[..., :cout].astype(jnp.float32)
            r_skip = ref[..., cout:cout + skc].astype(jnp.float32)
            return (jnp.max(jnp.abs(g_conv - r_conv) * covm),
                    jnp.max(jnp.abs(g_skip - r_skip) * covm))

        dc, ds_ = jax.device_get(maxdiff(got, ref, covm))
        print(f"ts={ts} G={G}: conv max|d|={dc:.3e} "
              f"skip max|d|={ds_:.3e} ({len(t)} tiles)", flush=True)
        assert dc < 1e-2 and ds_ < 1e-6

    if not interp:
        if "--sweep" not in sys.argv:
            print(f"old (8,8,32)x2 : {timeit(old, x1, wu, skip0):7.2f} ms",
                  flush=True)
        for ts, G in [((8, 8, 32), 4), ((8, 8, 16), 8)]:
            t = jnp.asarray(occupied_tiles(cc0, dims, ts, pad_multiple=G))
            op = pack_occ_updma(om0, t, ts, G)

            @jax.jit
            def new(xm, w, sk, t=t, op=op, ts=ts, G=G):
                return tiled_up2_into(
                    xm, w, t, dest=sk, skip_c=skc, scale=sc, bias=bi,
                    occ=op, relu_out=True, tile_shape=ts, group=G)

            print(f"new {ts} G{G}: {timeit(new, x1, wu, skip0):7.2f} ms "
                  f"({len(t)} tiles)", flush=True)


if __name__ == "__main__" and "--ablate" not in sys.argv:
    main()


def ablate():
    """Ablations of tiled_up2_into: which part costs (TPU)."""
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
    cin, cout, skc = 128, 96, 32
    x1 = jax.random.normal(key, margined_shape(
        tuple(d // 2 for d in dims), cin), jnp.bfloat16)
    dest = jax.random.normal(key, margined_shape(dims, skc), jnp.bfloat16)
    dest = dest.at[..., skc:].set(0.0)
    wu = jax.random.normal(key, (8, cin, cout), jnp.bfloat16) * 0.1
    sc = jnp.ones((cout,), jnp.float32)
    bi = jnp.zeros((cout,), jnp.float32)
    ts, G = (8, 8, 32), 2
    t = jnp.asarray(occupied_tiles(cc0, dims, ts, pad_multiple=G))
    op = pack_occ_updma(om0, t, ts, G)

    def mk(skip, occ, aff):
        @jax.jit
        def fn(xm, w, d):
            return tiled_up2_into(
                xm, w, t, dest=d, skip_c=skc if skip else 0,
                scale=sc if aff else None, bias=bi if aff else None,
                occ=op if occ else None, relu_out=aff,
                tile_shape=ts, group=G)
        return fn

    print(f"v2 full      : {timeit(mk(True, True, True), x1, wu, dest):7.2f} ms",
          flush=True)
    print(f"v2 no skip   : {timeit(mk(False, True, True), x1, wu, dest):7.2f} ms",
          flush=True)
    print(f"v2 no occ    : {timeit(mk(True, False, True), x1, wu, dest):7.2f} ms",
          flush=True)
    print(f"v2 bare      : {timeit(mk(False, False, False), x1, wu, dest):7.2f} ms",
          flush=True)


if __name__ == "__main__" and "--ablate" in sys.argv:
    ablate()
    sys.exit(0)
