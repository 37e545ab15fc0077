"""TPU diagnostic 6: up-kernel ablations (skip / occ / affine off) + HLO
copy check. Usage: python benchmarks/bench_diag6.py
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
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ_parity, tiled_up2)
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
    cc1 = np.unique(cc0 // 2, axis=0)
    dd1 = tuple(int(x) // 2 for x in dims)

    og = np.zeros(dims, np.float32)
    og[cc0[:, 0], cc0[:, 1], cc0[:, 2]] = 1.0
    om0 = jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))

    ts, G = (8, 8, 32), 2
    t = jnp.asarray(occupied_tiles(cc0, dims, ts, pad_multiple=G))
    op = pack_occ_parity(om0, t, ts)
    x1 = jax.random.normal(key, margined_shape(dd1, 128), jnp.bfloat16)
    skip0 = jax.random.normal(key, margined_shape(dims, 32), jnp.bfloat16)
    wu = jax.random.normal(key, (8, 128, 96), jnp.bfloat16) * 0.1
    sc = jnp.ones((96,), jnp.float32)
    bi = jnp.zeros((96,), jnp.float32)

    def mk(skip, occ, aff):
        @jax.jit
        def fn(xm, w, sk):
            return tiled_up2(
                xm, w, t,
                scale=sc if aff else None, bias=bi if aff else None,
                occ=op if occ else None,
                skip=sk if skip else None, skip_c=32 if skip else 0,
                relu_out=aff, tile_shape=ts, group=G)
        return fn

    full = mk(True, True, True)
    print(f"up0 full                {timeit(full, x1, wu, skip0):7.2f} ms",
          flush=True)
    print(f"up0 no skip             "
          f"{timeit(mk(False, True, True), x1, wu, skip0):7.2f} ms",
          flush=True)
    print(f"up0 no occ              "
          f"{timeit(mk(True, False, True), x1, wu, skip0):7.2f} ms",
          flush=True)
    print(f"up0 bare (conv only)    "
          f"{timeit(mk(False, False, False), x1, wu, skip0):7.2f} ms",
          flush=True)

    txt = full.lower(x1, wu, skip0).compile().as_text()
    import re
    copies = [ln for ln in txt.splitlines()
              if re.search(r"copy|transpose", ln) and "bf16" in ln]
    print(f"HLO lines with copy/transpose on bf16: {len(copies)}")
    for ln in copies[:8]:
        print("  ", ln.strip()[:140])


if __name__ == "__main__":
    main()
