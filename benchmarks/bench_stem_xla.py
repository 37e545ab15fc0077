"""TPU diagnostic 7: dense XLA k=5 stem vs the Pallas tiled stem.

The tiled stem is fold-bound (~18 ms) while its true MXU work is ~0.1 ms;
XLA's native conv handles the 3->32 channel k=5 conv with conv-specific
layouts and may beat the occupied-tile formulation outright on the full
dense grid. Usage: python benchmarks/bench_stem_xla.py
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
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ_group, tiled_conv3d)
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
    occ_m = jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))

    w5 = jax.random.normal(key, (125, 3, 32), jnp.bfloat16) * 0.05
    sc = jnp.ones((32,), jnp.float32)
    bi = jnp.zeros((32,), jnp.float32)

    # tiled baseline
    ts, G = STEM_TILE_PLAN
    t = jnp.asarray(occupied_tiles(cc0, dims, ts, pad_multiple=G))
    op = pack_occ_group(occ_m, t, ts, group=G)
    x3 = jax.random.normal(key, margined_shape(dims, 3), jnp.bfloat16)

    @jax.jit
    def tiled(xm, w):
        return tiled_conv3d(xm, w, t, tile_shape=ts, group=G,
                            kernel_size=5, scale=sc, bias=bi, occ=op,
                            relu_out=True)

    print(f"stem tiled {ts} G{G}: {timeit(tiled, x3, w5):7.2f} ms "
          f"({len(t)} tiles)", flush=True)

    # dense XLA conv: input stored 3-channel (cheap), output padded lanes
    xs = jax.random.normal(
        key, tuple(d + 2 * m for d, m in zip(dims, (MX, MY, MZ))) + (3,),
        jnp.bfloat16)

    def xla_stem(xm, w, pad_out):
        wk = w.reshape(5, 5, 5, 3, 32)  # (dz, dy, dx, ci, co) x-fastest
        wk = jnp.transpose(wk, (2, 1, 0, 3, 4))  # (dx, dy, dz, ci, co)
        y = jax.lax.conv_general_dilated(
            xm[None], wk.astype(jnp.bfloat16), (1, 1, 1), "SAME",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            preferred_element_type=jnp.float32,
        )[0]
        y = y * sc[None, None, None] + bi[None, None, None]
        y = jnp.maximum(y, 0.0) * occ_m[..., None]
        y = y.astype(jnp.bfloat16)
        if pad_out:
            y = jnp.pad(y, ((0, 0),) * 3 + ((0, 96),))
        return y

    for pad_out in (False, True):
        fn = jax.jit(lambda xm, w, p=pad_out: xla_stem(xm, w, p))
        print(f"stem XLA dense pad_out={pad_out}: "
              f"{timeit(fn, xs, w5):7.2f} ms", flush=True)

    # bf16 everything, f32 accum conv only
    @jax.jit
    def xla_min(xm, w):
        wk = jnp.transpose(w.reshape(5, 5, 5, 3, 32), (2, 1, 0, 3, 4))
        y = jax.lax.conv_general_dilated(
            xm[None], wk, (1, 1, 1), "SAME",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )[0]
        return y

    print(f"stem XLA conv only (bf16 accum): {timeit(xla_min, xs, w5):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
