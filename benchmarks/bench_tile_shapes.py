"""TPU sweep: tiled_conv3d (tile_shape, group) at the UNet's real L0/L1
shapes on a ScanNet-scale synthetic scene (margined-grid API).

Usage: python benchmarks/bench_tile_shapes.py
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
    c0 = coords - base
    c1 = np.unique(c0 // 2, axis=0)
    dims1 = tuple(d // 2 for d in dims)
    key = jax.random.PRNGKey(0)

    cases = [
        ("L0 128->96", c0, dims, 128, 96),
        ("L0  96->96", c0, dims, 96, 96),
        ("L1  96->96", c1, dims1, 96, 96),
        ("L1  32->32", c1, dims1, 32, 32),
    ]
    shapes = [
        ((8, 8, 32), 2), ((8, 8, 8), 4), ((8, 8, 8), 8),
        ((4, 8, 8), 8), ((4, 8, 8), 16),
        ((4, 4, 8), 8), ((4, 4, 8), 16),
    ]
    for label, c, d, cin, cout in cases:
        xm = jax.random.normal(key, margined_shape(d, cin), jnp.bfloat16)
        w = jax.random.normal(key, (27, cin, cout), jnp.bfloat16) * 0.05
        og = np.zeros(d, np.float32)
        og[c[:, 0], c[:, 1], c[:, 2]] = 1.0
        og = jnp.pad(jnp.asarray(og), ((MX, MX), (MY, MY), (MZ, MZ)))
        sc = jnp.ones((cout,), jnp.float32)
        bi = jnp.zeros((cout,), jnp.float32)
        print(f"--- {label}  dims={d} voxels={len(c)}")
        for ts, G in shapes:
            if any(dd % tt for dd, tt in zip(d, ts)):
                continue
            t = occupied_tiles(c, d, ts, pad_multiple=G)
            tt_ = jnp.asarray(t)
            op = pack_occ(og, tt_, ts)
            try:
                ms = timeit(tiled_conv3d, xm, w, tt_, scale=sc, bias=bi,
                            occ=op, relu_out=True, tile_shape=ts, group=G)
            except Exception as e:  # noqa
                print(f"  {ts} G={G:2d}: FAILED "
                      f"{str(e).splitlines()[0][:100]}")
                continue
            cells = len(t) * np.prod(ts)
            gflop = cells * 27 * cin * cout * 2 / 1e9
            print(f"  {ts} G={G:2d}: {ms:7.2f} ms  ({len(t):5d} tiles, "
                  f"{cells/1e6:.2f}M cells, {gflop/ms:.0f} GF/ms)")


if __name__ == "__main__":
    main()
