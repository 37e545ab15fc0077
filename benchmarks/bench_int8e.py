"""TPU diagnostic 13: where does the non-MXU conv-kernel time go?

Per-level A/B of tiled_conv3d: bf16 vs int8, G sweep, occ/affine on/off,
k=1 (no fold) vs k=3 — at the real per-level tile/channel configurations.
L2's 64-ch convs run at ~44 ns/covered-cell (10x the padded MXU bound), so
something besides the matmul binds; this isolates it.

Usage: python benchmarks/bench_int8e.py
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
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ, pack_occ_group,
    tiled_conv3d)
from canonicalvoting_tpu.ops.voxelize import sparse_quantize


def fetch(x):
    np.asarray(jax.device_get(jnp.sum(x[MX + 1, MY + 1].astype(jnp.float32))))


def timeit(f, *a, iters=10, **kw):
    fetch(f(*a, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a, **kw)
    fetch(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
    coords, _ = sparse_quantize(scene.points, 0.03)
    base, dims = dense_grid_geometry(coords)
    c0 = coords - base

    for lvl, ts, cch, gs in [
        (2, (8, 8, 16), 64, (2, 4, 8)),
        (1, (8, 8, 16), 32, (4, 8)),
        (0, (4, 4, 8), 96, (16,)),
    ]:
        c = c0 // (1 << lvl)
        c = np.unique(c, axis=0)
        d = tuple(x >> lvl for x in dims)
        shape = margined_shape(d, cch)
        occ_grid = jnp.zeros(shape[:3], jnp.float32).at[
            c[:, 0] + MX, c[:, 1] + MY, c[:, 2] + MZ].set(1.0)
        w = jnp.asarray(rng.randn(27, cch, cch).astype(np.float32) * 0.1)
        w1 = jnp.asarray(rng.randn(1, cch, cch).astype(np.float32) * 0.1)
        scale = jnp.asarray(rng.rand(cch).astype(np.float32) + 0.5)
        bias = jnp.asarray(rng.randn(cch).astype(np.float32) * 0.1)
        sx = jnp.asarray((rng.rand(cch).astype(np.float32) + 0.5) * 0.02)
        so = jnp.asarray((rng.rand(cch).astype(np.float32) + 0.5) * 0.02)
        xb = jnp.zeros(shape, jnp.bfloat16).at[
            c[:, 0] + MX, c[:, 1] + MY, c[:, 2] + MZ, :cch].set(1.0)
        xq = (xb * 50).astype(jnp.int8)

        for G in gs:
            tiles = jnp.asarray(occupied_tiles(c, d, ts, pad_multiple=G))
            cells = len(tiles) * ts[0] * ts[1] * ts[2]
            occp = pack_occ_group(occ_grid, tiles, ts, G)
            tag = f"L{lvl} {cch}ch {ts} T={len(tiles)} G={G}"

            t_full = timeit(tiled_conv3d, xb, w, tiles, scale=scale,
                            bias=bias, occ=occp, relu_out=True,
                            tile_shape=ts, group=G)
            t_noep = timeit(tiled_conv3d, xb, w, tiles,
                            tile_shape=ts, group=G)
            t_k1 = timeit(tiled_conv3d, xb, w1, tiles, scale=scale,
                          bias=bias, occ=occp, relu_out=True,
                          kernel_size=1, tile_shape=ts, group=G)
            t_i8 = timeit(tiled_conv3d, xq, w, tiles, x_scale=sx,
                          scale=scale, bias=bias, occ=occp, out_scale=so,
                          relu_out=True, tile_shape=ts, group=G)
            ns = lambda t: t * 1e6 / cells
            print(f"{tag}: full {t_full:6.2f} ms ({ns(t_full):5.1f} ns/cell)"
                  f"  no-epi {t_noep:6.2f}  k1 {t_k1:6.2f}"
                  f"  int8 {t_i8:6.2f} ({t_full / t_i8:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
