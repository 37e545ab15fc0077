"""TPU microbenchmark: tiled_conv3d cost vs channel width at fixed tiles.

Question for the round-4 separate-path (9-category) optimization: is the
occupied-tile conv's cost FLAT in the real channel count up to the 128-lane
block (padding waste -> packing 4x32ch categories into one 128-lane grid is
free), or does it scale with real channels?

Uses the production layout (margined grid, same tile plans as the
pipeline). Run: python benchmarks/bench_chanwidth.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.dense_prep import dense_flat_ids, dense_grid_geometry
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ, tiled_conv3d,
)
from canonicalvoting_tpu.ops.voxelize import sparse_quantize


def fetch(x):
    return np.asarray(jax.device_get(jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))(x)))


def timeit(fn, *args, iters=20):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rng = np.random.RandomState(0)
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
    coords, _ = sparse_quantize(scene.points, 0.03)
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)  # MARGINED ids
    mdims = (dims[0] + 2 * MX, dims[1] + 2 * MY, dims[2] + 2 * MZ)
    relm = np.stack(np.unravel_index(flat, mdims), -1)
    rel = relm - np.asarray([MX, MY, MZ])  # interior coords
    print(f"voxels={len(coords)} dims={dims}")

    # L0 production plan (eval pipeline): tile (2,2,8), group 64
    tile_shape, G = (2, 2, 8), 64
    tiles_np = occupied_tiles(rel, dims, tile_shape)
    pad = (-len(tiles_np)) % G
    if pad:
        tiles_np = np.concatenate([tiles_np, np.repeat(tiles_np[-1:], pad, 0)])
    tiles = jnp.asarray(tiles_np)
    print(f"L0 tiles={len(tiles_np)} covered={len(tiles_np)*8/1e3:.0f}k cells")

    for cin, cout in [(32, 32), (64, 64), (96, 96), (128, 128),
                      (128, 96), (256, 256), (384, 384)]:
        shape = margined_shape(dims, cin)
        x = jnp.zeros(shape, jnp.bfloat16)
        # fill occupied cells so no special-zero fast paths fire
        xi = x.at[relm[:, 0], relm[:, 1], relm[:, 2], :].set(
            jnp.asarray(rng.randn(len(rel), shape[-1]).astype(np.float32),
                        jnp.bfloat16))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05,
                        jnp.bfloat16)

        def conv(x_, w_):
            return tiled_conv3d(x_, w_, tiles, tile_shape=tile_shape,
                                group=G)

        t = timeit(jax.jit(conv), xi, w)
        blocks_k = -(-cin // 128)
        blocks_n = -(-cout // 128)
        print(f"cin={cin:>3} cout={cout:>3} ({blocks_k}x{blocks_n} lane "
              f"blocks): {t:7.2f} ms")


if __name__ == "__main__":
    main()
