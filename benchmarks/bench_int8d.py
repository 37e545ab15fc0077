"""TPU A/B: tiled_conv3d bf16 vs int8 at the real L0 configuration.

The go/no-go measurement for the int8 backbone mode: same scene-derived
tile list, (4, 4, 8) tiles, G=16, 96->96 channels, occ + affine + relu
epilogue, int8 input grid + int8 requantized output (the steady state of
an int8 block stack). Usage: python benchmarks/bench_int8d.py
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
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ_group, tiled_conv3d)
from canonicalvoting_tpu.ops.voxelize import sparse_quantize


def fetch(x):
    np.asarray(jax.device_get(jnp.sum(x[MX + 1, MY + 1])))


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
    c = coords - base
    ts, G = (4, 4, 8), 16
    tiles = jnp.asarray(occupied_tiles(c, dims, ts, pad_multiple=G))
    cch = 96
    shape = margined_shape(dims, cch)
    occ_grid = jnp.zeros(shape[:3], jnp.float32).at[
        c[:, 0] + MX, c[:, 1] + MY, c[:, 2] + MZ].set(1.0)
    occp = pack_occ_group(occ_grid, tiles, ts, G)
    print(f"{len(tiles)} tiles {ts} G={G} grid {shape}", flush=True)

    w = jnp.asarray(rng.randn(27, cch, cch).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(cch).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(cch).astype(np.float32) * 0.1)
    sx = jnp.asarray((rng.rand(cch).astype(np.float32) + 0.5) * 0.02)
    so = jnp.asarray((rng.rand(cch).astype(np.float32) + 0.5) * 0.02)

    xb = jnp.zeros(shape, jnp.bfloat16).at[
        c[:, 0] + MX, c[:, 1] + MY, c[:, 2] + MZ, :cch].set(1.0)
    xq = jnp.zeros(shape[:3] + (128,), jnp.int8).at[
        c[:, 0] + MX, c[:, 1] + MY, c[:, 2] + MZ, :cch].set(50)

    t_bf16 = timeit(
        tiled_conv3d, xb, w, tiles, scale=scale, bias=bias, occ=occp,
        relu_out=True, tile_shape=ts, group=G)
    print(f"bf16  in / bf16 out: {t_bf16:7.2f} ms", flush=True)

    t_i8 = timeit(
        tiled_conv3d, xq, w, tiles, x_scale=sx, scale=scale, bias=bias,
        occ=occp, out_scale=so, relu_out=True, tile_shape=ts, group=G)
    print(f"int8  in / int8 out: {t_i8:7.2f} ms   "
          f"speedup {t_bf16 / t_i8:.2f}x", flush=True)

    # segment-boundary variants
    t_b2i = timeit(
        tiled_conv3d, xb, w, tiles, scale=scale, bias=bias, occ=occp,
        out_scale=so, relu_out=True, tile_shape=ts, group=G)
    print(f"bf16  in / int8 out: {t_b2i:7.2f} ms", flush=True)
    t_i2b = timeit(
        tiled_conv3d, xq, w, tiles, x_scale=sx, scale=scale, bias=bias,
        occ=occp, relu_out=True, tile_shape=ts, group=G)
    print(f"int8  in / bf16 out: {t_i2b:7.2f} ms", flush=True)

    # with an int8 residual (block conv2 steady state)
    t_i8r = timeit(
        tiled_conv3d, xq, w, tiles, x_scale=sx, scale=scale, bias=bias,
        occ=occp, residual=xq, res_x_scale=sx, out_scale=so,
        relu_out=True, tile_shape=ts, group=G)
    print(f"int8 + int8 residual: {t_i8r:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
