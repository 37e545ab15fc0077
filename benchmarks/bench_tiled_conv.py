"""TPU microbenchmark: Pallas occupied-tile Conv3D vs XLA dense Conv3D.

Runs the UNet's real L0/L1 conv shapes on a synthetic ScanNet-scale scene.
Timings use a value fetch (np.asarray) as the barrier — block_until_ready
does not block through the axon relay.

Usage: python benchmarks/bench_tiled_conv.py
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
from canonicalvoting_tpu.models.dense_unet import _DN, _to_dense_kernel
from canonicalvoting_tpu.ops.pallas.tiled_conv import occupied_tiles, tiled_conv3d
from canonicalvoting_tpu.ops.voxelize import sparse_quantize


def fetch(x):
    return np.asarray(jax.device_get(x))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    fetch(out if not isinstance(out, tuple) else out[0])  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rng = np.random.RandomState(0)
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
    coords, _ = sparse_quantize(scene.points, 0.03)
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    n_cells = dims[0] * dims[1] * dims[2]
    rel = np.stack(np.unravel_index(flat, dims), -1)
    print(f"voxels={len(coords)} dims={dims} cells={n_cells/1e6:.1f}M "
          f"occ={len(coords)/n_cells*100:.2f}%")

    dtype = jnp.bfloat16

    for lvl, (cin, cout) in [(0, (32, 32)), (0, (96, 96)), (0, (128, 96)),
                             (1, (64, 64)), (2, (128, 128))]:
        s = 1 << lvl
        d = tuple(x // s for x in dims)
        rel_l = np.unique(rel // s, axis=0)
        occ_frac = len(rel_l) / (d[0] * d[1] * d[2])

        x = np.zeros(d + (cin,), np.float32)
        x[rel_l[:, 0], rel_l[:, 1], rel_l[:, 2]] = rng.randn(
            len(rel_l), cin).astype(np.float32)
        xj = jnp.asarray(x, dtype)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

        # XLA dense conv
        wk = _to_dense_kernel(w, 3).astype(dtype)

        @jax.jit
        def xla_conv(x_, wk_):
            return jax.lax.conv_general_dilated(
                x_[None], wk_, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=_DN, preferred_element_type=dtype,
            )[0]

        t_xla = timeit(xla_conv, xj, wk)

        # Tiled pallas conv
        tile_shape = (8, 8, 32)
        tiles = jnp.asarray(occupied_tiles(rel_l, d, tile_shape))
        tile_frac = tiles.shape[0] / (
            (d[0] // 8) * (d[1] // 8) * (d[2] // 32))

        def tconv(x_, w_, t_):
            return tiled_conv3d(x_, w_, t_, tile_shape=tile_shape)

        try:
            t_tile = timeit(tconv, xj, w.astype(dtype), tiles)
        except Exception as e:  # noqa: BLE001
            t_tile = float("nan")
            print(f"  tiled failed: {type(e).__name__}: {e}")

        gflop = len(rel_l) * 27 * cin * cout * 2 / 1e9
        print(f"L{lvl} {cin:>3}->{cout:<3} occ_cells={len(rel_l):>7} "
              f"tiles={tiles.shape[0]:>5} ({tile_frac*100:4.1f}% of tiles, "
              f"{occ_frac*100:5.2f}% cells) useful={gflop:6.1f} GF | "
              f"XLA {t_xla:7.2f} ms | tiled {t_tile:7.2f} ms")


if __name__ == "__main__":
    main()
