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
    # reduce ON DEVICE first: the relay transfer path runs at ~10 MB/s, so
    # fetching a full activation grid would dominate any timing
    return np.asarray(jax.device_get(_red(x)))


@jax.jit
def _red(x):
    return jnp.sum(x.astype(jnp.float32))


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


if __name__ == "__main__" and "--extras" not in sys.argv:
    main()


def main_extras():
    """Time the remaining dense-UNet pieces: stem k5, stride-2 down conv,
    transpose conv, the L0 elementwise mask+BN+relu chain, and the
    group_dz tiled variant."""
    rng = np.random.RandomState(0)
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
    coords, _ = sparse_quantize(scene.points, 0.03)
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    rel = np.stack(np.unravel_index(flat, dims), -1)
    dtype = jnp.bfloat16
    X, Y, Z = dims

    # stem k5 3->32
    x3 = jnp.asarray(rng.randn(X, Y, Z, 3).astype(np.float32), dtype)
    w5 = jnp.asarray(rng.randn(125, 3, 32).astype(np.float32) * 0.1)
    wk5 = _to_dense_kernel(w5, 5).astype(dtype)

    @jax.jit
    def stem(x_, wk_):
        return jax.lax.conv_general_dilated(
            x_[None], wk_, (1, 1, 1), [(2, 2)] * 3,
            dimension_numbers=_DN, preferred_element_type=dtype)[0]
    print(f"stem k5 3->32 XLA      {timeit(stem, x3, wk5):7.2f} ms")

    tiles = jnp.asarray(occupied_tiles(rel, dims, (8, 8, 32)))
    def tstem(x_, w_, t_):
        return tiled_conv3d(x_, w_, t_, kernel_size=5)
    try:
        print(f"stem k5 3->32 tiled    {timeit(tstem, x3, w5.astype(dtype), tiles):7.2f} ms")
    except Exception as e:
        print("stem tiled failed:", type(e).__name__, str(e)[:200])

    # down conv k2 s2 L0->L1 at 32ch
    x32 = jnp.asarray(rng.randn(X, Y, Z, 32).astype(np.float32), dtype)
    w2 = jnp.asarray(rng.randn(8, 32, 32).astype(np.float32) * 0.1)
    wk2 = _to_dense_kernel(w2, 2).astype(dtype)

    @jax.jit
    def down(x_, wk_):
        return jax.lax.conv_general_dilated(
            x_[None], wk_, (2, 2, 2), [(0, 1)] * 3,
            dimension_numbers=_DN, preferred_element_type=dtype)[0]
    print(f"down k2 s2 32->32 XLA  {timeit(down, x32, wk2):7.2f} ms")

    # transpose conv k2 s2 L1->L0 128->96
    x128 = jnp.asarray(
        rng.randn(X // 2, Y // 2, Z // 2, 128).astype(np.float32), dtype)
    wt = jnp.asarray(rng.randn(8, 128, 96).astype(np.float32) * 0.1)
    wkt = _to_dense_kernel(wt, 2).astype(dtype)

    @jax.jit
    def up(x_, wk_):
        return jax.lax.conv_transpose(
            x_[None], wk_[::-1, ::-1, ::-1], (2, 2, 2), "VALID",
            dimension_numbers=_DN, preferred_element_type=dtype)[0]
    print(f"convtr k2 128->96 XLA  {timeit(up, x128, wkt):7.2f} ms")

    # L0 elementwise chain at 96ch: mask -> BN affine -> relu
    x96 = jnp.asarray(rng.randn(X, Y, Z, 96).astype(np.float32), dtype)
    occ = jnp.asarray((rng.rand(X, Y, Z, 1) < 0.01).astype(np.float32))
    g = jnp.asarray(rng.rand(96).astype(np.float32))
    b = jnp.asarray(rng.rand(96).astype(np.float32))

    @jax.jit
    def chain(x_, occ_, g_, b_):
        out = (x_.astype(jnp.float32) * g_) * occ_ + b_ * occ_
        return jnp.maximum(out, 0.0).astype(x_.dtype)
    print(f"L0 mask+BN+relu 96ch   {timeit(chain, x96, occ, g, b):7.2f} ms")

    # group_dz tiled variants
    for cin, cout in [(96, 96), (128, 96)]:
        xx = jnp.asarray(rng.randn(X, Y, Z, cin).astype(np.float32), dtype)
        ww = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1,
                         dtype)
        def tg(x_, w_, t_):
            return tiled_conv3d(x_, w_, t_, group_dz=True)
        print(f"tiled group_dz {cin}->{cout} {timeit(tg, xx, ww, tiles):7.2f} ms")


if __name__ == "__main__" and "--extras" in sys.argv:
    main_extras()
