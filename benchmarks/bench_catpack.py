"""TPU microbench: per-call cost of tiled_conv3d vs LANE COUNT.

Question for the round-4 separate-path work (VERDICT r3 item 1): if N
categories' channels are packed into the lane dim with block-diagonal
weights (a grouped DenseMinkUNet with planes*N), how does the per-call
cost scale?  Free win iff cost(N*C lanes) < N * cost(C lanes).

Measures the real L0 decoder config (CONV_TILE_PLAN[0] = (2,2,8) x G64,
affine+occ+relu epilogue, ScanNet-scale occupancy) plus the L1 and L4
configs, sweeping channel counts.

Usage: python benchmarks/bench_catpack.py
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
    MX, MY, MZ, margined_shape, occupied_tiles, pack_occ_group, tiled_conv3d)
from canonicalvoting_tpu.ops.voxelize import sparse_quantize


def fetch(x):
    return np.asarray(jax.device_get(jax.jit(
        lambda v: jnp.sum(v.astype(jnp.float32)))(x)))


def timeit(fn, *args, iters=8):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def chained(x, w, tiles, occ, ab, ts, g, n=4):
    """n back-to-back convs (output feeds input) so per-call overheads that
    overlap across calls are amortized realistically; returns last.
    Grids older than 2 hops are donated back as output buffers so the live
    set stays at 3 grids (multi-GB grids at wide lanes OOM HBM otherwise).
    """
    grids = [x]
    for i in range(n):
        donor = grids[-2] if len(grids) >= 3 else None
        grids.append(tiled_conv3d(
            grids[-1], w, tiles, scale=ab[0], bias=ab[1], occ=occ,
            relu_out=True, tile_shape=ts, group=g, out=donor))
        if donor is not None:
            grids[-3] = None
    return grids[-1]


def main():
    rng = np.random.RandomState(0)
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
    coords, _ = sparse_quantize(scene.points, 0.03)
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    # interior coords at L0 (dense_flat_ids indexes margined storage)
    dxm, dym, dzm = dims[0] + 2 * MX, dims[1] + 2 * MY, dims[2] + 2 * MZ
    mg = np.stack(np.unravel_index(flat, (dxm, dym, dzm)), -1)
    rel = mg - np.array([MX, MY, MZ])
    print(f"voxels={len(coords)} dims={dims}")
    dt = jnp.bfloat16
    CH = int(os.environ.get("CHAIN", "4"))

    # (name, level, tile_shape, group, [channel list])
    cases = [
        ("L0-dec", 0, (2, 2, 8), 64, [96, 256, 384]),
        ("L1", 1, (4, 4, 8), 16, [32, 128, 256]),
        ("L2", 2, (8, 8, 16), 2, [64, 128, 256]),
        ("L4", 4, (2, 8, 8), 4, [256, 512]),
    ]
    for name, lvl, ts, g, chans in cases:
        s = 1 << lvl
        d = tuple(-(-x // s) for x in dims)
        rel_l = np.unique(rel // s, axis=0)
        tiles_np = occupied_tiles(rel_l, d, ts, pad_multiple=g)
        T = len(tiles_np)
        tiles = jnp.asarray(tiles_np)
        # margined occupancy
        occ_np = np.zeros((d[0] + 2 * MX, d[1] + 2 * MY, d[2] + 2 * MZ),
                          np.float32)
        occ_np[rel_l[:, 0] + MX, rel_l[:, 1] + MY, rel_l[:, 2] + MZ] = 1.0
        occp = jnp.asarray(np.asarray(pack_occ_group(
            occ_np, tiles_np, ts, group=g, xp=np)))
        for c in chans:
            shape = margined_shape(d, c)
            # build the grid ON DEVICE with a constant interior — a host
            # randn transfer through the relay (~10 MB/s) never finishes,
            # and an on-device random interior doubles peak HBM (values
            # don't affect conv timing)
            x = jax.jit(lambda: jnp.zeros(shape, dt).at[
                MX:-MX, MY:-MY, MZ:-MZ, :].set(jnp.asarray(0.1, dt)))()
            w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.05, dt)
            ab = (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))
            try:
                f = jax.jit(lambda x_, w_: chained(
                    x_, w_, tiles, occp, ab, ts, g, n=CH))
                t = timeit(f, x, w) / CH
                print(f"{name} ({ts}xG{g}, T={T}) c={c:>4}: "
                      f"{t:7.3f} ms/call  ({t / (c / 128):6.3f} per-128-lane)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} c={c}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
            # free the multi-GB grid NOW — async deletion through the
            # relay lags a config behind and OOMs the next one
            x.delete()
            w.delete()
            # flush the deletion stream with a real round trip
            fetch(jax.jit(lambda: jnp.ones((8,), jnp.float32))())
            time.sleep(3.0)


if __name__ == "__main__":
    main()
