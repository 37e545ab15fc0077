"""Real-TPU parity for the pair-DMA down/up transition kernels.

The TPU path of tiled_down2/tiled_up2 folds/unfolds z-pairs in the DMA
engine (per-parity copies through reshaped ref views) instead of the
full-grid XLA relayouts the interpret path uses; this checks the compiled
kernels against the margined XLA conv references on the chip.

Run: python -m pytest tests_tpu/test_pair_dma.py -s
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalvoting_tpu.models.dense_unet import _DN
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    MX, MY, MZ, occupied_tiles, pack_occ, pack_occ_parity, tiled_down2,
    tiled_up2)

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="compiles the Mosaic kernels; needs the TPU backend",
)


def _margined(x):
    cp = int(np.ceil(x.shape[-1] / 128) * 128)
    return jnp.pad(jnp.asarray(x), ((MX, MX), (MY, MY), (MZ, MZ),
                                    (0, cp - x.shape[-1])))


def _interior(xm, cout):
    return np.asarray(xm)[MX:xm.shape[0] - MX, MY:xm.shape[1] - MY,
                          MZ:xm.shape[2] - MZ, :cout]


def _tile_slices(t, ts):
    return tuple(slice(t[i] * ts[i], (t[i] + 1) * ts[i]) for i in range(3))


def test_down2_pair_dma_matches_xla():
    rng = np.random.RandomState(3)
    Xf, Yf, Zf, cin, cout = 16, 16, 32, 8, 8
    X, Y, Z = Xf // 2, Yf // 2, Zf // 2
    x = np.zeros((Xf, Yf, Zf, cin), np.float32)
    occ_cells = rng.randint(0, [Xf, Yf, Zf], (200, 3))
    x[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randn(
        200, cin).astype(np.float32)
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.2
    scale = rng.rand(cout).astype(np.float32) + 0.5
    bias = rng.randn(cout).astype(np.float32)
    coarse = np.unique(occ_cells // 2, axis=0)
    occ_grid = np.zeros((X, Y, Z), np.float32)
    occ_grid[coarse[:, 0], coarse[:, 1], coarse[:, 2]] = 1.0
    occ_m = jnp.pad(jnp.asarray(occ_grid), ((MX, MX), (MY, MY), (MZ, MZ)))

    ts, group = (4, 4, 8), 2
    tiles = jnp.asarray(occupied_tiles(coarse, (X, Y, Z), ts,
                                       pad_multiple=group))
    occp = pack_occ(occ_m, tiles, ts)
    got = tiled_down2(_margined(x), jnp.asarray(w), tiles,
                      scale=jnp.asarray(scale), bias=jnp.asarray(bias),
                      occ=occp, relu_out=True, tile_shape=ts, group=group)
    got = _interior(got, cout)

    wk = w.reshape(2, 2, 2, cin, cout)
    wk = jnp.transpose(jnp.asarray(wk), (2, 1, 0, 3, 4))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], wk, (2, 2, 2), [(0, 1)] * 3,
        dimension_numbers=_DN)[0]
    ref = np.maximum((np.asarray(ref) * scale + bias)
                     * occ_grid[..., None], 0.0)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        np.testing.assert_allclose(got[sl], ref[sl], atol=1e-4)


def test_up2_pair_dma_matches_xla():
    rng = np.random.RandomState(4)
    X, Y, Z, cin, cout, skip_c = 16, 16, 32, 8, 6, 4
    Xc, Yc, Zc = X // 2, Y // 2, Z // 2
    xc = np.zeros((Xc, Yc, Zc, cin), np.float32)
    coarse = rng.randint(0, [Xc, Yc, Zc], (80, 3))
    xc[coarse[:, 0], coarse[:, 1], coarse[:, 2]] = rng.randn(
        80, cin).astype(np.float32)
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.2
    scale = rng.rand(cout).astype(np.float32) + 0.5
    bias = rng.randn(cout).astype(np.float32)
    fine_cells = rng.randint(0, [X, Y, Z], (300, 3))
    occ_grid = np.zeros((X, Y, Z), np.float32)
    occ_grid[fine_cells[:, 0], fine_cells[:, 1], fine_cells[:, 2]] = 1.0
    occ_m = jnp.pad(jnp.asarray(occ_grid), ((MX, MX), (MY, MY), (MZ, MZ)))
    skip = rng.randn(X, Y, Z, skip_c).astype(np.float32)

    ts, group = (4, 4, 16), 2
    tiles = jnp.asarray(occupied_tiles(fine_cells, (X, Y, Z), ts,
                                       pad_multiple=group))
    occp = pack_occ_parity(occ_m, tiles, ts)
    got = tiled_up2(_margined(xc), jnp.asarray(w), tiles,
                    scale=jnp.asarray(scale), bias=jnp.asarray(bias),
                    occ=occp, skip=_margined(skip), skip_c=skip_c,
                    relu_out=True, tile_shape=ts, group=group)
    got = _interior(got, cout + skip_c)

    wk = w.reshape(2, 2, 2, cin, cout)
    wk = jnp.transpose(jnp.asarray(wk), (2, 1, 0, 3, 4))
    up = jax.lax.conv_transpose(
        jnp.asarray(xc)[None], wk[::-1, ::-1, ::-1], (2, 2, 2), "VALID",
        dimension_numbers=_DN)[0]
    up = np.maximum((np.asarray(up) * scale + bias)
                    * occ_grid[..., None], 0.0)
    ref = np.concatenate([up, skip], axis=-1)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        np.testing.assert_allclose(got[sl], ref[sl], atol=1e-4)


def test_up2_out_donation_matches():
    """Donating a dead zero grid via out= returns the same result."""
    rng = np.random.RandomState(5)
    X, Y, Z, cin, cout = 8, 8, 32, 8, 8
    Xc, Yc, Zc = X // 2, Y // 2, Z // 2
    xc = np.zeros((Xc, Yc, Zc, cin), np.float32)
    coarse = rng.randint(0, [Xc, Yc, Zc], (30, 3))
    xc[coarse[:, 0], coarse[:, 1], coarse[:, 2]] = rng.randn(
        30, cin).astype(np.float32)
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.2
    fine_cells = rng.randint(0, [X, Y, Z], (100, 3))
    occ_grid = np.zeros((X, Y, Z), np.float32)
    occ_grid[fine_cells[:, 0], fine_cells[:, 1], fine_cells[:, 2]] = 1.0
    occ_m = jnp.pad(jnp.asarray(occ_grid), ((MX, MX), (MY, MY), (MZ, MZ)))
    ts, group = (4, 4, 16), 2
    tiles = jnp.asarray(occupied_tiles(fine_cells, (X, Y, Z), ts,
                                       pad_multiple=group))
    occp = pack_occ_parity(occ_m, tiles, ts)
    xm = _margined(xc)
    base = tiled_up2(xm, jnp.asarray(w), tiles, occ=occp,
                     tile_shape=ts, group=group)
    donor = jnp.zeros_like(base)
    got = tiled_up2(xm, jnp.asarray(w), tiles, occ=occp,
                    tile_shape=ts, group=group, out=donor)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_replicated_stem_fold_matches_xla():
    """Real-TPU parity for the replicated-lane stem fold (rotation-free
    masked moves; see dense_unet stem_rep / tiled_conv3d replicated)."""
    from canonicalvoting_tpu.models.dense_unet import _DN, _to_dense_kernel
    from canonicalvoting_tpu.ops.pallas.tiled_conv import (
        pack_occ_group, tiled_conv3d)

    rng = np.random.RandomState(7)
    X, Y, Z, cin, cout, k = 16, 16, 32, 3, 16, 5
    ts, G = (4, 2, 8), 32
    x = np.zeros((X, Y, Z, cin), np.float32)
    cells = rng.randint(0, [X, Y, Z], (200, 3))
    x[cells[:, 0], cells[:, 1], cells[:, 2]] = rng.randn(200, cin)
    w = rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.2
    tiles = jnp.asarray(occupied_tiles(cells, (X, Y, Z), ts,
                                       pad_multiple=G))
    occg = np.zeros((X, Y, Z), np.float32)
    occg[cells[:, 0], cells[:, 1], cells[:, 2]] = 1.0
    occm = jnp.pad(jnp.asarray(occg), ((MX, MX), (MY, MY), (MZ, MZ)))
    occp = pack_occ_group(occm, tiles, ts, group=G)
    xr = np.tile(x, (1, 1, 1, k * k))
    xm = jnp.pad(jnp.asarray(xr), ((MX, MX), (MY, MY), (MZ, MZ),
                                   (0, 128 - xr.shape[-1])))
    got = tiled_conv3d(xm, jnp.asarray(w), tiles, occ=occp, tile_shape=ts,
                       group=G, kernel_size=k, replicated=True)
    got = np.asarray(got)[MX:-MX, MY:-MY, MZ:-MZ, :cout]
    wk = _to_dense_kernel(jnp.asarray(w), k)
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], wk, (1, 1, 1), [(2, 2)] * 3,
        dimension_numbers=_DN))[0] * occg[..., None]
    for t in np.asarray(tiles):
        sl = tuple(slice(t[i] * ts[i], (t[i] + 1) * ts[i])
                   for i in range(3))
        np.testing.assert_allclose(got[sl], ref[sl], atol=1e-4)
