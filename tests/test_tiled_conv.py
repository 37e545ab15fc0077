import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalvoting_tpu.models.dense_unet import _DN, _to_dense_kernel
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    MX, MY, MZ, fold_dydz, margined_shape, occupied_tiles, pack_occ,
    tiled_conv3d)


def _margined(x):
    """(X, Y, Z, C) -> margined grid with 128-multiple lanes."""
    cp = int(np.ceil(x.shape[-1] / 128) * 128)
    return jnp.pad(jnp.asarray(x), ((MX, MX), (MY, MY), (MZ, MZ),
                                    (0, cp - x.shape[-1])))


def _interior(xm, cout):
    return np.asarray(xm)[MX:xm.shape[0] - MX, MY:xm.shape[1] - MY,
                          MZ:xm.shape[2] - MZ, :cout]


def _dense_ref(x, w, k):
    wk = _to_dense_kernel(jnp.asarray(w), k)
    return np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], wk, (1, 1, 1), [(k // 2, k // 2)] * 3,
        dimension_numbers=_DN))[0]


def _tile_slices(t, ts):
    return tuple(slice(t[i] * ts[i], (t[i] + 1) * ts[i]) for i in range(3))


@pytest.mark.parametrize("k,tile_shape,group,prefolded", [
    (3, (8, 8, 8), 1, False),
    (3, (4, 4, 8), 4, False),   # fine tiles, batched groups
    (3, (4, 4, 8), 8, False),
    (1, (4, 4, 8), 4, False),   # pointwise
    (5, (4, 4, 8), 4, True),    # prefolded stem mode
])
def test_tiled_conv_matches_dense(rng, k, tile_shape, group, prefolded):
    X, Y, Z, cin, cout = 16, 16, 32, 8, 16
    if prefolded:
        cin = 3
    x = np.zeros((X, Y, Z, cin), np.float32)
    occ_cells = rng.randint(0, [X, Y, Z], (200, 3))
    x[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randn(
        200, cin).astype(np.float32)
    w = rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.2

    tiles = occupied_tiles(occ_cells, (X, Y, Z), tile_shape,
                           pad_multiple=group)
    xm = _margined(x)
    if prefolded:
        xm = fold_dydz(_margined(x)[..., :cin], k)
    got = tiled_conv3d(
        xm, jnp.asarray(w), jnp.asarray(tiles),
        tile_shape=tile_shape, kernel_size=k, group=group,
        prefolded=prefolded, interpret=True,
    )
    got = _interior(got, cout)
    ref = _dense_ref(x, w, k)

    for t in tiles:  # exact inside occupied tiles
        sl = _tile_slices(t, tile_shape)
        np.testing.assert_allclose(got[sl], ref[sl], atol=1e-4)
    # zero outside
    nts = tuple((X, Y, Z)[i] // tile_shape[i] for i in range(3))
    mask = np.zeros(nts, bool)
    mask[tiles[:, 0], tiles[:, 1], tiles[:, 2]] = True
    for idx in np.argwhere(~mask):
        sl = _tile_slices(idx, tile_shape)
        assert np.all(got[sl] == 0)


def test_tiled_conv_fused_epilogue(rng):
    """affine + occupancy mask + fused-downsample residual + relu epilogue
    == the explicit op sequence of a reference BasicBlock tail."""
    X, Y, Z, cin, cout = 16, 8, 32, 8, 8
    ts, group = (4, 4, 8), 4
    x = np.zeros((X, Y, Z, cin), np.float32)
    occ_cells = rng.randint(0, [X, Y, Z], (150, 3))
    x[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randn(
        150, cin).astype(np.float32)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.2
    scale = rng.rand(cout).astype(np.float32) + 0.5
    bias = rng.randn(cout).astype(np.float32)
    res = rng.randn(X, Y, Z, cout).astype(np.float32)
    occ_grid = np.zeros((X, Y, Z), np.float32)
    occ_grid[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = 1.0
    occ_m = jnp.pad(jnp.asarray(occ_grid), ((MX, MX), (MY, MY), (MZ, MZ)))

    tiles = jnp.asarray(occupied_tiles(occ_cells, (X, Y, Z), ts,
                                       pad_multiple=group))
    occp = pack_occ(occ_m, tiles, ts)

    got = tiled_conv3d(
        _margined(x), jnp.asarray(w), tiles,
        scale=jnp.asarray(scale), bias=jnp.asarray(bias), occ=occp,
        residual=_margined(res), relu_out=True, interpret=True,
        tile_shape=ts, group=group,
    )
    got = _interior(got, cout)

    plain = _interior(tiled_conv3d(
        _margined(x), jnp.asarray(w), tiles, interpret=True,
        tile_shape=ts, group=group,
    ), cout)
    want = np.maximum((plain * scale + bias) * occ_grid[..., None] + res, 0.0)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        np.testing.assert_allclose(got[sl], want[sl], atol=1e-4)

    # fused downsample residual: res passes through 1x1 conv + affine + mask
    rw = rng.randn(cin, cout).astype(np.float32) * 0.3
    rs = rng.rand(cout).astype(np.float32) + 0.5
    rb = rng.randn(cout).astype(np.float32)
    got2 = _interior(tiled_conv3d(
        _margined(x), jnp.asarray(w), tiles,
        scale=jnp.asarray(scale), bias=jnp.asarray(bias), occ=occp,
        residual=_margined(x), res_w=jnp.asarray(rw),
        res_scale=jnp.asarray(rs), res_bias=jnp.asarray(rb),
        relu_out=True, interpret=True, tile_shape=ts, group=group,
    ), cout)
    ds = ((x @ rw) * rs + rb) * occ_grid[..., None]
    want2 = np.maximum((plain * scale + bias) * occ_grid[..., None] + ds, 0.0)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        np.testing.assert_allclose(got2[sl], want2[sl], atol=1e-4)
