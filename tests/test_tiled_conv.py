import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalvoting_tpu.models.dense_unet import _DN, _to_dense_kernel
from canonicalvoting_tpu.ops.pallas.tiled_conv import occupied_tiles, tiled_conv3d


@pytest.mark.parametrize("k,group_dz", [(3, False), (3, True), (5, False)])
def test_tiled_conv_matches_dense_in_occupied_tiles(rng, k, group_dz):
    X, Y, Z, cin, cout = 16, 16, 64, 8, 16
    x = np.zeros((X, Y, Z, cin), np.float32)
    # occupy a few scattered cells
    occ_cells = rng.randint(0, [X, Y, Z], (200, 3))
    x[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randn(
        200, cin
    ).astype(np.float32)
    w = rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.2

    tiles = occupied_tiles(occ_cells, (X, Y, Z), (8, 8, 32))
    got = np.asarray(tiled_conv3d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(tiles),
        tile_shape=(8, 8, 32), kernel_size=k, group_dz=group_dz,
        interpret=True,
    ))

    wk = _to_dense_kernel(jnp.asarray(w), k)
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], wk, (1, 1, 1), [(k // 2, k // 2)] * 3,
        dimension_numbers=_DN,
    ))[0]

    # exact inside occupied tiles
    for t in tiles:
        sl = (slice(t[0] * 8, t[0] * 8 + 8), slice(t[1] * 8, t[1] * 8 + 8),
              slice(t[2] * 32, t[2] * 32 + 32))
        np.testing.assert_allclose(got[sl], ref[sl], atol=1e-4)
    # zero outside
    mask = np.zeros((X // 8, Y // 8, Z // 32), bool)
    mask[tiles[:, 0], tiles[:, 1], tiles[:, 2]] = True
    for i in range(X // 8):
        for j in range(Y // 8):
            for k in range(Z // 32):
                if not mask[i, j, k]:
                    sl = (slice(i * 8, i * 8 + 8), slice(j * 8, j * 8 + 8),
                          slice(k * 32, k * 32 + 32))
                    assert np.all(got[sl] == 0)


def test_tiled_conv_fused_epilogue(rng):
    """affine + occupancy mask + residual + relu epilogue == explicit ops."""
    from canonicalvoting_tpu.ops.pallas.tiled_conv import pack_occ

    X, Y, Z, cin, cout = 16, 8, 32, 8, 8
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

    tiles = jnp.asarray(occupied_tiles(occ_cells, (X, Y, Z), (8, 8, 32)))
    occp = pack_occ(jnp.asarray(occ_grid), tiles)

    got = np.asarray(tiled_conv3d(
        jnp.asarray(x), jnp.asarray(w), tiles,
        scale=jnp.asarray(scale), bias=jnp.asarray(bias), occ=occp,
        residual=jnp.asarray(res), relu_out=True, interpret=True,
    ))

    plain = np.asarray(tiled_conv3d(
        jnp.asarray(x), jnp.asarray(w), tiles, interpret=True,
    ))
    want = np.maximum((plain * scale + bias) * occ_grid[..., None] + res, 0.0)

    # compare only inside occupied tiles (outside, got is 0 but want = relu(res))
    for t in np.asarray(tiles):
        sl = (slice(t[0] * 8, t[0] * 8 + 8), slice(t[1] * 8, t[1] * 8 + 8),
              slice(t[2] * 32, t[2] * 32 + 32))
        np.testing.assert_allclose(got[sl], want[sl], atol=1e-4)
