"""Fused residual-block kernel vs the two-conv XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalvoting_tpu.models.dense_unet import _DN, _to_dense_kernel
from canonicalvoting_tpu.ops.pallas.tiled_conv import (
    MX, MY, MZ, occupied_tiles, pack_occ_expanded, tiled_block3d)


def _margined(x):
    cp = int(np.ceil(x.shape[-1] / 128) * 128)
    return jnp.pad(jnp.asarray(x), ((MX, MX), (MY, MY), (MZ, MZ),
                                    (0, cp - x.shape[-1])))


def _interior(xm, cout):
    return np.asarray(xm)[MX:xm.shape[0] - MX, MY:xm.shape[1] - MY,
                          MZ:xm.shape[2] - MZ, :cout]


def _conv(x, w):
    wk = _to_dense_kernel(jnp.asarray(w), 3)
    return jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], wk, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=_DN)[0]


def _block_ref(x, occ, w1, w2, a1, b1, a2, b2, rw=None, ra=None, rb=None):
    """Reference BasicBlock math (dense_unet.DenseBasicBlock semantics)."""
    o = occ[..., None]
    h = np.asarray(_conv(x, w1))
    h = np.maximum((h * a1 + b1) * o, 0.0)
    y = np.asarray(_conv(h, w2))
    y = (y * a2 + b2) * o
    if rw is not None:
        r = (x @ rw * ra + rb) * o
    else:
        r = x
    return np.maximum(y + r, 0.0)


@pytest.mark.parametrize("tile_shape,group,cin,mid,with_rw", [
    ((4, 4, 8), 4, 16, 16, False),
    ((4, 4, 8), 2, 24, 16, True),
    ((8, 8, 16), 1, 8, 8, False),
])
def test_block_kernel_matches_two_conv(rng, tile_shape, group, cin, mid,
                                       with_rw):
    X, Y, Z = 16, 16, 32
    cout = mid
    x = np.zeros((X, Y, Z, cin), np.float32)
    occ_cells = rng.randint(0, [X, Y, Z], (250, 3))
    occ_cells = np.unique(occ_cells, axis=0)
    x[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randn(
        len(occ_cells), cin).astype(np.float32)
    occ = np.zeros((X, Y, Z), np.float32)
    occ[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = 1.0

    w1 = rng.randn(27, cin, mid).astype(np.float32) * 0.2
    w2 = rng.randn(27, mid, cout).astype(np.float32) * 0.2
    a1 = rng.uniform(0.5, 1.5, (mid,)).astype(np.float32)
    b1 = rng.randn(mid).astype(np.float32) * 0.1
    a2 = rng.uniform(0.5, 1.5, (cout,)).astype(np.float32)
    b2 = rng.randn(cout).astype(np.float32) * 0.1
    rw = ra = rb = None
    if with_rw:
        rw = rng.randn(cin, cout).astype(np.float32) * 0.3
        ra = rng.uniform(0.5, 1.5, (cout,)).astype(np.float32)
        rb = rng.randn(cout).astype(np.float32) * 0.1

    tiles = occupied_tiles(occ_cells, (X, Y, Z), tile_shape,
                           pad_multiple=group)
    occ_m = jnp.pad(jnp.asarray(occ), ((MX, MX), (MY, MY), (MZ, MZ)))
    occ_e = pack_occ_expanded(occ_m, jnp.asarray(tiles), tile_shape)

    got = tiled_block3d(
        _margined(x), jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(tiles),
        scale1=jnp.asarray(a1), bias1=jnp.asarray(b1),
        scale2=jnp.asarray(a2), bias2=jnp.asarray(b2),
        occ_e=occ_e,
        res_w=None if rw is None else jnp.asarray(rw),
        res_scale=None if ra is None else jnp.asarray(ra),
        res_bias=None if rb is None else jnp.asarray(rb),
        tile_shape=tile_shape, group=group, interpret=True,
    )
    got = _interior(got, cout)

    # reference: the identity-residual case requires x masked at occupied
    # cells only (it is: unoccupied cells are zero by construction)
    ref = _block_ref(x, occ, w1, w2, a1, b1, a2, b2,
                     rw=rw, ra=ra, rb=rb)

    def tile_slices(t, ts):
        return tuple(slice(t[i] * ts[i], (t[i] + 1) * ts[i])
                     for i in range(3))

    for t in tiles:
        sl = tile_slices(t, tile_shape)
        np.testing.assert_allclose(got[sl], ref[sl], atol=2e-4,
                                   err_msg=str(t))
    # zero outside occupied tiles
    nts = tuple((X, Y, Z)[i] // tile_shape[i] for i in range(3))
    mask = np.zeros(nts, bool)
    mask[tiles[:, 0], tiles[:, 1], tiles[:, 2]] = True
    for idx in np.argwhere(~mask):
        sl = tile_slices(idx, tile_shape)
        assert np.all(got[sl] == 0)
