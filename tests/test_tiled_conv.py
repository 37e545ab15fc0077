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


@pytest.mark.parametrize("k,tile_shape,group,prefolded,replicated", [
    (3, (8, 8, 8), 1, False, False),
    (3, (4, 4, 8), 4, False, False),   # fine tiles, batched groups
    (3, (4, 4, 8), 8, False, False),
    (1, (4, 4, 8), 4, False, False),   # pointwise
    (5, (4, 4, 8), 4, True, False),    # prefolded stem mode
    (5, (4, 2, 8), 32, False, True),   # replicated-lane stem mode
])
def test_tiled_conv_matches_dense(rng, k, tile_shape, group, prefolded,
                                  replicated):
    X, Y, Z, cin, cout = 16, 16, 32, 8, 16
    if prefolded or replicated:
        cin = 3
    x = np.zeros((X, Y, Z, cin), np.float32)
    occ_cells = rng.randint(0, [X, Y, Z], (200, 3))
    x[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randn(
        200, cin).astype(np.float32)
    w = rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.2

    tiles = occupied_tiles(occ_cells, (X, Y, Z), tile_shape,
                           pad_multiple=group)
    if replicated:
        # cells carry their cin channels copied at all k^2 tap offsets
        xm = _margined(np.tile(x, (1, 1, 1, k * k)))
    else:
        xm = _margined(x)
    if prefolded:
        xm = fold_dydz(_margined(x)[..., :cin], k)
    got = tiled_conv3d(
        xm, jnp.asarray(w), jnp.asarray(tiles),
        tile_shape=tile_shape, kernel_size=k, group=group,
        prefolded=prefolded, replicated=replicated, interpret=True,
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


@pytest.mark.parametrize("ts,group", [
    ((2, 2, 8), 16),   # sub-128-cell tiles: only legal with the group pack
    ((2, 4, 8), 8),
    ((4, 4, 8), 4),    # also legal per-tile; exercises layout autodetect
])
def test_tiled_conv_group_occ_pack(rng, ts, group):
    """Group-major occupancy pack == per-tile semantics (fine tiles)."""
    from canonicalvoting_tpu.ops.pallas.tiled_conv import pack_occ_group

    X, Y, Z, cin, cout = 16, 8, 32, 8, 8
    x = np.zeros((X, Y, Z, cin), np.float32)
    occ_cells = rng.randint(0, [X, Y, Z], (150, 3))
    x[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randn(
        150, cin).astype(np.float32)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.2
    scale = rng.rand(cout).astype(np.float32) + 0.5
    bias = rng.randn(cout).astype(np.float32)
    occ_grid = np.zeros((X, Y, Z), np.float32)
    occ_grid[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = 1.0
    occ_m = jnp.pad(jnp.asarray(occ_grid), ((MX, MX), (MY, MY), (MZ, MZ)))

    tiles = jnp.asarray(occupied_tiles(occ_cells, (X, Y, Z), ts,
                                       pad_multiple=group))
    occp = pack_occ_group(occ_m, tiles, ts, group=group)

    got = _interior(tiled_conv3d(
        _margined(x), jnp.asarray(w), tiles,
        scale=jnp.asarray(scale), bias=jnp.asarray(bias), occ=occp,
        relu_out=True, interpret=True, tile_shape=ts, group=group,
    ), cout)
    ref = _dense_ref(x, w, 3)
    want = np.maximum((ref * scale + bias) * occ_grid[..., None], 0.0)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        np.testing.assert_allclose(got[sl], want[sl], atol=1e-4)


def test_tiled_down2_matches_xla(rng):
    """Stride-2 k=2 down conv + epilogue == the margined XLA path."""
    import jax.numpy as jnp

    from canonicalvoting_tpu.ops.pallas.tiled_conv import tiled_down2

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

    cp = 128
    xm = _margined(x)
    got = tiled_down2(xm, jnp.asarray(w), tiles,
                      scale=jnp.asarray(scale), bias=jnp.asarray(bias),
                      occ=occp, relu_out=True, tile_shape=ts, group=group,
                      interpret=True)
    got = _interior(got, cout)

    # XLA reference: margined strided conv (as in models.dense_unet)
    wk = w.reshape(2, 2, 2, cin, cout)             # (dz, dy, dx, ...)
    wk = jnp.transpose(jnp.asarray(wk), (2, 1, 0, 3, 4))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], wk, (2, 2, 2), [(0, 1)] * 3,
        dimension_numbers=_DN)[0]
    ref = np.maximum((np.asarray(ref) * scale + bias)
                     * occ_grid[..., None], 0.0)
    for t in np.asarray(tiles):
        sl = _tile_slices(t, ts)
        np.testing.assert_allclose(got[sl], ref[sl], atol=1e-4)


def test_tiled_up2_matches_xla(rng):
    """Transposed stride-2 conv + epilogue + fused skip concat == the
    margined XLA conv_transpose path + explicit concat."""
    import jax.numpy as jnp

    from canonicalvoting_tpu.ops.pallas.tiled_conv import (
        pack_occ_parity, tiled_up2)

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
                    relu_out=True, tile_shape=ts, group=group,
                    interpret=True)
    got = _interior(got, cout + skip_c)

    # XLA reference: conv_transpose VALID with flipped kernel (the
    # dense_unet transpose semantics), epilogue, then concat
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


def test_tiled_conv_zrun_matches(rng):
    """z-run chunks (zrun=R) + chained donated outputs == per-tile calls."""
    X, Y, Z, cin, cout = 16, 16, 64, 8, 8
    k, ts, G = 3, (4, 4, 8), 2
    x = np.zeros((X, Y, Z, cin), np.float32)
    # occupy long z-strips to create real runs + some isolated tiles
    occ_cells = []
    for (ox, oy) in [(2, 3), (9, 9)]:
        for z in range(8, 48):
            occ_cells.append((ox, oy, z))
    occ_cells += [tuple(c) for c in rng.randint(0, [X, Y, Z], (60, 3))]
    occ_cells = np.unique(np.array(occ_cells), axis=0)
    x[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randn(
        len(occ_cells), cin).astype(np.float32)
    w = rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.2
    xm = _margined(x)

    # reference: single flat tile list
    tiles = occupied_tiles(occ_cells, (X, Y, Z), ts, pad_multiple=G)
    ref = tiled_conv3d(xm, jnp.asarray(w), jnp.asarray(tiles),
                       tile_shape=ts, kernel_size=k, group=G,
                       interpret=True)

    # z-run decomposition via the host helper
    from canonicalvoting_tpu.data.dense_prep import level_tile_runs

    runs = level_tile_runs(
        occ_cells, np.zeros(3, np.int64), (X, Y, Z),
        run_plan={0: ((4, 1), (2, 1), (1, 2))},
        tile_plan={0: (ts, G)}, pad_multiple=2,
    )[0]
    assert any(R > 1 for (R, _g, _t) in runs), "scene must produce runs"
    out = None
    for (R, Gr, t) in runs:
        out = tiled_conv3d(xm, jnp.asarray(w), jnp.asarray(t),
                           tile_shape=ts, kernel_size=k, group=Gr, zrun=R,
                           out=out, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_tiled_conv_zrun_epilogue_occ(rng):
    """zrun with the fused affine + occupancy epilogue matches zrun=1."""
    from canonicalvoting_tpu.ops.pallas.tiled_conv import pack_occ

    X, Y, Z, cin, cout = 8, 8, 32, 8, 8
    k, ts = 3, (4, 4, 8)
    x = rng.randn(X, Y, Z, cin).astype(np.float32)
    occ = (rng.rand(X, Y, Z) < 0.5).astype(np.float32)
    x *= occ[..., None]
    w = rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.2
    a = rng.uniform(0.5, 1.5, (cout,)).astype(np.float32)
    b = rng.randn(cout).astype(np.float32) * 0.1
    xm = _margined(x)
    occ_m = jnp.pad(jnp.asarray(occ), ((MX, MX), (MY, MY), (MZ, MZ)))

    all_tiles = np.array([[i, j, l] for i in range(2) for j in range(2)
                          for l in range(4)], np.int32)
    o1 = pack_occ(occ_m, jnp.asarray(all_tiles), ts)
    ref = tiled_conv3d(xm, jnp.asarray(w), jnp.asarray(all_tiles),
                       scale=jnp.asarray(a), bias=jnp.asarray(b), occ=o1,
                       relu_out=True, tile_shape=ts, kernel_size=k,
                       group=4, interpret=True)

    # same coverage as 4 z-run chunks of R=4
    run_tiles = np.array([[i, j, 0] for i in range(2) for j in range(2)],
                         np.int32)
    o4 = pack_occ(occ_m, jnp.asarray(run_tiles), ts, zrun=4)
    got = tiled_conv3d(xm, jnp.asarray(w), jnp.asarray(run_tiles),
                       scale=jnp.asarray(a), bias=jnp.asarray(b), occ=o4,
                       relu_out=True, tile_shape=ts, kernel_size=k,
                       group=2, zrun=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
