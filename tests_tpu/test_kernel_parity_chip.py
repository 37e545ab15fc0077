"""REAL-hardware parity of the Pallas kernels the interpret-mode suite
cannot cover (round-5 regression tests).

Round 5 found the dense-tiled backbone computing wrong deep-level features
ON THE CHIP while every interpret-mode oracle test passed: the
tiled_down2/tiled_up2 pair-DMA reshaped-ref views return wrong values when
a grid has more than one 128-lane page (cin_p > 128 — the 256-channel
L3->L4 down and the decoder ups into L2/L3). The kernels now materialize
the views for those configs (ops/pallas/tiled_conv.py pair_dma="auto");
these tests pin the exact failing configurations in REAL (non-interpret)
mode, plus a model-level dense-vs-sparse head parity check at ScanNet
scale.

Run: CV_TPU_TESTS=1 python -m pytest tests_tpu/test_kernel_parity_chip.py
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real-hardware kernel parity needs the TPU backend",
)

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _margined(x, lanes=128):
    from canonicalvoting_tpu.ops.pallas.tiled_conv import MX, MY, MZ

    xp = np.zeros((x.shape[0] + 2 * MX, x.shape[1] + 2 * MY,
                   x.shape[2] + 2 * MZ, lanes), np.float32)
    xp[MX:-MX, MY:-MY, MZ:-MZ, :x.shape[3]] = x
    return jnp.asarray(xp)


def _interior(g, c):
    from canonicalvoting_tpu.ops.pallas.tiled_conv import MX, MY, MZ

    return np.asarray(g)[MX:-MX, MY:-MY, MZ:-MZ, :c]


def _w_dense(w, k=2):
    c1, c2 = w.shape[1], w.shape[2]
    wd = np.zeros((k, k, k, c1, c2), np.float32)
    for dz in range(k):
        for dy in range(k):
            for dx in range(k):
                wd[dx, dy, dz] = w[dx + k * dy + k * k * dz]
    return jnp.asarray(wd)


@pytest.mark.parametrize("ts,group,dimsf", [
    ((2, 8, 8), 4, (32, 32, 32)),   # the L3->L4 plan
    ((4, 4, 8), 2, (16, 16, 32)),
])
def test_down2_256ch_real_kernel(rng, ts, group, dimsf):
    from canonicalvoting_tpu.ops.pallas.tiled_conv import (
        MX, MY, MZ, occupied_tiles, pack_occ, tiled_down2)

    cin = cout = 256
    Xf, Yf, Zf = dimsf
    X, Y, Z = Xf // 2, Yf // 2, Zf // 2
    x = np.zeros((Xf, Yf, Zf, cin), np.float32)
    occ_cells = rng.randint(0, [Xf, Yf, Zf], (200, 3))
    x[occ_cells[:, 0], occ_cells[:, 1], occ_cells[:, 2]] = rng.randn(200, cin)
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.05
    coarse = np.unique(occ_cells // 2, axis=0)
    occ_grid = np.zeros((X, Y, Z), np.float32)
    occ_grid[coarse[:, 0], coarse[:, 1], coarse[:, 2]] = 1.0
    occ_m = jnp.pad(jnp.asarray(occ_grid), ((MX, MX), (MY, MY), (MZ, MZ)))
    tiles = jnp.asarray(occupied_tiles(coarse, (X, Y, Z), ts,
                                       pad_multiple=group))
    occp = pack_occ(occ_m, tiles, ts)
    got = tiled_down2(_margined(x, 256), jnp.asarray(w), tiles, occ=occp,
                      tile_shape=ts, group=group)
    got = _interior(got, cout)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], _w_dense(w), (2, 2, 2), [(0, 1)] * 3,
        dimension_numbers=_DN)[0]
    ref = np.asarray(ref) * occ_grid[..., None]
    sel = (coarse[:, 0], coarse[:, 1], coarse[:, 2])
    np.testing.assert_allclose(got[sel], ref[sel], atol=1e-4)


@pytest.mark.parametrize("ts,group,dims,cin,cout,skip_c", [
    ((8, 8, 16), 2, (32, 32, 32), 256, 256, 128),  # the up5-into-L2 shape
    ((4, 4, 16), 2, (16, 16, 32), 256, 256, 256),  # up4-into-L3
])
def test_up2_256ch_real_kernel(rng, ts, group, dims, cin, cout, skip_c):
    from canonicalvoting_tpu.ops.pallas.tiled_conv import (
        MX, MY, MZ, occupied_tiles, pack_occ_parity, tiled_up2)

    X, Y, Z = dims
    Xc, Yc, Zc = X // 2, Y // 2, Z // 2
    xc = np.zeros((Xc, Yc, Zc, cin), np.float32)
    coarse = rng.randint(0, [Xc, Yc, Zc], (80, 3))
    xc[coarse[:, 0], coarse[:, 1], coarse[:, 2]] = rng.randn(80, cin)
    w = rng.randn(8, cin, cout).astype(np.float32) * 0.05
    fine_cells = rng.randint(0, [X, Y, Z], (300, 3))
    occ_grid = np.zeros((X, Y, Z), np.float32)
    occ_grid[fine_cells[:, 0], fine_cells[:, 1], fine_cells[:, 2]] = 1.0
    occ_m = jnp.pad(jnp.asarray(occ_grid), ((MX, MX), (MY, MY), (MZ, MZ)))
    skip = rng.randn(X, Y, Z, skip_c).astype(np.float32)
    tiles = jnp.asarray(occupied_tiles(fine_cells, (X, Y, Z), ts,
                                       pad_multiple=group))
    occp = pack_occ_parity(occ_m, tiles, ts)
    got = tiled_up2(_margined(xc, 256), jnp.asarray(w), tiles, occ=occp,
                    skip=_margined(skip, -(-skip_c // 128) * 128),
                    skip_c=skip_c, tile_shape=ts, group=group)
    got = np.asarray(got)
    up = jax.lax.conv_transpose(
        jnp.asarray(xc)[None], _w_dense(w)[::-1, ::-1, ::-1], (2, 2, 2),
        "VALID", dimension_numbers=_DN)[0]
    up = np.asarray(up) * occ_grid[..., None]
    sel = (fine_cells[:, 0] + MX, fine_cells[:, 1] + MY,
           fine_cells[:, 2] + MZ)
    refr = up[fine_cells[:, 0], fine_cells[:, 1], fine_cells[:, 2]]
    np.testing.assert_allclose(got[sel][:, :cout], refr, atol=1e-4)
    np.testing.assert_allclose(
        got[sel][:, cout:cout + skip_c],
        skip[fine_cells[:, 0], fine_cells[:, 1], fine_cells[:, 2]],
        atol=1e-5)


def test_dense_tiled_backbone_matches_sparse_at_scale(rng):
    """The production dense-tiled forward == the gather-form forward at
    ScanNet scale on the REAL chip (the divergence round 5 caught was
    invisible to the interpret-mode suite)."""
    from canonicalvoting_tpu.data.geometry import NCLASSES
    from canonicalvoting_tpu.data.synthetic import make_scene
    from canonicalvoting_tpu.eval.pipeline import (
        DetectionPipeline,
        prepare_scene_args,
    )
    from canonicalvoting_tpu.models import MinkUNet34C
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
    from canonicalvoting_tpu.ops.voxelize import (
        batched_coordinates,
        sparse_quantize,
    )
    from canonicalvoting_tpu.train.steps import init_variables

    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1,
                        compute_dtype="float32")
    sc = make_scene(np.random.RandomState(0), extent=(6.0, 2.5, 7.0),
                    n_background=50000, n_boxes=6, pts_per_box=3000)
    coords, idx = sparse_quantize(sc.points, 0.03)
    feats_raw = sc.rgb[idx]
    pyr = build_pyramid(batched_coordinates([coords]),
                        PyramidSpec(cap_multiple=4096))
    f0 = np.zeros((pyr.coords[0].shape[0], 3), np.float32)
    variables = init_variables(model, f0, pyr.as_jax_inputs(), train=False)
    n = len(coords)
    fs = f0.copy()
    fs[:n] = feats_raw * 2 - 1
    out_s = np.asarray(jax.jit(lambda v, f, p: model.apply(v, f, p, False))(
        variables, fs, pyr.as_jax_inputs()))[:n]

    args = prepare_scene_args(coords, feats_raw, res=0.03, cap_multiple=4096,
                              grid_multiple=(64, 32, 128), backbone="dense",
                              conv_impl="tiled")
    pipe = DetectionPipeline(model=model, variables=variables, res=0.03,
                             backbone="dense", conv_impl="tiled")
    (_, fd, flat, valid, cw, gs, dd, tiles, rs, rt, occ) = args
    out_d = np.asarray(pipe._backbone_fn(
        variables, fd, flat, valid, tuple(dd), tiles=tiles, run_spec=rs,
        run_tiles=rt, occ_packs=occ))[:n]
    d = np.abs(out_d - out_s)
    assert d.max() < 0.02, (d.max(), d.mean())
