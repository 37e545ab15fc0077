"""Dense-execution backbone must match the gather-form sparse path exactly
(same parameter tree, same function).

The default parametrizations are CPU-sized (tiny channel plans + ~32^3
grids) so the dense == sparse == tiled equality chain is checkable without
a TPU; the production-sized variants (MinkUNet14A/34C plans on bigger
scenes) run under ``-m slow`` (they exceed 5 minutes each on CPU — XLA's
CPU Conv3D is far off its TPU throughput).
"""

import jax
import numpy as np
import pytest

from canonicalvoting_tpu.data.dense_prep import dense_flat_ids, dense_grid_geometry
from canonicalvoting_tpu.models import MinkUNet14A, MinkUNet34C
from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet
from canonicalvoting_tpu.models.minkunet import MinkUNetBase
from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
from canonicalvoting_tpu.ops.voxelize import batched_coordinates, sparse_quantize

TINY_PLANES = (8, 16, 32, 32, 32, 32, 16, 16)


def _scene(rng, n_pts=400, extent=1.2):
    pts = rng.uniform(0, extent, (n_pts, 3)).astype(np.float32)
    # include negative coords to exercise base alignment
    pts[: n_pts // 4] -= extent / 2
    coords, idx = sparse_quantize(pts, 0.03)
    return coords, rng.rand(len(coords), 3).astype(np.float32)


def _tiny_models(out_ch, layers=(1,) * 8):
    sparse_model = MinkUNetBase(
        in_channels=3, out_channels=out_ch, block="basic", layers=layers,
        planes=TINY_PLANES, init_dim=8, compute_dtype="float32",
    )
    dense_model = DenseMinkUNet(
        in_channels=3, out_channels=out_ch, block="basic", layers=layers,
        planes=TINY_PLANES, init_dim=8, compute_dtype="float32",
    )
    return sparse_model, dense_model


def _check_dense_matches_sparse(rng, sparse_model, dense_model, out_ch,
                                n_pts, extent):
    coords, feats_raw = _scene(rng, n_pts=n_pts, extent=extent)
    n = len(coords)

    # sparse path
    pyr = build_pyramid(batched_coordinates([coords]), PyramidSpec(cap_multiple=64))
    n0 = pyr.coords[0].shape[0]
    feats = np.zeros((n0, 3), np.float32)
    feats[:n] = feats_raw
    variables = sparse_model.init(
        jax.random.PRNGKey(0), feats, pyr.as_jax_inputs(), False
    )
    out_sparse = np.asarray(
        sparse_model.apply(variables, feats, pyr.as_jax_inputs(), False)
    )[:n]

    # dense path with the SAME variables
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    valid = np.ones((n,), np.float32)
    out_dense = np.asarray(dense_model.apply(
        variables, feats_raw, flat, valid, dims, False
    ))

    assert out_dense.shape == (n, out_ch)
    np.testing.assert_allclose(out_dense, out_sparse, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("layers", [(1,) * 8, (1, 2, 1, 1, 2, 1, 1, 1)])
def test_dense_matches_sparse_tiny(rng, layers):
    sparse_model, dense_model = _tiny_models(10, layers)
    _check_dense_matches_sparse(rng, sparse_model, dense_model, 10,
                                n_pts=250, extent=0.8)


@pytest.mark.slow
@pytest.mark.parametrize("variant,out_ch", [("14A", 8), ("34C", 16)])
def test_dense_matches_sparse_full(rng, variant, out_ch):
    ctor = {"14A": MinkUNet14A, "34C": MinkUNet34C}[variant]
    sparse_model = ctor(3, out_ch, compute_dtype="float32")
    dense_model = DenseMinkUNet(
        in_channels=3, out_channels=out_ch,
        block=sparse_model.block, layers=sparse_model.layers,
        planes=sparse_model.planes, compute_dtype="float32",
    )
    _check_dense_matches_sparse(rng, sparse_model, dense_model, out_ch,
                                n_pts=400, extent=1.2)


def test_dense_param_tree_matches(rng):
    """Dense init produces the same tree structure/shapes as sparse init."""
    import jax.tree_util as jtu

    coords, feats_raw = _scene(rng, n_pts=150, extent=0.8)
    n = len(coords)
    pyr = build_pyramid(batched_coordinates([coords]), PyramidSpec(cap_multiple=64))
    feats = np.zeros((pyr.coords[0].shape[0], 3), np.float32)
    sparse_model, dense_model = _tiny_models(8)
    vs = sparse_model.init(jax.random.PRNGKey(0), feats, pyr.as_jax_inputs(), False)

    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    vd = dense_model.init(
        jax.random.PRNGKey(0), feats_raw, flat, np.ones((n,), np.float32),
        dims, False,
    )
    ps = {jtu.keystr(k): v.shape for k, v in
          jtu.tree_flatten_with_path(vs["params"])[0]}
    pd = {jtu.keystr(k): v.shape for k, v in
          jtu.tree_flatten_with_path(vd["params"])[0]}
    assert ps == pd


def test_dense_valid_mask(rng):
    """Invalid rows neither contribute nor receive features."""
    coords, feats_raw = _scene(rng, n_pts=200, extent=0.8)
    n = len(coords)
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    model = DenseMinkUNet(in_channels=3, out_channels=4,
                          layers=(1,) * 8, planes=TINY_PLANES, init_dim=8,
                          compute_dtype="float32")
    valid = np.ones((n,), np.float32)
    k = n // 2
    valid[k:] = 0
    vs = model.init(jax.random.PRNGKey(0), feats_raw, flat, valid, dims, False)
    out = np.asarray(model.apply(vs, feats_raw, flat, valid, dims, False))
    assert np.all(out[k:] == 0)
    # equals running on only the valid prefix
    base2, dims2 = dense_grid_geometry(coords[:k])
    # keep same grid so comparison is apples-to-apples
    out2 = np.asarray(model.apply(
        vs, feats_raw[:k], flat[:k], valid[:k], dims, False
    ))
    np.testing.assert_allclose(out[:k], out2, atol=1e-4)


def test_dense_tiled_matches_xla(rng):
    """conv_impl="tiled" (Pallas occupied-tile kernel, interpret mode on CPU)
    must reproduce the XLA dense path exactly at the valid rows."""
    from canonicalvoting_tpu.data.dense_prep import level_tiles

    coords, feats_raw = _scene(rng, n_pts=250, extent=0.8)
    n = len(coords)
    base, dims = dense_grid_geometry(coords)
    flat = dense_flat_ids(coords, base, dims)
    valid = np.ones((n,), np.float32)

    kw = dict(in_channels=3, out_channels=8, block="basic",
              layers=(1, 1, 1, 1, 1, 1, 1, 1), planes=TINY_PLANES,
              init_dim=8, compute_dtype="float32")
    m_xla = DenseMinkUNet(conv_impl="xla", **kw)
    variables = m_xla.init(jax.random.PRNGKey(1), feats_raw, flat, valid,
                           dims, False)
    out_xla = np.asarray(m_xla.apply(variables, feats_raw, flat, valid,
                                     dims, False))

    tiles = level_tiles(coords, base, dims)
    assert 0 in tiles
    m_tiled = DenseMinkUNet(conv_impl="tiled_interpret", **kw)
    out_tiled = np.asarray(m_tiled.apply(
        variables, feats_raw, flat, valid, dims, False, tiles=tiles
    ))
    np.testing.assert_allclose(out_tiled, out_xla, atol=2e-3, rtol=1e-3)

    # with the z-run decomposition driving the k=3 convs
    from canonicalvoting_tpu.data.dense_prep import level_tile_runs

    runs = level_tile_runs(coords, base, dims)
    assert runs, "scene must produce run lists"
    out_runs = np.asarray(m_tiled.apply(
        variables, feats_raw, flat, valid, dims, False, tiles=tiles,
        tile_runs=runs,
    ))
    np.testing.assert_allclose(out_runs, out_xla, atol=2e-3, rtol=1e-3)
