import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.ops.coords import (
    PyramidSpec,
    build_nbr_table,
    build_pyramid,
    downsample_coords,
    kernel_offsets,
    pack_coords,
)
from canonicalvoting_tpu.ops.sparse_conv import sparse_conv_apply


def _random_coords(rng, n, extent=12, batches=2):
    pts = set()
    while len(pts) < n:
        b = rng.randint(batches)
        pts.add((b,) + tuple(rng.randint(0, extent, 3)))
    return np.array(sorted(pts), np.int32)


def _sparse_conv_dict_oracle(coords_in, feats, coords_out, offsets, W):
    """Direct transliteration of sparse-conv semantics via a coord dict."""
    table = {tuple(c): i for i, c in enumerate(coords_in.tolist())}
    out = np.zeros((len(coords_out), W.shape[2]), np.float32)
    for m, c in enumerate(coords_out.tolist()):
        for k, off in enumerate(offsets.tolist()):
            q = (c[0], c[1] + off[0], c[2] + off[1], c[3] + off[2])
            j = table.get(q)
            if j is not None:
                out[m] += feats[j] @ W[k]
    return out


def test_kernel_offsets_order_and_coverage():
    offs = kernel_offsets(3, 1)
    assert offs.shape == (27, 3)
    # x varies fastest (ME hypercube order)
    assert list(offs[0]) == [-1, -1, -1]
    assert list(offs[1]) == [0, -1, -1]
    assert list(offs[2]) == [1, -1, -1]
    assert list(offs[3]) == [-1, 0, -1]
    # even kernel: {0, s}
    offs2 = kernel_offsets(2, 4)
    assert set(map(tuple, offs2.tolist())) == {
        (a, b, c) for a in (0, 4) for b in (0, 4) for c in (0, 4)
    }


def test_pack_coords_unique(rng):
    coords = _random_coords(rng, 200)
    keys = pack_coords(coords)
    assert len(np.unique(keys)) == len(coords)


def test_nbr_table_matches_dict(rng):
    coords = _random_coords(rng, 150)
    offs = kernel_offsets(3, 1)
    nbr = build_nbr_table(coords, coords, offs)
    table = {tuple(c): i for i, c in enumerate(coords.tolist())}
    for m in range(0, len(coords), 7):
        c = coords[m].tolist()
        for k, off in enumerate(offs.tolist()):
            q = (c[0], c[1] + off[0], c[2] + off[1], c[3] + off[2])
            expected = table.get(q, -1)
            assert nbr[m, k] == expected


def test_sparse_conv_matches_dict_oracle(rng):
    coords = _random_coords(rng, 120)
    offs = kernel_offsets(3, 1)
    nbr = build_nbr_table(coords, coords, offs)
    cin, cout = 8, 16
    feats = rng.randn(len(coords), cin).astype(np.float32)
    W = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    ref = _sparse_conv_dict_oracle(coords, feats, coords, offs, W)
    got = np.asarray(
        sparse_conv_apply(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(W),
                          compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_sparse_conv_matches_dense_conv(rng):
    """Cross-check against XLA's dense conv on a small dense grid: sparse
    conv at occupied voxels == dense conv sampled there (empty = 0 feats)."""
    E = 6
    coords = _random_coords(rng, 40, extent=E, batches=1)
    cin, cout = 4, 5
    feats = rng.randn(len(coords), cin).astype(np.float32)
    W = rng.randn(27, cin, cout).astype(np.float32) * 0.2

    offs = kernel_offsets(3, 1)
    nbr = build_nbr_table(coords, coords, offs)
    got = np.asarray(
        sparse_conv_apply(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(W),
                          compute_dtype=jnp.float32)
    )

    dense = np.zeros((1, cin, E, E, E), np.float32)
    for i, (b, x, y, z) in enumerate(coords.tolist()):
        dense[0, :, x, y, z] = feats[i]
    # W[k] with k enumerated x-fastest over (dx,dy,dz) in [-1,1]
    Wd = np.zeros((cout, cin, 3, 3, 3), np.float32)
    for k, (dx, dy, dz) in enumerate(offs.tolist()):
        Wd[:, :, dx + 1, dy + 1, dz + 1] = W[k].T
    out_dense = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(Wd), (1, 1, 1), "SAME"
    )
    out_dense = np.asarray(out_dense)
    for i, (b, x, y, z) in enumerate(coords.tolist()):
        np.testing.assert_allclose(got[i], out_dense[0, :, x, y, z], atol=1e-4)


def test_downsample_coords():
    coords = np.array(
        [[0, 0, 0, 0], [0, 1, 1, 1], [0, 2, 2, 2], [0, 3, 3, 3], [1, 0, 0, 0],
         [0, -1, -1, -1]],
        np.int32,
    )
    down = downsample_coords(coords, 2)
    got = set(map(tuple, down.tolist()))
    assert got == {(0, 0, 0, 0), (0, 2, 2, 2), (1, 0, 0, 0), (0, -2, -2, -2)}


def test_strided_down_conv_matches_dict(rng):
    coords = _random_coords(rng, 100)
    out_coords = downsample_coords(coords, 2)
    offs = kernel_offsets(2, 1)
    nbr = build_nbr_table(coords, out_coords, offs)
    cin, cout = 6, 7
    feats = rng.randn(len(coords), cin).astype(np.float32)
    W = rng.randn(8, cin, cout).astype(np.float32) * 0.2
    ref = _sparse_conv_dict_oracle(coords, feats, out_coords, offs, W)
    got = np.asarray(
        sparse_conv_apply(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(W),
                          compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_transposed_conv_is_reverse_map(rng):
    """Up conv: every fine voxel receives from exactly one (parent, offset),
    and the pair set is the transpose of the down map."""
    coords = _random_coords(rng, 80)
    out_coords = downsample_coords(coords, 2)
    offs = kernel_offsets(2, 1)
    down = build_nbr_table(coords, out_coords, offs)
    up = build_nbr_table(out_coords, coords, -offs)
    # each fine row has exactly one valid entry
    assert np.all((up >= 0).sum(1) == 1)
    # pair sets match: (coarse m, fine j, offset k) in down <=> in up
    pairs_down = {
        (m, int(down[m, k]), k)
        for m in range(len(out_coords)) for k in range(8) if down[m, k] >= 0
    }
    pairs_up = {
        (int(up[j, k]), j, k)
        for j in range(len(coords)) for k in range(8) if up[j, k] >= 0
    }
    assert pairs_down == pairs_up


def test_build_pyramid_shapes(rng):
    coords = _random_coords(rng, 200, extent=20)
    pyr = build_pyramid(coords, PyramidSpec(capacities=(256, 256, 192, 96, 64)))
    assert len(pyr.coords) == 5
    assert pyr.nbr_stem.shape == (256, 125)
    assert [c.shape[0] for c in pyr.coords] == [256, 256, 192, 96, 64]
    # strides: level i coords are multiples of 2^i
    for i, c in enumerate(pyr.coords):
        nv = pyr.nvalid[i]
        assert np.all(c[:nv, 1:] % (1 << i) == 0)
    # padded rows of tables are -1
    for i in range(5):
        nv = pyr.nvalid[i]
        assert np.all(pyr.nbr_conv[i][nv:] == -1)


def test_pyramid_padding_isolated(rng):
    """Padding rows never appear as neighbors of valid rows."""
    coords = _random_coords(rng, 100, extent=10)
    pyr = build_pyramid(coords, PyramidSpec(capacities=(128, 128, 128, 64, 64)))
    for i in range(5):
        nv = pyr.nvalid[i]
        valid_nbrs = pyr.nbr_conv[i][:nv]
        assert np.all(valid_nbrs < nv)
    for i in range(4):
        assert np.all(pyr.nbr_down[i][: pyr.nvalid[i + 1]] < pyr.nvalid[i])
        assert np.all(pyr.nbr_up[i][: pyr.nvalid[i]] < pyr.nvalid[i + 1])


def test_native_matches_numpy_coordinate_manager(rng):
    """C coordinate manager == NumPy fallback, exactly."""
    import canonicalvoting_tpu.native as native_mod
    from canonicalvoting_tpu.ops.coords import _pad_coords

    if native_mod.lib() is None:
        import pytest

        pytest.skip("no C compiler available")
    coords = _random_coords(rng, 300, extent=24)
    padded = _pad_coords(coords, 384)
    offs = kernel_offsets(3, 1)
    nat = native_mod.build_nbr_table(padded, len(coords), padded, len(coords), offs)
    # numpy path
    import os

    os.environ["CVT_NO_NATIVE"] = "1"
    native_mod._tried = False
    native_mod._lib = None
    try:
        ref = build_nbr_table(padded, padded, offs, in_valid=len(coords),
                              out_valid=len(coords))
        np.testing.assert_array_equal(nat, ref)

        got_d = native_mod.downsample_coords(coords, len(coords), 2)
        assert got_d is None  # disabled via env
    finally:
        del os.environ["CVT_NO_NATIVE"]
        native_mod._tried = False
        native_mod._lib = None
    # downsample parity (native on, vs pure-numpy formula)
    down_ref = np.unique(
        np.concatenate(
            [coords[:, :1], (coords[:, 1:] // 2) * 2], 1
        ), axis=0,
    )
    down_nat = downsample_coords(coords, 2)
    assert set(map(tuple, down_nat.tolist())) == set(map(tuple, down_ref.tolist()))


def test_scatter_dense_engine_matches_gather(rng):
    """dense_plans (scatter -> lax.conv -> gather, ops/scatter_conv.py)
    reproduce the gather-form forward for every site type (stem k=5, sub
    k=3, strided down, transposed up) — same params, same pyramid."""
    import jax

    from canonicalvoting_tpu.data.collate import collate_joint
    from canonicalvoting_tpu.data.synthetic import make_scene
    from canonicalvoting_tpu.models.minkunet import MinkUNetBase
    from canonicalvoting_tpu.ops.voxelize import sparse_quantize
    from canonicalvoting_tpu.train.steps import (
        build_dense_plans,
        init_variables,
        parse_dense_sites,
    )

    items = []
    for i in range(2):
        sc = make_scene(rng, extent=(0.8, 0.7, 0.8), n_background=400,
                        n_boxes=1, pts_per_box=150)
        coords, idx = sparse_quantize(sc.points, 0.03)
        items.append((f"s{i}", coords, sc.rgb[idx], sc.xyz_labels[idx],
                      sc.scale_labels[idx], sc.class_labels[idx]))
    batch = collate_joint(items, cap_multiple=256, with_flat_levels=True)
    model = MinkUNetBase(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=(8, 16, 16, 16, 16, 16, 8, 8), init_dim=8,
        compute_dtype="float32",
    )
    variables = init_variables(model, batch["feats"], batch["pyramid"],
                               train=False)
    ref = np.asarray(model.apply(variables, batch["feats"],
                                 batch["pyramid"], False))

    meta = batch["meta"]
    plans = build_dense_plans(
        batch["flat_levels"], meta["grid_dims"], meta["n_scenes"],
        parse_dense_sites("all"), stem_kernel=5)
    got = np.asarray(model.apply(variables, batch["feats"],
                                 batch["pyramid"], False,
                                 dense_plans=plans))
    nv = int(batch["pyramid"]["nvalid"][0])
    np.testing.assert_allclose(got[:nv], ref[:nv], atol=2e-4, rtol=1e-3)

    # train-mode grads agree too (the engine's purpose is the train step)
    def loss(v, plans):
        out, _ = model.apply(v, batch["feats"], batch["pyramid"], True,
                             0.5, dense_plans=plans,
                             mutable=["batch_stats"])
        return jnp.sum(out[:nv].astype(jnp.float32) ** 2) / nv

    g_ref = jax.grad(lambda v: loss(v, None))(variables["params"]
                                              if False else variables)
    g_got = jax.grad(lambda v: loss(v, plans))(variables)
    fr = jax.tree_util.tree_flatten_with_path(g_ref["params"])[0]
    fg = dict(jax.tree_util.tree_flatten_with_path(g_got["params"])[0])
    for k, vr in fr:
        np.testing.assert_allclose(
            np.asarray(vr), np.asarray(fg[k]), atol=5e-3, rtol=5e-3,
            err_msg=jax.tree_util.keystr(k))
