import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalvoting_tpu.ops.hough_voting import HoughVoting, hough_voting
from tests.reference_impls import hv_backward_numpy, hv_forward_numpy


def _random_scene(rng, n=40):
    points = rng.uniform(0, 1.0, (n, 3)).astype(np.float32)
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scale = rng.uniform(0.1, 0.4, (n, 3)).astype(np.float32)
    obj = rng.uniform(0, 1, (n,)).astype(np.float32)
    return points, xyz, scale, obj


@pytest.mark.parametrize("num_rots", [8, 120])
def test_forward_matches_reference(rng, num_rots):
    points, xyz, scale, obj = _random_scene(rng)
    res = 0.05
    ref_obj, ref_rot, ref_scale = hv_forward_numpy(
        points, xyz, scale, obj, res, num_rots
    )
    hv = HoughVoting(res=res, num_rots=num_rots)
    got_obj, got_rot, got_scale = hv(points, xyz, scale, obj)
    got_obj, got_rot, got_scale = map(np.asarray, (got_obj, got_rot, got_scale))
    assert got_obj.shape == ref_obj.shape
    np.testing.assert_allclose(got_obj, ref_obj, atol=2e-4)
    # normalized channels divide by grid_obj + 1e-7: near-empty cells amplify
    # float32 rounding, so compare with a slightly looser tolerance
    np.testing.assert_allclose(got_rot, ref_rot, atol=2e-3)
    np.testing.assert_allclose(got_scale, ref_scale, atol=2e-3)


def test_forward_padded_grid_matches(rng):
    """Votes into a padded static grid match the exact-size grid."""
    points, xyz, scale, obj = _random_scene(rng)
    res = 0.05
    ref_obj, _, _ = hv_forward_numpy(points, xyz, scale, obj, res, 16)
    gx, gy, gz = ref_obj.shape
    pad_shape = (gx + 13, gy + 5, gz + 9)
    got_obj, _, _ = hough_voting(
        jnp.asarray(points), jnp.asarray(xyz), jnp.asarray(scale),
        jnp.asarray(obj), res=res, num_rots=16, grid_shape=pad_shape,
    )
    got_obj = np.asarray(got_obj)
    np.testing.assert_allclose(got_obj[:gx, :gy, :gz], ref_obj, atol=2e-4)
    assert np.all(got_obj[gx:] == 0)
    assert np.all(got_obj[:, gy:] == 0)
    assert np.all(got_obj[:, :, gz:] == 0)


def test_explicit_corners_matches(rng):
    """7-arg explicit-corners variant (sunrgbd/brnetcanon.py:96-117)."""
    points, xyz, scale, obj = _random_scene(rng)
    res = 0.05
    corners = np.stack([points.min(0) - 0.1, points.max(0) + 0.1]).astype(np.float32)
    ref_obj, ref_rot, _ = hv_forward_numpy(
        points, xyz, scale, obj, res, 12, corners=corners
    )
    hv = HoughVoting(res=res, num_rots=12)
    got_obj, got_rot, _ = hv(points, xyz, scale, obj, corners=corners)
    np.testing.assert_allclose(np.asarray(got_obj), ref_obj, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_rot), ref_rot, atol=2e-3)


def test_valid_mask_equals_dropping_rows(rng):
    points, xyz, scale, obj = _random_scene(rng, n=30)
    valid = (rng.uniform(size=30) > 0.3).astype(np.float32)
    res = 0.05
    kept = valid > 0
    ref_obj, _, _ = hv_forward_numpy(
        points[kept], xyz[kept], scale[kept], obj[kept], res, 12
    )
    gx, gy, gz = ref_obj.shape
    got_obj, _, _ = hough_voting(
        jnp.asarray(points), jnp.asarray(xyz), jnp.asarray(scale),
        jnp.asarray(obj), res=res, num_rots=12, grid_shape=(gx, gy, gz),
        valid=jnp.asarray(valid),
    )
    np.testing.assert_allclose(np.asarray(got_obj), ref_obj, atol=2e-4)


def test_backward_matches_reference_kernel(rng):
    """Custom VJP == the CUDA backward kernel's math (incl. its quirks:
    grad only from grid_obj, no 1/res factor)."""
    points, xyz, scale, obj = _random_scene(rng, n=12)
    res = 0.08
    num_rots = 6
    ref_obj, _, _ = hv_forward_numpy(points, xyz, scale, obj, res, num_rots)
    g = rng.uniform(-1, 1, ref_obj.shape).astype(np.float32)
    d_xyz_ref, d_scale_ref, d_obj_ref = hv_backward_numpy(
        g, points, xyz, scale, obj, res, num_rots
    )

    def f(xyz_, scale_, obj_):
        go, _, _ = hough_voting(
            jnp.asarray(points), xyz_, scale_, obj_,
            res=res, num_rots=num_rots, grid_shape=ref_obj.shape,
        )
        return jnp.sum(go * jnp.asarray(g))

    d_xyz, d_scale, d_obj = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(xyz), jnp.asarray(scale), jnp.asarray(obj)
    )
    np.testing.assert_allclose(np.asarray(d_xyz), d_xyz_ref, atol=3e-4)
    np.testing.assert_allclose(np.asarray(d_scale), d_scale_ref, atol=3e-4)
    np.testing.assert_allclose(np.asarray(d_obj), d_obj_ref, atol=3e-4)


def test_obj_grad_finite_difference(rng):
    """d grid_obj / d obj is exact (splat is linear in obj)."""
    points, xyz, scale, obj = _random_scene(rng, n=8)
    res = 0.1
    ref_obj, _, _ = hv_forward_numpy(points, xyz, scale, obj, res, 4)
    g = rng.uniform(-1, 1, ref_obj.shape).astype(np.float32)

    def f(obj_):
        go, _, _ = hough_voting(
            jnp.asarray(points), jnp.asarray(xyz), jnp.asarray(scale), obj_,
            res=res, num_rots=4, grid_shape=ref_obj.shape,
        )
        return jnp.sum(go * jnp.asarray(g))

    d_obj = np.asarray(jax.grad(f)(jnp.asarray(obj)))
    eps = 1e-3
    for i in range(4):
        e = np.zeros_like(obj)
        e[i] = eps
        fd = (float(f(jnp.asarray(obj + e))) - float(f(jnp.asarray(obj - e)))) / (2 * eps)
        np.testing.assert_allclose(d_obj[i], fd, rtol=1e-2, atol=1e-3)


def test_rot_scale_grads_are_discarded(rng):
    """Cotangents on grid_rot / grid_scale contribute nothing
    (reference train_joint.py:31-37 discards them)."""
    points, xyz, scale, obj = _random_scene(rng, n=8)
    res = 0.1

    def f(xyz_):
        _, gr, gs = hough_voting(
            jnp.asarray(points), xyz_, jnp.asarray(scale), jnp.asarray(obj),
            res=res, num_rots=4, grid_shape=(16, 16, 16),
        )
        return jnp.sum(gr) + jnp.sum(gs)

    d = np.asarray(jax.grad(f)(jnp.asarray(xyz)))
    assert np.all(d == 0)


def test_jit_and_vmap_compose(rng):
    points, xyz, scale, obj = _random_scene(rng, n=16)
    f = jax.jit(
        lambda p, x, s, o: hough_voting(
            p, x, s, o, res=0.1, num_rots=4, grid_shape=(16, 16, 16)
        )[0]
    )
    single = f(points, xyz, scale, obj)
    batched = jax.vmap(f)(
        jnp.stack([points, points]),
        jnp.stack([xyz, xyz]),
        jnp.stack([scale, scale]),
        jnp.stack([obj, obj]),
    )
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single), atol=1e-5)
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single), atol=1e-5)


def test_pallas_interpret_matches_xla(rng):
    """Plane-splat Pallas kernel (interpret mode) vs the XLA scatter path."""
    points, xyz, scale, obj = _random_scene(rng, n=60)
    res = 0.05
    gshape = (24, 16, 128)
    ref = hough_voting(points, xyz, scale, obj, res=res, num_rots=12,
                       grid_shape=gshape, method="xla")
    got = hough_voting(points, xyz, scale, obj, res=res, num_rots=12,
                       grid_shape=gshape, method="pallas_interpret")
    ro = np.asarray(ref[0])
    go = np.asarray(got[0])
    # bf16 one-hot weights: ~0.5% relative tolerance
    np.testing.assert_allclose(go, ro, atol=2e-2 + 5e-3 * ro.max())
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(got[2]), np.asarray(ref[2]), atol=2e-2
    )


def test_pallas_interpret_valid_mask(rng):
    points, xyz, scale, obj = _random_scene(rng, n=40)
    valid = (rng.uniform(size=40) > 0.4).astype(np.float32)
    gshape = (24, 16, 128)
    ref = hough_voting(points, xyz, scale, obj, res=0.05, num_rots=8,
                       grid_shape=gshape, valid=jnp.asarray(valid),
                       method="xla")
    got = hough_voting(points, xyz, scale, obj, res=0.05, num_rots=8,
                       grid_shape=gshape, valid=jnp.asarray(valid),
                       method="pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]),
        atol=2e-2 + 5e-3 * float(np.asarray(ref[0]).max()),
    )


def test_vote_stats_at_cell_matches_dense_grids(rng):
    """Lazy per-cell rot/scale sampling == the dense grids at that cell."""
    import jax.numpy as jnp

    from canonicalvoting_tpu.ops.hough_voting import (
        compute_corners,
        grid_dims_from_corners,
        hough_voting,
        hough_voting_obj,
        vote_stats_at_cell,
    )

    n = 60
    points = rng.uniform(0, 1.2, (n, 3)).astype(np.float32)
    xyz = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    scale = rng.uniform(0.1, 0.4, (n, 3)).astype(np.float32)
    obj = rng.rand(n).astype(np.float32)
    valid = (rng.rand(n) > 0.2).astype(np.float32)
    gs = (48, 48, 48)
    res = 0.05

    go, gr, gsc = hough_voting(
        jnp.asarray(points), jnp.asarray(xyz), jnp.asarray(scale),
        jnp.asarray(obj), res=res, num_rots=24, grid_shape=gs,
        valid=jnp.asarray(valid), method="xla",
    )
    go2 = hough_voting_obj(
        jnp.asarray(points), jnp.asarray(xyz), jnp.asarray(scale),
        jnp.asarray(obj), res=res, num_rots=24, grid_shape=gs,
        valid=jnp.asarray(valid), method="xla",
    )
    np.testing.assert_allclose(np.asarray(go2), np.asarray(go), atol=1e-5)

    corners = compute_corners(jnp.asarray(points), jnp.asarray(valid))
    dims = jnp.minimum(grid_dims_from_corners(corners, res),
                       jnp.asarray(gs, np.int32))
    go_np = np.asarray(go)
    # sample the densest cells (where the peeler would look)
    flat_order = np.argsort(go_np.ravel())[::-1][:5]
    for f in flat_order:
        cell = np.unravel_index(f, gs)
        rot_vec, scale_vec = vote_stats_at_cell(
            jnp.asarray(points), jnp.asarray(xyz), jnp.asarray(scale),
            jnp.asarray(obj), corners[0], dims, res, 24,
            jnp.asarray(cell, np.int32), valid=jnp.asarray(valid),
        )
        np.testing.assert_allclose(
            np.asarray(rot_vec), np.asarray(gr)[cell], atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(scale_vec), np.asarray(gsc)[cell], atol=2e-4, rtol=1e-3)


def test_windowed_splat_matches_xla(rng):
    """The x-bucket-windowed Pallas splat (interpret mode) must match the
    XLA oracle, including large-radius points routed through its
    full-width tail pass."""
    import jax.numpy as jnp

    from canonicalvoting_tpu.ops.hough_voting import (
        compute_corners, grid_dims_from_corners, hough_voting_obj)
    from canonicalvoting_tpu.ops.pallas.hv_splat import hv_splat_windowed

    n, cap = 300, 512
    points = np.zeros((cap, 3), np.float32)
    points[:n] = rng.rand(n, 3).astype(np.float32) * np.array(
        [1.5, 0.7, 1.5], np.float32)
    valid = np.zeros((cap,), np.float32)
    valid[:n] = 1.0
    xyz = rng.randn(cap, 3).astype(np.float32) * 0.15
    scale = np.abs(rng.randn(cap, 3)).astype(np.float32) * 0.3 + 0.05
    scale[: n // 8] *= 8.0  # big boxes: exercise the large-radius tail
    obj = rng.rand(cap).astype(np.float32)
    res = 0.05
    gs = (32, 16, 128)

    ref = hough_voting_obj(
        jnp.asarray(points), jnp.asarray(xyz), jnp.asarray(scale),
        jnp.asarray(obj), res=res, num_rots=24, grid_shape=gs,
        valid=jnp.asarray(valid), method="xla",
    )
    corners = compute_corners(jnp.asarray(points), jnp.asarray(valid))
    dims = jnp.minimum(grid_dims_from_corners(corners, res),
                       jnp.asarray(gs, np.int32))
    got = hv_splat_windowed(
        jnp.asarray(points), jnp.asarray(xyz), jnp.asarray(scale),
        jnp.asarray(obj), corners[0], dims, res, num_rots=24,
        grid_shape=gs, valid=jnp.asarray(valid), interpret=True,
    )
    # bf16 tents in the kernel vs f32 oracle
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
