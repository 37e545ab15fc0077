"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalvoting_tpu.ops.hough_voting import hough_voting
from canonicalvoting_tpu.parallel.hv_sharded import hough_voting_sharded
from canonicalvoting_tpu.parallel.mesh import factor_mesh, make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_factor_mesh():
    assert factor_mesh(8) == (4, 2)
    assert factor_mesh(3) == (3, 1)
    assert factor_mesh(1) == (1, 1)


def test_point_sharded_voting_matches_single_device(rng):
    n = 64  # divisible by 8
    points = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scale = rng.uniform(0.1, 0.4, (n, 3)).astype(np.float32)
    obj = rng.uniform(0, 1, (n,)).astype(np.float32)
    corners = np.stack([points.min(0), points.max(0)])
    gshape = (24, 24, 24)

    ref = hough_voting(points, xyz, scale, obj, res=0.05, num_rots=12,
                       grid_shape=gshape, corners=corners)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        got = hough_voting_sharded(
            jnp.asarray(points), jnp.asarray(xyz), jnp.asarray(scale),
            jnp.asarray(obj), jnp.asarray(corners), res=0.05, num_rots=12,
            grid_shape=gshape, mesh=mesh, axis="data",
        )
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]), atol=1e-3)


def test_dryrun_multichip_8():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_odd():
    import __graft_entry__ as graft

    graft.dryrun_multichip(3)
