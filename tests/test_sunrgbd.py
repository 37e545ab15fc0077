import jax
import numpy as np

from canonicalvoting_tpu.sunrgbd.proposal import (
    HoughVotingProposal,
    farthest_point_sample,
    query_ball_point,
    square_distance,
)


def test_square_distance(rng):
    src = rng.randn(2, 10, 3).astype(np.float32)
    dst = rng.randn(2, 7, 3).astype(np.float32)
    d = np.asarray(square_distance(src, dst))
    for b in range(2):
        for i in range(10):
            for j in range(7):
                expected = np.sum((src[b, i] - dst[b, j]) ** 2)
                np.testing.assert_allclose(d[b, i, j], expected, atol=1e-4)


def test_fps_spreads_points(rng):
    # two tight clusters far apart: FPS with n=2 must pick one from each
    a = rng.randn(50, 3).astype(np.float32) * 0.01
    b = a + 10.0
    xyz = np.concatenate([a, b])[None]
    idx = np.asarray(farthest_point_sample(xyz, 2, jax.random.PRNGKey(0)))[0]
    sides = {int(i) >= 50 for i in idx}
    assert sides == {True, False}


def test_query_ball_point(rng):
    xyz = rng.uniform(0, 1, (1, 100, 3)).astype(np.float32)
    new_xyz = xyz[:, :5]
    idx = np.asarray(query_ball_point(0.2, 8, xyz, new_xyz))
    assert idx.shape == (1, 5, 8)
    for q in range(5):
        for j in idx[0, q]:
            d = np.linalg.norm(xyz[0, int(j)] - new_xyz[0, q])
            # either within radius or the backfilled first neighbor
            assert d <= 0.2 + 1e-5 or int(j) == int(idx[0, q, 0])


def test_proposal_sampler_finds_object(rng):
    """Proposals concentrate near a planted high-vote object and are
    rejected near existing vote seeds."""
    from canonicalvoting_tpu.data.geometry import rotmat_y

    center = np.array([1.0, 0.5, 1.0], np.float32)
    scale = np.array([0.3, 0.3, 0.3], np.float32)
    n_obj, n_bg = 1500, 3000
    lcc = rng.uniform(-0.9, 0.9, (n_obj, 3)).astype(np.float32)
    obj_pts = (rotmat_y(0.5) @ (lcc * scale).T).T + center
    bg = rng.uniform(0, 2, (n_bg, 3)).astype(np.float32)
    pc = np.concatenate([obj_pts, bg]).astype(np.float32)
    xyz = np.concatenate([lcc, np.zeros_like(bg)]).astype(np.float32)
    scl = np.full_like(pc, 0.2)
    scl[:n_obj] = scale
    prob = np.concatenate([
        np.full(n_obj, 0.9, np.float32), np.full(n_bg, 0.01, np.float32)
    ])
    corners = np.stack([pc.min(0), pc.max(0)])

    sampler = HoughVotingProposal(res=0.05, num_rots=36, num_proposal=64)
    cands, probs, scales = sampler(
        pc, xyz, scl, prob, corners,
        vote_points=np.full((8, 3), 50.0, np.float32),  # no rejections
        key=jax.random.PRNGKey(0), grid_shape=(48, 32, 48),
    )
    cands = np.asarray(cands)
    assert cands.shape == (64, 3)
    d = np.linalg.norm(cands - center, axis=-1)
    # most proposals should cluster at the planted center
    assert (d < 0.3).mean() > 0.35, f"only {(d < 0.3).mean():.2f} near center"

    # rejection: seeds at the object center suppress proposals there
    cands2, _, _ = sampler(
        pc, xyz, scl, prob, corners,
        vote_points=np.broadcast_to(center, (8, 3)).astype(np.float32),
        key=jax.random.PRNGKey(0), grid_shape=(48, 32, 48),
    )
    d2 = np.linalg.norm(np.asarray(cands2) - center, axis=-1)
    assert (d2 < 0.3).mean() < (d < 0.3).mean()
