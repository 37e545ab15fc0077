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


def _two_blob_scene(rng):
    """Two planted high-vote objects A and B, plus uniform background."""
    from canonicalvoting_tpu.data.geometry import rotmat_y

    centers = np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 1.5]], np.float32)
    scale = np.array([0.3, 0.3, 0.3], np.float32)
    n_obj, n_bg = 1500, 1000
    parts, xyzs = [], []
    for c in centers:
        lcc = rng.uniform(-0.9, 0.9, (n_obj, 3)).astype(np.float32)
        parts.append((rotmat_y(0.5) @ (lcc * scale).T).T + c)
        xyzs.append(lcc)
    bg = rng.uniform(0, 2, (n_bg, 3)).astype(np.float32)
    pc = np.concatenate(parts + [bg]).astype(np.float32)
    xyz = np.concatenate(xyzs + [np.zeros_like(bg)]).astype(np.float32)
    scl = np.full_like(pc, 0.2)
    scl[: 2 * n_obj] = scale
    prob = np.concatenate([
        np.full(2 * n_obj, 0.9, np.float32), np.full(n_bg, 0.01, np.float32)
    ])
    corners = np.stack([pc.min(0), pc.max(0)])
    return pc, xyz, scl, prob, corners, centers


def test_proposal_sampler_finds_objects(rng):
    """With no qualifying seed, the sampler falls back to the raw vote
    distribution and finds both planted objects."""
    pc, xyz, scl, prob, corners, centers = _two_blob_scene(rng)
    sampler = HoughVotingProposal(res=0.05, num_rots=36, num_proposal=64)
    cands, probs, scales = sampler(
        pc, xyz, scl, prob, corners,
        vote_points=np.full((8, 3), 50.0, np.float32),  # nothing within 0.3m
        key=jax.random.PRNGKey(0), grid_shape=(64, 32, 64),
    )
    cands = np.asarray(cands)
    assert cands.shape == (64, 3)
    dA = np.linalg.norm(cands - centers[0], axis=-1)
    dB = np.linalg.norm(cands - centers[1], axis=-1)
    assert (dA < 0.4).mean() > 0.08, f"only {(dA < 0.4).mean():.2f} near A"
    assert (dB < 0.4).mean() > 0.08, f"only {(dB < 0.4).mean():.2f} near B"


def test_brnetcanon_sampler_contract(rng):
    """BRNetCanonSampler.propose reproduces the sample_mod=='custom'
    contract (reference brnetcanon.py:210-249): feats_dict keys/shapes,
    mmdet3d-axis outputs, per-sample loop over a ragged batch, and a
    frozen backbone (identical variables before/after)."""
    from canonicalvoting_tpu.models.minkunet import MinkUNetBase
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
    from canonicalvoting_tpu.ops.voxelize import (
        batched_coordinates,
        sparse_quantize,
    )
    from canonicalvoting_tpu.sunrgbd.brnetcanon import BRNetCanonSampler
    from canonicalvoting_tpu.train.steps import init_variables

    # tiny frozen voting backbone: 8 head channels (xyz 3 + scale 3 + 2)
    model = MinkUNetBase(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=(8, 16, 16, 16, 16, 16, 8, 8), init_dim=8,
        compute_dtype="float32",
    )
    # ragged batch of 2 point clouds in mmdet3d axes (z up): different
    # sizes exercise the per-sample loop (:216, :232)
    # anisotropic extents so a missed y<->z re-permutation moves
    # proposals outside the AABB
    pts = [
        rng.uniform([0, 0, 0], [2.0, 1.6, 0.4], (900, 3)).astype(np.float32),
        rng.uniform([0, 0, 0], [1.8, 1.4, 0.3], (700, 3)).astype(np.float32),
    ]
    pc0 = pts[0][:, [0, 2, 1]]
    coords0, _ = sparse_quantize(pc0, 0.03)
    pyr0 = build_pyramid(batched_coordinates([coords0]),
                         PyramidSpec(cap_multiple=1024))
    f0 = np.zeros((pyr0.coords[0].shape[0], 3), np.float32)
    variables = init_variables(model, f0, pyr0.as_jax_inputs(), train=False)

    sampler = BRNetCanonSampler(
        model=model, variables=variables, num_rots=12, num_proposal=32,
        cap_multiple=1024, grid_multiple=(16, 16, 16),
    )
    vote_points = rng.uniform(0, 1.2, (2, 16, 3)).astype(np.float32)
    before = jax.tree_util.tree_leaves(variables)
    out = sampler.propose(pts, vote_points, key=jax.random.PRNGKey(1))

    assert set(out) == {"proposals", "probs", "scales"}  # (:247-249)
    assert out["proposals"].shape == (2, 32, 3)
    assert out["probs"].shape == (2, 32)
    assert out["scales"].shape == (2, 32, 3)
    assert np.all(out["probs"] == 0.0)  # (:161) probs are zeros
    after = jax.tree_util.tree_leaves(sampler.variables)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # outputs are back in mmdet3d axes: proposals must lie inside the
    # input cloud's AABB (voting can only land on occupied-extent cells),
    # which differs between y and z — catching a missed re-permutation
    for b in range(2):
        lo, hi = pts[b].min(0) - 0.1, pts[b].max(0) + 0.1
        assert np.all(out["proposals"][b] >= lo - 1e-5)
        assert np.all(out["proposals"][b] <= hi + 1e-5)
    # deterministic under a fixed key
    out2 = sampler.propose(pts, vote_points, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(out["proposals"], out2["proposals"])


def test_proposal_sampler_keeps_near_seed(rng):
    """Reference semantics (brnetcanon.py:142-155): candidates within 0.3m
    of a vote seed are KEPT, others rejected. A seed at object A must
    concentrate proposals at A and starve B — the opposite assignment
    (rejecting near-seed draws) would concentrate them at B instead, so
    this test discriminates the two behaviors."""
    pc, xyz, scl, prob, corners, centers = _two_blob_scene(rng)
    sampler = HoughVotingProposal(res=0.05, num_rots=36, num_proposal=64,
                                  oversample=24)
    cands, _, _ = sampler(
        pc, xyz, scl, prob, corners,
        vote_points=np.broadcast_to(centers[0], (8, 3)).astype(np.float32),
        key=jax.random.PRNGKey(0), grid_shape=(64, 32, 64),
    )
    cands = np.asarray(cands)
    dA = np.linalg.norm(cands - centers[0], axis=-1)
    dB = np.linalg.norm(cands - centers[1], axis=-1)
    near_A, near_B = (dA < 0.35).mean(), (dB < 0.35).mean()
    assert near_A > 0.8, f"near-seed draws must dominate, got {near_A:.2f}"
    assert near_B < 0.05, f"far-from-seed draws must be rejected, got {near_B:.2f}"


def test_brnetcanon_bridge_from_nested_pth(rng, tmp_path):
    """The worked bridge (sunrgbd/README.md) end to end: a genuine
    torch-saved checkpoint in the SUN RGB-D layout (state dict nested under
    ['model_state_dict'], reference brnetcanon.py:167) loads through
    ``load_reference_checkpoint``, and torch point clouds + vote seeds run
    through ``BRNetCanonSampler.propose`` into feats_dict-ready torch
    tensors."""
    import pytest

    torch = pytest.importorskip("torch")

    from canonicalvoting_tpu.models.minkunet import MinkUNetBase
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
    from canonicalvoting_tpu.ops.voxelize import (
        batched_coordinates,
        sparse_quantize,
    )
    from canonicalvoting_tpu.sunrgbd.brnetcanon import (
        BRNetCanonSampler,
        load_reference_checkpoint,
    )
    from canonicalvoting_tpu.train.checkpoint import export_torch_style
    from canonicalvoting_tpu.train.steps import init_variables

    model = MinkUNetBase(
        in_channels=3, out_channels=8, block="basic", layers=(1,) * 8,
        planes=(8, 16, 16, 16, 16, 16, 8, 8), init_dim=8,
        compute_dtype="float32",
    )
    pts_t = [
        torch.from_numpy(
            rng.uniform([0, 0, 0], [2.0, 1.6, 0.4], (600, 3))
            .astype(np.float32)),
        torch.from_numpy(
            rng.uniform([0, 0, 0], [1.8, 1.4, 0.3], (500, 3))
            .astype(np.float32)),
    ]
    pc0 = pts_t[0].numpy()[:, [0, 2, 1]]
    coords0, _ = sparse_quantize(pc0, 0.03)
    pyr0 = build_pyramid(batched_coordinates([coords0]),
                         PyramidSpec(cap_multiple=1024))
    f0 = np.zeros((pyr0.coords[0].shape[0], 3), np.float32)
    variables = init_variables(model, f0, pyr0.as_jax_inputs(), train=False)

    # save in the published layout, then load through the bridge's loader
    path = str(tmp_path / "checkpoint.pth")
    export_torch_style(path, variables)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    torch.save({"model_state_dict": sd, "epoch": 160}, path)
    loaded = load_reference_checkpoint(path)

    sampler = BRNetCanonSampler(
        model=model, variables=loaded, num_rots=12, num_proposal=32,
        cap_multiple=1024, grid_multiple=(16, 16, 16),
    )
    # the documented adapter: torch -> numpy -> propose -> torch
    seeds_t = torch.from_numpy(
        rng.uniform(0, 1.2, (2, 16, 3)).astype(np.float32))
    out = sampler.propose([p.numpy() for p in pts_t], seeds_t.numpy(),
                          key=jax.random.PRNGKey(1))
    feats_dict = {k: torch.from_numpy(out[k]) for k in
                  ("proposals", "probs", "scales")}
    assert feats_dict["proposals"].shape == (2, 32, 3)
    assert feats_dict["probs"].shape == (2, 32)
    assert feats_dict["scales"].shape == (2, 32, 3)
    assert feats_dict["proposals"].dtype == torch.float32
    # identical outputs to running with the in-memory variables: the
    # nested .pth layout loses nothing
    sampler2 = BRNetCanonSampler(
        model=model, variables=variables, num_rots=12, num_proposal=32,
        cap_multiple=1024, grid_multiple=(16, 16, 16),
    )
    out2 = sampler2.propose([p.numpy() for p in pts_t], seeds_t.numpy(),
                            key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(out["proposals"], out2["proposals"])
    np.testing.assert_allclose(out["scales"], out2["scales"])
