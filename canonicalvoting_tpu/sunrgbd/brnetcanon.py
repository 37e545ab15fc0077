"""BRNetCanon detector contract: canonical-voting proposal injection.

The reference registers ``BRNetCanon(TwoStage3DDetector)`` into
mmdetection3d and, when ``sample_mod == 'custom'``, replaces BRNet's FPS
proposal sampling with Canonical-Voting proposals
(reference /root/reference/sunrgbd/brnetcanon.py:170-352). The mmdet3d host
framework (PointNet++ backbone, rpn/roi heads) is external in the reference
too — users drop the file into a BRNet checkout (reference README.md:110).

This module rebuilds the part the reference actually adds — the
``sample_mod == 'custom'`` proposal-injection block shared verbatim by
``forward_train`` (brnetcanon.py:210-249) and ``simple_test`` (:299-338) —
as a host-framework-agnostic sampler with the same contract:

  * a FROZEN pretrained MinkUNet34C(3, 8) voting backbone held as module
    state, loaded once from a checkpoint nested under ``model_state_dict``
    (brnetcanon.py:165-167);
  * per-sample: axis permutation ``[0, 2, 1]`` between mmdet3d's z-up and
    ScanNet's y-up conventions (:217, :243-245), ``sparse_quantize`` at
    0.03 m with the permuted points as features (:218-225), backbone
    forward under no-grad (:213, :226), head slicing xyz/scale/softmax-prob
    (:233-234), explicit min/max corners with border 0 (:236-240);
  * Hough voting at res 0.05 / 60 rotations / 512 proposals with
    vote-seed rejection at 0.3 m (:165, :242 -> :114-162), all inside ONE
    jitted per-sample program (the reference pays a kernel launch + host
    sync per stage);
  * results stacked into the ``feats_dict`` keys the BRNet rpn head reads:
    ``proposals`` (B, P, 3), ``probs`` (B, P), ``scales`` (B, P, 3), with
    the output permutation applied (:247-249).

A torch-side adapter is intentionally NOT provided: the contract boundary
is the feats_dict, which is plain arrays either way.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
from canonicalvoting_tpu.ops.hough_voting import (
    compute_corners,
    round_grid_shape,
)
from canonicalvoting_tpu.ops.sparse_conv import valid_row_mask
from canonicalvoting_tpu.ops.voxelize import batched_coordinates, sparse_quantize
from canonicalvoting_tpu.sunrgbd.proposal import HoughVotingProposal

#: mmdet3d (x, y, z) <-> ScanNet (x, z, y) — its own inverse
#: (reference brnetcanon.py:217, :243-245)
AXIS_PERMUTE = (0, 2, 1)


@dataclass
class BRNetCanonSampler:
    """Drop-in equivalent of the reference's ``sample_mod == 'custom'``
    proposal block (reference brnetcanon.py:210-249 / :299-338).

    ``model`` is the frozen voting backbone (MinkUNet34C(3, 8) in the
    reference, :165-167); ``variables`` its pretrained parameters —
    load reference checkpoints with ``load_reference_checkpoint``.
    """

    model: object
    variables: Dict
    quant_res: float = 0.03      # sparse_quantize size (brnetcanon.py:221)
    hv_res: float = 0.05         # voting grid res (:165)
    num_rots: int = 60           # (:165)
    num_proposal: int = 512      # (:165)
    reject_radius: float = 0.3   # (:145-152)
    pow: float = 0.5             # top-down map exponent (:242, pow=0.5)
    border: float = 0.0          # corner padding (:211, border = 0.)
    cap_multiple: int = 4096
    grid_multiple: tuple = (16, 16, 16)
    _fns: Dict = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    def _sample_fn(self, cap: int, grid_shape, n_votes: int):
        """One jitted program: backbone -> heads -> HV -> proposal draw."""
        key_sig = (cap, tuple(grid_shape), n_votes)
        if key_sig in self._fns:
            return self._fns[key_sig]

        sampler = HoughVotingProposal(
            res=self.hv_res, num_rots=self.num_rots,
            num_proposal=self.num_proposal,
            reject_radius=self.reject_radius, pow=self.pow,
        )
        model = self.model
        border = self.border

        @jax.jit
        def fn(variables, feats, pyramid, pc, vote_points, key):
            out = model.apply(variables, feats, pyramid, False)
            # heads: xyz 3 + scale 3 + 2-way objectness (brnetcanon.py:233)
            xyz = out[..., :3]
            scale = jnp.exp(out[..., 3:6])  # (:234)
            prob = jax.nn.softmax(out[..., 6:8], axis=-1)[..., 1]
            valid = valid_row_mask(feats.shape[0],
                                   pyramid["nvalid"][0])[:, 0]
            corners = compute_corners(pc, valid)
            # border widens x/z only (:237-240); 0 in the reference config
            pad = jnp.asarray([border, 0.0, border], jnp.float32)
            corners = jnp.stack([corners[0] - pad, corners[1] + pad], 0)
            return sampler(
                pc, xyz, scale, prob, corners, vote_points, key,
                grid_shape=tuple(grid_shape), valid=valid,
            )

        self._fns[key_sig] = fn
        return fn

    # ------------------------------------------------------------------
    def propose(self, points: List[np.ndarray], vote_points: np.ndarray,
                key: Optional[jax.Array] = None) -> Dict[str, np.ndarray]:
        """The custom-sampling block: per-sample quantize -> frozen
        backbone -> Hough-vote -> proposal draw, stacked to feats_dict
        arrays (reference brnetcanon.py:210-249).

        ``points``: length-B list of (N_i, 3) float arrays in mmdet3d
        axes. ``vote_points``: (B, V, 3) BRNet vote-module seeds, same
        axes. Returns {"proposals": (B, P, 3), "probs": (B, P),
        "scales": (B, P, 3)} in mmdet3d axes.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        vote_points = np.asarray(vote_points, np.float32)
        proposals, probs, scales = [], [], []
        for i, pts in enumerate(points):
            pc = np.asarray(pts, np.float32)[:, AXIS_PERMUTE]  # (:217)
            coords, idx = sparse_quantize(pc, self.quant_res)  # (:218-225)
            pyr = build_pyramid(
                batched_coordinates([coords]),
                PyramidSpec(cap_multiple=self.cap_multiple),
            )
            cap = pyr.coords[0].shape[0]
            feats = np.zeros((cap, 3), np.float32)
            feats[: len(coords)] = pc[idx]  # features = permuted points
            pc_w = np.zeros((cap, 3), np.float32)
            pc_w[: len(coords)] = (
                pyr.coords[0][: len(coords), 1:].astype(np.float32)
                * self.quant_res
            )  # pc = coord * 0.03 (:235)
            dims = (coords.max(0) - coords.min(0)) * (
                self.quant_res / self.hv_res) + 1
            grid_shape = round_grid_shape(
                dims.astype(np.int32) + 1, self.grid_multiple)
            fn = self._sample_fn(cap, grid_shape, vote_points.shape[1])
            key, sub = jax.random.split(key)
            cand, prob, scl = fn(
                self.variables, feats, pyr.as_jax_inputs(), pc_w,
                jnp.asarray(vote_points[i][:, AXIS_PERMUTE]), sub,  # (:242)
            )
            proposals.append(np.asarray(cand)[:, AXIS_PERMUTE])  # (:243)
            probs.append(np.asarray(prob))
            scales.append(np.asarray(scl)[:, AXIS_PERMUTE])      # (:245)
        return {
            "proposals": np.stack(proposals),   # (:247)
            "probs": np.stack(probs),           # (:248)
            "scales": np.stack(scales),         # (:249)
        }

    # both reference entry points run the SAME custom block; keep their
    # names so a BRNet port maps 1:1 (brnetcanon.py:191/:288)
    def forward_train_proposals(self, points, vote_points, key=None):
        return self.propose(points, vote_points, key)

    def simple_test_proposals(self, points, vote_points, key=None):
        return self.propose(points, vote_points, key)


def load_reference_checkpoint(path: str):
    """Load the reference's SUN RGB-D backbone checkpoint
    (``sunrgbd/checkpoint.pth`` with the state dict nested under
    ``model_state_dict``, brnetcanon.py:167) into flax variables."""
    from canonicalvoting_tpu.utils.torch_convert import load_torch_checkpoint

    # load_torch_checkpoint already unwraps the model_state_dict nesting
    params, stats = load_torch_checkpoint(path)
    return {"params": params, "batch_stats": stats}
