"""LCC-aware iterative box peeling, fully on-device.

Rebuilds the reference's back-projection-checking decoder
(reference: /root/reference/eval_joint.py:204-263; copies in
train_joint.py:364-424, train_separate.py:379-431, eval_separate.py:203-264)
as a single jit-compiled ``lax.while_loop``:

  loop:
    1. take the argmax cell of grid_obj; stop when its votes < thresh_high
       (eval_joint.py:205-209)
    2. zero a +/- ``elimination`` neighborhood (:211)
    3. decode yaw from atan2 of the rot grid and scale from the scale grid
       (:213-216)
    4. zero every grid cell inside the candidate OBB (:219-243) — expressed
       here as a full-grid inside test, which is provably equivalent to the
       reference's truncated-bounding-volume enumeration for integer cells
    5. back-project all scene points into the canonical frame (:231-234);
       accept iff >= valid_ratio of inside points have prob > prob_thresh,
       >= thresh_low points are inside, and the prob-weighted LCC error is
       <= err_thresh (:245-253)
    6. majority-vote the class among confident inside points (:255-256) and
       score by the max inside prob (:258)

The reference does a ``.item()`` host sync per box; this version never leaves
the device until the final (fixed-size) result arrays are fetched.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.geometry import unit_box_corners


@dataclass(frozen=True)
class PeelConfig:
    """Static decoding constants (reference train_joint.py:16-19 and
    eval_joint.py:204-280)."""

    res: float = 0.03
    thresh_high: float = 60.0
    thresh_low: int = 10
    valid_ratio: float = 0.2
    elimination: int = 2
    prob_thresh: float = 0.3
    err_thresh: float = 0.3
    nclasses: int = 9
    max_boxes: int = 64
    max_iters: int = 128
    # eval_separate.py:209 uses slices without the +1 on the end bound;
    # eval_joint.py:211 includes it. True = eval_joint semantics.
    elimination_inclusive: bool = True


def _axis_deltas(grid_shape, cand, res):
    gx, gy, gz = grid_shape
    ix = jax.lax.broadcasted_iota(jnp.int32, (gx, 1, 1), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, gy, 1), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, gz), 2)
    dx = (ix - cand[0]).astype(jnp.float32) * res
    dy = (iy - cand[1]).astype(jnp.float32) * res
    dz = (iz - cand[2]).astype(jnp.float32) * res
    return ix, iy, iz, dx, dy, dz


def peel_boxes(
    grid_obj: jnp.ndarray,
    grid_rot: Optional[jnp.ndarray],
    grid_scale: Optional[jnp.ndarray],
    points: jnp.ndarray,
    xyz_pred: jnp.ndarray,
    prob_pred: jnp.ndarray,
    class_pred: Optional[jnp.ndarray],
    corner: jnp.ndarray,
    config: PeelConfig,
    valid: Optional[jnp.ndarray] = None,
    rot_scale_fn=None,
):
    """Peel oriented boxes off a vote grid.

    Args:
      grid_obj/grid_rot/grid_scale: vote grids from ``hough_voting``.
      points: (N, 3) world-space scene points (already * res).
      xyz_pred: (N, 3) predicted LCCs.
      prob_pred: (N,) objectness probabilities.
      class_pred: (N,) int32 predicted classes, or None for the binary
        per-category pipeline (class output filled with 0).
      corner: (3,) world coordinate of grid cell (0,0,0) — the scene AABB min
        (reference eval_joint.py:201,206).
      config: static decoding constants.
      valid: optional (N,) point validity mask for padded inputs.
      rot_scale_fn: optional ``cand (3,) int32 -> (rot_vec (2,), scale (3,))``
        lazy sampler (ops.hough_voting.vote_stats_at_cell); when given,
        grid_rot/grid_scale may be None and only the obj grid is needed.

    Returns dict with fixed-size arrays:
      boxes (max_boxes, 8, 3) world corners, scores (max_boxes,),
      classes (max_boxes,) int32, accepted (max_boxes,) bool, n_boxes int32,
      plus exit diagnostics (the reference's loop is unbounded,
      eval_joint.py:204, so a budgeted loop must say WHY it stopped):
      exit_on_threshold bool — the loop stopped because the peak fell below
      thresh_high (the reference's only exit); n_dropped int32 — accepted
      boxes discarded because the max_boxes output buffer was full;
      truncated bool — results may be incomplete (budget exit or drops).
    """
    cfg = config
    res = jnp.float32(cfg.res)
    grid_obj = jnp.asarray(grid_obj)
    if rot_scale_fn is None:
        grid_rot = jnp.asarray(grid_rot)
        grid_scale = jnp.asarray(grid_scale)
    points = jnp.asarray(points)
    xyz_pred = jnp.asarray(xyz_pred)
    prob_pred = jnp.asarray(prob_pred)
    if class_pred is not None:
        class_pred = jnp.asarray(class_pred)
    corner = jnp.asarray(corner, jnp.float32)
    grid_shape = grid_obj.shape
    n_pts = points.shape[0]
    if valid is None:
        valid = jnp.ones((n_pts,), jnp.float32)
    valid_b = valid > 0
    bbox_raw = jnp.asarray(unit_box_corners(), jnp.float32)  # (8, 3)

    def cond(state):
        (grid, boxes, scores, classes, accepted, n_boxes, it, done,
         dropped) = state
        return jnp.logical_and(jnp.logical_not(done), it < cfg.max_iters)

    def body(state):
        (grid, boxes, scores, classes, accepted, n_boxes, it, done,
         dropped) = state

        flat_idx = jnp.argmax(grid)
        cand = jnp.stack(jnp.unravel_index(flat_idx, grid_shape)).astype(jnp.int32)
        peak = grid.reshape(-1)[flat_idx]
        stop = peak < cfg.thresh_high

        cand_world = corner + res * cand.astype(jnp.float32)

        if rot_scale_fn is None:
            rot_vec = grid_rot[cand[0], cand[1], cand[2]]
            scale_full = grid_scale[cand[0], cand[1], cand[2]]
        else:
            rot_vec, scale_full = rot_scale_fn(cand)
        rot = jnp.arctan2(rot_vec[1], rot_vec[0])
        c, s = jnp.cos(rot), jnp.sin(rot)
        # rot_mat_full (eval_joint.py:215): [[c,0,-s],[0,1,0],[s,0,c]]
        safe_scale = jnp.where(jnp.abs(scale_full) < 1e-12, 1e-12, scale_full)

        # --- grid elimination -------------------------------------------
        ix, iy, iz, dx, dy, dz = _axis_deltas(grid_shape, cand, res)
        e = cfg.elimination
        hi = e if cfg.elimination_inclusive else e - 1
        elim = (
            (ix >= cand[0] - e) & (ix <= cand[0] + hi)
            & (iy >= cand[1] - e) & (iy <= cand[1] + hi)
            & (iz >= cand[2] - e) & (iz <= cand[2] + hi)
        )
        # inside-OBB test for every cell: inv = ((cell-cand)*res) @ R / scale
        inv0 = (dx * c + dz * s) / safe_scale[0]
        inv1 = dy / safe_scale[1]
        inv2 = (-dx * s + dz * c) / safe_scale[2]
        inside_cells = (
            (jnp.abs(inv0) < 1.0) & (jnp.abs(inv1) < 1.0) & (jnp.abs(inv2) < 1.0)
        )
        new_grid = jnp.where(elim | inside_cells, 0.0, grid)
        grid = jnp.where(stop, grid, new_grid)

        # --- back-projection checking ------------------------------------
        d = points - cand_world  # (N, 3)
        w0 = (d[:, 0] * c + d[:, 2] * s) / safe_scale[0]
        w1 = d[:, 1] / safe_scale[1]
        w2 = (-d[:, 0] * s + d[:, 2] * c) / safe_scale[2]
        inside_w = (
            (jnp.abs(w0) < 1.0) & (jnp.abs(w1) < 1.0) & (jnp.abs(w2) < 1.0)
            & valid_b
        )
        n_inside = jnp.sum(inside_w)
        conf = inside_w & (prob_pred > cfg.prob_thresh)
        n_conf = jnp.sum(conf)

        coords_inv_world = jnp.stack([w0, w1, w2], axis=-1)
        err_vec = jnp.linalg.norm(xyz_pred - coords_inv_world, axis=-1)
        conf_f = conf.astype(jnp.float32)
        err = jnp.sum(err_vec * prob_pred * conf_f) / jnp.maximum(n_conf, 1)

        ok = (
            (n_conf >= cfg.valid_ratio * n_inside)
            & (n_inside >= cfg.thresh_low)
            & (err <= cfg.err_thresh)
            & jnp.logical_not(stop)
        )

        if class_pred is not None:
            # majority vote (eval_joint.py:255-256); jnp.argmax takes the
            # first max = lowest class index, matching torch.unique order.
            counts = jnp.sum(
                jax.nn.one_hot(class_pred, cfg.nclasses) * conf_f[:, None],
                axis=0,
            )
            best_class = jnp.argmax(counts).astype(jnp.int32)
        else:
            best_class = jnp.int32(0)

        probmax = jnp.max(jnp.where(inside_w, prob_pred, 0.0))

        # world-space corners (eval_joint.py:259)
        rot_mat = jnp.stack(
            [
                jnp.stack([c, jnp.float32(0.0), -s]),
                jnp.stack([jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0)]),
                jnp.stack([s, jnp.float32(0.0), c]),
            ]
        )
        box = (rot_mat @ jnp.diag(scale_full) @ bbox_raw.T).T + cand_world

        slot = jnp.minimum(n_boxes, cfg.max_boxes - 1)
        write = ok & (n_boxes < cfg.max_boxes)
        boxes = jnp.where(
            write,
            jax.lax.dynamic_update_index_in_dim(boxes, box, slot, 0),
            boxes,
        )
        scores = jnp.where(write, scores.at[slot].set(probmax), scores)
        classes = jnp.where(write, classes.at[slot].set(best_class), classes)
        accepted = jnp.where(write, accepted.at[slot].set(True), accepted)
        n_boxes = n_boxes + jnp.where(write, 1, 0)
        dropped = dropped + jnp.where(ok & jnp.logical_not(write), 1, 0)

        return (grid, boxes, scores, classes, accepted, n_boxes, it + 1,
                stop, dropped)

    init = (
        grid_obj,
        jnp.zeros((cfg.max_boxes, 8, 3), jnp.float32),
        jnp.zeros((cfg.max_boxes,), jnp.float32),
        jnp.zeros((cfg.max_boxes,), jnp.int32),
        jnp.zeros((cfg.max_boxes,), bool),
        jnp.int32(0),
        jnp.int32(0),
        jnp.asarray(False),
        jnp.int32(0),
    )
    (grid, boxes, scores, classes, accepted, n_boxes, _, done, dropped) = \
        jax.lax.while_loop(cond, body, init)
    return {
        "boxes": boxes,
        "scores": scores,
        "classes": classes,
        "accepted": accepted,
        "n_boxes": n_boxes,
        "exit_on_threshold": done,
        "n_dropped": dropped,
        "truncated": jnp.logical_not(done) | (dropped > 0),
    }


def peel_boxes_numpy_reference(
    grid_obj, grid_rot, grid_scale, points, xyz_pred, prob_pred, class_pred,
    corner, config: PeelConfig,
):
    """Host transliteration of the reference while-loop
    (eval_joint.py:204-263), used as a test oracle and for eager debugging."""
    cfg = config
    grid = np.array(grid_obj, np.float32)
    grid_rot = np.asarray(grid_rot)
    grid_scale = np.asarray(grid_scale)
    points = np.asarray(points)
    xyz_pred = np.asarray(xyz_pred)
    prob_pred = np.asarray(prob_pred)
    bbox_raw = unit_box_corners()
    boxes, scores, classes = [], [], []
    e = cfg.elimination
    for _ in range(cfg.max_iters):
        cand = np.unravel_index(grid.argmax(), grid.shape)
        if grid[cand] < cfg.thresh_high:
            break
        hi = e + 1 if cfg.elimination_inclusive else e
        grid[
            max(cand[0] - e, 0): cand[0] + hi,
            max(cand[1] - e, 0): cand[1] + hi,
            max(cand[2] - e, 0): cand[2] + hi,
        ] = 0
        rot_vec = grid_rot[cand]
        rot = np.arctan2(rot_vec[1], rot_vec[0])
        c, s = np.cos(rot), np.sin(rot)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        scale = grid_scale[cand]
        cand_world = corner + cfg.res * np.array(cand)

        # zero every cell inside the OBB (full-grid formulation)
        gi = np.stack(
            np.meshgrid(*[np.arange(n) for n in grid.shape], indexing="ij"), -1
        )
        inv = (((gi - np.array(cand)) * cfg.res) @ R) / scale
        grid[np.all(np.abs(inv) < 1, axis=-1)] = 0

        inv_w = ((points - cand_world) @ R) / scale
        inside = np.all(np.abs(inv_w) < 1, axis=-1)
        mask = prob_pred[inside] > cfg.prob_thresh
        if mask.sum() < cfg.valid_ratio * inside.sum() or inside.sum() < cfg.thresh_low:
            continue
        err = np.mean(
            np.linalg.norm(xyz_pred[inside][mask] - inv_w[inside][mask], axis=-1)
            * prob_pred[inside][mask]
        )
        if err > cfg.err_thresh:
            continue
        if class_pred is not None:
            elems, counts = np.unique(
                np.asarray(class_pred)[inside][mask], return_counts=True
            )
            best = int(elems[np.argmax(counts)])
        else:
            best = 0
        probmax = prob_pred[inside].max()
        box = (R @ np.diag(scale) @ bbox_raw.T).T + cand_world
        boxes.append(box)
        scores.append(float(probmax))
        classes.append(best)
    return boxes, scores, classes
