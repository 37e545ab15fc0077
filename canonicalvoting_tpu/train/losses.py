"""Training losses.

Joint loss (reference train_joint.py:246-282): per-GT-class head gather,
masked weighted MSE on LCC + log-scale, cross-entropy over 10 classes
(9 foreground + background).

Separate loss (reference train_separate.py:246-286): binary objectness CE,
masked scale MSE, and the symmetry-aware LCC loss — min over bbox yaw
hypotheses per object. The reference computes that min in a Python loop over
batch items and objects (train_separate.py:265-278, a noted hot spot); here
it is one vectorized segment-reduction over (points x hypotheses), exploiting
that hypothesis h's label is just Rot_y(-angle_h) applied to the base LCC
(Mbbox @ roty(a) => inv = roty(-a) @ inv(Mbbox), utils/dataloader.py:444-465).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.geometry import NCLASSES, SYMMETRY_ANGLES

MAX_HYPOTHESES = 36

#: symmetry class codes for the vectorized loss
SYM_CODES = {
    "__SYM_NONE": 0,
    "__SYM_ROTATE_UP_2": 1,
    "__SYM_ROTATE_UP_4": 2,
    "__SYM_ROTATE_UP_INF": 3,
}


def _sym_tables():
    angles = np.zeros((4, MAX_HYPOTHESES), np.float32)
    valid = np.zeros((4, MAX_HYPOTHESES), np.float32)
    for name, code in SYM_CODES.items():
        a = [0.0] + list(SYMMETRY_ANGLES[name])
        angles[code, : len(a)] = a
        valid[code, : len(a)] = 1.0
    return angles, valid


_SYM_ANGLES, _SYM_VALID = _sym_tables()


def joint_losses(
    out: jnp.ndarray,
    xyz_labels: jnp.ndarray,
    scale_labels: jnp.ndarray,
    class_labels: jnp.ndarray,
    nvalid,
    xyz_weights,
    log_scale: bool = True,
    xyz_factor: float = 1.0,
    scale_factor: float = 1.0,
    nclasses: int = NCLASSES,
) -> Dict[str, jnp.ndarray]:
    """Joint-model training losses on padded rows.

    out: (N, 6*nclasses + nclasses + 1); labels per point; class label in
    [0, nclasses] with nclasses = background; padding rows are excluded via
    ``nvalid``.
    """
    n = out.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    rows_valid = row < nvalid

    out_xyz = out[:, : 3 * nclasses].reshape(-1, nclasses, 3)
    out_scale = out[:, 3 * nclasses: 6 * nclasses].reshape(-1, nclasses, 3)
    out_class = out[:, 6 * nclasses:]

    # gather per-GT-class heads; invalid/background clamped to 0
    # (train_joint.py:253-255)
    idx = jnp.clip(class_labels, 0, nclasses - 1)
    pred_xyz = jnp.take_along_axis(out_xyz, idx[:, None, None], axis=1)[:, 0]
    pred_scale = jnp.take_along_axis(out_scale, idx[:, None, None], axis=1)[:, 0]

    mask = rows_valid & (class_labels >= 0) & (class_labels < nclasses)
    mask_f = mask.astype(jnp.float32)[:, None]
    n_pos = jnp.maximum(jnp.sum(mask_f) * 3.0, 1.0)

    w = jnp.asarray(xyz_weights, jnp.float32)
    scale_target = jnp.where(
        log_scale, jnp.log(jnp.maximum(scale_labels, 1e-12)), scale_labels
    )
    loss_scale = jnp.sum(((pred_scale - scale_target) ** 2) * w * mask_f) / n_pos
    loss_xyz = jnp.sum(((pred_xyz - xyz_labels) ** 2) * w * mask_f) / n_pos

    # CE over all valid rows, 10-way incl. background (train_joint.py:273)
    logp = jax.nn.log_softmax(out_class, axis=-1)
    tgt = jnp.clip(class_labels, 0, nclasses)
    ce = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    rv = rows_valid.astype(jnp.float32)
    loss_class = jnp.sum(ce * rv) / jnp.maximum(jnp.sum(rv), 1.0)

    any_pos = jnp.sum(mask_f) > 0
    loss_xyz = jnp.where(any_pos, loss_xyz * xyz_factor, 0.0)
    loss_scale = jnp.where(any_pos, loss_scale * scale_factor, 0.0)
    loss_class = jnp.where(any_pos, loss_class, 0.0)
    return {
        "loss_xyz": loss_xyz,
        "loss_scale": loss_scale,
        "loss_class": loss_class,
        "loss": loss_xyz + loss_scale + loss_class,
    }


def symmetry_xyz_loss(
    pred_xyz: jnp.ndarray,
    base_xyz: jnp.ndarray,
    obj_id: jnp.ndarray,
    sym_code: jnp.ndarray,
    num_objects,
    xyz_weights,
    max_objects: int,
    nvalid,
) -> jnp.ndarray:
    """Vectorized min-over-hypotheses LCC loss.

    pred_xyz/base_xyz: (N, 3); obj_id: (N,) int32 (-1 = background / padding);
    sym_code: (max_objects,) int32 per object; num_objects: true count.

    Per object o: loss_o = min_h mean_{points(o), 3 comps}
    ((pred - Rot_y(-a_h) base)^2 * w); total = mean over objects
    (train_separate.py:265-278 semantics).
    """
    n = pred_xyz.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    pt_valid = (row < nvalid) & (obj_id >= 0)
    seg = jnp.where(pt_valid, obj_id, max_objects)  # overflow bucket

    angles = jnp.asarray(_SYM_ANGLES)[jnp.clip(sym_code, 0, 3)]  # (O, H)
    hvalid = jnp.asarray(_SYM_VALID)[jnp.clip(sym_code, 0, 3)]   # (O, H)

    w = jnp.asarray(xyz_weights, jnp.float32)
    # per-point per-hypothesis rotated base labels need per-object angles;
    # gather per-point angle rows:
    ang_pt = angles[jnp.clip(obj_id, 0, max_objects - 1)]  # (N, H)
    c = jnp.cos(-ang_pt)
    s = jnp.sin(-ang_pt)
    bx, by, bz = base_xyz[:, 0:1], base_xyz[:, 1:2], base_xyz[:, 2:3]
    # roty(t) = [[c,0,-s],[0,1,0],[s,0,c]] applied with t = -angle
    lx = c * bx - s * bz          # (N, H)
    lz = s * bx + c * bz
    ly = jnp.broadcast_to(by, lx.shape)

    px, py, pz = pred_xyz[:, 0:1], pred_xyz[:, 1:2], pred_xyz[:, 2:3]
    err = (
        w[0] * (px - lx) ** 2 + w[1] * (py - ly) ** 2 + w[2] * (pz - lz) ** 2
    )  # (N, H)

    err_sum = jax.ops.segment_sum(err, seg, num_segments=max_objects + 1)
    cnt = jax.ops.segment_sum(
        pt_valid.astype(jnp.float32), seg, num_segments=max_objects + 1
    )
    err_mean = err_sum[:max_objects] / jnp.maximum(cnt[:max_objects, None] * 3.0, 1.0)

    big = jnp.float32(3e38)
    obj_row = jax.lax.broadcasted_iota(jnp.int32, (max_objects,), 0)
    obj_valid = (obj_row < num_objects) & (cnt[:max_objects] > 0)
    per_obj = jnp.min(jnp.where(hvalid > 0, err_mean, big), axis=1)
    per_obj = jnp.where(obj_valid, per_obj, 0.0)
    denom = jnp.maximum(jnp.sum(obj_valid.astype(jnp.float32)), 1.0)
    return jnp.sum(per_obj) / denom


def separate_losses(
    out: jnp.ndarray,
    base_xyz: jnp.ndarray,
    scale_labels: jnp.ndarray,
    obj_labels: jnp.ndarray,
    obj_id: jnp.ndarray,
    sym_code: jnp.ndarray,
    num_objects,
    nvalid,
    xyz_weights,
    max_objects: int,
    log_scale: bool = True,
    xyz_factor: float = 1.0,
    scale_factor: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Per-category model losses (train_separate.py:246-286).

    out: (N, 8) = xyz(3) + scale(3) + binary objectness(2).
    """
    n = out.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    rows_valid = row < nvalid
    rv = rows_valid.astype(jnp.float32)

    pred_xyz = out[:, :3]
    pred_scale = out[:, 3:6]
    pred_obj = out[:, 6:8]

    logp = jax.nn.log_softmax(pred_obj, axis=-1)
    tgt = jnp.clip(obj_labels, 0, 1)
    ce = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    loss_obj = jnp.sum(ce * rv) / jnp.maximum(jnp.sum(rv), 1.0)

    mask = rows_valid & (obj_labels == 1)
    mask_f = mask.astype(jnp.float32)[:, None]
    n_pos = jnp.maximum(jnp.sum(mask_f) * 3.0, 1.0)
    w = jnp.asarray(xyz_weights, jnp.float32)
    scale_target = jnp.where(
        log_scale, jnp.log(jnp.maximum(scale_labels, 1e-12)), scale_labels
    )
    loss_scale = jnp.sum(((pred_scale - scale_target) ** 2) * w * mask_f) / n_pos

    loss_xyz = symmetry_xyz_loss(
        pred_xyz, base_xyz, obj_id, sym_code, num_objects, xyz_weights,
        max_objects, nvalid,
    )

    loss_xyz = loss_xyz * xyz_factor
    loss_scale = loss_scale * scale_factor
    return {
        "loss_obj": loss_obj,
        "loss_xyz": loss_xyz,
        "loss_scale": loss_scale,
        "loss": loss_obj + loss_xyz + loss_scale,
    }
