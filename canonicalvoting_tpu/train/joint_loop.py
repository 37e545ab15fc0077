"""Joint training driver (reference train_joint.py:191-473).

Epoch loop with the reference's schedules (step LR decay, BN-momentum
decay), checkpointing every 10 epochs, and a full detection + mAP validation
pass every 10 epochs. Ground truth comes either from results_gt txt files
(ScanNet) or from a callback (synthetic smoke runs).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Optional

import jax.numpy as jnp

from canonicalvoting_tpu.config import Config
from canonicalvoting_tpu.data.collate import collate_joint, collate_joint_dense
from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.data.loader import DataLoader
from canonicalvoting_tpu.decode.peeling import PeelConfig
from canonicalvoting_tpu.eval.gt import load_gt_scene
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
from canonicalvoting_tpu.metrics.ap import compute_map
from canonicalvoting_tpu.models import MinkUNet34C
from canonicalvoting_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from canonicalvoting_tpu.train.schedules import bn_momentum_for_epoch, lr_for_epoch
from canonicalvoting_tpu.train.steps import (
    create_train_state,
    create_train_state_dense,
    make_joint_train_step,
    make_optimizer,
)
from canonicalvoting_tpu.utils.meters import AverageMeter

logger = logging.getLogger(__name__)


def run_joint_training(
    cfg: Config,
    train_dataset,
    val_dataset,
    workdir: str = ".",
    gt_lookup: Optional[Callable] = None,
    eval_every: int = 10,
    max_epoch: Optional[int] = None,
    cap_multiple: Optional[int] = None,
    model=None,
):
    """Train the joint model; returns (state, last mAP dict or None)."""
    import jax

    os.makedirs(workdir, exist_ok=True)
    cap_multiple = cap_multiple or cfg.tpu.point_buckets[0]
    max_epoch = max_epoch if max_epoch is not None else cfg.max_epoch

    if model is None:
        model = MinkUNet34C(cfg.in_channels, 6 * NCLASSES + NCLASSES + 1,
                            compute_dtype=cfg.tpu.conv_dtype)
    optimizer = make_optimizer(cfg.weight_decay)

    # mesh=dp,tp (tpu.mesh_data / tpu.mesh_model): scene-level data
    # parallelism x conv-channel tensor parallelism over a jax.sharding.Mesh
    # (parallel/data_parallel.py) — new capability over the single-GPU
    # reference (SURVEY §2). Per-shard batch = cfg.batch_size, so the global
    # batch scales with mesh_data (weak scaling).
    if cfg.tpu.mesh_data * cfg.tpu.mesh_model > 1:
        return _run_joint_training_mesh(
            cfg, train_dataset, val_dataset, workdir, gt_lookup, eval_every,
            max_epoch, cap_multiple, model, optimizer,
        )

    # dense backbone on TPU: the masked dense Conv3D twin trains on the MXU
    # (the gather-form forward is row-gather-bound, models/dense_unet.py);
    # identical parameter tree, so checkpoints and the validation pipeline
    # (which rebuilds its own dense twin) interchange freely
    backbone = cfg.tpu.train_backbone
    on_tpu = jax.default_backend() == "tpu"
    if backbone == "auto":
        backbone = "gather"  # measured winner (RESULTS_r5.md)
    if backbone == "dense":
        import functools

        from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet

        train_model = DenseMinkUNet(
            in_channels=model.in_channels, out_channels=model.out_channels,
            block=model.block, layers=model.layers, planes=model.planes,
            init_dim=model.init_dim, stem_kernel=model.stem_kernel,
            compute_dtype=model.compute_dtype, conv_impl="xla",
            remat=cfg.tpu.train_remat,
        )
        # scene-at-a-time gradient accumulation on TPU: the batch-3 dense
        # backward at ScanNet scale exceeds HBM even with remat
        # (RESULTS_r5.md); microbatch=0 keeps the whole-batch step
        mb = cfg.tpu.train_microbatch
        if mb == 0 and on_tpu:
            mb = 1
        collate = functools.partial(collate_joint_dense, microbatch=mb)
    else:
        import functools

        from canonicalvoting_tpu.train.steps import parse_dense_sites

        # block remat under train (memory; numerics-preserving)
        train_model = model.clone(remat=cfg.tpu.train_remat)
        # the gather backward needs scene microbatching at ScanNet scale
        # too (19.9 GB at batch 3, RESULTS_r5.md); flat_levels feed the
        # scatter-dense conv engine for the tpu.train_dense_levels sites
        mb = cfg.tpu.train_microbatch
        if mb == 0 and on_tpu:
            mb = 1
        collate = functools.partial(
            collate_joint, microbatch=mb,
            with_flat_levels=bool(
                parse_dense_sites(cfg.tpu.train_dense_levels)))

    def make_loader(ds, batch_size, shuffle, drop_last):
        return DataLoader(
            ds, batch_size=batch_size,
            collate_fn=lambda items: collate(items, cap_multiple),
            shuffle=shuffle, num_workers=cfg.num_workers, drop_last=drop_last,
        )

    train_loader = make_loader(train_dataset, cfg.batch_size, True, True)
    val_loader = make_loader(val_dataset, 1, False, False)

    # init from the first batch's shapes
    first = next(iter(train_loader))
    if backbone == "dense":
        state = create_train_state_dense(train_model, optimizer, first)
    else:
        f0 = first["microbatches"][0] if "microbatches" in first else first
        state = create_train_state(model, optimizer, f0["feats"],
                                   f0["pyramid"])
    step_fn = make_joint_train_step(train_model, optimizer, cfg,
                                    backbone=backbone)

    start_epoch = cfg.start_epoch
    ckpt = latest_checkpoint(workdir)
    if ckpt is not None:
        state, saved_epoch = restore_checkpoint(ckpt, state)
        start_epoch = saved_epoch + 1
        logger.info("resumed from %s (epoch %d)", ckpt, saved_epoch)

    meter = AverageMeter()
    ret = None
    for epoch in range(start_epoch, max_epoch + 1):
        lr = jnp.float32(lr_for_epoch(
            epoch, cfg.opt.learning_rate, cfg.lr_decay_steps, cfg.lr_decay_rates
        ))
        mom = jnp.float32(bn_momentum_for_epoch(
            epoch, cfg.opt.bn_decay_step, cfg.opt.bn_decay_rate
        ))
        meter.reset()
        t0 = time.time()
        for batch in train_loader:
            state, losses = step_fn(state, batch, lr, mom)
            meter.update(float(losses["loss"]))
        logger.info(
            "epoch %d: loss=%.4f (%.1fs, lr=%.2e, bn_mom=%.3f)",
            epoch, meter.avg, time.time() - t0, float(lr), float(mom),
        )

        if epoch % eval_every == 0:
            save_checkpoint(
                os.path.join(workdir, f"epoch{epoch}.ckpt"), state, epoch
            )
            ret = run_joint_validation(cfg, model, state, val_dataset, gt_lookup)
    return state, ret


def _run_joint_training_mesh(cfg, train_dataset, val_dataset, workdir,
                             gt_lookup, eval_every, max_epoch, cap_multiple,
                             model, optimizer):
    """Distributed joint training over a (data, model) device mesh: scenes
    sharded over 'data' with sync-BN (statistics psummed over the vmapped
    scene axis), conv kernels column-sharded over 'model'; GSPMD inserts
    the ICI collectives. Validation runs single-device on fetched params."""
    import jax
    import numpy as np

    from canonicalvoting_tpu.data.collate import collate_joint_sharded
    from canonicalvoting_tpu.parallel.data_parallel import (
        make_dp_train_step,
        shard_train_state,
    )
    from canonicalvoting_tpu.parallel.mesh import make_mesh

    dp, tp = cfg.tpu.mesh_data, cfg.tpu.mesh_model
    mesh = make_mesh(dp, tp)
    logger.info("mesh training: data=%d, model=%d", dp, tp)

    train_loader = DataLoader(
        train_dataset, batch_size=cfg.batch_size * dp,
        collate_fn=lambda items: collate_joint_sharded(
            items, dp, cap_multiple),
        shuffle=True, num_workers=cfg.num_workers, drop_last=True,
    )

    first = next(iter(train_loader))
    feats0 = first["feats"][0]
    pyr0 = jax.tree_util.tree_map(lambda x: x[0], first["pyramid"])
    state = create_train_state(model, optimizer, feats0, pyr0)

    start_epoch = cfg.start_epoch
    ckpt = latest_checkpoint(workdir)
    if ckpt is not None:
        state, saved_epoch = restore_checkpoint(ckpt, state)
        start_epoch = saved_epoch + 1
        logger.info("resumed from %s (epoch %d)", ckpt, saved_epoch)

    state = shard_train_state(state, mesh)
    # sync-BN twin: same parameter tree, BN stats psummed over the vmapped
    # scene axis inside the DP step
    step_fn = make_dp_train_step(model.clone(bn_axis="batch"), optimizer,
                                 cfg, mesh)

    meter = AverageMeter()
    ret = None
    for epoch in range(start_epoch, max_epoch + 1):
        lr = jnp.float32(lr_for_epoch(
            epoch, cfg.opt.learning_rate, cfg.lr_decay_steps,
            cfg.lr_decay_rates))
        mom = jnp.float32(bn_momentum_for_epoch(
            epoch, cfg.opt.bn_decay_step, cfg.opt.bn_decay_rate))
        meter.reset()
        t0 = time.time()
        for batch in train_loader:
            state, losses = step_fn(state, batch, lr, mom)
            meter.update(float(losses["loss"]))
        logger.info(
            "epoch %d: loss=%.4f (%.1fs, lr=%.2e, bn_mom=%.3f, mesh=%dx%d)",
            epoch, meter.avg, time.time() - t0, float(lr), float(mom), dp, tp,
        )

        if epoch % eval_every == 0:
            # fetch to host: checkpoints and the single-device validation
            # pipeline are mesh-agnostic
            host_state = jax.tree_util.tree_map(
                lambda x: np.asarray(jax.device_get(x)), state)
            save_checkpoint(
                os.path.join(workdir, f"epoch{epoch}.ckpt"), host_state,
                epoch)
            ret = run_joint_validation(cfg, model, host_state, val_dataset,
                                       gt_lookup)
    return state, ret


def run_joint_validation(cfg, model, state, val_dataset, gt_lookup):
    """Detection + Scan2CAD mAP over the validation split
    (reference train_joint.py:293-473)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pipe = DetectionPipeline(
        model=model, variables=variables, res=cfg.scannet_res,
        num_rots=120, log_scale=cfg.log_scale, use_xyz=cfg.use_xyz,
        peel=PeelConfig(res=cfg.scannet_res, max_boxes=cfg.tpu.max_boxes),
        cap_multiple=cfg.tpu.point_buckets[0],
    )
    pred_map_cls = {}
    gt_map_cls = {}
    for i in range(len(val_dataset)):
        item = val_dataset[i]
        id_scan, coords, feats_raw = item[0], item[1], item[2]
        args = pipe.prepare_quantized(coords, feats_raw)
        # retry escalation so a budget-exit peel can't silently truncate the
        # detections feeding the mAP numbers (reference peels unbounded,
        # eval_joint.py:204)
        out = pipe.run_scene_with_retry(args)
        pred_map_cls[id_scan] = pipe.postprocess(out)
        if gt_lookup is not None:
            gt_map_cls[id_scan] = gt_lookup(id_scan)
        else:
            gt_map_cls[id_scan] = load_gt_scene(cfg.data.gt_path, id_scan)

    results = {}
    for thresh in (0.25, 0.5):
        d = compute_map(pred_map_cls, gt_map_cls, ovthresh=thresh)
        logger.info("IoU %.2f: mAP=%.4f AR=%.4f", thresh, d["mAP"], d["AR"])
        results[thresh] = d
    return results
