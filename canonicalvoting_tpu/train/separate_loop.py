"""Per-category (separate) training driver (reference train_separate.py:184-459).

Epoch loop with the reference's schedules, checkpointing every 10 epochs,
auto-resume, and — like the reference — a full detection + Scan2CAD mAP
validation pass over ``val_dataset`` every 10 epochs
(reference train_separate.py:301-455): per val scene the current model is
run through the vote → peel → NMS chain, detections are labeled with the
trained category, and per-category AP/Recall are logged so training can be
steered toward the 21.7-mAP separate-model target.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.config import Config
from canonicalvoting_tpu.data.collate import collate_separate
from canonicalvoting_tpu.data.geometry import NAME2CATNAME
from canonicalvoting_tpu.data.loader import DataLoader
from canonicalvoting_tpu.decode.peeling import PeelConfig
from canonicalvoting_tpu.eval.gt import load_gt_scene
from canonicalvoting_tpu.eval.separate import (
    SeparateDetectionPipeline,
    stack_variables,
)
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
    make_optimizer,
    make_separate_train_step,
)
from canonicalvoting_tpu.utils.meters import AverageMeter

logger = logging.getLogger(__name__)


def run_separate_training(
    cfg: Config,
    train_dataset,
    val_dataset,
    workdir: str = ".",
    gt_lookup: Optional[Callable] = None,
    eval_every: int = 10,
    max_epoch: Optional[int] = None,
    cap_multiple: int = 4096,
    model=None,
):
    """Train one per-category model; returns (state, last mAP dict or None)."""
    os.makedirs(workdir, exist_ok=True)
    max_epoch = max_epoch if max_epoch is not None else cfg.max_epoch
    max_objects = cfg.tpu.max_objects

    if model is None:
        model = MinkUNet34C(cfg.in_channels, 8,
                            compute_dtype=cfg.tpu.conv_dtype)
    optimizer = make_optimizer(cfg.weight_decay)

    # mesh=dp,tp (tpu.mesh_data / tpu.mesh_model): scene-level data
    # parallelism with sync-BN over a jax.sharding.Mesh, as the joint loop
    # does — new capability over the single-GPU reference trainer
    # (train_separate.py:184-298)
    if cfg.tpu.mesh_data * cfg.tpu.mesh_model > 1:
        return _run_separate_training_mesh(
            cfg, train_dataset, val_dataset, workdir, gt_lookup, eval_every,
            max_epoch, cap_multiple, max_objects, model, optimizer,
        )

    # dense backbone on TPU, as in the joint loop: the masked dense Conv3D
    # twin trains on the MXU with the identical parameter tree, so
    # checkpoints and the validation pipeline interchange freely
    import jax

    backbone = cfg.tpu.train_backbone
    on_tpu = jax.default_backend() == "tpu"
    if backbone == "auto":
        backbone = "gather"  # measured winner (RESULTS_r5.md)
    mb = 0
    if backbone == "dense":
        from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet

        train_model = DenseMinkUNet(
            in_channels=model.in_channels, out_channels=model.out_channels,
            block=model.block, layers=model.layers, planes=model.planes,
            init_dim=model.init_dim, stem_kernel=model.stem_kernel,
            compute_dtype=model.compute_dtype, conv_impl="xla",
            remat=cfg.tpu.train_remat,
        )
        # remat + scene-at-a-time grad accumulation on TPU, as the joint
        # loop does (the batch-3 dense backward exceeds HBM otherwise —
        # RESULTS_r5.md)
        mb = cfg.tpu.train_microbatch
        if mb == 0 and on_tpu:
            mb = 1
    else:
        # block remat under train (memory; numerics-preserving)
        train_model = model.clone(remat=cfg.tpu.train_remat)
        # gather path: scene microbatching + the scatter-dense conv
        # engine for the tpu.train_dense_levels sites (as the joint loop)
        mb = cfg.tpu.train_microbatch
        if mb == 0 and on_tpu:
            mb = 1

    from canonicalvoting_tpu.train.steps import parse_dense_sites

    with_fl = (backbone != "dense"
               and bool(parse_dense_sites(cfg.tpu.train_dense_levels)))
    loader = DataLoader(
        train_dataset, batch_size=cfg.batch_size,
        collate_fn=lambda it: collate_separate(
            it, cap_multiple=cap_multiple, max_objects=max_objects,
            dense=(backbone == "dense"), microbatch=mb,
            with_flat_levels=with_fl,
        ),
        shuffle=True, num_workers=cfg.num_workers, drop_last=True,
    )
    first = next(iter(loader))
    if backbone == "dense":
        state = create_train_state_dense(train_model, optimizer, first)
    else:
        f0 = first["microbatches"][0] if "microbatches" in first else first
        state = create_train_state(model, optimizer, f0["feats"],
                                   f0["pyramid"])
    step_fn = make_separate_train_step(train_model, optimizer, cfg,
                                       max_objects, backbone=backbone)

    start_epoch = cfg.start_epoch
    ckpt = latest_checkpoint(workdir)
    if ckpt is not None:
        state, saved_epoch = restore_checkpoint(ckpt, state)
        start_epoch = saved_epoch + 1
        logger.info("[%s] resumed from %s (epoch %d)", cfg.category, ckpt,
                    saved_epoch)

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
        for batch in loader:
            state, losses = step_fn(state, batch, lr, mom)
            meter.update(float(losses["loss"]))
        logger.info("[%s] epoch %d: loss=%.4f (%.1fs)", cfg.category, epoch,
                    meter.avg, time.time() - t0)
        if epoch % eval_every == 0:
            save_checkpoint(os.path.join(workdir, f"epoch{epoch}.ckpt"),
                            state, epoch)
            ret = run_separate_validation(cfg, model, state, val_dataset,
                                          gt_lookup)
    return state, ret


def _run_separate_training_mesh(cfg, train_dataset, val_dataset, workdir,
                                gt_lookup, eval_every, max_epoch,
                                cap_multiple, max_objects, model, optimizer):
    """Distributed separate training over a (data, model) mesh; mirrors
    train.joint_loop._run_joint_training_mesh with separate_losses."""
    import jax

    from canonicalvoting_tpu.data.collate import collate_separate_sharded
    from canonicalvoting_tpu.parallel.data_parallel import (
        make_dp_train_step_separate,
        shard_train_state,
    )
    from canonicalvoting_tpu.parallel.mesh import make_mesh

    dp, tp = cfg.tpu.mesh_data, cfg.tpu.mesh_model
    mesh = make_mesh(dp, tp)
    logger.info("[%s] mesh training: data=%d, model=%d", cfg.category, dp, tp)

    loader = DataLoader(
        train_dataset, batch_size=cfg.batch_size * dp,
        collate_fn=lambda it: collate_separate_sharded(
            it, dp, cap_multiple=cap_multiple, max_objects=max_objects),
        shuffle=True, num_workers=cfg.num_workers, drop_last=True,
    )
    first = next(iter(loader))
    feats0 = first["feats"][0]
    pyr0 = jax.tree_util.tree_map(lambda x: x[0], first["pyramid"])
    state = create_train_state(model, optimizer, feats0, pyr0)

    start_epoch = cfg.start_epoch
    ckpt = latest_checkpoint(workdir)
    if ckpt is not None:
        state, saved_epoch = restore_checkpoint(ckpt, state)
        start_epoch = saved_epoch + 1
        logger.info("[%s] resumed from %s (epoch %d)", cfg.category, ckpt,
                    saved_epoch)

    state = shard_train_state(state, mesh)
    step_fn = make_dp_train_step_separate(
        model.clone(bn_axis="batch"), optimizer, cfg, mesh, max_objects)

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
        for batch in loader:
            state, losses = step_fn(state, batch, lr, mom)
            meter.update(float(losses["loss"]))
        logger.info("[%s] epoch %d: loss=%.4f (%.1fs, mesh=%dx%d)",
                    cfg.category, epoch, meter.avg, time.time() - t0, dp, tp)
        if epoch % eval_every == 0:
            host_state = jax.tree_util.tree_map(
                lambda x: np.asarray(jax.device_get(x)), state)
            save_checkpoint(os.path.join(workdir, f"epoch{epoch}.ckpt"),
                            host_state, epoch)
            ret = run_separate_validation(cfg, model, host_state,
                                          val_dataset, gt_lookup)
    return state, ret


def run_separate_validation(cfg, model, state, val_dataset, gt_lookup=None):
    """Detection + mAP over the val split for ONE category model
    (reference train_separate.py:301-455). Returns {thresh: compute_map dict}."""
    category = NAME2CATNAME.get(cfg.category, cfg.category)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pipe = SeparateDetectionPipeline(
        model=model,
        stacked_variables=stack_variables([variables]),
        categories=[category],
        res=cfg.scannet_res, log_scale=cfg.log_scale,
        # the trainer's peel uses the inclusive elimination slice
        # (train_separate.py:389: `cand+elimination+1`), unlike eval_separate
        peel=PeelConfig(res=cfg.scannet_res, elimination_inclusive=True,
                        max_boxes=cfg.tpu.max_boxes),
    )

    pred_map_cls = {}
    gt_map_cls = {}
    for i in range(len(val_dataset)):
        item = val_dataset[i]
        id_scan, coords, feats_raw = item[0], item[1], item[2]
        pred_map_cls[id_scan] = pipe.detect(coords, feats_raw)
        if gt_lookup is not None:
            gt_map_cls[id_scan] = gt_lookup(id_scan)
        else:
            gt_map_cls[id_scan] = load_gt_scene(
                cfg.data.gt_path, id_scan, map_catname=True
            )

    results = {}
    for thresh in (0.25, 0.5):
        d = compute_map(pred_map_cls, gt_map_cls, ovthresh=thresh)
        logger.info(
            "[%s] IoU %.2f: Recall=%s AP=%s", category, thresh,
            d.get(f"{category} Recall", 0.0),
            d.get(f"{category} Average Precision", 0.0),
        )
        results[thresh] = d
    return results
