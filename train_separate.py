"""Per-category training CLI (mirror of reference train_separate.py).

Usage:
  python train_separate.py category=03001627 [key=value ...]
  python train_separate.py category=a,b,c -m      # multirun sweep
  python train_separate.py --synthetic            # smoke run
"""

import logging
import os
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger("train_separate")


def run_one(cfg, train_ds, val_ds, workdir, max_epoch=None):
    import jax
    import jax.numpy as jnp

    from canonicalvoting_tpu.data.collate import collate_separate
    from canonicalvoting_tpu.data.loader import DataLoader
    from canonicalvoting_tpu.models import MinkUNet34C
    from canonicalvoting_tpu.train.checkpoint import save_checkpoint
    from canonicalvoting_tpu.train.schedules import (
        bn_momentum_for_epoch,
        lr_for_epoch,
    )
    from canonicalvoting_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_separate_train_step,
    )
    from canonicalvoting_tpu.utils.meters import AverageMeter

    os.makedirs(workdir, exist_ok=True)
    max_epoch = max_epoch if max_epoch is not None else cfg.max_epoch
    max_objects = cfg.tpu.max_objects

    model = MinkUNet34C(cfg.in_channels, 8, compute_dtype=cfg.tpu.conv_dtype)
    optimizer = make_optimizer(cfg.weight_decay)
    loader = DataLoader(
        train_ds, batch_size=cfg.batch_size,
        collate_fn=lambda it: collate_separate(
            it, cap_multiple=4096, max_objects=max_objects
        ),
        shuffle=True, num_workers=cfg.num_workers, drop_last=True,
    )
    first = next(iter(loader))
    state = create_train_state(model, optimizer, first["feats"], first["pyramid"])
    step_fn = make_separate_train_step(model, optimizer, cfg, max_objects)

    meter = AverageMeter()
    for epoch in range(cfg.start_epoch, max_epoch + 1):
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
        if epoch % 10 == 0:
            save_checkpoint(os.path.join(workdir, f"epoch{epoch}.ckpt"),
                            state, epoch)
    return state


def build_synthetic_sym(cfg, n_scenes=6, seed=0):
    from canonicalvoting_tpu.data.geometry import NCLASSES, rotmat_y
    from canonicalvoting_tpu.data.loader import ListDataset
    from canonicalvoting_tpu.data.synthetic import make_scene
    from canonicalvoting_tpu.ops.voxelize import sparse_quantize

    rng = np.random.RandomState(seed)
    items = []
    for i in range(n_scenes):
        scene = make_scene(rng, extent=(2.5, 1.8, 2.5), n_background=4000,
                           n_boxes=2, pts_per_box=600)
        coords, idx = sparse_quantize(scene.points, cfg.scannet_res)
        cls = scene.class_labels[idx]
        obj_lab = (cls < NCLASSES).astype(np.int32)
        pw = coords.astype(np.float32) * cfg.scannet_res
        oid = np.full(len(coords), -1, np.int32)
        for bi, b in enumerate(scene.boxes):
            inv = ((pw - b.center) @ rotmat_y(b.yaw)) / b.scale
            oid[np.all(np.abs(inv) < 1, -1)] = bi
        sym = np.array([(bi % 4) for bi in range(len(scene.boxes))], np.int32)
        items.append((
            f"s{i}", coords, scene.rgb[idx], scene.xyz_labels[idx],
            scene.scale_labels[idx], obj_lab, cls, oid, sym,
        ))
    return ListDataset(items)


def main(argv):
    from canonicalvoting_tpu.config import load_config, parse_cli

    synthetic = "--synthetic" in argv
    argv = [a for a in argv if a != "--synthetic"]
    yaml_path, overrides, categories = parse_cli(argv)

    if categories is None:
        cfg = load_config(yaml_path, overrides)
        categories = [cfg.category]

    for category in categories:
        cfg = load_config(yaml_path, overrides)
        cfg.category = category
        if synthetic:
            ds = build_synthetic_sym(cfg)
            run_one(cfg, ds, ds, workdir="multirun/synthetic",
                    max_epoch=min(cfg.max_epoch, 1))
        else:
            from canonicalvoting_tpu.data.scannet import ScanNetXYZProbSymDataset

            train_ds = ScanNetXYZProbSymDataset(cfg, training=True,
                                                augment=cfg.augment)
            val_ds = ScanNetXYZProbSymDataset(cfg, training=False, augment=False)
            run_one(cfg, train_ds, val_ds, workdir=f"multirun/{category}")


if __name__ == "__main__":
    main(sys.argv[1:])
