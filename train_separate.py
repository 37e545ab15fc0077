"""Per-category training CLI (mirror of reference train_separate.py).

Usage:
  python train_separate.py category=03001627 [key=value ...]
  python train_separate.py category=a,b,c -m      # multirun sweep
  python train_separate.py --synthetic            # smoke run
"""

import logging
import sys

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger("train_separate")


def build_synthetic_sym(cfg, n_scenes=6, seed=0):
    from canonicalvoting_tpu.data.geometry import (
        IDX2NAME,
        NAME2CATNAME,
        NCLASSES,
        rotmat_y,
    )
    from canonicalvoting_tpu.data.loader import ListDataset
    from canonicalvoting_tpu.data.synthetic import make_scene
    from canonicalvoting_tpu.ops.voxelize import sparse_quantize

    rng = np.random.RandomState(seed)
    items, gts = [], {}
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
        gts[f"s{i}"] = [
            (NAME2CATNAME[IDX2NAME[ci]], c) for ci, c in scene.gt_corners()
        ]
    return ListDataset(items), gts.get


def main(argv):
    from canonicalvoting_tpu.config import load_config, parse_cli

    synthetic = "--synthetic" in argv
    argv = [a for a in argv if a != "--synthetic"]
    yaml_path, overrides, categories = parse_cli(argv)

    if categories is None:
        cfg = load_config(yaml_path, overrides)
        categories = [cfg.category]

    from canonicalvoting_tpu.train.separate_loop import run_separate_training

    for category in categories:
        cfg = load_config(yaml_path, overrides)
        cfg.category = category
        if synthetic:
            ds, gt_lookup = build_synthetic_sym(cfg)
            me = min(cfg.max_epoch, 1)
            run_separate_training(
                cfg, ds, ds, workdir=f"multirun/synthetic/{category}",
                gt_lookup=gt_lookup, eval_every=me, max_epoch=me,
            )
        else:
            from canonicalvoting_tpu.data.scannet import ScanNetXYZProbSymDataset

            train_ds = ScanNetXYZProbSymDataset(cfg, training=True,
                                                augment=cfg.augment)
            val_ds = ScanNetXYZProbSymDataset(cfg, training=False, augment=False)
            run_separate_training(cfg, train_ds, val_ds,
                                  workdir=f"multirun/{category}")


if __name__ == "__main__":
    main(sys.argv[1:])
