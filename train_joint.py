"""Joint-model training CLI (mirror of reference train_joint.py).

Usage:
  python train_joint.py [key=value ...]             # ScanNet (cfg.data paths)
  python train_joint.py --synthetic [key=value ...] # synthetic smoke run

Hydra-style overrides: ``scannet_res=0.03 opt.learning_rate=1e-3 ...``
(reference README.md:73-78).
"""

import logging
import sys

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")


def build_synthetic(cfg, n_train=8, n_val=2, seed=0):
    from canonicalvoting_tpu.data.geometry import IDX2NAME, NAME2CATNAME
    from canonicalvoting_tpu.data.loader import ListDataset
    from canonicalvoting_tpu.data.synthetic import make_scene
    from canonicalvoting_tpu.ops.voxelize import sparse_quantize

    rng = np.random.RandomState(seed)
    items, gts = [], {}

    def scene_to_item(i, scene):
        coords, idx = sparse_quantize(scene.points, cfg.scannet_res)
        return (
            f"synthetic{i}", coords, scene.rgb[idx], scene.xyz_labels[idx],
            scene.scale_labels[idx], scene.class_labels[idx],
        )

    for i in range(n_train + n_val):
        scene = make_scene(rng, extent=(4.0, 2.0, 4.0), n_background=15000,
                           n_boxes=3, pts_per_box=2000)
        items.append(scene_to_item(i, scene))
        gts[f"synthetic{i}"] = [
            (NAME2CATNAME[IDX2NAME[ci]], c) for ci, c in scene.gt_corners()
        ]
    train = ListDataset(items[:n_train])
    val = ListDataset(items[n_train:])
    return train, val, gts.get


def main(argv):
    from canonicalvoting_tpu.config import load_config, parse_cli
    from canonicalvoting_tpu.train.joint_loop import run_joint_training

    synthetic = "--synthetic" in argv
    argv = [a for a in argv if a != "--synthetic"]
    yaml_path, overrides, _ = parse_cli(argv)
    cfg = load_config(yaml_path, overrides)

    if synthetic:
        train_ds, val_ds, gt_lookup = build_synthetic(cfg)
        run_joint_training(
            cfg, train_ds, val_ds, workdir="outputs/synthetic_joint",
            gt_lookup=gt_lookup, eval_every=min(10, cfg.max_epoch),
            cap_multiple=4096,
        )
    else:
        from canonicalvoting_tpu.data.scannet import ScanNetXYZProbMultiDataset

        train_ds = ScanNetXYZProbMultiDataset(cfg, training=True,
                                              augment=cfg.augment)
        val_ds = ScanNetXYZProbMultiDataset(cfg, training=False, augment=False)
        run_joint_training(
            cfg, train_ds, val_ds, workdir=f"outputs/{cfg.category}",
        )


if __name__ == "__main__":
    main(sys.argv[1:])
