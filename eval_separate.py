"""Per-category evaluation CLI (mirror of reference eval_separate.py).

Loads 9 per-category checkpoints (ours .ckpt or reference .pth), stacks
their parameters, and runs the vmapped 9-model pipeline per scene.

Usage:
  python eval_separate.py pretrained_dir=<dir> [key=value ...]
  python eval_separate.py --synthetic            # smoke run, random weights
"""

import logging
import os
import sys

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger("eval_separate")


def main(argv):
    import jax

    from canonicalvoting_tpu.config import load_config, parse_cli
    from canonicalvoting_tpu.data.geometry import NAME2CATNAME
    from canonicalvoting_tpu.eval.gt import load_gt_scene
    from canonicalvoting_tpu.eval.separate import (
        ALL_CATEGORIES,
        SeparateDetectionPipeline,
    )
    from canonicalvoting_tpu.metrics.ap import compute_map
    from canonicalvoting_tpu.models import MinkUNet34C
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
    from canonicalvoting_tpu.ops.voxelize import batched_coordinates

    synthetic = "--synthetic" in argv
    argv = [a for a in argv if a != "--synthetic"]
    pretrained_dir = None
    rest = []
    for a in argv:
        if a.startswith("pretrained_dir="):
            pretrained_dir = a.split("=", 1)[1]
        else:
            rest.append(a)
    yaml_path, overrides, _ = parse_cli(rest)
    cfg = load_config(yaml_path, overrides)
    cfg.category = "all"

    catname2name = {v: k for k, v in NAME2CATNAME.items()}
    model = MinkUNet34C(cfg.in_channels, 8, compute_dtype=cfg.tpu.conv_dtype)

    if synthetic:
        import train_joint as tj

        _, val_ds, gt_lookup = tj.build_synthetic(cfg, n_train=0, n_val=2)
        scenes = [val_ds[i] for i in range(len(val_ds))]
    else:
        from canonicalvoting_tpu.data.scannet import ScanNetXYZProbMultiDataset

        ds = ScanNetXYZProbMultiDataset(cfg, training=False, augment=False)
        scenes = (ds[i] for i in range(len(ds)))
        gt_lookup = None

    pipe = None
    pred_map_cls = {}
    gt_map_cls = {}
    for item in scenes:
        id_scan, coords, feats_raw = item[0], item[1], item[2]

        if pipe is None:
            variables_list = []
            for category in ALL_CATEGORIES:
                if pretrained_dir is not None:
                    path_pth = os.path.join(
                        pretrained_dir, f"{catname2name[category]}.pth"
                    )
                    path_ckpt = os.path.join(pretrained_dir, f"{category}.ckpt")
                    if os.path.exists(path_pth):
                        from canonicalvoting_tpu.utils.torch_convert import (
                            load_torch_checkpoint,
                        )

                        p, s = load_torch_checkpoint(path_pth)
                        variables_list.append({"params": p, "batch_stats": s})
                        continue
                    if os.path.exists(path_ckpt):
                        from canonicalvoting_tpu.train.checkpoint import (
                            restore_checkpoint,
                        )
                        from canonicalvoting_tpu.train.steps import (
                            create_train_state,
                            make_optimizer,
                        )

                        # structural template for restore
                        pyr = build_pyramid(
                            batched_coordinates([coords]),
                            PyramidSpec(cap_multiple=4096),
                        )
                        feats0 = np.zeros(
                            (pyr.coords[0].shape[0], feats_raw.shape[1]),
                            np.float32,
                        )
                        st = create_train_state(
                            model, make_optimizer(0.0), feats0,
                            pyr.as_jax_inputs(),
                        )
                        st, _ = restore_checkpoint(path_ckpt, st)
                        variables_list.append(
                            {"params": st.params, "batch_stats": st.batch_stats}
                        )
                        continue
                from canonicalvoting_tpu.ops.coords import (
                    PyramidSpec as PS,
                )
                from canonicalvoting_tpu.train.steps import init_variables

                pyr = build_pyramid(batched_coordinates([coords]),
                                    PS(cap_multiple=4096))
                feats0 = np.zeros(
                    (pyr.coords[0].shape[0], feats_raw.shape[1]), np.float32
                )
                variables_list.append(init_variables(
                    model, feats0, pyr.as_jax_inputs(), train=False,
                    seed=hash(category) % 2**31,
                ))
            pipe = SeparateDetectionPipeline(
                model=model, stacked_variables=None,
                res=cfg.scannet_res, log_scale=cfg.log_scale,
            )
            # stacks the 9 per-category variable trees for the category
            # scan (group_size="auto" resolves to 1 — lane packing measured
            # a ~24% e2e loss, RESULTS_r4.md; opt-in via group_size=N)
            pipe.set_variables_list(variables_list)

        dets = pipe.detect(coords, feats_raw)
        pred_map_cls[id_scan] = dets
        if gt_lookup is not None:
            gt_map_cls[id_scan] = gt_lookup(id_scan)
        else:
            gt_map_cls[id_scan] = load_gt_scene(
                cfg.data.gt_path, id_scan, map_catname=True
            )
        logger.info("%s: %d detections", id_scan, len(dets))

    for thresh in (0.25, 0.5):
        logger.info("thresh: %s", thresh)
        d = compute_map(pred_map_cls, gt_map_cls, ovthresh=thresh)
        for category in ALL_CATEGORIES:
            logger.info("%s Recall: %s", category,
                        d.get(f"{category} Recall", 0))
            logger.info("%s Average Precision: %s", category,
                        d.get(f"{category} Average Precision", 0))
        logger.info("mAP: %s", d["mAP"])


if __name__ == "__main__":
    main(sys.argv[1:])
