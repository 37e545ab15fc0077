"""Per-category evaluation CLI (mirror of reference eval_separate.py).

Loads 9 per-category checkpoints (ours .ckpt or reference .pth), stacks
their parameters, and runs the vmapped 9-model pipeline per scene. With
more than one visible device (and not --no-mesh) the scenes fan out over a
jax.sharding.Mesh instead — each device runs the full 9-category stack for
its scene (parallel/scene_parallel.py), a new capability over the
scene-at-a-time reference (eval_separate.py:165-186).

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


def load_variables_list(model, pretrained_dir, coords, feats_raw,
                        categories, catname2name):
    """Per-category variables: reference .pth, our .ckpt, or random init."""
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
    from canonicalvoting_tpu.ops.voxelize import batched_coordinates

    def template_pyr():
        pyr = build_pyramid(batched_coordinates([coords]),
                            PyramidSpec(cap_multiple=4096))
        feats0 = np.zeros(
            (pyr.coords[0].shape[0], feats_raw.shape[1]), np.float32)
        return pyr, feats0

    variables_list = []
    for category in categories:
        if pretrained_dir is not None:
            path_pth = os.path.join(
                pretrained_dir, f"{catname2name[category]}.pth")
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

                pyr, feats0 = template_pyr()  # structural template
                st = create_train_state(
                    model, make_optimizer(0.0), feats0, pyr.as_jax_inputs())
                st, _ = restore_checkpoint(path_ckpt, st)
                variables_list.append(
                    {"params": st.params, "batch_stats": st.batch_stats})
                continue
        from canonicalvoting_tpu.train.steps import init_variables

        pyr, feats0 = template_pyr()
        variables_list.append(init_variables(
            model, feats0, pyr.as_jax_inputs(), train=False,
            seed=hash(category) % 2**31,
        ))
    return variables_list


def main(argv):
    import jax

    from canonicalvoting_tpu.config import load_config, parse_cli
    from canonicalvoting_tpu.data.geometry import NAME2CATNAME
    from canonicalvoting_tpu.eval.gt import load_gt_scene
    from canonicalvoting_tpu.eval.separate import (
        ALL_CATEGORIES,
        SeparateDetectionPipeline,
        stack_variables,
    )
    from canonicalvoting_tpu.metrics.ap import compute_map

    from canonicalvoting_tpu.models import MinkUNet34C

    synthetic = "--synthetic" in argv
    no_mesh = "--no-mesh" in argv
    argv = [a for a in argv if a not in ("--synthetic", "--no-mesh")]
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

    def gt_for(id_scan):
        if gt_lookup is not None:
            return gt_lookup(id_scan)
        return load_gt_scene(cfg.data.gt_path, id_scan, map_catname=True)

    pred_map_cls = {}
    gt_map_cls = {}

    if len(jax.devices()) > 1 and not no_mesh:
        # scene-parallel fan-out: each device runs the full 9-category
        # stack for its scene (parallel/scene_parallel.py)
        from canonicalvoting_tpu.decode.peeling import PeelConfig
        from canonicalvoting_tpu.parallel.scene_parallel import (
            evaluate_scenes_sharded_separate,
        )

        scene_list = [(it[0], it[1], it[2]) for it in scenes]
        first = scene_list[0]
        variables_list = load_variables_list(
            model, pretrained_dir, first[1], first[2], ALL_CATEGORIES,
            catname2name)
        stacked = stack_variables(variables_list)
        logger.info("fanning %d scenes over %d devices (9 categories each)",
                    len(scene_list), len(jax.devices()))
        pred_map_cls = evaluate_scenes_sharded_separate(
            model, stacked, scene_list, ALL_CATEGORIES,
            res=cfg.scannet_res, log_scale=cfg.log_scale,
            peel=PeelConfig(res=cfg.scannet_res,
                            elimination_inclusive=False,
                            max_boxes=cfg.tpu.max_boxes),
        )
        for id_scan, dets in pred_map_cls.items():
            gt_map_cls[id_scan] = gt_for(id_scan)
            logger.info("%s: %d detections", id_scan, len(dets))
    else:
        pipe = None
        for item in scenes:
            id_scan, coords, feats_raw = item[0], item[1], item[2]
            if pipe is None:
                variables_list = load_variables_list(
                    model, pretrained_dir, coords, feats_raw,
                    ALL_CATEGORIES, catname2name)
                pipe = SeparateDetectionPipeline(
                    model=model, stacked_variables=None,
                    res=cfg.scannet_res, log_scale=cfg.log_scale,
                )
                # stacks the 9 per-category variable trees for the category
                # scan (group_size="auto" resolves to 1 — lane packing
                # measured a ~24% e2e loss, RESULTS_r4.md; opt-in via
                # group_size=N)
                pipe.set_variables_list(variables_list)

            dets = pipe.detect(coords, feats_raw)
            pred_map_cls[id_scan] = dets
            gt_map_cls[id_scan] = gt_for(id_scan)
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
