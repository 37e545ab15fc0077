"""Joint-model evaluation CLI (mirror of reference eval_joint.py).

Usage:
  python eval_joint.py checkpoint=<path> [key=value ...]
  python eval_joint.py --scenenn checkpoint=<path> ...   # SceneNN transfer
  python eval_joint.py --synthetic                        # smoke run

Accepts either this framework's .ckpt files or the reference's torch .pth
checkpoints (converted on load via utils/torch_convert.py).
"""

import logging
import sys

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger("eval_joint")


def load_variables(model, checkpoint, example):
    import jax

    from canonicalvoting_tpu.train.steps import init_variables

    feats, pyramid = example
    variables = init_variables(model, feats, pyramid, train=False)
    if checkpoint is None:
        logger.warning("no checkpoint given: evaluating random weights")
        return variables
    if checkpoint.endswith(".pth"):
        from canonicalvoting_tpu.utils.torch_convert import load_torch_checkpoint

        params, stats = load_torch_checkpoint(checkpoint)
        return {"params": params, "batch_stats": stats}
    from canonicalvoting_tpu.train.checkpoint import restore_checkpoint
    from canonicalvoting_tpu.train.steps import TrainState, create_train_state, make_optimizer

    state = create_train_state(model, make_optimizer(0.0), feats, pyramid)
    state, _ = restore_checkpoint(checkpoint, state)
    return {"params": state.params, "batch_stats": state.batch_stats}


def main(argv):
    from canonicalvoting_tpu.config import load_config, parse_cli
    from canonicalvoting_tpu.data.geometry import NCLASSES
    from canonicalvoting_tpu.decode.peeling import PeelConfig
    from canonicalvoting_tpu.eval.gt import load_gt_scene
    from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
    from canonicalvoting_tpu.metrics.ap import compute_map
    from canonicalvoting_tpu.models import MinkUNet34C
    from canonicalvoting_tpu.ops.coords import PyramidSpec, build_pyramid
    from canonicalvoting_tpu.ops.voxelize import batched_coordinates, sparse_quantize

    scenenn = "--scenenn" in argv
    synthetic = "--synthetic" in argv
    no_mesh = "--no-mesh" in argv
    argv = [a for a in argv if not a.startswith("--scenenn")
            and a not in ("--synthetic", "--no-mesh")]
    checkpoint = None
    rest = []
    for a in argv:
        if a.startswith("checkpoint="):
            checkpoint = a.split("=", 1)[1]
        else:
            rest.append(a)
    yaml_path, overrides, _ = parse_cli(rest)
    cfg = load_config(yaml_path, overrides)
    cfg.category = "all"  # (eval_joint.py:139)

    model = MinkUNet34C(cfg.in_channels, 6 * NCLASSES + NCLASSES + 1,
                        compute_dtype=cfg.tpu.conv_dtype)

    if synthetic:
        import train_joint as tj

        _, val_ds, gt_lookup = tj.build_synthetic(cfg, n_train=0, n_val=3)
        scenes = [val_ds[i] for i in range(len(val_ds))]
    else:
        from canonicalvoting_tpu.data.scannet import (
            SceneNNDataset,
            ScanNetXYZProbMultiDataset,
        )

        ds = (SceneNNDataset if scenenn else ScanNetXYZProbMultiDataset)(
            cfg, training=False, augment=False
        )
        scenes = (ds[i] for i in range(len(ds)))
        gt_lookup = None

    def gt_for(id_scan):
        if gt_lookup is not None:
            return gt_lookup(id_scan)
        import os

        gt_dir = (os.path.join(cfg.data.scene_nn_root, "results_gt")
                  if scenenn else cfg.data.gt_path)
        return load_gt_scene(gt_dir, id_scan, scenenn=scenenn)

    import jax

    if len(jax.devices()) > 1 and not no_mesh:
        # scene-parallel fan-out: D scenes per dispatch, sharded over the
        # 'data' mesh axis (parallel/scene_parallel.py) — new capability
        # over the scene-at-a-time reference (eval_joint.py:163-303)
        from canonicalvoting_tpu.parallel.scene_parallel import (
            evaluate_scenes_sharded,
        )

        scene_list = [(it[0], it[1], it[2]) for it in scenes]
        first = scene_list[0]
        pyr = build_pyramid(batched_coordinates([first[1]]),
                            PyramidSpec(cap_multiple=4096))
        f0 = np.zeros((pyr.coords[0].shape[0], first[2].shape[1]),
                      np.float32)
        variables = load_variables(model, checkpoint,
                                   (f0, pyr.as_jax_inputs()))
        logger.info("fanning %d scenes over %d devices",
                    len(scene_list), len(jax.devices()))
        pred_map_cls = evaluate_scenes_sharded(
            model, variables, scene_list, res=cfg.scannet_res,
            log_scale=cfg.log_scale,
            peel=PeelConfig(res=cfg.scannet_res,
                            max_boxes=cfg.tpu.max_boxes),
        )
        gt_map_cls = {}
        for id_scan, dets in pred_map_cls.items():
            if scenenn:
                pred_map_cls[id_scan] = [
                    d for d in dets if d[0] in
                    ("cabinet", "chair", "table", "sofa", "display")]
            gt_map_cls[id_scan] = gt_for(id_scan)
            logger.info("%s: %d detections", id_scan,
                        len(pred_map_cls[id_scan]))
        for thresh in (0.25, 0.5):
            print(thresh)
            d = compute_map(pred_map_cls, gt_map_cls, ovthresh=thresh)
            for k in sorted(k for k in d
                            if k.endswith("Average Precision")):
                logger.info("%s: %s", k, d[k])
            logger.info("mean Average Precision: %s", d["mAP"])
            logger.info("AR: %s", d["AR"])
        return

    # init pipeline from the first scene's shapes
    pred_map_cls = {}
    gt_map_cls = {}
    pipe = None
    for item in scenes:
        id_scan, coords, feats_raw = item[0], item[1], item[2]
        if pipe is None:
            pyr = build_pyramid(batched_coordinates([coords]),
                                PyramidSpec(cap_multiple=4096))
            f0 = np.zeros((pyr.coords[0].shape[0], feats_raw.shape[1]), np.float32)
            variables = load_variables(model, checkpoint,
                                       (f0, pyr.as_jax_inputs()))
            pipe = DetectionPipeline(
                model=model, variables=variables, res=cfg.scannet_res,
                num_rots=120, log_scale=cfg.log_scale, use_xyz=cfg.use_xyz,
                peel=PeelConfig(res=cfg.scannet_res,
                                max_boxes=cfg.tpu.max_boxes),
                cap_multiple=4096,
            )
        out = pipe.run_scene_with_retry(
            pipe.prepare_quantized(coords, feats_raw))
        dets = pipe.postprocess(out)
        if scenenn:
            dets = [d for d in dets if d[0] in
                    ("cabinet", "chair", "table", "sofa", "display")]
        pred_map_cls[id_scan] = dets
        gt_map_cls[id_scan] = gt_for(id_scan)
        logger.info("%s: %d detections", id_scan, len(dets))

    for thresh in (0.25, 0.5):
        print(thresh)
        d = compute_map(pred_map_cls, gt_map_cls, ovthresh=thresh)
        for k in sorted(k for k in d if k.endswith("Average Precision")):
            logger.info("%s: %s", k, d[k])
        logger.info("mean Average Precision: %s", d["mAP"])
        logger.info("AR: %s", d["AR"])


if __name__ == "__main__":
    main(sys.argv[1:])
