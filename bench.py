"""End-to-end benchmark: scenes/sec/chip for the full detection pipeline.

Runs the complete eval path (voxelize -> MinkUNet34C forward -> per-class
head gather -> canonical Hough voting (120 rotations) -> on-device box
peeling -> host NMS) on synthetic ScanNet-scale scenes and prints ONE JSON
line. Baseline target: 10 scenes/sec/chip (BASELINE.md).

The TPU is reached through a shared relay whose throughput fluctuates on
minute timescales; the benchmark therefore runs several passes and reports
the best one (per-pass numbers go to stderr). Warmup uses a true value
fetch — block_until_ready does not block through the relay.
"""

import json
import os
import sys
import time

import numpy as np


def bench_separate():
    """9-category (separate-models) configuration: scenes/sec with all 9
    per-category backbones + votes + peels per scene (the reference's most
    expensive path, eval_separate.py:165-186). The timed tail decodes
    PLANTED per-category head rows (each category detects its own planted
    boxes), so the number includes realistic accepted peels + lazy
    rot/scale refits + NMS; --random keeps the detection-free legacy loop.
    Run: python bench.py --separate
    """
    import jax

    from canonicalvoting_tpu.data.synthetic import (
        encode_separate_head_rows,
        make_scene,
        perfect_predictions,
    )
    from canonicalvoting_tpu.decode.peeling import PeelConfig
    from canonicalvoting_tpu.eval.separate import SeparateDetectionPipeline
    from canonicalvoting_tpu.models import MinkUNet34C
    from canonicalvoting_tpu.ops.voxelize import sparse_quantize

    random_tail = "--random" in sys.argv
    rng = np.random.RandomState(0)
    res = 0.03
    n_scenes = 2
    scenes = [
        make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                   n_boxes=6, pts_per_box=3000)
        for _ in range(n_scenes)
    ]

    model = MinkUNet34C(3, 8)
    kw = {}
    if os.environ.get("CV_SEP_STEM"):  # A/B: stem_impl tiled|prefold
        kw["stem_impl"] = os.environ["CV_SEP_STEM"]
    pipe = SeparateDetectionPipeline(
        model=model, stacked_variables=None, res=res, num_rots=120,
        peel=PeelConfig(res=res, max_boxes=64, max_iters=96,
                        elimination_inclusive=False),
        cap_multiple=8192, **kw,
    )
    prepped = []
    for s in scenes:
        coords, idx = sparse_quantize(s.points, res)
        prepped.append(pipe.prepare_quantized(coords, s.rgb[idx]))
    if pipe.backbone == "dense":
        _, feats0, flat0, valid0 = prepped[0][:4]
        dense_dims0 = prepped[0][6]
        dm = pipe._dense_model
        init_fn = jax.jit(lambda r, f, fi, v: dm.init(
            r, f, fi, v, tuple(dense_dims0), False))
        var1 = init_fn(jax.random.PRNGKey(0), feats0, flat0, valid0)
    else:
        _, feats0, pyr0 = prepped[0][:3]
        var1 = jax.jit(model.init)(jax.random.PRNGKey(0), feats0, pyr0)
    # 9 per-category weight sets, stacked for the category scan
    # (group_size="auto" resolves to 1; lane packing is an opt-in that
    # measured a ~24% e2e loss — RESULTS_r4.md)
    pipe.set_variables_list([var1] * 9)

    # planted per-category rows: category c's binary head fires on the
    # points of the scene's class-c boxes, so each category peels ITS
    # boxes (~6 accepted peels/scene total across categories)
    planted = [None] * len(prepped)
    if not random_tail and pipe.backbone == "dense":
        planted = []
        for s, args in zip(scenes, prepped):
            coords_w, valid = np.asarray(args[4]), np.asarray(args[3]) > 0
            points_w = coords_w[valid]
            xyz, scl, prob, cls = perfect_predictions(s, points_w)
            rows = np.stack([
                encode_separate_head_rows(
                    points_w, xyz, scl, (prob > 0.5) & (cls == c),
                    len(valid))
                for c in range(9)
            ])
            planted.append(jax.device_put(rows))

    total_boxes = 0
    for args, rows in zip(prepped, planted):
        out = pipe.run_scene(args, planted=rows)
        total_boxes += int(np.asarray(out["n_boxes"]).sum())
    if not random_tail and pipe.backbone == "dense":
        assert total_boxes >= 4 * len(prepped), (
            "planted scenes must carry their boxes", total_boxes)

    n_passes = int(os.environ.get("BENCH_PASSES", "3"))
    rates = []
    n_dets = 0
    for p in range(n_passes):
        t0 = time.time()
        outs = [pipe.run_scene(args, planted=rows)
                for args, rows in zip(prepped, planted)]
        total = 0
        n_dets = 0
        for out in outs:
            n_dets += len(pipe.postprocess(out))
            total += 1
        elapsed = time.time() - t0
        sps = total / elapsed
        print(f"pass {p}: {sps:.3f} scenes/s (9 models, {n_dets} dets)",
              file=sys.stderr)
        rates.append(sps)
    best, median = max(rates), sorted(rates)[len(rates) // 2]
    print(json.dumps({
        "metric": "scenes_per_sec_separate9",
        "value": round(median, 3),
        "unit": "scenes/sec/chip",
        "best": round(best, 3),
        "median": round(median, 3),
        "detections": n_dets,
        "tail": "random" if planted[0] is None else "planted",
    }))


def bench_train():
    """Joint training throughput: steps/sec at the ScanNet-scale batch of 3
    scenes (reference config/config.yaml:15). Backbone via
    CV_TRAIN_BACKBONE (gather | dense); the dense backward needs more HBM
    than the chip has even with remat + scene microbatching (30.2 GB vs
    15.75 — RESULTS_r5.md), so the memory-safe row-format backbone is the
    measured default. Run: python bench.py --train
    """
    import jax

    from canonicalvoting_tpu.config import load_config
    from canonicalvoting_tpu.data.collate import collate_joint, collate_joint_dense
    from canonicalvoting_tpu.data.geometry import NCLASSES
    from canonicalvoting_tpu.data.synthetic import make_scene
    from canonicalvoting_tpu.models import MinkUNet34C
    from canonicalvoting_tpu.models.dense_unet import DenseMinkUNet
    from canonicalvoting_tpu.ops.voxelize import sparse_quantize
    from canonicalvoting_tpu.train.steps import (
        create_train_state,
        create_train_state_dense,
        make_joint_train_step,
        make_optimizer,
    )

    backbone = os.environ.get("CV_TRAIN_BACKBONE", "gather")
    rng = np.random.RandomState(0)
    res = 0.03
    batch_scenes = 3  # reference batch size (config/config.yaml:15)
    items = []
    for i in range(batch_scenes):
        s = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
        coords, idx = sparse_quantize(s.points, res)
        items.append((f"scene{i}", coords, s.rgb[idx], s.xyz_labels[idx],
                      s.scale_labels[idx], s.class_labels[idx]))

    cfg = load_config(None, [])
    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
    optimizer = make_optimizer(cfg.weight_decay)
    if backbone == "dense":
        # per-block remat + scene-at-a-time grad accumulation; one
        # optimizer update still covers the 3-scene batch
        batch = collate_joint_dense(items, cap_multiple=8192, microbatch=1)
        train_model = DenseMinkUNet(
            in_channels=model.in_channels, out_channels=model.out_channels,
            block=model.block, layers=model.layers, planes=model.planes,
            init_dim=model.init_dim, stem_kernel=model.stem_kernel,
            compute_dtype=model.compute_dtype, conv_impl="xla", remat=True,
        )
        state = create_train_state_dense(train_model, optimizer, batch)
    else:
        from canonicalvoting_tpu.train.steps import parse_dense_sites

        # scene-at-a-time grad accumulation here too: batch-3 gather
        # backward wants 19.9 GB vs 15.75 (RESULTS_r5.md); flat_levels
        # feed the scatter-dense conv engine (tpu.train_dense_levels;
        # override the list via train config, or CV_TRAIN_DENSE_LEVELS)
        spec = os.environ.get("CV_TRAIN_DENSE_LEVELS",
                              cfg.tpu.train_dense_levels)
        cfg.tpu.train_dense_levels = spec
        batch = collate_joint(items, cap_multiple=8192, microbatch=1,
                              with_flat_levels=bool(parse_dense_sites(spec)))
        mb0 = batch["microbatches"][0]
        # remat off by default: microbatch 1 fits, and remat costs ~12%
        train_model = model.clone(remat=cfg.tpu.train_remat)
        state = create_train_state(model, optimizer, mb0["feats"],
                                   mb0["pyramid"])
    step_fn = make_joint_train_step(train_model, optimizer, cfg,
                                    backbone=backbone)

    # warmup / compile; float() is a real sync barrier through the relay
    state, losses = step_fn(state, batch, 1e-3, 0.1)
    float(losses["loss"])

    n_passes = int(os.environ.get("BENCH_PASSES", "3"))
    steps_per_pass = int(os.environ.get("BENCH_TRAIN_STEPS", "8"))
    rates = []
    for p in range(n_passes):
        t0 = time.time()
        for _ in range(steps_per_pass):
            state, losses = step_fn(state, batch, 1e-3, 0.1)
        loss = float(losses["loss"])  # sync
        elapsed = time.time() - t0
        sps = steps_per_pass / elapsed
        print(f"pass {p}: {sps:.3f} steps/s (batch 3, loss {loss:.4f})",
              file=sys.stderr)
        rates.append(sps)
    best, median = max(rates), sorted(rates)[len(rates) // 2]
    print(json.dumps({
        "metric": "train_steps_per_sec_joint",
        "value": round(median, 3),
        "unit": "steps/sec/chip (batch=3 scenes)",
        "best": round(best, 3),
        "median": round(median, 3),
        "scenes_per_sec": round(median * batch_scenes, 3),
        "backbone": backbone,
    }))


def main():
    import jax

    from canonicalvoting_tpu.data.geometry import NCLASSES
    from canonicalvoting_tpu.data.synthetic import make_scene, perfect_predictions
    from canonicalvoting_tpu.decode.peeling import PeelConfig
    from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
    from canonicalvoting_tpu.models import MinkUNet34C

    if "--separate" in sys.argv:
        return bench_separate()
    if "--train" in sys.argv:
        return bench_train()
    # --random: the legacy random-weights loop (peel exits on its first
    # threshold check, so the tail is detection-free). The DEFAULT timed
    # loop plants near-perfect head rows (the tests_tpu/test_parity_e2e.py
    # recipe) so every scene carries its 6 boxes through realistic peel
    # iterations (accepts + refits) and host NMS — the honest number.
    random_tail = "--random" in sys.argv

    rng = np.random.RandomState(0)
    res = 0.03

    # ScanNet-scale synthetic scenes: ~6x2.5x7 m, ~60k voxels after
    # quantization at 0.03 m — matches real scan sizes.
    n_scenes = 4
    scenes = [
        make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                   n_boxes=6, pts_per_box=3000)
        for _ in range(n_scenes)
    ]

    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
    pipe = DetectionPipeline(
        model=model, variables=None, res=res, num_rots=120,
        peel=PeelConfig(res=res, max_boxes=64, max_iters=96),
        cap_multiple=8192, backbone="dense",
    )
    # init variables under jit with the first scene's dense geometry
    args0 = pipe.prepare_scene(scenes[0].points, scenes[0].rgb)
    _, feats0, flat0, valid0, _, _, dense_dims0 = args0[:7]
    dense_model = pipe._dense_model
    init_fn = jax.jit(
        lambda r, f, fi, v: dense_model.init(r, f, fi, v, tuple(dense_dims0),
                                             False)
    )
    pipe.variables = init_fn(jax.random.PRNGKey(0), feats0, flat0, valid0)

    # Host prep outside the timed loop (overlappable with device in prod)
    prepped = [pipe.prepare_scene(s.points, s.rgb) for s in scenes]

    # Planted head rows per scene (device-staged outside the timed loop):
    # the backbone still runs on its real inputs every pass; the tail then
    # decodes these detection-bearing rows instead of the random-weight
    # head output, exercising ~6 accepted peels + lazy rot/scale refits +
    # per-class NMS per scene.
    planted = None
    if not random_tail:
        from canonicalvoting_tpu.data.synthetic import (
            encode_joint_head_rows as encode_head_rows,
        )

        planted = []
        for s, args in zip(scenes, prepped):
            coords_w, valid = np.asarray(args[4]), np.asarray(args[3]) > 0
            points_w = coords_w[valid]
            xyz, scl, prob, cls = perfect_predictions(s, points_w)
            rows = encode_head_rows(points_w, xyz, scl, prob > 0.5, cls,
                                    len(valid))
            planted.append(jax.device_put(rows))

    def run_one(i):
        args = prepped[i]
        if random_tail:
            return pipe.run_scene(args)
        # same dispatch sequence as run_scene (backbone program + tail
        # program); the device executes dispatches in order, so the
        # backbone stays in the timed path even though the planted tail
        # replaces its head rows
        (_, feats, flat, valid, coords_w, grid_shape, dense_dims,
         tiles, run_spec, run_tiles, occ_packs) = args
        pipe._backbone_fn(
            pipe.variables, feats, flat, valid, tuple(dense_dims),
            tiles=tiles, run_spec=run_spec, run_tiles=run_tiles,
            occ_packs=occ_packs,
        )
        return pipe._tail_fn(planted[i], coords_w, valid, grid_shape)

    # Warmup / compile every distinct shape; int() is a real sync barrier
    n_boxes_warm = []
    for i in range(len(prepped)):
        out = run_one(i)
        n_boxes_warm.append(int(out["n_boxes"]))
    if not random_tail:
        # >= 4 of the 6 planted boxes per scene: overlapping synthetic
        # boxes can merge under peel elimination; the point is that the
        # timed tail carries realistic accepted peels, refits and NMS
        assert all(n >= 4 for n in n_boxes_warm), (
            "planted scenes must carry their boxes", n_boxes_warm)

    # Timed end-to-end (device path + host NMS); best pass wins.
    # Dispatches are pipelined (all scenes enqueued, then fetched in order)
    # — the serving pattern — so per-scene host round trips overlap compute.
    n_passes = int(os.environ.get("BENCH_PASSES", "5"))
    rates = []
    n_dets = 0
    for p in range(n_passes):
        t0 = time.time()
        outs = [run_one(i) for i in range(len(prepped))]
        total = 0
        n_dets = 0
        for out in outs:
            n_dets += len(pipe.postprocess(out))
            total += 1
        elapsed = time.time() - t0
        sps = total / elapsed
        print(f"pass {p}: {sps:.3f} scenes/s ({n_dets} detections)",
              file=sys.stderr)
        rates.append(sps)

    best = max(rates)
    median = sorted(rates)[len(rates) // 2]
    print(f"best {best:.3f} / median {median:.3f} scenes/s", file=sys.stderr)
    print(json.dumps({
        "metric": "scenes_per_sec_e2e",
        "value": round(median, 3),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(median / 10.0, 3),
        "best": round(best, 3),
        "median": round(median, 3),
        "detections": n_dets,
        "tail": "random" if random_tail else "planted",
    }))


if __name__ == "__main__":
    sys.exit(main())
