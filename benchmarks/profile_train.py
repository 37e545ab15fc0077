"""Device op-level profile of the TRAIN step (gather backbone, microbatch
accumulation) — attribution for the round-5 training-throughput work."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from canonicalvoting_tpu.config import load_config
from canonicalvoting_tpu.data.collate import collate_joint
from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.models import MinkUNet34C
from canonicalvoting_tpu.ops.voxelize import sparse_quantize
from canonicalvoting_tpu.train.steps import (
    create_train_state, make_joint_train_step, make_optimizer)

TRACEDIR = "/tmp/jaxtrace_train"


def main():
    rng = np.random.RandomState(0)
    items = []
    for i in range(3):
        s = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
        coords, idx = sparse_quantize(s.points, 0.03)
        items.append((f"s{i}", coords, s.rgb[idx], s.xyz_labels[idx],
                      s.scale_labels[idx], s.class_labels[idx]))
    batch = collate_joint(items, cap_multiple=8192, microbatch=1)
    mb0 = batch["microbatches"][0]
    cfg = load_config(None, [])
    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
    opt = make_optimizer(cfg.weight_decay)
    state = create_train_state(model, opt, mb0["feats"], mb0["pyramid"])
    step = make_joint_train_step(model, opt, cfg, backbone="gather")
    state, losses = step(state, batch, 1e-3, 0.1)
    float(losses["loss"])  # warm

    os.system(f"rm -rf {TRACEDIR}")
    with jax.profiler.trace(TRACEDIR):
        for _ in range(2):
            state, losses = step(state, batch, 1e-3, 0.1)
        float(losses["loss"])

    # aggregate
    paths = glob.glob(f"{TRACEDIR}/**/*.trace.json.gz", recursive=True)
    per_op = defaultdict(float)
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            pid_name = ev.get("pid")
            per_op[name] += ev.get("dur", 0.0)
    total = sum(v for k, v in per_op.items())
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:30]
    print("top ops (us over 2 steps x 3 microbatches):")
    for k, v in top:
        print(f"  {v/1e3:10.2f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
