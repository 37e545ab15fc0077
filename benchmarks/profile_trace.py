"""Device op-level profile of the e2e pipeline via jax.profiler.

Traces run_scene, parses the trace.json.gz, aggregates TPU op durations by
category and prints the top individual ops. This is the tool behind the
"convs X + reshapes Y + ..." breakdowns in RESULTS_r3.md.

Usage: python benchmarks/profile_trace.py [--top N]
"""
import glob
import gzip
import json
import os
import re
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.decode.peeling import PeelConfig
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
from canonicalvoting_tpu.models import MinkUNet34C

TRACEDIR = "/tmp/jaxtrace"


def categorize(name):
    n = name.lower()
    if "fusion" in n and ("conv" in n or "dot" in n):
        return "conv/dot-fusion"
    for pat, cat in [
        ("custom-call", "pallas"),
        ("convolution", "conv"),
        ("dot", "dot"),
        ("reshape", "reshape"),
        ("transpose", "transpose"),
        ("broadcast", "broadcast"),
        ("copy", "copy"),
        ("dynamic-update", "dyn-update"),
        ("dynamic-slice", "dyn-slice"),
        ("scatter", "scatter"),
        ("gather", "gather"),
        ("reduce", "reduce"),
        ("while", "while"),
        ("fusion", "fusion"),
        ("select", "select"),
        ("iota", "iota"),
    ]:
        if pat in n:
            return cat
    return "other"


def main():
    rng = np.random.RandomState(0)
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)
    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
    pipe = DetectionPipeline(
        model=model, variables=None, res=0.03, num_rots=120,
        peel=PeelConfig(res=0.03, max_boxes=64, max_iters=96),
        cap_multiple=8192, backbone="dense")
    args = pipe.prepare_scene(scene.points, scene.rgb)
    feats, flat, valid = args[1], args[2], args[3]
    dense_dims = args[6]
    dm = pipe._dense_model
    pipe.variables = jax.jit(
        lambda r, f, fi, v: dm.init(r, f, fi, v, tuple(dense_dims), False)
    )(jax.random.PRNGKey(0), feats, flat, valid)

    out = pipe.run_scene(args)
    int(out["n_boxes"])
    NITER = 3
    shutil.rmtree(TRACEDIR, ignore_errors=True)
    with jax.profiler.trace(TRACEDIR):
        for _ in range(NITER):
            out = pipe.run_scene(args)
            int(np.asarray(out["n_boxes"]))

    tj = sorted(glob.glob(TRACEDIR + "/plugins/profile/*/*.trace.json.gz"))
    if not tj:
        print("no trace written", file=sys.stderr)
        return 1
    with gzip.open(tj[-1], "rt") as f:
        trace = json.load(f)
    # TPU device ops live on pids whose process_name contains "TPU"
    tpu_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pn = ev["args"].get("name", "")
            if "TPU" in pn or "tpu" in pn:
                tpu_pids.add(ev["pid"])
    cats = defaultdict(float)
    ops = defaultdict(float)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1000.0  # us -> ms
        # skip tracing metadata rows
        if name.startswith(("$", "process_")):
            continue
        cats[categorize(name)] += dur
        ops[name] += dur
        total += dur
    per = NITER
    print(f"total device-op time: {total / per:.1f} ms/scene "
          f"({NITER} iters)")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {c:<16} {t / per:7.2f} ms")
    topn = int(sys.argv[sys.argv.index("--top") + 1]) \
        if "--top" in sys.argv else 25
    print(f"\ntop {topn} ops:")
    for name, t in sorted(ops.items(), key=lambda kv: -kv[1])[:topn]:
        print(f"  {t / per:7.2f} ms  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
