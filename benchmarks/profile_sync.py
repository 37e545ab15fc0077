"""Measure axon relay round-trip latency + true per-scene sync e2e times."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.decode.peeling import PeelConfig
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
from canonicalvoting_tpu.models import MinkUNet34C


def main():
    # relay round-trip: trivial jit + tiny fetch
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        y = np.asarray(f(x))
    rt = (time.perf_counter() - t0) / 10 * 1000
    print(f"relay round-trip (tiny jit + fetch): {rt:.1f} ms")

    rng = np.random.RandomState(0)
    scenes = [make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                         n_boxes=6, pts_per_box=3000) for _ in range(4)]
    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
    pipe = DetectionPipeline(
        model=model, variables=None, res=0.03, num_rots=120,
        peel=PeelConfig(res=0.03, max_boxes=64, max_iters=96),
        cap_multiple=8192, backbone="dense",
    )
    args0 = pipe.prepare_scene(scenes[0].points, scenes[0].rgb)
    _, feats0, flat0, valid0, _, _, dense_dims0 = args0[:7]
    dm = pipe._dense_model
    pipe.variables = jax.jit(
        lambda r, f_, fi, v: dm.init(r, f_, fi, v, tuple(dense_dims0), False)
    )(jax.random.PRNGKey(0), feats0, flat0, valid0)

    prepped = [pipe.prepare_scene(s.points, s.rgb) for s in scenes]
    for i, a in enumerate(prepped):
        kind = a[0]
        print(f"scene{i}: cap={len(a[3])} dense={a[6]} grid={a[5]}")

    # warmup (compile) each
    for a in prepped:
        out = pipe.run_scene(a)
        int(out["n_boxes"])

    for rep in range(2):
        for i, a in enumerate(prepped):
            t0 = time.perf_counter()
            out = pipe.run_scene(a)
            n = int(out["n_boxes"])
            dt = time.perf_counter() - t0
            print(f"rep{rep} scene{i}: {dt*1000:7.1f} ms  n_boxes={n}")


if __name__ == "__main__":
    main()
