"""Real-TPU end-to-end parity: tiled Pallas pipeline vs XLA reference path.

Runs the SAME weights + scene through (a) the production pipeline
(dense backbone, conv_impl="tiled", lazy rot/scale splat) and (b) the
all-XLA fallback (conv_impl="xla", hv_method="xla", eager rot/scale),
then compares backbone outputs and decoded boxes. Interpret-mode parity
(tests/test_dense_unet.py) can't see Mosaic alignment/DMA bugs; this
script runs on the actual chip. Exits nonzero on mismatch.

Usage: python benchmarks/parity_e2e_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from canonicalvoting_tpu.data.geometry import NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene
from canonicalvoting_tpu.decode.peeling import PeelConfig
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
from canonicalvoting_tpu.models import MinkUNet34C


def main():
    assert jax.default_backend() == "tpu", "needs the real chip"
    rng = np.random.RandomState(0)
    res = 0.03
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                       n_boxes=6, pts_per_box=3000)

    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
    peel = PeelConfig(res=res, max_boxes=64, max_iters=96)

    pipe_t = DetectionPipeline(
        model=model, variables=None, res=res, num_rots=120, peel=peel,
        cap_multiple=8192, backbone="dense", conv_impl="tiled",
    )
    pipe_x = DetectionPipeline(
        model=model, variables=None, res=res, num_rots=120, peel=peel,
        cap_multiple=8192, backbone="dense", conv_impl="xla",
        hv_method="xla", lazy_rot_scale=False,
    )

    args_t = pipe_t.prepare_scene(scene.points, scene.rgb)
    args_x = pipe_x.prepare_scene(scene.points, scene.rgb)
    feats0, flat0, valid0 = args_t[1:4]
    dense_dims0 = args_t[6]
    dm = pipe_t._dense_model
    init_fn = jax.jit(lambda r, f, fi, v: dm.init(
        r, f, fi, v, tuple(dense_dims0), False))
    variables = init_fn(jax.random.PRNGKey(0), feats0, flat0, valid0)
    pipe_t.variables = variables
    pipe_x.variables = variables

    # 1) backbone outputs (valid rows only)
    def backbone_out(pipe, args):
        (_, feats, flat, valid, _cw, _gs, dense_dims, tiles, run_spec,
         run_tiles, occ_packs) = args
        out = pipe._backbone_fn(
            pipe.variables, feats, flat, valid, tuple(dense_dims),
            tiles=tiles, run_spec=run_spec, run_tiles=run_tiles,
            occ_packs=occ_packs)
        return np.asarray(out), np.asarray(valid)

    out_t, valid = backbone_out(pipe_t, args_t)
    out_x, _ = backbone_out(pipe_x, args_x)
    m = valid > 0
    diff = np.abs(out_t[m] - out_x[m])
    denom = np.maximum(np.abs(out_x[m]), 1.0)
    rel = (diff / denom).max()
    print(f"backbone: max abs diff={diff.max():.3e} max rel={rel:.3e} "
          f"(n={int(m.sum())})")
    ok_backbone = rel < 2e-2  # bf16 accumulation-order tolerance

    # 2) decoded boxes end to end
    det_t = pipe_t.postprocess(pipe_t.run_scene(args_t))
    det_x = pipe_x.postprocess(pipe_x.run_scene(args_x))
    print(f"boxes: tiled={len(det_t)} xla={len(det_x)}")
    ok_boxes = abs(len(det_t) - len(det_x)) <= max(2, len(det_x) // 4)

    if not (ok_backbone and ok_boxes):
        print("PARITY FAIL", "backbone" if not ok_backbone else "",
              "boxes" if not ok_boxes else "")
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
