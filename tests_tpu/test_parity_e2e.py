"""ScanNet-scale parity of the PRODUCTION TPU path against the float64
reference oracle (eval_joint.py:163-280).

The production configuration under test is exactly what bench.py/eval_joint
run on the chip: dense tiled backbone prep + obj-only plane splat
(hv_splat) + lazy rot/scale decode + on-device peel + host NMS. Head rows
are PLANTED (perfect predictions encoded as raw head outputs) so boxes
exist and the accept path is exercised at scale; the backbone itself is
covered by the dense==sparse==XLA parity suite and the .pth round-trip
tests (tests/test_parity_e2e.py chains those on CPU).

Run: python -m pytest tests_tpu/test_parity_e2e.py -s  (needs the chip)
"""

import numpy as np
import pytest

import jax

from canonicalvoting_tpu.data.geometry import IDX2NAME, NAME2CATNAME, NCLASSES
from canonicalvoting_tpu.data.synthetic import make_scene, perfect_predictions
from canonicalvoting_tpu.decode.peeling import PeelConfig
from canonicalvoting_tpu.eval.pipeline import DetectionPipeline
from canonicalvoting_tpu.metrics.ap import compute_map
from canonicalvoting_tpu.models import MinkUNet34C
from tests.reference_impls import reference_eval_joint_tail
from tests.test_parity_e2e import encode_head_rows

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="production-path parity needs the TPU backend",
)


def test_production_tail_matches_oracle_at_scale(rng):
    res = 0.03
    scene = make_scene(rng, extent=(6.0, 2.5, 7.0), n_background=50000,
                      n_boxes=6, pts_per_box=3000)
    model = MinkUNet34C(3, 6 * NCLASSES + NCLASSES + 1)
    peel = PeelConfig(res=res, max_boxes=64, max_iters=96)
    pipe = DetectionPipeline(
        model=model, variables=None, res=res, num_rots=120, peel=peel,
        cap_multiple=8192, backbone="dense",
    )
    args = pipe.prepare_scene(scene.points, scene.rgb)
    coords_w, grid_shape = args[4], args[5]
    valid = np.asarray(args[3]) > 0
    points_w = np.asarray(coords_w)[valid]
    cap = len(valid)

    xyz, scl, prob, cls = perfect_predictions(scene, points_w)
    rows = encode_head_rows(points_w, xyz, scl, prob > 0.5, cls, cap)

    out = jax.device_get(pipe._tail_fn(
        rows, coords_w, valid.astype(np.float32), grid_shape))
    got = pipe.postprocess(out)

    map_ref, boxes_ref, scores_ref, classes_ref = reference_eval_joint_tail(
        rows[:len(points_w)], points_w, res, pipe.num_rots, peel)

    assert len(boxes_ref) == 6, "oracle must find every planted box"
    n = int(out["n_boxes"])
    assert n == len(boxes_ref), (n, len(boxes_ref))
    assert not bool(out["truncated"])
    np.testing.assert_array_equal(np.asarray(out["classes"])[:n],
                                  classes_ref)
    np.testing.assert_allclose(np.asarray(out["boxes"])[:n], boxes_ref,
                               atol=8e-3)
    np.testing.assert_allclose(np.asarray(out["scores"])[:n], scores_ref,
                               atol=1e-5)

    gt_map = [(NAME2CATNAME[IDX2NAME[ci]], c8)
              for ci, c8 in scene.gt_corners()]
    d_got = compute_map({"s": got}, {"s": gt_map}, ovthresh=0.5, processes=1)
    d_ref = compute_map({"s": map_ref}, {"s": gt_map}, ovthresh=0.5,
                        processes=1)
    assert d_got["mAP"] == pytest.approx(d_ref["mAP"], abs=1e-9)
    assert d_got["mAP"] > 0.99
    print(f"\nproduction-vs-oracle at scale: {n} boxes, "
          f"mAP {d_got['mAP']:.4f} == oracle {d_ref['mAP']:.4f}")
