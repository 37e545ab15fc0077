"""Per-category (separate) model evaluation.

The reference runs 9 independent U-Net forwards + 9 Hough-voting passes per
scene sequentially (reference eval_separate.py:165-186). Here the 9 models'
parameters are STACKED and the whole backbone + vote + peel chain is vmapped
over the category axis — one batched device program per scene.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from canonicalvoting_tpu.decode.peeling import PeelConfig, peel_boxes
from canonicalvoting_tpu.eval.pipeline import slice_separate_heads
from canonicalvoting_tpu.metrics.ap import nms as nms_host
from canonicalvoting_tpu.ops.hough_voting import hough_voting
from canonicalvoting_tpu.ops.sparse_conv import valid_row_mask

#: category order used by the separate evaluator
#: (reference eval_separate.py:92 all_categories)
ALL_CATEGORIES = [
    "others", "display", "table", "bathtub", "trashbin", "sofa", "chair",
    "cabinet", "bookshelf",
]


@dataclass
class SeparateDetectionPipeline:
    model: object                     # flax MinkUNetBase (out_channels=8)
    stacked_variables: Dict           # leaves stacked on axis 0 (9, ...)
    categories: List[str] = None
    res: float = 0.03
    num_rots: int = 120
    log_scale: bool = True
    peel: PeelConfig = None
    nms_iou: float = 0.3
    hv_method: str = "auto"

    def __post_init__(self):
        if self.categories is None:
            self.categories = list(ALL_CATEGORIES)
        if self.peel is None:
            # eval_separate.py:209 uses the exclusive elimination slice
            self.peel = PeelConfig(res=self.res, elimination_inclusive=False)

    @functools.cached_property
    def _scene_fn(self):
        model = self.model
        peel_cfg = self.peel
        res = self.res
        num_rots = self.num_rots
        log_scale = self.log_scale
        hv_method = self.hv_method

        @functools.partial(jax.jit, static_argnames=("grid_shape",))
        def scene_fn(stacked_vars, feats, pyramid, coords_w, grid_shape):
            valid = valid_row_mask(feats.shape[0], pyramid["nvalid"][0])[:, 0]
            corner = jnp.min(
                jnp.where(valid[:, None] > 0, coords_w, jnp.float32(3e38)),
                axis=0,
            )

            def per_category(variables):
                out = model.apply(variables, feats, pyramid, False)
                xyz, scale, prob = slice_separate_heads(out)
                if log_scale:
                    scale = jnp.exp(scale)
                go, gr, gs = hough_voting(
                    coords_w, xyz, scale, prob, res=res, num_rots=num_rots,
                    grid_shape=grid_shape, valid=valid, method=hv_method,
                )
                return peel_boxes(
                    go, gr, gs, coords_w, xyz, prob, None, corner, peel_cfg,
                    valid=valid,
                )

            return jax.vmap(per_category)(stacked_vars)

        return scene_fn

    def detect(self, feats, pyramid, coords_w, grid_shape):
        out = self._scene_fn(
            self.stacked_variables, feats, pyramid, coords_w, grid_shape
        )
        map_scene = []
        n_boxes = np.asarray(out["n_boxes"])
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        for ci, category in enumerate(self.categories):
            n = int(n_boxes[ci])
            if n == 0:
                continue
            b, s = boxes[ci, :n], scores[ci, :n]
            for j in nms_host(b, s, self.nms_iou):
                map_scene.append((category, b[j], float(s[j])))
        return map_scene


def stack_variables(variables_list: List[Dict]) -> Dict:
    """Stack per-category variable pytrees on a new leading axis (jitted —
    eager per-leaf stacking pays a dispatch round trip per op on
    remote-compile backends)."""
    stack = jax.jit(
        lambda vs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *vs)
    )
    return stack(variables_list)
