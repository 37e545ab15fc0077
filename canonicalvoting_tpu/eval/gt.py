"""Ground-truth box parsing (reference train_joint.py:443-455,
eval_joint.py:284-303): each line of results_gt/<scan>.txt is
"tx ty tz ry sx sy sz ... category"."""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from canonicalvoting_tpu.data.geometry import (
    NAME2CATNAME,
    rotmat_y,
    unit_box_corners,
)


def parse_gt_line(line: str, map_catname: bool = True) -> Tuple[str, np.ndarray]:
    parts = line.split(" ")
    tx, ty, tz, ry, sx, sy, sz = [float(v) for v in parts[:7]]
    category = parts[-1]
    if map_catname:
        category = NAME2CATNAME.get(category, category)
    box = (rotmat_y(ry) @ np.diag([sx, sy, sz]) @ unit_box_corners().T).T \
        + np.array([tx, ty, tz])
    return category, box


def load_gt_scene(gt_path: str, id_scan: str, map_catname: bool = True,
                  scenenn: bool = False) -> List[Tuple[str, np.ndarray]]:
    with open(os.path.join(gt_path, f"{id_scan}.txt")) as f:
        lines = f.read().splitlines()
    out = []
    for line in lines:
        category, box = parse_gt_line(line, map_catname=map_catname and not scenenn)
        if scenenn:
            # eval_joint.py:293-296
            if category == "desk":
                category = "table"
            if category == "television":
                category = "display"
        out.append((category, box))
    return out
