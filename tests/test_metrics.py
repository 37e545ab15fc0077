import numpy as np

from canonicalvoting_tpu.data.geometry import rotmat_y, unit_box_corners
from canonicalvoting_tpu.metrics import (
    eval_det_multiprocessing,
    get_iou_obb,
    get_iou_obb2d,
    nms,
    voc_ap,
)
from canonicalvoting_tpu.metrics.ap import compute_map
from canonicalvoting_tpu.metrics.iou import convex_intersection_area


def make_box(center, scale, yaw=0.0):
    """(8, 3) corners in the reference layout."""
    c = unit_box_corners()  # (8,3) in [-1,1]
    R = rotmat_y(yaw)
    return (R @ np.diag(scale) @ c.T).T + np.asarray(center)


def test_identical_boxes_iou_one():
    b = make_box([0, 0, 0], [1, 1, 1])
    assert abs(get_iou_obb(b, b) - 1.0) < 1e-9
    assert abs(get_iou_obb2d(b, b) - 1.0) < 1e-9


def test_disjoint_boxes_iou_zero():
    b1 = make_box([0, 0, 0], [1, 1, 1])
    b2 = make_box([10, 0, 0], [1, 1, 1])
    assert get_iou_obb(b1, b2) == 0.0


def test_axis_aligned_half_overlap():
    # boxes [0,2]x[0,2]x[0,2] and [1,3]x[0,2]x[0,2]: inter 1*2*2=4, union 12
    b1 = make_box([1, 1, 1], [1, 1, 1])
    b2 = make_box([2, 1, 1], [1, 1, 1])
    assert abs(get_iou_obb(b1, b2) - 4.0 / 12.0) < 1e-9


def test_rotated_square_overlap_45deg():
    # unit square vs same square rotated 45deg about center:
    # intersection is a regular octagon with area 2*(sqrt(2)-1)*s^2 for s=2
    b1 = make_box([0, 0, 0], [1, 1, 1])
    b2 = make_box([0, 0, 0], [1, 1, 1], yaw=np.pi / 4)
    inter = convex_intersection_area(
        np.stack([b1[:4, 0], b1[:4, 2]], -1), np.stack([b2[:4, 0], b2[:4, 2]], -1)
    )
    expected = 8 * (np.sqrt(2) - 1)  # side 2 square
    assert abs(inter - expected) < 1e-6


def test_degenerate_box_returns_zero():
    b1 = make_box([0, 0, 0], [1, 1, 1])
    b_flat = b1.copy()
    b_flat[:, 1] = 0  # top not above bottom (reference calc_map.py:13)
    assert get_iou_obb(b1, b_flat) == 0.0


def test_y_offset_reduces_iou():
    b1 = make_box([0, 0, 0], [1, 1, 1])
    b2 = make_box([0, 1, 0], [1, 1, 1])  # shifted up by half the height
    assert abs(get_iou_obb(b1, b2) - 1.0 / 3.0) < 1e-9


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(voc_ap(rec, prec) - 1.0) < 1e-9


def test_voc_ap_11point():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(voc_ap(rec, prec, use_07_metric=True) - 1.0) < 1e-9


def test_nms_suppresses_duplicates():
    b = make_box([0, 0, 0], [1, 1, 1])
    b2 = make_box([0.05, 0, 0], [1, 1, 1])
    b3 = make_box([5, 0, 0], [1, 1, 1])
    pick = nms([b, b2, b3], [0.9, 0.8, 0.7], 0.3)
    assert 0 in pick and 2 in pick and 1 not in pick


def test_eval_det_perfect_predictions():
    b1 = make_box([0, 0, 0], [1, 1, 1])
    b2 = make_box([5, 0, 0], [1, 1, 1])
    pred = {"scene0": [("chair", b1, 0.9), ("table", b2, 0.8)]}
    gt = {"scene0": [("chair", b1), ("table", b2)]}
    rec, prec, ap = eval_det_multiprocessing(pred, gt, ovthresh=0.5, processes=1)
    assert abs(ap["chair"] - 1.0) < 1e-9
    assert abs(ap["table"] - 1.0) < 1e-9


def test_eval_det_class_without_predictions():
    """The reference misaligns results here (calc_map.py:215-219); we keep
    AP=0 for the missing class but must NOT corrupt the other classes."""
    b1 = make_box([0, 0, 0], [1, 1, 1])
    b2 = make_box([5, 0, 0], [1, 1, 1])
    pred = {"scene0": [("table", b2, 0.9)]}
    gt = {"scene0": [("chair", b1), ("table", b2)]}
    rec, prec, ap = eval_det_multiprocessing(pred, gt, ovthresh=0.5, processes=1)
    assert ap["chair"] == 0
    assert abs(ap["table"] - 1.0) < 1e-9


def test_eval_det_false_positive_lowers_ap():
    b1 = make_box([0, 0, 0], [1, 1, 1])
    bfp = make_box([20, 0, 0], [1, 1, 1])
    pred = {"s": [("chair", bfp, 0.95), ("chair", b1, 0.9)]}
    gt = {"s": [("chair", b1)]}
    _, _, ap = eval_det_multiprocessing(pred, gt, ovthresh=0.5, processes=1)
    assert 0 < ap["chair"] < 1.0


def test_compute_map_dict():
    b1 = make_box([0, 0, 0], [1, 1, 1])
    pred = {"s": [("chair", b1, 0.9)]}
    gt = {"s": [("chair", b1)]}
    d = compute_map(pred, gt, ovthresh=0.25, processes=1)
    assert abs(d["mAP"] - 1.0) < 1e-9
    assert abs(d["AR"] - 1.0) < 1e-9
    assert "chair Average Precision" in d
