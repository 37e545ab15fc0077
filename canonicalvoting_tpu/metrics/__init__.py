from canonicalvoting_tpu.metrics.iou import get_iou_obb, get_iou_obb2d  # noqa: F401
from canonicalvoting_tpu.metrics.ap import (  # noqa: F401
    eval_det_cls,
    eval_det_multiprocessing,
    nms,
    voc_ap,
)
