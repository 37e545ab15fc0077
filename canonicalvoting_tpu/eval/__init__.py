from canonicalvoting_tpu.eval.pipeline import (  # noqa: F401
    DetectionPipeline,
    detections_to_map_entries,
    slice_joint_heads,
    slice_separate_heads,
)
