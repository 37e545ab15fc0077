from canonicalvoting_tpu.ops.voxelize import (  # noqa: F401
    batched_coordinates,
    sparse_quantize,
)
from canonicalvoting_tpu.ops.hough_voting import hough_voting  # noqa: F401
