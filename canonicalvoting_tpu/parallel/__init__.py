from canonicalvoting_tpu.parallel.mesh import make_mesh  # noqa: F401
from canonicalvoting_tpu.parallel.data_parallel import (  # noqa: F401
    make_dp_train_step,
    param_shardings,
    stack_scene_batches,
)
from canonicalvoting_tpu.parallel.hv_sharded import hough_voting_sharded  # noqa: F401
