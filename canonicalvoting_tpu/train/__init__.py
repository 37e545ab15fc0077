from canonicalvoting_tpu.train.losses import joint_losses, separate_losses  # noqa: F401
from canonicalvoting_tpu.train.schedules import (  # noqa: F401
    bn_momentum_for_epoch,
    lr_for_epoch,
)
