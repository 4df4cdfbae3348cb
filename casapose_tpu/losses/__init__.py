from casapose_tpu.losses.losses import (
    LossWeights,
    composite_loss,
    keypoint_reprojection_loss,
    proxy_voting_dist,
    proxy_voting_loss,
    smooth_l1_loss,
)
from casapose_tpu.losses.schedules import LossWeightHandler, exponential_decay_late_start, make_lr_schedule

__all__ = [
    "LossWeights",
    "composite_loss",
    "keypoint_reprojection_loss",
    "proxy_voting_dist",
    "proxy_voting_loss",
    "smooth_l1_loss",
    "LossWeightHandler",
    "exponential_decay_late_start",
    "make_lr_schedule",
]
