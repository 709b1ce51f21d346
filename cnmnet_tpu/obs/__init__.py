from cnmnet_tpu.obs.logger import MetricLogger
from cnmnet_tpu.obs.meters import AverageMeter, StepTimer
from cnmnet_tpu.obs.colorize import (
    colorize_depth,
    colorize_idepth,
    colorize_prob,
    normal_to_color,
)

__all__ = [
    "MetricLogger",
    "AverageMeter",
    "StepTimer",
    "colorize_depth",
    "colorize_idepth",
    "colorize_prob",
    "normal_to_color",
]
