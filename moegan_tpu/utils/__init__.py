from moegan_tpu.utils.metrics import EMAMeter, MetricLogger
from moegan_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_step

__all__ = [
    "EMAMeter",
    "MetricLogger",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
]
