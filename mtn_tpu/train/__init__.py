from mtn_tpu.train.batch import DeviceBatch, device_batch, batch_masks
from mtn_tpu.train.loss import label_smoothed_kl, mtn_loss
from mtn_tpu.train.schedule import noam_rate, noam_schedule, make_optimizer
from mtn_tpu.train.trainer import TrainState, Trainer

__all__ = [
    "DeviceBatch",
    "device_batch",
    "batch_masks",
    "label_smoothed_kl",
    "mtn_loss",
    "noam_rate",
    "noam_schedule",
    "make_optimizer",
    "TrainState",
    "Trainer",
]
