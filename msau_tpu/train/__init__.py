from msau_tpu.train.loss import masked_cross_entropy, unet_loss
from msau_tpu.train.optimizer import make_optimizer, staircase_schedule
from msau_tpu.train.trainer import Trainer, TrainState, make_train_step

__all__ = [
    "masked_cross_entropy",
    "unet_loss",
    "make_optimizer",
    "staircase_schedule",
    "Trainer",
    "TrainState",
    "make_train_step",
]
