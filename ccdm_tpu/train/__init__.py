from ccdm_tpu.train.optimizer import build_optimizer, build_lr_schedule
from ccdm_tpu.train.state import TrainState, create_train_state
from ccdm_tpu.train.step import make_train_step, train_loss

__all__ = [
    "build_optimizer",
    "build_lr_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "train_loss",
]
