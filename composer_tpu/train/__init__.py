"""Training, evaluation, and generation loops."""

from composer_tpu.train.trainer import Trainer, TrainState

__all__ = ["Trainer", "TrainState"]
