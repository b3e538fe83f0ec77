from whvi_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from whvi_tpu.train.optim import (
    decay_schedule,
    decayed_adam,
    mask_likelihood_grads,
)
from whvi_tpu.train.trainer import TrainConfig, Trainer, TrainState

__all__ = [
    "TrainConfig",
    "Trainer",
    "TrainState",
    "decay_schedule",
    "decayed_adam",
    "latest_checkpoint",
    "mask_likelihood_grads",
    "restore_checkpoint",
    "save_checkpoint",
]
