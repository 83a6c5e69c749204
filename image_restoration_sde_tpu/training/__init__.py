from . import ema, losses, lr_schedules, optimizers
from .ema import EmaConfig, EmaState
from .losses import matching_loss
from .lr_schedules import build_lr_schedule
from .optimizers import build_optimizer
from .trainer import (
    TrainState,
    create_train_state,
    make_denoising_train_step,
    make_train_step,
)

__all__ = [
    "ema", "losses", "lr_schedules", "optimizers",
    "EmaConfig", "EmaState", "matching_loss", "build_lr_schedule",
    "build_optimizer", "TrainState", "create_train_state",
    "make_train_step", "make_denoising_train_step",
]
