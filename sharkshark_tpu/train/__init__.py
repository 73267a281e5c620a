from .losses import (
    charbonnier_loss,
    mse_loss,
    cosine_similarity_loss,
    vanilla_gan_loss,
    lsgan_loss,
    define_criterion,
)
from .schedules import (
    fixed_lr,
    multistep_lr,
    cosine_annealing_restart,
    define_lr_schedule,
)
from .vsr import VSRTrainConfig, TrainState, create_train_state, make_train_step

__all__ = [
    "charbonnier_loss", "mse_loss", "cosine_similarity_loss",
    "vanilla_gan_loss", "lsgan_loss", "define_criterion",
    "fixed_lr", "multistep_lr", "cosine_annealing_restart", "define_lr_schedule",
    "VSRTrainConfig", "TrainState", "create_train_state", "make_train_step",
]
