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
from .vsrgan import (
    VSRGANConfig,
    GANTrainState,
    create_gan_state,
    make_gan_train_step,
)
from . import checkpoint, datasets, discriminators, metrics, model_summary

__all__ = [
    "charbonnier_loss", "mse_loss", "cosine_similarity_loss",
    "vanilla_gan_loss", "lsgan_loss", "define_criterion",
    "fixed_lr", "multistep_lr", "cosine_annealing_restart", "define_lr_schedule",
    "VSRTrainConfig", "TrainState", "create_train_state", "make_train_step",
    "VSRGANConfig", "GANTrainState", "create_gan_state", "make_gan_train_step",
    "checkpoint", "datasets", "discriminators", "metrics", "model_summary",
]
