from .mesh import (
    make_mesh,
    replicated,
    batch_sharding,
    spatial_sharding,
    pad_batch,
    P,
)
from .sharded import (
    make_sharded_upscale,
    make_sharded_train_step,
    make_sharded_denoise,
    make_sharded_denoise_flush,
    make_sharded_egvsr_step,
    width_sharding,
)

__all__ = [
    "make_mesh", "replicated", "batch_sharding", "spatial_sharding",
    "pad_batch", "P", "make_sharded_upscale", "make_sharded_train_step",
    "make_sharded_denoise", "make_sharded_denoise_flush",
    "make_sharded_egvsr_step", "width_sharding",
]
