from .mesh import (
    make_mesh,
    replicated,
    batch_sharding,
    spatial_sharding,
    pad_batch,
    P,
)
from .sharded import make_sharded_upscale, make_sharded_train_step

__all__ = [
    "make_mesh", "replicated", "batch_sharding", "spatial_sharding",
    "pad_batch", "P", "make_sharded_upscale", "make_sharded_train_step",
]
