from .levels import LR_LEVELS, HR_LEVELS, lr_shape_for_level, hr_shape_for_level
from .steps import (
    UpscaleSpec,
    upscale_multi,
    upscale_single_denoise,
    upscale_batch_denoise,
    flush_batch_denoise,
    init_denoise_state,
    egvsr_upscale_step,
    egvsr_upscale_chunk,
)
from .tile import tile_upscale
from .jit_cache import ShapeCache, enable_persistent_cache
from .service import (
    UpscalerQueueEntry,
    BaseUpscalerService,
    EsrganUpscalerService,
    EgvsrUpscalerService,
)

__all__ = [
    "LR_LEVELS", "HR_LEVELS", "lr_shape_for_level", "hr_shape_for_level",
    "UpscaleSpec", "upscale_multi", "upscale_single_denoise", "upscale_batch_denoise",
    "flush_batch_denoise",
    "init_denoise_state", "egvsr_upscale_step", "egvsr_upscale_chunk",
    "tile_upscale", "ShapeCache", "enable_persistent_cache",
    "UpscalerQueueEntry", "BaseUpscalerService",
    "EsrganUpscalerService", "EgvsrUpscalerService",
]
