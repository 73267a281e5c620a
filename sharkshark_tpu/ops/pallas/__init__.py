from .tsm_conv import pack_weights, tsm_conv, tsm_conv_supported
from .warp_band import banded_backward_warp

__all__ = [
    "banded_backward_warp",
    "tsm_conv",
    "tsm_conv_supported",
    "pack_weights",
]
