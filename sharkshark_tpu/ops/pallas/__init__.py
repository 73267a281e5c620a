from .warp_band import banded_backward_warp

__all__ = ["banded_backward_warp"]
