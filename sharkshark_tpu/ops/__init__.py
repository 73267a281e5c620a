from .nn import (
    conv2d,
    conv2d_pairfold,
    pairfold_conv_weights,
    conv_transpose2d,
    depthwise_conv2d,
    prelu,
    leaky_relu,
    relu6,
    pixel_shuffle,
    pixel_shuffle_folded_dil,
    pixel_shuffle_mxu,
    space_to_depth,
    space_to_depth_mxu,
    pad2d,
)
from .resize import resize, resize_nchw, upsample_tecogan
from .color import (
    gaussian_kernel_2d,
    sharpen_kernel_2d,
    blur,
    sharpen,
    global_color_match,
    local_color_match,
    to_float,
    to_uint8,
    to_yuv420,
)
from .warp import backward_warp, backward_warp_ac0, backward_warp_fast, grid_sample_bilinear

__all__ = [
    "conv2d", "conv2d_pairfold", "pairfold_conv_weights", "conv_transpose2d", "depthwise_conv2d", "prelu", "leaky_relu",
    "relu6", "pixel_shuffle", "pixel_shuffle_folded_dil",
    "pixel_shuffle_mxu", "space_to_depth", "space_to_depth_mxu", "pad2d",
    "resize", "resize_nchw", "upsample_tecogan",
    "gaussian_kernel_2d", "sharpen_kernel_2d", "blur", "sharpen",
    "global_color_match", "local_color_match", "to_float", "to_uint8", "to_yuv420",
    "backward_warp", "backward_warp_ac0", "backward_warp_fast", "grid_sample_bilinear",
]
