from .conv_stack import fused_conv_stack, conv_stack_supported

__all__ = ["fused_conv_stack", "conv_stack_supported"]
