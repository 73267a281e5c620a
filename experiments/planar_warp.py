"""EGVSR conv_in planar-warp fold — documented negative result.

srnet_apply with space_to_depth folded into conv_in:
conv3x3 over [lr | space_to_depth(hr, s)] == conv3x3(lr, W_lr) +
conv(hr, W_{3s x 3s}, stride s, pad s) with the s2d slice of the weights
rearranged (dy,dx)-block-major -> spatial taps.  Consumes the warp
kernel's native (1, C, H, W) planar output directly, so the
4x-resolution s2d transpose and the NCHW->NHWC relayout never happen.

MEASURED OUTCOME (v5e, 2160p): 17.3 ms vs 11.1 ms for s2d+conv — the
12x12/stride-4 C_in=3 conv is MXU-hostile; the production path stays
srnet_apply(space_to_depth(...)) (models/egvsr.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sharkshark_tpu.models.egvsr import _srnet_body
from sharkshark_tpu.ops import conv2d

__all__ = ["srnet_apply_planar_warp"]


def srnet_apply_planar_warp(
    params: dict, lr_curr: jnp.ndarray, hr_warp_nchw: jnp.ndarray, s: int
) -> jnp.ndarray:
    p = params
    w = p["conv_in"]["w"]
    c_lr = lr_curr.shape[-1]
    kh, kw, _, o = w.shape
    w_lr, w_s2d = w[:, :, :c_lr], w[:, :, c_lr:]
    c = w_s2d.shape[2] // (s * s)
    w_big = (
        w_s2d.reshape(kh, kw, s, s, c, o)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(kh * s, kw * s, c, o)
    )
    y = conv2d(lr_curr, w_lr, p["conv_in"]["b"], padding=1)
    y = y + jax.lax.conv_general_dilated(
        hr_warp_nchw.astype(y.dtype),
        w_big.astype(y.dtype),
        window_strides=(s, s),
        padding=[(s, s), (s, s)],
        dimension_numbers=("NCHW", "HWIO", "NHWC"),
    )
    return _srnet_body(p, jnp.maximum(y, 0))
