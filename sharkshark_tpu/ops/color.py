"""Color/post-processing ops of the production upscale path.

These are the TPU rewrites of the post-model stages in
src/upscale/fsrcnn_upscaler.py:

- `global_color_match`     <- channel mean/std match (:188-199)
- `local_color_match`      <- blur-pyramid local match (:201-218)
- `gaussian_kernel_2d`     <- blur_ker (:20-52)
- `sharpen_kernel_2d`      <- sharpen_ker (:54-84)
- `to_float` / `to_uint8`  <- the /255, *255 + uint8 NHWC edges (:170-171,:233)

All stay inside the jitted step so XLA fuses them with the model epilogue.
Layout is NHWC throughout (channel-last statistics reduce over H*W).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .nn import depthwise_conv2d
from .resize import resize

__all__ = [
    "gaussian_kernel_2d",
    "sharpen_kernel_2d",
    "global_color_match",
    "local_color_match",
    "to_float",
    "to_uint8",
]


@lru_cache(maxsize=None)
def gaussian_kernel_2d(kernel_size: int = 3, sigma: float = 0.5) -> np.ndarray:
    """Normalized 2-D gaussian, shape (k, k, 1, 1) for depthwise conv."""
    coords = np.arange(kernel_size, dtype=np.float64)
    mean = (kernel_size - 1) / 2.0
    var = sigma**2
    g1 = np.exp(-((coords - mean) ** 2) / (2 * var)) / math.sqrt(2 * math.pi * var)
    k = np.outer(g1, g1)
    k = k / k.sum()
    return k.astype(np.float32).reshape(kernel_size, kernel_size, 1, 1)


@lru_cache(maxsize=None)
def sharpen_kernel_2d(strength: float = 1.0) -> np.ndarray:
    """Blend of a 3x3 sharpen stencil with identity, normalized to sum 1,
    shape (3, 3, 1, 1)."""
    sharp = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]], dtype=np.float64)
    ident = np.array([[0, 0, 0], [0, 1, 0], [0, 0, 0]], dtype=np.float64)
    k = sharp * strength + (1.0 - strength) * ident
    k = k / k.sum()
    return k.astype(np.float32).reshape(3, 3, 1, 1)


def blur(x: jnp.ndarray, kernel_size: int = 3, sigma: float = 0.5) -> jnp.ndarray:
    """Depthwise gaussian blur with reflect padding (NHWC)."""
    k = jnp.asarray(gaussian_kernel_2d(kernel_size, sigma))
    return depthwise_conv2d(x, k, padding=kernel_size // 2, pad_mode="reflect")


def sharpen(x: jnp.ndarray, strength: float) -> jnp.ndarray:
    """3x3 sharpen stencil with reflect padding (NHWC).

    Same kernel as sharpen_kernel_2d — y = (1+8s)*x - s*sum(8 neighbours)
    — but lowered as shifted adds instead of a depthwise conv: a C=3
    depthwise conv is an HLO boundary that blocks XLA's elementwise
    fusion with the surrounding post chain and runs on a slow conv path
    (round-5 probe: the denoise post chain's two sharpens dominated its
    cost at batch 8).  The shift form fuses into one traversal."""
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    h, w = x.shape[-3], x.shape[-2]
    nb = None
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            t = xp[..., dy : dy + h, dx : dx + w, :]
            nb = t if nb is None else nb + t
    s = jnp.asarray(strength, x.dtype)
    return (1 + 8 * s) * x - s * nb


def _chan_stats(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image per-channel mean/std over H*W. Std uses the unbiased
    (n-1) estimator to match torch.Tensor.std."""
    xf = x.astype(jnp.float32)
    n = x.shape[-3] * x.shape[-2]
    mean = xf.mean(axis=(-3, -2), keepdims=True)
    var = jnp.sum((xf - mean) ** 2, axis=(-3, -2), keepdims=True) / max(n - 1, 1)
    return mean, jnp.sqrt(var)


def global_color_match(hr: jnp.ndarray, ref_lr: jnp.ndarray) -> jnp.ndarray:
    """Re-standardize `hr`'s per-channel distribution to match `ref_lr`'s:
    hr' = (hr - mu_hr) / (std_hr + 1e-8) * std_ref + mu_ref."""
    hr_mean, hr_std = _chan_stats(hr)
    ref_mean, ref_std = _chan_stats(ref_lr)
    out = (hr.astype(jnp.float32) - hr_mean) / (hr_std + 1e-8)
    return (out * ref_std + ref_mean).astype(hr.dtype)


def local_color_match(
    hr: jnp.ndarray,
    ref_lr: jnp.ndarray,
    match_factor: int = 8,
    blur_kernel_size: int = 17,
    blur_sigma: float = 8.0,
) -> jnp.ndarray:
    """Subtract the low-frequency color drift of `hr` relative to `ref_lr`.

    Both are area-downscaled to (H/match_factor, W/match_factor), gaussian
    blurred, and the blurred difference is bilinearly upsampled and removed
    from `hr`.  Skipped (identity) when the pyramid would be smaller than
    the blur support — same gate as the reference (:204)."""
    h, w = hr.shape[-3], hr.shape[-2]
    small = (h // match_factor, w // match_factor)
    if not (small[0] > blur_kernel_size // 2 and h > 64 and w > 64):
        return hr
    lr_small = resize(ref_lr, small, "area")
    hr_small = resize(hr, small, "area")
    lr_blur = blur(lr_small, blur_kernel_size, blur_sigma)
    hr_blur = blur(hr_small, blur_kernel_size, blur_sigma)
    diff = resize(hr_blur - lr_blur, (h, w), "bilinear")
    return (hr.astype(jnp.float32) - diff.astype(jnp.float32)).astype(hr.dtype)


def to_float(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] -> float [0,1]."""
    return x.astype(dtype) / jnp.asarray(255.0, dtype)


def to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] -> uint8, with clamp; truncation matches torch's
    `.to(torch.uint8)` cast after `*255`."""
    x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0) * 255.0
    return x.astype(jnp.uint8)


def to_yuv420(x: jnp.ndarray) -> jnp.ndarray:
    """float RGB [0,1] (N, H, W, 3) -> planar yuv420p uint8 (N, H*3//2, W).

    Device-side colorspace conversion + 2x2 chroma subsampling for the
    encoder feed: emitting yuv420p instead of rgb24 halves the
    device->host bytes per frame (1.5 vs 3 B/px) AND removes ffmpeg's
    swscale rgb24->yuv420p stage from the host CPU — the TPU-first
    replacement for the reference piping rgb24 into ffmpeg
    (output_stream.py:115-191).  BT.601 limited range, the same default
    swscale applies for yuv420p H.264.

    Layout per frame: rows [0, H) = Y plane; rows [H, H+H//4) = U plane
    ((H/2, W/2) raveled W-wide); rows [H+H//4, H*3//2) = V plane.
    Requires H % 4 == 0 and W % 2 == 0 (every ladder entry qualifies).
    """
    n, h, w, _ = x.shape
    assert h % 4 == 0 and w % 2 == 0, (h, w)
    rgb = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 16.0 + 65.481 * r + 128.553 * g + 24.966 * b
    # chroma on the 2x2-average of RGB (swscale's default down-filter)
    rgb2 = rgb.reshape(n, h // 2, 2, w // 2, 2, 3).mean(axis=(2, 4))
    r2, g2, b2 = rgb2[..., 0], rgb2[..., 1], rgb2[..., 2]
    u = 128.0 - 37.797 * r2 - 74.203 * g2 + 112.0 * b2
    v = 128.0 + 112.0 * r2 - 93.786 * g2 - 18.214 * b2

    def q(p):
        return jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.uint8)

    return jnp.concatenate(
        [q(y), q(u).reshape(n, h // 4, w), q(v).reshape(n, h // 4, w)], axis=1
    )
