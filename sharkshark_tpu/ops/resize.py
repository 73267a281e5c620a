"""Torch-semantics-exact separable image resize for TPU.

The reference pipeline leans on `torch.nn.functional.interpolate` in four
modes — `area` (pre-downscale to the lr ladder and post downscale,
src/upscale/fsrcnn_upscaler.py:173-176,229-231), `bilinear` (local color
match upsample, :215-217), `bicubic` (final HR upsample, :225-227) and
`nearest` (SRVGG residual base, src/upscale/model/realesrgan/factory.py:80).

Rather than translating per-pixel loops, every mode is expressed as a pair
of 1-D resampling matrices applied along H and W with matmuls — MXU-friendly,
fully static, and trivially fused by XLA with the surrounding elementwise
work.  The matrices are built in numpy at trace time and become compile-time
constants.  Exactness vs torch is locked down by tests/test_resize.py.

Integer-factor area downscale takes a reshape+mean fast path (pure VPU, no
matmul needed).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_nchw"]


@lru_cache(maxsize=None)
def _area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Adaptive-average-pool weights: row i averages input range
    [floor(i*in/out), ceil((i+1)*in/out)) — torch `interpolate(mode='area')`
    lowers to adaptive_avg_pool2d with exactly these windows."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        w[i, start:end] = 1.0 / (end - start)
    return w


@lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Bilinear (align_corners=False): source coord (i+0.5)*in/out - 0.5,
    clamped; two taps."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = max((i + 0.5) * scale - 0.5, 0.0)
        i0 = min(int(np.floor(src)), in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        frac = src - i0
        w[i, i0] += 1.0 - frac
        w[i, i1] += frac
    return w


def _cubic_kernel(t: float, a: float = -0.75) -> float:
    at = abs(t)
    if at <= 1.0:
        return (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0
    if at < 2.0:
        return a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a
    return 0.0


@lru_cache(maxsize=None)
def _cubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Bicubic (align_corners=False, a=-0.75), border indices clamped —
    matches torch's upsample_bicubic2d tap placement."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        frac = src - i0
        for k in range(-1, 3):
            idx = min(max(i0 + k, 0), in_size - 1)
            w[i, idx] += _cubic_kernel(k - frac)
    return w


@lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """Legacy torch 'nearest': src = floor(i * in / out)."""
    idx = (np.arange(out_size) * in_size) // out_size
    return np.minimum(idx, in_size - 1).astype(np.int32)


_MATRIX = {"area": _area_matrix, "bilinear": _linear_matrix, "bicubic": _cubic_matrix}


def _apply_axis(x: jnp.ndarray, mat: np.ndarray, axis: int) -> jnp.ndarray:
    """out[..., o, ...] = sum_i mat[o, i] * x[..., i, ...] along `axis`.

    precision=HIGHEST: the TPU MXU truncates f32 matmuls to bf16 by default,
    which puts ~0.4% relative error on resampled pixels — visible at uint8
    scale.  The resize matmuls are a tiny fraction of the conv FLOPs, so the
    full-precision path is cheap insurance.
    """
    m = jnp.asarray(mat, dtype=jnp.float32)
    xf = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    moved = jnp.moveaxis(xf, axis, -1)
    out = jnp.matmul(moved, m.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, axis)


def resize(x: jnp.ndarray, size: tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    """Resize NHWC (or HWC / NFHWC — any rank >= 3 with H,W as the trailing
    spatial dims before channels) to `size=(out_h, out_w)`.

    method: 'area' | 'bilinear' | 'bicubic' | 'nearest', each bit-matching
    the torch F.interpolate mode of the same name (align_corners=False).
    Computation runs in float32 and is cast back to the input dtype.
    """
    out_h, out_w = int(size[0]), int(size[1])
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    orig_dtype = x.dtype

    if (in_h, in_w) == (out_h, out_w):
        return x

    if method == "nearest":
        out = jnp.take(x, jnp.asarray(_nearest_index(in_h, out_h)), axis=h_axis)
        out = jnp.take(out, jnp.asarray(_nearest_index(in_w, out_w)), axis=w_axis)
        return out

    if method == "area" and in_h % out_h == 0 and in_w % out_w == 0:
        fh, fw = in_h // out_h, in_w // out_w
        lead = x.shape[:h_axis]
        c = x.shape[-1]
        xr = x.astype(jnp.float32).reshape(*lead, out_h, fh, out_w, fw, c)
        out = xr.mean(axis=(h_axis + 1, h_axis + 3))
        return out.astype(orig_dtype)

    try:
        builder = _MATRIX[method]
    except KeyError:
        raise ValueError(f"unknown resize method: {method!r}") from None

    out = _apply_axis(x, builder(in_h, out_h), h_axis)
    out = _apply_axis(out, builder(in_w, out_w), w_axis)
    return out.astype(orig_dtype)


def resize_nchw(x: jnp.ndarray, size: tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    """Convenience for NCHW layouts (torch-parity tests)."""
    return jnp.moveaxis(resize(jnp.moveaxis(x, -3, -1), size, method), -1, -3)
