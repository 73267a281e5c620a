"""Torch-semantics-exact separable image resize for TPU.

The reference pipeline leans on `torch.nn.functional.interpolate` in four
modes — `area` (pre-downscale to the lr ladder and post downscale,
src/upscale/fsrcnn_upscaler.py:173-176,229-231), `bilinear` (local color
match upsample, :215-217), `bicubic` (final HR upsample, :225-227) and
`nearest` (SRVGG residual base, src/upscale/model/realesrgan/factory.py:80).

Each mode is a separable 1-D resampler with a small fixed tap count
(bicubic 4, bilinear 2, area <= ceil(in/out)+1), applied along H then W as
K gathers + K fused multiply-adds on the VPU.  A dense out_size x in_size
matmul formulation would burn in/K times more FLOPs (and at 2880->1440
that is ~700x); the tap tables are numpy compile-time constants, so XLA
fuses the whole resample into the surrounding elementwise work.

Integer-factor area downscale takes a reshape+mean fast path (pure VPU).
Exactness vs torch is locked down by tests/test_resize.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_nchw"]


@lru_cache(maxsize=None)
def _area_taps(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Adaptive-average-pool taps: row i averages input range
    [floor(i*in/out), ceil((i+1)*in/out)) — torch `interpolate(mode='area')`
    lowers to adaptive_avg_pool2d with exactly these windows."""
    starts = (np.arange(out_size) * in_size) // out_size
    ends = -((-(np.arange(out_size) + 1) * in_size) // out_size)  # ceil
    k = int((ends - starts).max())
    idx = starts[:, None] + np.arange(k)[None, :]
    w = np.where(idx < ends[:, None], 1.0, 0.0) / (ends - starts)[:, None]
    idx = np.minimum(idx, in_size - 1)
    return idx.astype(np.int32), w.astype(np.float32)


@lru_cache(maxsize=None)
def _linear_taps(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Bilinear (align_corners=False): source coord (i+0.5)*in/out - 0.5,
    clamped; two taps."""
    scale = in_size / out_size
    src = np.maximum((np.arange(out_size) + 0.5) * scale - 0.5, 0.0)
    i0 = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = (src - i0).astype(np.float32)
    idx = np.stack([i0, i1], axis=1)
    w = np.stack([1.0 - frac, frac], axis=1)
    return idx.astype(np.int32), w.astype(np.float32)


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    w1 = (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0
    w2 = a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a
    return np.where(at <= 1.0, w1, np.where(at < 2.0, w2, 0.0))


@lru_cache(maxsize=None)
def _cubic_taps(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Bicubic (align_corners=False, a=-0.75), border indices clamped —
    matches torch's upsample_bicubic2d tap placement (duplicated clamped
    taps accumulate, same as the += in a dense formulation)."""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    ks = np.arange(-1, 3)
    idx = np.clip(i0[:, None] + ks[None, :], 0, in_size - 1)
    w = _cubic_kernel(ks[None, :] - frac[:, None])
    return idx.astype(np.int32), w.astype(np.float32)


@lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """Legacy torch 'nearest': src = floor(i * in / out)."""
    idx = (np.arange(out_size) * in_size) // out_size
    return np.minimum(idx, in_size - 1).astype(np.int32)


_TAPS = {"area": _area_taps, "bilinear": _linear_taps, "bicubic": _cubic_taps}


def _apply_axis(x: jnp.ndarray, taps: tuple[np.ndarray, np.ndarray], axis: int) -> jnp.ndarray:
    """out[..., o, ...] = sum_k w[o, k] * x[..., idx[o, k], ...] along `axis`.

    K gathers + K FMAs in float32 on the VPU — no MXU matmul, so no
    bf16-truncation concern and no dense zero-padded weight matrix."""
    idx, w = taps
    xf = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    out = None
    for k in range(idx.shape[1]):
        tap = jnp.take(xf, jnp.asarray(idx[:, k]), axis=axis)
        wk = jnp.asarray(w[:, k]).reshape((-1,) + (1,) * (x.ndim - 1 - axis))
        out = tap * wk if out is None else out + tap * wk
    return out


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
        builder = _TAPS[method]
    except KeyError:
        raise ValueError(f"unknown resize method: {method!r}") from None

    out = _apply_axis(x, builder(in_h, out_h), h_axis)
    out = _apply_axis(out, builder(in_w, out_w), w_axis)
    return out.astype(orig_dtype)


def resize_nchw(x: jnp.ndarray, size: tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    """Convenience for NCHW layouts (torch-parity tests)."""
    return jnp.moveaxis(resize(jnp.moveaxis(x, -3, -1), size, method), -1, -3)
