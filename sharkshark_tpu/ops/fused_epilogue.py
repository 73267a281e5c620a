"""Fused model epilogue: pixel-shuffle(4) + bicubic 2x-downscale, without
materializing the 4x image.

The production pipeline upscales 4x with SRVGG and immediately bicubic-
downscales 2x to the 1440p output (reference fsrcnn_upscaler.py:222-231).
Both steps are linear, so their composition is a fixed per-phase mix of
the 48 pre-shuffle channels with +-1-pixel neighbor taps — computable at
LR resolution. This removes the (N, 2880, 5120, C) tensors entirely; on
an HBM-bound chip that is the single largest post-processing cost.

Bicubic d=2 taps (a=-0.75, align_corners=False): src = 2o + 0.5, taps at
2o-1..2o+2 with weights (-0.09375, 0.59375, 0.59375, -0.09375). Mapping
hr index 4m+p back to (LR pixel, shuffle phase):

  out[2m]   = k0*ph3[m-1] + k1*ph0[m] + k2*ph1[m] + k3*ph2[m]
  out[2m+1] = k0*ph1[m]   + k1*ph2[m] + k2*ph3[m] + k3*ph0[m+1]

applied separably over H (dy phases) and W (dx phases). Border columns
use edge-replicated shifts, which differs from clamped-index bicubic on
the outermost output pixel only (<=1 px border, documented fast-path
deviation; the interior is exact to float rounding).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "ps4_bicubic_down2",
    "nearest4_bicubic_down2",
    "ps4_bicubic_down3",
    "ps4_bicubic_down4",
    "nearest4_bicubic_down4",
]

# bicubic 2x-downscale taps at frac 0.5 (a = -0.75)
K = np.array([-0.09375, 0.59375, 0.59375, -0.09375], np.float32)


def _shift_up(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """x[i-1] with edge replication."""
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, 1)
    first = x[tuple(idx)]
    idx[axis] = slice(0, -1)
    return jnp.concatenate([first, x[tuple(idx)]], axis=axis)


def _shift_down(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """x[i+1] with edge replication."""
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(-1, None)
    last = x[tuple(idx)]
    idx[axis] = slice(1, None)
    return jnp.concatenate([x[tuple(idx)], last], axis=axis)


def _mix_axis(y: jnp.ndarray, axis: int, phase_axis: int) -> jnp.ndarray:
    """y: (..., n, ..., 4phases, ...) -> (..., 2n, ...) with the phase
    axis consumed. axis indexes the spatial dim, phase_axis the 4-phase
    dim (both positive)."""

    def ph(p):
        idx = [slice(None)] * y.ndim
        idx[phase_axis] = p
        return y[tuple(idx)]

    p0, p1, p2, p3 = ph(0), ph(1), ph(2), ph(3)
    # phase_axis removed; spatial axis position unchanged (phase_axis > axis)
    q0 = (
        K[0] * _shift_up(p3, axis)
        + K[1] * p0
        + K[2] * p1
        + K[3] * p2
    )
    q1 = (
        K[0] * p1
        + K[1] * p2
        + K[2] * p3
        + K[3] * _shift_down(p0, axis)
    )
    out = jnp.stack([q0, q1], axis=axis + 1)  # (..., n, 2, ...)
    shape = list(q0.shape)
    shape[axis] = shape[axis] * 2
    return out.reshape(shape)


def ps4_bicubic_down2(y: jnp.ndarray) -> jnp.ndarray:
    """y: (N, h, w, c*16) pre-shuffle tail activations (torch PixelShuffle
    channel order: (c*4 + dy)*4 + dx) -> (N, 2h, 2w, c), equal to
    bicubic-2x-down(pixel_shuffle(y, 4)) except the 1-px border."""
    n, h, w, c16 = y.shape
    c = c16 // 16
    y6 = y.reshape(n, h, w, c, 4, 4)  # (..., dy, dx)
    z = _mix_axis(y6, axis=1, phase_axis=4)  # consume dy -> (n, 2h, w, c, 4)
    z = _mix_axis(z, axis=2, phase_axis=4)   # consume dx -> (n, 2h, 2w, c)
    return z


def nearest4_bicubic_down2(x: jnp.ndarray) -> jnp.ndarray:
    """x: (N, h, w, c) -> (N, 2h, 2w, c), equal to
    bicubic-2x-down(nearest-4x-up(x)) except the 1-px border.

    nearest-up phases are all x, so the mix collapses to:
      out[2m]   = k0*x[m-1] + (k1+k2+k3)*x[m]
      out[2m+1] = (k0+k1+k2)*x[m] + k3*x[m+1]
    """
    a, b = float(K[0]), float(K[1] + K[2] + K[3])
    c_, d = float(K[0] + K[1] + K[2]), float(K[3])

    def mix(x, axis):
        q0 = a * _shift_up(x, axis) + b * x
        q1 = c_ * x + d * _shift_down(x, axis)
        out = jnp.stack([q0, q1], axis=axis + 1)
        shape = list(q0.shape)
        shape[axis] = shape[axis] * 2
        return out.reshape(shape)

    return mix(mix(x, 1), 2)


def ps4_bicubic_down3(y: jnp.ndarray) -> jnp.ndarray:
    """y: (N, h, w, c*16) pre-shuffle -> (N, 4h/3, 4w/3, c), equal to
    bicubic-3x-down(pixel_shuffle(y, 4)). h, w must be multiples of 3.

    Non-antialiased bicubic at an integer source stride of 3 has src =
    3o + 1 with frac 0 — weights (0, 1, 0, 0) — i.e. PURE SUBSAMPLING of
    the 4x image at positions 3o+1. Those positions map to shuffle phase
    (3o+1) mod 4 and block (3o+1)//4, a static per-phase strided slice."""
    n, h, w, c16 = y.shape
    assert h % 3 == 0 and w % 3 == 0, (h, w)
    c = c16 // 16
    oh, ow = 4 * h // 3, 4 * w // 3
    y6 = y.reshape(n, h, w, c, 4, 4)

    def pick_axis(z, axis, phase_axis, out_size):
        # out index o = 4m + q (q in 0..3): hr pos 3o+1 -> phase (3q+1)%4,
        # block 3m + (3q+1)//4
        parts = []
        for q in range(4):
            ph = (3 * q + 1) % 4
            off = (3 * q + 1) // 4
            idx = [slice(None)] * z.ndim
            idx[phase_axis] = ph
            zq = z[tuple(idx)]  # phase consumed
            idx2 = [slice(None)] * zq.ndim
            idx2[axis] = slice(off, off + 3 * (out_size // 4), 3)
            parts.append(zq[tuple(idx2)])
        stacked = jnp.stack(parts, axis=axis + 1)  # (..., out/4, 4, ...)
        shape = list(parts[0].shape)
        shape[axis] = out_size
        return stacked.reshape(shape)

    z = pick_axis(y6, axis=1, phase_axis=4, out_size=oh)  # dy consumed
    z = pick_axis(z, axis=2, phase_axis=4, out_size=ow)   # dx consumed
    return z


def ps4_bicubic_down4(y: jnp.ndarray) -> jnp.ndarray:
    """y: (N, h, w, c*16) pre-shuffle -> (N, h, w, c), equal to
    bicubic-4x-down(pixel_shuffle(y, 4)): src = 4o + 1.5, all four taps
    inside block o — a pure per-axis channel mix with the d=2 weights."""
    n, h, w, c16 = y.shape
    c = c16 // 16
    y6 = y.reshape(n, h, w, c, 4, 4)
    k = jnp.asarray(K)
    z = jnp.einsum("nhwcde,d->nhwce", y6, k)
    return jnp.einsum("nhwce,e->nhwc", z, k)


def nearest4_bicubic_down4(x: jnp.ndarray) -> jnp.ndarray:
    """bicubic-4x-down(nearest-4x-up(x)) == x exactly (all taps hit the
    same source pixel and the kernel sums to 1)."""
    return x


def nearest4_bicubic_down3(x: jnp.ndarray) -> jnp.ndarray:
    """bicubic-3x-down(nearest-4x-up(x)): subsampling positions 3o+1 of
    the nearest-up image -> x[(3o+1)//4], a per-phase strided slice.
    H, W must be multiples of 3."""
    n, h, w, c = x.shape
    assert h % 3 == 0 and w % 3 == 0, (h, w)

    def pick(z, axis, out_size):
        parts = []
        for q in range(4):
            off = (3 * q + 1) // 4
            idx = [slice(None)] * z.ndim
            idx[axis] = slice(off, off + 3 * (out_size // 4), 3)
            parts.append(z[tuple(idx)])
        stacked = jnp.stack(parts, axis=axis + 1)
        shape = list(parts[0].shape)
        shape[axis] = out_size
        return stacked.reshape(shape)

    return pick(pick(x, 1, 4 * h // 3), 2, 4 * w // 3)


def _cubic_w(t: float, a: float = -0.75) -> float:
    at = abs(t)
    if at <= 1.0:
        return (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0
    if at < 2.0:
        return a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a
    return 0.0


def _rational_plan(num: int, den: int):
    """Tap plan for bicubic downscale by f = num/den composed with ps4.

    Returns (P, stride_blocks, classes) where classes[c] is a list of
    (block_offset, phase, weight) for output indices o ≡ c (mod P).
    Output pixel o samples src = f*o + (f-1)/2 with 4 cubic taps."""
    from fractions import Fraction
    from math import gcd, floor

    f = Fraction(num, den)
    # smallest P with f*P divisible by 4
    P = 4 * den // gcd(num, 4 * den)
    fp = f * P
    assert fp % 4 == 0, (num, den, P)
    stride_blocks = int(fp) // 4
    classes = []
    for c in range(P):
        src = f * c + (f - 1) / 2
        i0 = floor(src)
        frac = float(src - i0)
        taps = []
        for t in range(-1, 3):
            wgt = _cubic_w(t - frac)
            if wgt == 0.0:
                continue
            pos = i0 + t
            taps.append((pos // 4, pos % 4, wgt))
        classes.append(taps)
    return P, stride_blocks, classes


def _edge_pad_axis(z: jnp.ndarray, axis: int, lo: int, hi: int) -> jnp.ndarray:
    if lo == 0 and hi == 0:
        return z
    pads = [(0, 0)] * z.ndim
    pads[axis] = (lo, hi)
    return jnp.pad(z, pads, mode="edge")


def _apply_rational_axis(z, axis, phase_axis, out_size, plan):
    """z: blocks on `axis`, 4 shuffle phases on `phase_axis` (or None for
    the nearest-residual case where z has no phase axis)."""
    P, stride, classes = plan
    assert out_size % P == 0, (out_size, P)
    n_u = out_size // P
    offs = [b for taps in classes for (b, _, _) in taps]
    pad_l = max(0, -min(offs))
    max_need = max(offs) + stride * (n_u - 1)
    pad_r = max(0, max_need - (z.shape[axis] - 1))
    zp = _edge_pad_axis(z, axis, pad_l, pad_r)

    outs = []
    for taps in classes:
        acc = None
        for boff, ph, wgt in taps:
            if phase_axis is not None:
                idx = [slice(None)] * zp.ndim
                idx[phase_axis] = ph
                src = zp[tuple(idx)]
            else:
                src = zp
            start = boff + pad_l
            idx2 = [slice(None)] * src.ndim
            idx2[axis] = slice(start, start + stride * n_u, stride)
            term = src[tuple(idx2)] * wgt
            acc = term if acc is None else acc + term
        outs.append(acc)
    stacked = jnp.stack(outs, axis=axis + 1)  # (..., n_u, P, ...)
    shape = list(outs[0].shape)
    shape[axis] = out_size
    return stacked.reshape(shape)


def ps4_bicubic_down_rational(y: jnp.ndarray, num: int, den: int) -> jnp.ndarray:
    """y: (N, h, w, c*16) pre-shuffle -> bicubic-(num/den)-downscale of
    pixel_shuffle(y, 4): output (N, 4h*den/num, 4w*den/num, c). Covers any
    ladder ratio (2, 3, 4, 3/2, 5/2, 7/4, ...); borders use edge-replicated
    blocks (<= 1 block deviation vs clamped-index bicubic)."""
    n, h, w, c16 = y.shape
    c = c16 // 16
    oh, ow = 4 * h * den // num, 4 * w * den // num
    assert oh * num == 4 * h * den and ow * num == 4 * w * den, (h, w, num, den)
    plan = _rational_plan(num, den)
    y6 = y.reshape(n, h, w, c, 4, 4)
    z = _apply_rational_axis(y6, 1, 4, oh, plan)   # consume dy
    z = _apply_rational_axis(z, 2, 4, ow, plan)    # consume dx
    return z


def nearest4_bicubic_down_rational(x: jnp.ndarray, num: int, den: int) -> jnp.ndarray:
    """bicubic-(num/den)-down(nearest-4x-up(x)) via the same tap plan: the
    nearest image's value at hr position 4b+p is x[b], so phases collapse
    and taps hitting the same block merge."""
    n, h, w, c = x.shape
    oh, ow = 4 * h * den // num, 4 * w * den // num
    plan = _rational_plan(num, den)
    # merge same-block taps (phase is irrelevant for the nearest image)
    P, stride, classes = plan
    merged = []
    for taps in classes:
        acc: dict[int, float] = {}
        for boff, _ph, wgt in taps:
            acc[boff] = acc.get(boff, 0.0) + wgt
        merged.append([(b, 0, wgt) for b, wgt in sorted(acc.items())])
    mplan = (P, stride, merged)
    z = _apply_rational_axis(x, 1, None, oh, mplan)
    z = _apply_rational_axis(z, 2, None, ow, mplan)
    return z
