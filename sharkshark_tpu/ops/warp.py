"""Backward warping (flow-based resampling) for frame-recurrent VSR.

TPU rewrite of EGVSR's `backward_warp` (reference
src/upscale/model/egvsr/utils/net_utils.py:50-93): bilinear
`grid_sample(align_corners=True, padding_mode='border')` driven by a dense
optical-flow field.  Implemented as per-channel flat gathers over H*W with
computed bilinear weights.

PERFORMANCE NOTE (measured, v5e): dense gathers are the one op class TPUs
are genuinely bad at. The 4x-resolution warp in EGVSR's recurrence costs
~870 ms at 2160x3840 (vs ~milliseconds for the convs around it) in the
XLA-gather formulation below, making EGVSR ~70x off its GPU-TensorRT
latency.  `backward_warp_fast` routes large single frames through the
gather-free banded hat-matmul Pallas kernel (ops/pallas/warp_band.py),
with a per-frame lax.cond fallback to the exact gather path whenever a
tile's flow range exceeds the kernel's static band — so speed depends on
flow smoothness (guaranteed in EGVSR: flow is bilinearly upsampled from
a /8 grid and tanh-bounded), correctness never does.  The gather path
remains the reference semantics and the differentiable training path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "backward_warp",
    "backward_warp_fast",
    "backward_warp_ac0",
    "grid_sample_bilinear",
]


def grid_sample_bilinear(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with border padding and align_corners=True.

    x: (N, H, W, C); grid: (N, H', W', 2) normalized coords in [-1, 1],
    grid[..., 0] = x (width), grid[..., 1] = y (height).
    """
    n, h, w, c = x.shape
    gh, gw = grid.shape[1], grid.shape[2]
    gf = grid.astype(jnp.float32)

    # align_corners=True: -1 -> 0, +1 -> size-1
    fx = (gf[..., 0] + 1.0) * ((w - 1) / 2.0)
    fy = (gf[..., 1] + 1.0) * ((h - 1) / 2.0)
    fx = jnp.clip(fx, 0.0, w - 1)
    fy = jnp.clip(fy, 0.0, h - 1)

    x0 = jnp.clip(jnp.floor(fx), 0, w - 1)
    y0 = jnp.clip(jnp.floor(fy), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = fx - x0
    wy = fy - y0

    x0i = x0.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)

    # gather per channel over 2D (N, H*W) planes: a (N, H*W, C) gather
    # with C=3 minor gets lane-padded ~32x by XLA TPU (measured 2.87 GB of
    # padding at 4x 540p), OOMing HBM; per-channel gathers keep the minor
    # dim large and unpadded
    planes = [
        x[..., ci].reshape(n, h * w).astype(jnp.float32) for ci in range(c)
    ]

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, gh * gw)  # (N, gh*gw)
        chans = [
            jnp.take_along_axis(p, idx, axis=1).reshape(n, gh, gw)
            for p in planes
        ]
        return jnp.stack(chans, axis=-1)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def backward_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp `x` backward along `flow` (both NHWC; flow has C=2 = (dx, dy)
    in pixels).  Equivalent to sampling x at (u + dx, v + dy)."""
    n, h, w, _ = x.shape
    iu = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)[None, None, :]
    iv = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)[None, :, None]
    gx = iu + flow[..., 0].astype(jnp.float32) / ((w - 1.0) / 2.0)
    gy = iv + flow[..., 1].astype(jnp.float32) / ((h - 1.0) / 2.0)
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample_bilinear(x, grid)


def backward_warp_fast(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    planar_out: bool = False,
    s2d_out: int = 0,
) -> jnp.ndarray:
    """backward_warp with the banded Pallas kernel on the hot path.

    Exact-fallback contract: frames whose flow is too rough for the
    kernel's static band (or shapes the kernel does not tile) take the
    gather path, so the result always equals backward_warp up to
    compute_dtype rounding inside the kernel.  s2d_out=s returns
    space_to_depth(result, s) with the relayout fused into the kernel's
    output tiles (EGVSR recurrence path)."""
    from .nn import space_to_depth
    from .pallas.warp_band import (
        WINDOW_FAST,
        WINDOW_FULL,
        WINDOW_TURBO,
        banded_backward_warp,
        banded_warp_bases_for,
        banded_warp_supported,
    )

    def gather():
        y = backward_warp(x, flow)
        if s2d_out:
            return space_to_depth(y, s2d_out)
        return y.transpose(0, 3, 1, 2) if planar_out else y

    on_tpu = jax.default_backend() == "tpu"
    if not banded_warp_supported(x.shape) or not (on_tpu or interpret):
        return gather()

    windows = (WINDOW_TURBO, WINDOW_FAST, WINDOW_FULL)
    bx, by, (ok_turbo, ok_fast, ok_full) = banded_warp_bases_for(flow, windows)

    def banded(window):
        return lambda: banded_backward_warp(
            x, flow, bx, by, window=window,
            compute_dtype=compute_dtype, interpret=interpret,
            planar_out=planar_out, s2d_out=s2d_out,
        )

    idx = jnp.where(
        ok_turbo, 0, jnp.where(ok_fast, 1, jnp.where(ok_full, 2, 3))
    )
    return jax.lax.switch(
        idx,
        [banded(WINDOW_TURBO), banded(WINDOW_FAST), banded(WINDOW_FULL), gather],
    )


def backward_warp_ac0(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """STN-style warp (reference utils/motion.py:51-91): flow in pixels,
    normalized by size (not size-1), grid_sample(align_corners=False,
    border padding). Used by the VESPCN/SOF-VSR variants."""
    n, h, w, _ = x.shape
    iu = ((jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0)[None, None, :]
    iv = ((jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0)[None, :, None]
    gx = iu + flow[..., 0].astype(jnp.float32) / w * 2.0
    gy = iv + flow[..., 1].astype(jnp.float32) / h * 2.0
    # convert align_corners=False coords to the ac=True sampler's frame:
    # pixel = (g + 1)/2 * size - 0.5  ->  g_ac1 = pixel / ((size-1)/2) - 1
    px = (gx + 1.0) * (w / 2.0) - 0.5
    py = (gy + 1.0) * (h / 2.0) - 0.5
    g1x = px / ((w - 1.0) / 2.0) - 1.0
    g1y = py / ((h - 1.0) / 2.0) - 1.0
    return grid_sample_bilinear(x, jnp.stack([g1x, g1y], axis=-1))
