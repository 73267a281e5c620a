"""Core NN primitives in NHWC for TPU (conv, transposed conv, activations,
pixel shuffle, padding).

Layout note: everything here is NHWC/HWIO — the layout XLA:TPU tiles best —
whereas the reference is NCHW torch (e.g. src/upscale/model/fsrcnn/model.py,
model/realesrgan/factory.py:18-82).  Weight import transposes once at load
time (models/torch_import.py); no per-step layout shuffling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "depthwise_conv2d",
    "prelu",
    "leaky_relu",
    "relu6",
    "pixel_shuffle",
    "pixel_shuffle_mxu",
    "space_to_depth",
    "pad2d",
]


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """2-D convolution. x: NHWC, w: HWIO (I = in_ch // groups)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
) -> jnp.ndarray:
    """Transposed conv with torch ConvTranspose2d semantics.

    x: NHWC; w: HWIO laid out for the *forward* direction of this op
    (I = in_ch of x, O = out_ch), spatially flipped at import time.
    Implemented as an input-dilated convolution: out spatial =
    (in-1)*stride - 2*padding + kernel + output_padding, matching
    e.g. FSRCNN's deconv head (reference model.py:46).
    """
    kh, kw = w.shape[0], w.shape[1]
    pad_lo_h = kh - 1 - padding
    pad_lo_w = kw - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=(
            (pad_lo_h, pad_lo_h + output_padding),
            (pad_lo_w, pad_lo_w + output_padding),
        ),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def depthwise_conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    padding: int = 0,
    pad_mode: str = "zero",
) -> jnp.ndarray:
    """Depthwise conv; w: HWI1 -> applied per channel.  pad_mode 'reflect'
    mirrors torch's padding_mode='reflect' used by the gaussian blur /
    sharpen kernels (reference fsrcnn_upscaler.py:47-48,76-80).

    Small kernels (<= 3x3) run as a fused shift-multiply-add instead of
    a grouped conv: XLA's TPU lowering of C=3 depthwise convs is both
    slow (10.9 -> 5.2 ms for the 1440p HR sharpen on v5e) and silently
    reduced-precision (f32 convs ride the bf16 MXU by default; the
    VPU shift-add keeps full f32)."""
    c = x.shape[-1]
    if pad_mode != "zero" and padding > 0:
        x = pad2d(x, padding, mode=pad_mode)
        padding = 0
    kh, kw, _, _ = w.shape
    if kh * kw <= 9 and w.shape[2] == 1:
        if padding > 0:
            x = pad2d(x, padding, mode="zero")
        h_out = x.shape[-3] - kh + 1
        w_out = x.shape[-2] - kw + 1
        acc = None
        for dy in range(kh):
            for dx in range(kw):
                tap = w[dy, dx, 0].astype(x.dtype)  # (1,) or (c,)
                t = x[..., dy : dy + h_out, dx : dx + w_out, :] * tap
                acc = t if acc is None else acc + t
        return acc
    w = jnp.broadcast_to(w, (kh, kw, 1, c)) if w.shape[-1] != c else w
    return conv2d(x, w, stride=1, padding=padding, groups=c)


def pad2d(x: jnp.ndarray, pad: int | tuple[int, int, int, int], mode: str = "reflect") -> jnp.ndarray:
    """Spatial pad of NHWC. pad: int or (left, right, top, bottom) like
    torch F.pad's last-two-dims order."""
    if isinstance(pad, int):
        left = right = top = bottom = pad
    else:
        left, right, top, bottom = pad
    jmode = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}[mode]
    cfg = [(0, 0)] * (x.ndim - 3) + [(top, bottom), (left, right), (0, 0)]
    return jnp.pad(x, cfg, mode=jmode)


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """PReLU with per-channel alpha (last axis)."""
    a = alpha.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * jnp.asarray(negative_slope, x.dtype))


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0, 6)


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC pixel shuffle matching torch nn.PixelShuffle channel order:
    input channel index (c_out * r + dy) * r + dx -> spatial (dy, dx)."""
    n, h, w, c = x.shape
    r = factor
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r(dy), w, r(dx), c_out
    return x.reshape(n, h * r, w * r, c_out)


def pixel_shuffle_mxu(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """pixel_shuffle as a one-hot lhs-dilated conv — bit-identical, but
    the relayout runs on the MXU instead of XLA's transpose lowering
    (measured at 2160x3840x3: 9.7 -> 6.6 ms).  Use for large HR
    shuffles; the reshape form is fine at small sizes."""
    import numpy as _np

    n, h, w, c = x.shape
    r = factor
    co = c // (r * r)
    w_oh = _np.zeros((r, r, c, co), _np.float32)
    for c0 in range(co):
        for dy in range(r):
            for dx in range(r):
                w_oh[r - 1 - dy, r - 1 - dx, (c0 * r + dy) * r + dx, c0] = 1.0
    return jax.lax.conv_general_dilated(
        x,
        jnp.asarray(w_oh, x.dtype),
        window_strides=(1, 1),
        padding=[(r - 1, r - 1)] * 2,
        lhs_dilation=(r, r),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_onehot_precision(x.dtype),
    )


def pixel_shuffle_folded_dil(zf: jnp.ndarray, r: int, f: int) -> jnp.ndarray:
    """PixelShuffle(r) on a W-folded tensor via ONE (r,1) lhs-dilated
    one-hot conv: the H-upsample rides the conv's input dilation (each
    kernel row serves exactly one output-row parity) and the W-shuffle
    stays in lanes, so no transpose and no HR-resolution 3-lane conv.

    zf: (N, H, Wp, f*c) with c = co*r*r -> (N, r*H, Wp, f*r*co), i.e.
    the shuffled HR image W-folded by f*r (unfold_lanes(out, f*r) is the
    canonical HR frame).  Bit-identical to
    fold(pixel_shuffle(unfold(zf, f), r), f*r); measured 18.4 -> 12.5 ms
    for EGVSR's conv_out+ps4 tail at 720p->4x (round-5 probe)."""
    import numpy as _np

    n, h, wp, fc = zf.shape
    c = fc // f
    co = c // (r * r)
    wz = _np.zeros((r, 1, f * c, f * r * co), _np.float32)
    for a in range(r):
        k = (r - 1) - a
        for u in range(f):
            for b in range(r):
                for ch in range(co):
                    cin = (ch * r + a) * r + b
                    wz[k, 0, u * c + cin, (r * u + b) * co + ch] = 1.0
    return jax.lax.conv_general_dilated(
        zf,
        jnp.asarray(wz, zf.dtype),
        window_strides=(1, 1),
        padding=((r - 1, r - 1), (0, 0)),
        lhs_dilation=(r, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_onehot_precision(zf.dtype),
    )


def _onehot_precision(dtype):
    """One-hot relayout matmuls move values exactly only if the MXU does
    not round the inputs: f32 operands need Precision.HIGHEST (the TPU
    default silently computes f32 convs in bf16); bf16 operands are
    exact at default precision (single-term sums of bf16 values)."""
    return None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST


def space_to_depth(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Inverse of pixel_shuffle with the channel order used by EGVSR's
    space_to_depth (reference utils/net_utils.py:36-47): output channel
    index = (dy * r + dx) * c + c_in ... i.e. block offset major."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h', w', dy, dx, c
    return x.reshape(n, h // r, w // r, r * r * c)


def space_to_depth_mxu(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """space_to_depth with the W axis folded by a free reshape and the H
    axis gathered by a one-hot stride-r conv on the MXU — bit-identical
    to space_to_depth, avoiding XLA's transpose lowering for the big HR
    relayout (the EGVSR step's s2d of the warped 4x frame).

    The (w, c) -> (w/r, r*c) reshape already yields lane order dx*c + c_in;
    the conv's kernel (r, 1) with stride (r, 1) lifts row offset dy into
    the lane dim at block-offset-major order (dy*(r*c) + dx*c + c_in).

    When W divides by 4r, FOUR output column groups ride each conv
    position instead (input view (.., w/4r, 4rc) — 48 lanes at c=3
    instead of 12, so the operand's HBM lane padding drops from 10.7x to
    2.7x; measured 12.8 -> 10.7 ms at 2880x5120, bit-identical)."""
    import numpy as _np

    n, h, w, c = x.shape
    r = factor
    k = 4 if w % (4 * r) == 0 else 1
    xf = x.reshape(n, h, w // (k * r), k * r * c)
    w_oh = _np.zeros((r, 1, k * r * c, k * r * r * c), _np.float32)
    for g in range(k):
        for dy in range(r):
            for i in range(r * c):
                w_oh[dy, 0, g * r * c + i, g * r * r * c + dy * r * c + i] = 1.0
    y = jax.lax.conv_general_dilated(
        xf,
        jnp.asarray(w_oh, x.dtype),
        window_strides=(r, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_onehot_precision(x.dtype),
    )
    return y.reshape(n, h // r, w // r, r * r * c)


def pairfold_conv_weights(w: jnp.ndarray, ci_pad: int = 32) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (3, 3, 2*ci_pad, 2*ci_pad_out) block weights for
    conv2d_pairfold: two adjacent W pixels become one doubled-channel
    pixel, and the 3x3 conv becomes a 3x3 conv over pair-pixels whose
    kernel-width taps are pair shifts z with block (u, v) = w[:, d+1]
    where d = 2z + u - v (zero outside |d| <= 1).

    NOTE: ops/lanefold.py generalizes this scatter to arbitrary fold
    factors (plus stride-2/ps2 forms) — the two weight-fold loops encode
    the same |d| <= 1 band and must stay consistent; this ci_pad variant
    additionally zero-pads narrow channel counts to a 32-lane block.

    MAC count doubles but the conv runs at 2x the channel width — measured net ~1.8x on the
    dev chip for C=32 at 720p (BASELINE.md: C=32 runs at 13 TFLOP/s vs
    C=64 at 46.6)."""
    kh, kw, ci, co = w.shape
    co_pad = ci_pad if co <= ci_pad else co
    wp = jnp.zeros((kh, 3, 2 * ci_pad, 2 * co_pad), w.dtype)
    for z in (-1, 0, 1):
        for u in range(2):
            for v in range(2):
                d = 2 * z + u - v
                if -1 <= d <= 1:
                    wp = wp.at[
                        :, z + 1,
                        u * ci_pad : u * ci_pad + ci,
                        v * co_pad : v * co_pad + co,
                    ].set(w[:, d + 1])
    return wp


def conv2d_pairfold(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
    *, ci_pad: int = 32,
) -> jnp.ndarray:
    """Exact 3x3 SAME conv for narrow channel counts via W-pair folding.

    x: (N, H, W, Ci) with W even; w: (3, 3, Ci, Co) with Ci, Co <= ci_pad.
    Equivalent to conv2d(x, w, b, padding=1); the folded form keeps the
    MXU at 2*ci_pad output lanes instead of Co."""
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = x
    if ci < ci_pad:
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, ci_pad - ci)))
    xp = xp.reshape(n, h, wd // 2, 2 * ci_pad)
    wp = pairfold_conv_weights(w, ci_pad).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xp, wp, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    co_pad = wp.shape[-1] // 2
    y = y.reshape(n, h, wd, co_pad)[..., :co]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
