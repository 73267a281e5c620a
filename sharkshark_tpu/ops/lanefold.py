"""Lane-folded 3x3 convolutions for narrow-channel stages.

Why: XLA's TPU conv lowering runs a C=32 3x3 conv at ~13 TFLOP/s (the
MXU wants 128 input/output lanes; narrow channel counts waste ~4x of the
array) while the SAME logical conv expressed over "super-pixels" — f
adjacent W pixels viewed as one 128-lane pixel — runs as a dense
(3, 3, f*C, f*C) conv at the C=128 rate.  The folded kernel carries f x
the MACs (the (u, v) sub-pixel blocks are zero outside |shift| <= 1) but
measured on the dev v5e the net is ~2x faster for C=32 at 720p
(chained: 8.5 -> 4.3 ms/conv at N=4; /tmp probe recorded in
BASELINE.md round 3).  This generalizes ops.conv2d_pairfold (the f=2
case) and extends it to stride-2 downsampling convs and conv+ps2
upsampling convs so a whole encoder/decoder stage can stay folded.

Used by models/bsvd.py's warm chunk path for the full-resolution C<=32
stage (inc/outc/down0/down1/up2/up1 of each DenBlock — reference
src/upscale/model/bsvd/model.py:339-424 defines the stage structure).

Folded layout: (N, H, W, C) <-> (N, H, W//f, f*C), lane u*C + c holding
original pixel (w*f + u, c) — a plain row-major reshape, so entering and
leaving folded space is free.

All transforms are exact re-parametrizations (same sums, extra terms are
multiplications by structural zeros); f32 parity vs the plain conv is
~1e-6 (accumulation order differs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "fold_lanes",
    "unfold_lanes",
    "conv3x3_folded",
    "conv_stride2_folded",
    "conv_ps2_folded",
    "lanefold_enabled",
]


def lanefold_enabled(w_dim: int, f: int = 2) -> bool:
    """Shared routing gate for folded conv bodies (SRVGG / EGVSR srnet /
    BSVD full-res stage).  SHARKSHARK_LANEFOLD: '1' (default) = TPU
    only, 'force' = everywhere (CPU parity tests), '0' = off."""
    import os

    mode = os.environ.get("SHARKSHARK_LANEFOLD", "1")
    if mode == "0" or w_dim % f:
        return False
    return mode == "force" or jax.default_backend() == "tpu"


def fold_lanes(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(..., W, C) -> (..., W//f, f*C); free (row-major reshape)."""
    *lead, w, c = x.shape
    return x.reshape(*lead, w // f, f * c)


def unfold_lanes(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(..., Wp, f*C) -> (..., Wp*f, C); free (row-major reshape)."""
    *lead, wp, fc = x.shape
    return x.reshape(*lead, wp * f, fc // f)


def _fold3x3_weights(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3, 3, ci, co) -> (3, 3, f*ci, f*co) stride-1 folded kernel.

    Output super-pixel J sub-pixel v reads original columns J*f + v + dx;
    the contribution of input super-pixel J+z sub-pixel u is w[dy, dx]
    with dx = f*z + u - v, zero outside |dx| <= 1."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3), w.shape
    out = jnp.zeros((3, 3, f * ci, f * co), w.dtype)
    for z in (-1, 0, 1):
        for u in range(f):
            for v in range(f):
                dx = f * z + u - v
                if -1 <= dx <= 1:
                    out = out.at[
                        :, z + 1, u * ci : (u + 1) * ci, v * co : (v + 1) * co
                    ].set(w[:, dx + 1])
    return out


def conv3x3_folded(
    xf: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None, f: int
) -> jnp.ndarray:
    """3x3 SAME stride-1 conv on a folded tensor.

    xf: (N, H, W//f, f*ci); w: (3, 3, ci, co) unfolded HWIO.
    Returns (N, H, W//f, f*co).  Equals fold(conv2d(unfold(xf), w, b,
    padding=1)).

    Narrow-input note (measured-negative, round 5): a 9-tap im2col
    lowering for f*ci <= 64 inputs (BSVD temp1 inc0 at 16 lanes) beats
    this conv in ISOLATION (2.47 vs 2.77 ms/frame) but loses ~2.4
    ms/frame inside the full warm chunk — the (N, H, Wp, 9*f*ci) tap
    concat breaks XLA's fusion with the surrounding graph.  Plain/f8/f16
    refolds are also worse; the f=4 folded conv stands."""
    wf = _fold3x3_weights(w, f).astype(xf.dtype)
    y = jax.lax.conv_general_dilated(
        xf, wf, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + jnp.tile(b, f).astype(y.dtype)
    return y


def conv3x3_folded_hsplit(
    xf: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None, f: int,
    parts: int = 2,
) -> jnp.ndarray:
    """conv3x3_folded with each image split into `parts` row bands that
    ride the conv's BATCH dim (1-row zero/neighbour halos keep it exact:
    a zero halo row at the global edges reproduces the conv's own zero
    padding, an interior halo row is the neighbour band's edge row).
    XLA's conv lowering on v5e underutilizes at small batch; N=2x at
    half the rows measured ~2x the TFLOP/s at the BSVD chunk's T=4
    shapes."""
    n, h, wp, L = xf.shape
    assert h % parts == 0, (h, parts)
    hh = h // parts
    wf = _fold3x3_weights(w, f).astype(xf.dtype)
    z = jnp.zeros((n, 1, wp, L), xf.dtype)
    xpad = jnp.concatenate([z, xf, z], axis=1)
    xs = jnp.concatenate(
        [xpad[:, i * hh : i * hh + hh + 2] for i in range(parts)], axis=0
    )
    y = jax.lax.conv_general_dilated(
        xs, wf, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jnp.concatenate([y[i * n : (i + 1) * n] for i in range(parts)], axis=1)
    if b is not None:
        y = y + jnp.tile(b, f).astype(y.dtype)
    return y


def _fold_stride2_weights(w: jnp.ndarray, f_in: int) -> jnp.ndarray:
    """(3, 3, ci, co) -> (3, 2, f_in*ci, (f_in//2)*co) folded stride-2
    kernel.  Output sub-pixel v (original out col f_out*J + v) reads
    input cols 2*(f_out*J + v) + dx = f_in*J + 2v + dx, so the block for
    input super-pixel J+z sub-pixel u is w[dy, dx] with
    dx = f_in*z + u - 2v; only z in {-1, 0} can land in |dx| <= 1."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3) and f_in % 2 == 0, (w.shape, f_in)
    f_out = f_in // 2
    out = jnp.zeros((3, 2, f_in * ci, f_out * co), w.dtype)
    for z in (-1, 0):
        for u in range(f_in):
            for v in range(f_out):
                dx = f_in * z + u - 2 * v
                if -1 <= dx <= 1:
                    out = out.at[
                        :, z + 1, u * ci : (u + 1) * ci, v * co : (v + 1) * co
                    ].set(w[:, dx + 1])
    return out


def conv_stride2_folded(
    xf: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None, f_in: int
) -> jnp.ndarray:
    """3x3 stride-2 conv (padding 1) on a folded tensor, folded output.

    xf: (N, H, W//f_in, f_in*ci); returns (N, H//2, W//(2*f_out)... i.e.
    (N, H//2, W//f_in, f_out*co) with f_out = f_in // 2 — the same
    super-pixel count, half the pixels per super-pixel.  Equals
    fold(conv2d(unfold(xf), w, b, stride=2, padding=1), f_out)."""
    wf = _fold_stride2_weights(w, f_in).astype(xf.dtype)
    y = jax.lax.conv_general_dilated(
        xf, wf, (2, 1), ((1, 1), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + jnp.tile(b, f_in // 2).astype(y.dtype)
    return y


def _fold_ps2_weights(w: jnp.ndarray, f_in: int) -> jnp.ndarray:
    """(3, 3, ci, 4*co) conv-then-PixelShuffle(2) -> folded fused kernel
    (3, 3, f_in*ci, 2*f_out*co), f_out = 2*f_in.

    torch PixelShuffle(2) channel order: conv channel c*4 + a*2 + b_
    lands on output pixel (2y+a, 2x+b_) (ops.pixel_shuffle).  Output
    lanes are a*(f_out*co) + k*co + c with k = 2u + b_ (output sub-pixel
    within the super-column), so rows for a=0/a=1 sit in the top/bottom
    half of the lane dim and conv_ps2_folded can interleave them with
    one reshape+transpose."""
    kh, kw, ci, co4 = w.shape
    assert (kh, kw) == (3, 3) and co4 % 4 == 0, w.shape
    co = co4 // 4
    f_out = 2 * f_in
    out = jnp.zeros((3, 3, f_in * ci, 2 * f_out * co), w.dtype)
    for z in (-1, 0, 1):
        for up in range(f_in):      # input sub-pixel of the tap
            for u in range(f_in):   # input sub-pixel the output hangs off
                dx = f_in * z + up - u
                if not -1 <= dx <= 1:
                    continue
                for a in (0, 1):
                    for b_ in (0, 1):
                        k = 2 * u + b_
                        out = out.at[
                            :, z + 1,
                            up * ci : (up + 1) * ci,
                            a * f_out * co + k * co : a * f_out * co + (k + 1) * co,
                        ].set(w[:, dx + 1, :, a * 2 + b_ :: 4].reshape(3, ci, co))
    return out


def _fold_ps2_weights_dil(w: jnp.ndarray, f_in: int) -> jnp.ndarray:
    """(3, 3, ci, 4*co) conv-then-PixelShuffle(2) -> (6, 3, f_in*ci,
    f_out*co) kernel for the lhs-dilated (H-upsampling) lowering.

    With lhs_dilation=(2,1) and H padding (3,3), output row r = 2y+a
    reads dilated rows r + k - 3 which are nonzero only when even, i.e.
    k = 3 + 2*dy - a for dy in {-1,0,1} — so each kernel row k serves
    exactly one output-row parity a = (k+1) % 2 and no MXU work is
    wasted beyond the conv engine's own handling of the dilated zeros.
    Lane order matches _fold_ps2_weights AFTER its interleave: output
    lane (2u+b_)*co + c at row parity a takes conv channel c*4+a*2+b_."""
    kh, kw, ci, co4 = w.shape
    assert (kh, kw) == (3, 3) and co4 % 4 == 0, w.shape
    co = co4 // 4
    f_out = 2 * f_in
    out = jnp.zeros((6, 3, f_in * ci, f_out * co), w.dtype)
    for k in range(6):
        a = (k + 1) % 2
        dy = (k - 3 + a) // 2
        for z in (-1, 0, 1):
            for up in range(f_in):
                for u in range(f_in):
                    dx = f_in * z + up - u
                    if not -1 <= dx <= 1:
                        continue
                    for b_ in (0, 1):
                        kk = 2 * u + b_
                        out = out.at[
                            k, z + 1,
                            up * ci : (up + 1) * ci,
                            kk * co : (kk + 1) * co,
                        ].set(w[dy + 1, dx + 1, :, a * 2 + b_ :: 4])
    return out


def conv_ps2_folded(
    xf: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None, f_in: int
) -> jnp.ndarray:
    """Fused 3x3 SAME conv + PixelShuffle(2), folded in and out.

    xf: (N, H, W//f_in, f_in*ci); w: (3, 3, ci, 4*co) unfolded.  Returns
    (N, 2H, W//f_in, 2*f_in*co) — folded with f_out = 2*f_in over the
    doubled width.  Equals fold(pixel_shuffle(conv2d(unfold(xf), w, b,
    padding=1), 2), 2*f_in).

    Lowering: one lhs-dilated conv (H-upsample fused into the conv, the
    transposed-conv trick) instead of conv + reshape + row-interleave
    transpose.  The transpose materialized a full extra HBM round trip
    AND blocked XLA's conv/side-input fusion with the skip-add that
    follows in both BSVD up stages — measured on the dev v5e the dilated
    lowering is ~17% faster in isolation and removes the downstream
    unfused-add pass (round-5 stage probe; BASELINE.md)."""
    n, h, wp, _ = xf.shape
    co = w.shape[-1] // 4
    f_out = 2 * f_in
    wf = _fold_ps2_weights_dil(w, f_in).astype(xf.dtype)
    y = jax.lax.conv_general_dilated(
        xf, wf, (1, 1), ((3, 3), (1, 1)), lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, 2H, Wp, f_out*co), rows already parity-interleaved
    if b is not None:
        # conv bias c*4 + a*2 + b_ -> lane k*co + c for every (a, k);
        # after interleave every lane row uses sub-pixel bias b[c*4+a*2+b_]
        # which depends on (a, b_): rows alternate a, lanes cycle b_.
        ba = [
            jnp.concatenate(
                [b[a * 2 + b_ :: 4] for u in range(f_in) for b_ in (0, 1)]
            )
            for a in (0, 1)
        ]
        brow = jnp.stack(ba)  # (2, f_out*co)
        y = y + jnp.tile(brow, (h, 1))[None, :, None, :].astype(y.dtype)
    return y
