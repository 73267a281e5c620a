"""Pallas TPU kernel: banded hat-matmul backward warp (gather-free).

Why this exists: EGVSR's recurrence warps the previous HR frame with a
dense optical-flow field (reference src/upscale/model/egvsr/utils/
net_utils.py:50-93, grid_sample bilinear/border/align_corners=True).
A bilinear warp is 4 data-dependent loads per pixel — a gather — and
gathers are the one op class TPUs execute essentially scalar: the XLA
gather formulation costs ~870 ms at 2160x3840 (ops/warp.py), ~70x off
the reference's GPU latency for the whole model.

TPU reformulation — no gathers anywhere:

* The bilinear kernel factorizes per output pixel into an outer product
  of two 2-tap "hat" functions: out[y,x] = sum_r hat(r - sy) *
  (sum_c hat(c - sx) * img[r, c]) with (sy, sx) the sample coordinate.
  The inner (horizontal) contraction over a *band* of columns is a real
  matmul: for each output row, a (window_cols x TX) hat matrix built
  from iota comparisons selects-and-lerps the two source columns of
  every output pixel.  Stacking the C channels along M and the TY tile
  rows along N makes one large MXU matmul per tile; the outer vertical
  2-tap reduce is a per-row weighted sum on the VPU.
* Flow fields in VSR are smooth (FNet's flow is bilinearly upsampled
  from a /8 grid and tanh-bounded to +-24 LR px == +-96 HR px), so per
  output tile the 4 taps of all pixels live in a small window whose
  *position* varies but whose *extent* is tiny.  Each tile's integer
  window base (min displacement, per axis) is computed on-device and
  shipped to the kernel through SMEM; the double-buffered DMA fetches
  the window at a dynamic (tile-grain-aligned) offset.  The static band
  then only needs to cover the *in-tile flow range*, not the worst-case
  displacement.
* Two window variants are compiled: FAST (64 x 384) for smooth flow,
  and FULL (224 x 512), which by construction covers *any* flow within
  the +-MAX_DISP bound — scene cuts and garbage flows stay an order of
  magnitude faster than the gather path instead of falling back to it.
  `banded_warp_bases` classifies the frame on-device; ops/warp.py
  backward_warp_fast switches variants with lax.switch, keeping the
  gather path only for out-of-bound flows (impossible for EGVSR's
  tanh-bounded FNet) and as the differentiable training formulation.
* Border handling ('border' padding = clamp) is folded into an
  edge-replicated pad of the source image, which makes the un-clamped
  hat weights exactly reproduce the clamped bilinear sample, so the
  kernel has no boundary branches at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "banded_warp_supported",
    "banded_warp_bases",
    "banded_warp_bases_for",
    "banded_backward_warp",
    "WINDOW_TURBO",
    "WINDOW_FAST",
    "WINDOW_FULL",
]

# output tile per grid step
TY, TX = 8, 128
# source window (rows x cols) variants: TURBO for the nearly-uniform
# in-tile flow a bilinearly-upsampled FNet field has almost everywhere
# (the hat matmul's FLOPs and the window DMA both scale with rows, so
# 24 vs 64 rows is ~2.7x less work), FAST for smooth flow, FULL sized so
# that any flow within +-MAX_DISP fits regardless of roughness
WINDOW_TURBO = (24, 384)
WINDOW_FAST = (64, 384)
WINDOW_FULL = (224, 512)
# HBM DMA offsets must be tile-aligned (8 sublanes x 128 lanes), so the
# per-tile window bases are rounded down to those grains; the window
# sizes above absorb the rounding (up to +7 rows / +127 cols).
ROW_GRAIN, COL_GRAIN = 8, 128
# displacement magnitude the padding is sized for; tiles that move
# farther than this are reported infeasible (gather fallback)
MAX_DISP = 96
PAD_TOP = 104   # >= MAX_DISP + ROW_GRAIN slack, sublane-aligned
PAD_LEFT = 128  # >= MAX_DISP + COL_GRAIN slack, lane-aligned
# padding below/right sized for the largest window variant
PAD_BOT = WINDOW_FULL[0] + MAX_DISP + ROW_GRAIN - TY
PAD_RIGHT = WINDOW_FULL[1] + COL_GRAIN - TX


def banded_warp_supported(x_shape: tuple[int, ...]) -> bool:
    """Kernel geometry constraint: one frame, tile-divisible extents."""
    n, h, w, _ = x_shape
    return n == 1 and h % TY == 0 and w % TX == 0 and h >= TY and w >= TX


def banded_warp_bases_for(
    flow: jnp.ndarray, windows: tuple[tuple[int, int], ...]
) -> tuple[jnp.ndarray, jnp.ndarray, tuple[jnp.ndarray, ...]]:
    """Per-tile integer window bases from the flow field (on device).

    flow: (1, H, W, 2) with [..., 0] = dx, [..., 1] = dy in pixels.
    Returns (bx, by, oks): int32 (H//TY, W//TX) window bases relative to
    each tile's origin (shared by every variant — the grain is the
    same), and one scalar bool per requested window saying whether every
    tile's taps fit it (False for any window when the flow exceeds the
    +-MAX_DISP padding bound)."""
    _, h, w, _ = flow.shape
    ni, nj = h // TY, w // TX
    fx = flow[0, :, :, 0].astype(jnp.float32).reshape(ni, TY, nj, TX)
    fy = flow[0, :, :, 1].astype(jnp.float32).reshape(ni, TY, nj, TX)

    # sample position relative to the tile origin, per axis
    zx = fx + jnp.arange(TX, dtype=jnp.float32)[None, None, None, :]
    zy = fy + jnp.arange(TY, dtype=jnp.float32)[None, :, None, None]

    def bases_1d(z, extent, wins, grain):
        lo = jnp.floor(z.min(axis=(1, 3)))
        hi = jnp.floor(z.max(axis=(1, 3))) + 1.0  # +1: second bilinear tap
        base = jnp.floor(lo / grain) * grain  # DMA-grain aligned
        in_bound = (lo >= -(MAX_DISP + 1)) & (hi <= extent - 1 + MAX_DISP + 1)
        oks = [jnp.all((hi - base + 1.0 <= win) & in_bound) for win in wins]
        return base.astype(jnp.int32), oks

    bx, okx = bases_1d(zx, TX, [wn[1] for wn in windows], COL_GRAIN)
    by, oky = bases_1d(zy, TY, [wn[0] for wn in windows], ROW_GRAIN)
    return bx, by, tuple(a & b for a, b in zip(okx, oky))


def banded_warp_bases(
    flow: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Legacy 2-variant form: (bx, by, ok_fast, ok_full)."""
    bx, by, (ok_fast, ok_full) = banded_warp_bases_for(
        flow, (WINDOW_FAST, WINDOW_FULL)
    )
    return bx, by, ok_fast, ok_full


def _s2d_perm(s: int, c: int) -> "np.ndarray":
    """(s*c*TX, (TX//s)*s*s*c) one-hot permutation: row block (dy*c+ci)
    lane l = s*xw+dx  ->  dest lane xw*(s*s*c) + (dy*s+dx)*c + ci.  A
    one-hot bf16 matmul moves each value exactly (single-term sums), so
    the in-kernel s2d relayout rides the MXU instead of unsupported
    lane-split reshapes."""
    import numpy as _np

    rows = s * c * TX
    cols = (TX // s) * s * s * c
    p = _np.zeros((rows, cols), _np.float32)
    for dy in range(s):
        for ci in range(c):
            for l in range(TX):
                xw, dx = divmod(l, s)
                src = (dy * c + ci) * TX + l
                dst = xw * (s * s * c) + (dy * s + dx) * c + ci
                p[src, dst] = 1.0
    return p


def _kernel(
    bx_ref, by_ref, x_hbm, fx_ref, fy_ref, *rest, ni, nj, c, rw, cw,
    s2d=0,
):
    if s2d:
        perm_ref, out_ref, buf, sems = rest
    else:
        (out_ref, buf, sems) = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * nj + j
    total = ni * nj

    def dma_for(step, slot):
        ii = step // nj
        jj = step % nj
        rs = pl.multiple_of(ii * TY + PAD_TOP + by_ref[ii, jj], ROW_GRAIN)
        cs = pl.multiple_of(jj * TX + PAD_LEFT + bx_ref[ii, jj], COL_GRAIN)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(rs, rw), pl.ds(cs, cw)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _():
        dma_for(t, 0).start()

    @pl.when(t + 1 < total)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, t % 2).wait()
    slot = t % 2

    dtype = buf.dtype
    a = buf[slot].reshape(c * rw, cw)

    # horizontal hat matrix: column k of the window contributes
    # hat(k - sample_x) to output pixel (row-stacked along N)
    bxc = bx_ref[i, j].astype(jnp.float32)
    xrel = jax.lax.broadcasted_iota(jnp.int32, (TY, TX), 1).astype(jnp.float32)
    txf = (xrel + fx_ref[:, :] - bxc).reshape(1, TY * TX)
    kx = jax.lax.broadcasted_iota(jnp.int32, (cw, TY * TX), 0).astype(jnp.float32)
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(kx - txf)).astype(dtype)

    # float32 mode must not silently run the MXU in bf16 (the TPU default)
    prec = None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    m = jnp.dot(a, hx, preferred_element_type=jnp.float32, precision=prec)

    # vertical 2-tap hat reduce on the VPU
    byc = by_ref[i, j].astype(jnp.float32)
    yrel = (
        jax.lax.broadcasted_iota(jnp.int32, (TY, TX), 0).astype(jnp.float32)
        + fy_ref[:, :]
        - byc
    )
    ky = jax.lax.broadcasted_iota(jnp.int32, (rw, TX), 0).astype(jnp.float32)
    if not s2d:
        for ci in range(c):
            rows = m[ci * rw : (ci + 1) * rw, :]
            for jj in range(TY):
                mv = rows[:, jj * TX : (jj + 1) * TX]
                wv = jnp.maximum(0.0, 1.0 - jnp.abs(ky - yrel[jj, :][None, :]))
                out_ref[ci, jj, :] = jnp.sum(wv * mv, axis=0)
        return

    # space-to-depth fused output: concatenate the (dy, ci) vectors per
    # s2d row at 128-aligned lane offsets (legal) and let a one-hot
    # permutation matmul interleave them into the standard
    # (dy, dx, c) block-offset-major order (ops.space_to_depth)
    vals = []
    for ci in range(c):
        rows = m[ci * rw : (ci + 1) * rw, :]
        per_jj = []
        for jj in range(TY):
            mv = rows[:, jj * TX : (jj + 1) * TX]
            wv = jnp.maximum(0.0, 1.0 - jnp.abs(ky - yrel[jj, :][None, :]))
            per_jj.append(jnp.sum(wv * mv, axis=0))  # (TX,)
        vals.append(per_jj)
    s = s2d
    # f32 one-hot matmuls at HIGHEST precision: move each f32 value
    # exactly (single-term sums), identical to the non-s2d output path.
    # One matmul per (dy, ci) source block: sublane-stacked (TY//s, TX)
    # x its (TX, out_cols) permutation block (1-D lane concats are not
    # lowerable, so the blocks are contracted separately and summed).
    acc = None
    for dy in range(s):
        for ci in range(c):
            k = dy * c + ci
            vk = jnp.stack(
                [vals[ci][s * dy2 + dy] for dy2 in range(TY // s)]
            )  # (TY//s, TX)
            part = jnp.dot(
                vk, perm_ref[k * TX : (k + 1) * TX, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            acc = part if acc is None else acc + part
    out_ref[0] = acc


@partial(jax.jit, static_argnames=(
    "window", "compute_dtype", "interpret", "planar_out", "s2d_out"))
def banded_backward_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    bx: jnp.ndarray,
    by: jnp.ndarray,
    *,
    window: tuple[int, int] = WINDOW_FAST,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    planar_out: bool = False,
    s2d_out: int = 0,
) -> jnp.ndarray:
    """Warp x (1, H, W, C) backward along flow (1, H, W, 2), equivalent to
    ops.warp.backward_warp, given per-tile window bases (bx, by) from
    banded_warp_bases.  Only valid when banded_warp_bases reported ok for
    this window variant; callers guard with lax.switch/cond.
    compute_dtype=float32 matches the gather path to ~1e-6; bfloat16 is
    the fast inference mode.  planar_out returns (1, C, H, W) — the
    kernel's native layout.  s2d_out=s returns
    space_to_depth(warp(x), s) as (1, H//s, W//s, s*s*C) with the
    relayout done per-tile via one-hot permutation matmuls.  MEASURED
    NEGATIVE for the EGVSR hot path (165 vs 112.6 ms full-step at 720p —
    the 12 tiny per-tile matmuls cost more than XLA's 16 ms relayout);
    kept because it is exact, tested, and the right building block if a
    future fused warp+conv_in kernel amortizes the permutation."""
    n, h, w, c = x.shape
    assert banded_warp_supported(x.shape), x.shape
    if s2d_out:
        assert planar_out is False and TY % s2d_out == 0 and TX % s2d_out == 0
    rw, cw = window
    ni, nj = h // TY, w // TX

    # edge-replicated pad == 'border' (clamp) sampling semantics
    pad_r = PAD_RIGHT + (-(w + PAD_LEFT + PAD_RIGHT) % COL_GRAIN)
    xp = jnp.pad(
        x[0].transpose(2, 0, 1),
        ((0, 0), (PAD_TOP, PAD_BOT), (PAD_LEFT, pad_r)),
        mode="edge",
    ).astype(compute_dtype)

    fx = flow[0, :, :, 0].astype(jnp.float32)
    fy = flow[0, :, :, 1].astype(jnp.float32)

    s = s2d_out
    if s:
        # (tile-row, s2d-row-in-tile, flat cols): the middle block dim
        # equals the array dim (TPU block rule), last dim is 128-aligned
        out_specs = pl.BlockSpec(
            (1, TY // s, (TX // s) * s * s * c),
            lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (ni, TY // s, (w // s) * s * s * c), jnp.float32
        )
    else:
        out_specs = pl.BlockSpec(
            (c, TY, TX), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((c, h, w), jnp.float32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    ]
    operands = [bx, by, xp, fx, fy]
    if s:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(_s2d_perm(s, c)))

    out = pl.pallas_call(
        partial(_kernel, ni=ni, nj=nj, c=c, rw=rw, cw=cw, s2d=s),
        grid=(ni, nj),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, c, rw, cw), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*operands)

    if s:
        return out.reshape(1, h // s, w // s, s * s * c).astype(x.dtype)  # noqa: E501 — (ni, TY//s, flat) is contiguous in exactly this order
    if planar_out:
        return out[None].astype(x.dtype)
    return out.transpose(1, 2, 0)[None].astype(x.dtype)
