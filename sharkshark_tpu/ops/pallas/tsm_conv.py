"""Pallas TPU kernel: temporal-shift 3x3 conv for BSVD's buffered convs.

Why: the XLA formulation of a temporal-shift conv (models/bsvd.py
_shift_conv_chunk, capability parity with the reference's
ShiftConv/BiBufferConv, reference model/bsvd/model.py:22-138) must
materialize the channel-mixed input `[x_{t+1}[:fold] | x_{t-2}[f:2f] |
x_t[2f:]]` as a full tensor before the conv reads it — one extra HBM
write + read per conv.  Measured on v5e at 720p/T=4 this construction
costs 9.4 ms/frame across the 16 buffered convs; XLA variants of the
construction (xe-buffer, sliced-weight sum) measure the same or worse
(BASELINE.md round-2 notes).  This kernel builds the mix in VMEM on the
way into the MXU, so HBM traffic is the conv's own read and write.

Design:
  - Lane packing. Mosaic pads an HBM operand's minor dim to 128 lanes,
    which would double DMA bytes at C=64; instead `fold_w = 128 // C`
    adjacent width pixels are viewed as one 128-lane super-pixel (a free
    XLA reshape), and the 3x3 conv becomes 3(dy) x 3(pair-shift z) MXU
    matmuls against (128, 128) block weights W[dy][z][u*C:(u+1)*C,
    v*C:(v+1)*C] = w3x3[dy, z*fold_w + u - v + 1] (zero outside |.|<=1)
    — 2x MAC count at C=64 but full MXU width, and every DMA is
    lane-aligned.  C=128 degenerates to the plain formulation.
  - Grid (row-tile, t) with t innermost and a 4-slot VMEM ring of
    (tile_h+2)-row frame stripes: each step DMAs ONE new frame stripe
    (prefetched one step ahead, slot t+1 never aliases the live t-2,
    t-1, t slots) while fut/rest/left read the ring at t, t-1, t-2 —
    total input traffic (T+2)/T of the tensor instead of 3x.
  - Channel mix by lane-index select (Mosaic rejects lane-offset
    concatenates): lanes [0,fold) of each C-block read the future frame,
    [fold,2fold) the t-2 frame, [2fold,C) the t-1 frame.
  - f32 accumulate, bias + activation, bf16 store.

Steady-state (warm) live path only — warm-up masking stays in the XLA
path, which also remains the fallback for CPU, odd shapes, and N > 1.
Production wiring: models/bsvd.py _mem_chunk(warm=True) routes supported
shift convs here (gated by SHARKSHARK_TSM, default on for the channel
widths where the fused kernel beats XLA conv + input construction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tsm_conv", "tsm_conv_supported", "pack_weights"]


NSLOT = 4
# VMEM budget for ring + mixed + acc + out tiles (bytes); leaves head-
# room under the ~16 MB/core for weights and compiler temporaries
_VMEM_BUDGET = 12_000_000


def pick_tile_h(h: int, wp: int | None = None) -> int | None:
    """Largest divisor row-tile that fits the VMEM budget.

    Grid-step overhead on this chip (~30 us/step: DMA issue + scheduling)
    dwarfs the per-step MXU/DMA work at small tiles, so bigger is
    strictly better until VMEM runs out.  wp = W // fold_w (super-pixel
    width); when unknown a 720p-class wp=320 is assumed."""
    wp = wp or 320
    # bytes as fn of tile_h: 4 ring slots + mixed (+2 halo rows/cols,
    # bf16) + f32 accumulator + out tile
    def vmem(th):
        return (
            (th + 2) * wp * 128 * 2 * NSLOT
            + (th + 2) * (wp + 2) * 128 * 2
            + th * wp * 128 * (4 + 2)
        )

    best = None
    for th in range(4, min(h // 2, 64) + 1):
        if h % th == 0 and vmem(th) <= _VMEM_BUDGET:
            best = th
    # a height whose only fitting divisor is tiny (e.g. 316 -> 4) would
    # run 2-3x more grid steps than the XLA path is worth — reject and
    # let the caller fall back (the ~30us/step overhead dominates then)
    if best is not None and (best < 6 or h // best > 40):
        return None
    return best


def tsm_conv_supported(x_shape: tuple[int, ...], dtype=None) -> bool:
    """(T, N, H, W, C) supported by the kernel?  dtype, when given, must
    be bf16 — the VMEM budget in pick_tile_h assumes 2-byte elements
    (f32 rings would overflow VMEM at the chosen tile)."""
    if dtype is not None and dtype != jnp.bfloat16:
        return False
    if len(x_shape) != 5:
        return False
    t, n, h, w, c = x_shape
    if not (n == 1 and t >= 2 and c in (64, 128)):
        return False
    fold_w = 128 // c
    return w % fold_w == 0 and pick_tile_h(h, w // fold_w) is not None


def pack_weights(w: jnp.ndarray) -> np.ndarray:
    """(3, 3, C, C) HWIO -> (9, 128, 128) block pair-shift weights.

    Index [3*dy + (z+1)]: contribution of super-pixel b+z to super-pixel
    b at kernel row dy.  Block (u, v) (input sub-pixel u, output
    sub-pixel v) is w[dy, d+1] where d = z*fold_w + u - v, zero unless
    |d| <= 1."""
    kh, kw, ci, co = w.shape
    fold_w = 128 // ci
    out = jnp.zeros((9, 128, 128), w.dtype)
    for dy in range(3):
        for z in (-1, 0, 1):
            for u in range(fold_w):
                for v in range(fold_w):
                    d = z * fold_w + u - v
                    if -1 <= d <= 1:
                        out = out.at[
                            3 * dy + z + 1,
                            u * ci : (u + 1) * ci,
                            v * co : (v + 1) * co,
                        ].set(w[dy, d + 1])
    return out


def _kernel(x_ref, hist_ref, w_ref, b_ref, out_ref, ring, mixed, sems,
            *, tile_h: int, n_row_tiles: int, n_t: int, act: str,
            c_orig: int):
    i = pl.program_id(0)
    t = pl.program_id(1)
    H = n_row_tiles * tile_h
    Wp = out_ref.shape[3]          # super-pixel width
    fold = c_orig // 8

    def slot(f):
        return jax.lax.rem(f + 2 * NSLOT, NSLOT)

    def stripe(ref, src0, s, do_start):
        """Start (or wait for) the (tile_h+2)-row halo stripe DMA of the
        frame whose first row in `ref` is src0, into ring slot s.  The
        wait path re-creates the identical copy descriptor.  Halo rows
        outside the image are pre-zeroed on start."""

        def mk(row0, dst0, rows):
            return pltpu.make_async_copy(
                ref.at[pl.ds(row0, rows)],
                ring.at[s, pl.ds(dst0, rows)],
                sems.at[s],
            )

        @pl.when(i == 0)
        def _():
            cp = mk(src0, 1, tile_h + 1)
            if do_start:
                ring[s, 0:1] = jnp.zeros_like(ring[s, 0:1])
                cp.start()
            else:
                cp.wait()

        @pl.when((i > 0) & (i < n_row_tiles - 1))
        def _():
            cp = mk(src0 + i * tile_h - 1, 0, tile_h + 2)
            if do_start:
                cp.start()
            else:
                cp.wait()

        @pl.when(i == n_row_tiles - 1)
        def _():
            cp = mk(src0 + H - tile_h - 1, 0, tile_h + 1)
            if do_start:
                ring[s, tile_h + 1 :] = jnp.zeros_like(ring[s, tile_h + 1 :])
                cp.start()
            else:
                cp.wait()

    @pl.when(t == 0)
    def _():
        # fresh row-tile: history frames t-2 (hist rows [0, H)), t-1
        # (hist rows [H, 2H)), current frame 0, and prefetch frame 1
        stripe(hist_ref, 0, slot(-2), True)
        stripe(hist_ref, H, slot(-1), True)
        stripe(x_ref, 0, slot(0), True)
        if n_t > 1:
            stripe(x_ref, H, slot(1), True)
        stripe(hist_ref, 0, slot(-2), False)
        stripe(hist_ref, H, slot(-1), False)
        stripe(x_ref, 0, slot(0), False)

    @pl.when(t > 0)
    def _():
        @pl.when(t + 1 < n_t)
        def _():
            stripe(x_ref, (t + 1) * H, slot(t + 1), True)

        # frame t's stripe was prefetched one step earlier
        stripe(x_ref, t * H, slot(t), False)

    fut = ring[slot(t)]
    rest = ring[slot(t - 1)]
    left = ring[slot(t - 2)]

    lane = jax.lax.broadcasted_iota(jnp.int32, fut.shape, 2) & (c_orig - 1)
    mix = jnp.where(lane < fold, fut, jnp.where(lane < 2 * fold, left, rest))
    mixed[:, 0:1, :] = jnp.zeros_like(mixed[:, 0:1, :])
    mixed[:, Wp + 1 :, :] = jnp.zeros_like(mixed[:, Wp + 1 :, :])
    mixed[:, 1 : Wp + 1, :] = mix

    acc = jnp.zeros((tile_h * Wp, 128), jnp.float32)
    for dy in range(3):
        for zi in range(3):
            a = mixed[dy : dy + tile_h, zi : zi + Wp, :].reshape(tile_h * Wp, 128)
            acc = acc + jnp.dot(
                a, w_ref[3 * dy + zi], preferred_element_type=jnp.float32
            )

    y = acc + b_ref[0].astype(jnp.float32)
    if act == "relu6":
        y = jnp.clip(y, 0.0, 6.0)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    out_ref[0, 0] = y.astype(out_ref.dtype).reshape(tile_h, Wp, 128)


@partial(jax.jit, static_argnames=("act", "tile_h", "interpret"))
def tsm_conv(
    x: jnp.ndarray,
    prev1: jnp.ndarray,
    left0: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    act: str = "relu6",
    tile_h: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Temporal-shift 3x3 conv over a chunk (steady-state / warm path).

    x: (T, H, W, C); prev1: (H, W, C) frame t-1; left0: (H, W, fold)
    fold-slice of frame t-2 (the BiBufferConv 'left' state); w: (3,3,C,C)
    HWIO; b: (C,). Returns (T, H, W, C) activation output, equivalent to
    models.bsvd._shift_conv_chunk's warm regime (bf16 MXU accumulate).
    """
    t, h, wd, c = x.shape
    fold = c // 8
    fold_w = 128 // c
    wp_ = wd // fold_w
    if tile_h is None:
        tile_h = pick_tile_h(h, wd // fold_w)
        if tile_h is None:
            raise ValueError(f"no valid tile_h for H={h}")
    n_row_tiles = h // tile_h
    wpk = pack_weights(w.astype(jnp.bfloat16))
    b_lane = jnp.tile(b.astype(jnp.float32), fold_w).reshape(1, 128)

    # history frames stacked as one (2H, W', 128) plane: row block 0 is
    # the t-2 frame (only lanes [fold, 2fold) of each C-block are read),
    # row block 1 is the t-1 frame
    left_full = (
        jnp.zeros((h, wd, c), x.dtype)
        .at[..., fold : 2 * fold]
        .set(left0.astype(x.dtype))
    )
    hist = jnp.concatenate([left_full, prev1.astype(x.dtype)], axis=0)
    hist = hist.reshape(2 * h, wp_, 128)
    xv = x.reshape(t, h, wd, c).reshape(t * h, wp_, 128)

    grid = (n_row_tiles, t)
    out = pl.pallas_call(
        partial(
            _kernel,
            tile_h=tile_h,
            n_row_tiles=n_row_tiles,
            n_t=t,
            act=act,
            c_orig=c,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x (T*H, W', 128)
            pl.BlockSpec(memory_space=pl.ANY),      # hist (2H, W', 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (9,128,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1,128)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_h, wp_, 128),
            lambda i_, t_: (t_, i_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, n_row_tiles, tile_h, wp_, 128), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, tile_h + 2, wp_, 128), x.dtype),   # ring
            pltpu.VMEM((tile_h + 2, wp_ + 2, 128), x.dtype),      # mixed
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        interpret=interpret,
    )(xv, hist, wpk, b_lane)
    return out.reshape(t, h, wd, c)


# --------------------------------------------------------------------------
# Pair-fused variant: BSVD's mem blocks are PAIRS of temporal-shift convs
# (c1 -> c2, reference model.py MemCvBlock). Fusing both into one kernel
# keeps the intermediate y1 = act(conv1(mix1(x))) resident in a VMEM ring
# across the t loop — y1 never touches HBM (the single-conv kernel pays a
# full write + (T+2)/T read of it), and the per-pallas_call overhead is
# paid once per pair instead of twice.


def pick_tile_h_pair(h: int, wp: int | None = None) -> int | None:
    """Largest divisor row-tile fitting the pair kernel's VMEM budget
    (two rings, two mixed buffers, two accumulators, two out tiles)."""
    wp = wp or 320

    def vmem(th):
        return (
            (th + 4) * wp * 128 * 2 * NSLOT      # x ring (halo 2)
            + (th + 2) * wp * 128 * 2 * NSLOT    # y1 ring (halo 1)
            + (th + 4) * (wp + 2) * 128 * 2      # mixed1
            + (th + 2) * (wp + 2) * 128 * 2      # mixed2
            + (th + 2) * wp * 128 * 4            # acc1 (f32)
            + th * wp * 128 * 4                  # acc2 (f32)
            + 2 * th * wp * 128 * 2 * 2          # out + carry tiles, 2x buffered
        )

    best = None
    for th in range(4, min(h // 2, 64) + 1):
        if h % th == 0 and vmem(th) <= _VMEM_BUDGET:
            best = th
    if best is not None and (best < 4 or h // best > 64):
        return None
    return best


def tsm_conv_pair_supported(x_shape: tuple[int, ...], dtype=None) -> bool:
    if dtype is not None and dtype != jnp.bfloat16:
        return False
    if len(x_shape) != 5:
        return False
    t, n, h, w, c = x_shape
    if not (n == 1 and t >= 2 and c in (64, 128)):
        return False
    fold_w = 128 // c
    return w % fold_w == 0 and pick_tile_h_pair(h, w // fold_w) is not None


def _pair_kernel(x_ref, hist1_ref, hist2_ref, w_ref, b_ref,
                 out_ref, carry_ref, ring_x, ring_y1, mixed1, mixed2,
                 sems_x, sems_h,
                 *, tile_h: int, n_row_tiles: int, n_t: int, act: str,
                 c_orig: int):
    i = pl.program_id(0)
    t = pl.program_id(1)
    H = n_row_tiles * tile_h
    Wp = out_ref.shape[3]
    fold = c_orig // 8

    def slot(f):
        return jax.lax.rem(f + 2 * NSLOT, NSLOT)

    def stripe(ref, src0, ring, sem, s, halo, do_start):
        """(tile_h + 2*halo)-row halo stripe of the frame whose first row
        in `ref` is src0, into ring slot s; dst row m <-> global row
        i*tile_h - halo + m, out-of-image rows zeroed on start."""

        def mk(row0, dst0, rows):
            return pltpu.make_async_copy(
                ref.at[pl.ds(row0, rows)],
                ring.at[s, pl.ds(dst0, rows)],
                sem.at[s],
            )

        @pl.when(i == 0)
        def _():
            cp = mk(src0, halo, tile_h + halo)
            if do_start:
                ring[s, 0:halo] = jnp.zeros_like(ring[s, 0:halo])
                cp.start()
            else:
                cp.wait()

        @pl.when((i > 0) & (i < n_row_tiles - 1))
        def _():
            cp = mk(src0 + i * tile_h - halo, 0, tile_h + 2 * halo)
            if do_start:
                cp.start()
            else:
                cp.wait()

        @pl.when(i == n_row_tiles - 1)
        def _():
            cp = mk(src0 + H - tile_h - halo, 0, tile_h + halo)
            if do_start:
                ring[s, tile_h + halo:] = jnp.zeros_like(
                    ring[s, tile_h + halo:]
                )
                cp.start()
            else:
                cp.wait()

    @pl.when(t == 0)
    def _():
        # x history (frames a-2, a-1), x frame 0, prefetch frame 1;
        # y1 history (from the c2 carry) into the y1 ring
        stripe(hist1_ref, 0, ring_x, sems_x, slot(-2), 2, True)
        stripe(hist1_ref, H, ring_x, sems_x, slot(-1), 2, True)
        stripe(x_ref, 0, ring_x, sems_x, slot(0), 2, True)
        if n_t > 1:
            stripe(x_ref, H, ring_x, sems_x, slot(1), 2, True)
        stripe(hist2_ref, 0, ring_y1, sems_h, slot(-2), 1, True)
        stripe(hist2_ref, H, ring_y1, sems_h, slot(-1), 1, True)
        stripe(hist1_ref, 0, ring_x, sems_x, slot(-2), 2, False)
        stripe(hist1_ref, H, ring_x, sems_x, slot(-1), 2, False)
        stripe(x_ref, 0, ring_x, sems_x, slot(0), 2, False)
        stripe(hist2_ref, 0, ring_y1, sems_h, slot(-2), 1, False)
        stripe(hist2_ref, H, ring_y1, sems_h, slot(-1), 1, False)

    @pl.when(t > 0)
    def _():
        @pl.when(t + 1 < n_t)
        def _():
            stripe(x_ref, (t + 1) * H, ring_x, sems_x, slot(t + 1), 2, True)

        stripe(x_ref, t * H, ring_x, sems_x, slot(t), 2, False)

    lane_x = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h + 4, Wp, 128), 2
    ) & (c_orig - 1)
    mix1 = jnp.where(
        lane_x < fold,
        ring_x[slot(t)],
        jnp.where(lane_x < 2 * fold, ring_x[slot(t - 2)], ring_x[slot(t - 1)]),
    )
    mixed1[:, 0:1, :] = jnp.zeros_like(mixed1[:, 0:1, :])
    mixed1[:, Wp + 1:, :] = jnp.zeros_like(mixed1[:, Wp + 1:, :])
    mixed1[:, 1 : Wp + 1, :] = mix1

    rows1 = tile_h + 2
    acc1 = jnp.zeros((rows1 * Wp, 128), jnp.float32)
    for dy in range(3):
        for zi in range(3):
            a = mixed1[dy : dy + rows1, zi : zi + Wp, :].reshape(rows1 * Wp, 128)
            acc1 = acc1 + jnp.dot(
                a, w_ref[0, 3 * dy + zi], preferred_element_type=jnp.float32
            )
    y1 = acc1 + b_ref[0:1].astype(jnp.float32)
    if act == "relu6":
        y1 = jnp.clip(y1, 0.0, 6.0)
    elif act == "relu":
        y1 = jnp.maximum(y1, 0.0)
    y1 = y1.astype(ring_y1.dtype).reshape(rows1, Wp, 128)
    ring_y1[slot(t)] = y1
    # zero the y1 halo rows that fall outside the image: conv2's spatial
    # padding must see true zeros, and act(bias) != 0
    @pl.when(i == 0)
    def _():
        ring_y1[slot(t), 0:1] = jnp.zeros_like(ring_y1[slot(t), 0:1])

    @pl.when(i == n_row_tiles - 1)
    def _():
        ring_y1[slot(t), tile_h + 1:] = jnp.zeros_like(
            ring_y1[slot(t), tile_h + 1:]
        )

    lane_y = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h + 2, Wp, 128), 2
    ) & (c_orig - 1)
    mix2 = jnp.where(
        lane_y < fold,
        ring_y1[slot(t)],
        jnp.where(
            lane_y < 2 * fold, ring_y1[slot(t - 2)], ring_y1[slot(t - 1)]
        ),
    )
    mixed2[:, 0:1, :] = jnp.zeros_like(mixed2[:, 0:1, :])
    mixed2[:, Wp + 1:, :] = jnp.zeros_like(mixed2[:, Wp + 1:, :])
    mixed2[:, 1 : Wp + 1, :] = mix2

    acc2 = jnp.zeros((tile_h * Wp, 128), jnp.float32)
    for dy in range(3):
        for zi in range(3):
            a = mixed2[dy : dy + tile_h, zi : zi + Wp, :].reshape(tile_h * Wp, 128)
            acc2 = acc2 + jnp.dot(
                a, w_ref[1, 3 * dy + zi], preferred_element_type=jnp.float32
            )
    y2 = acc2 + b_ref[1:2].astype(jnp.float32)
    if act == "relu6":
        y2 = jnp.clip(y2, 0.0, 6.0)
    elif act == "relu":
        y2 = jnp.maximum(y2, 0.0)
    out_ref[0, 0] = y2.astype(out_ref.dtype).reshape(tile_h, Wp, 128)

    # c2 carry for the next chunk: y1 of the last two frames (interior
    # rows only — halo row 0 belongs to the neighbouring tile)
    @pl.when(t >= n_t - 2)
    def _():
        carry_ref[0, 0] = ring_y1[slot(t), 1 : tile_h + 1]


@partial(jax.jit, static_argnames=("act", "tile_h", "interpret"))
def tsm_conv_pair(
    x: jnp.ndarray,
    prev1_x: jnp.ndarray,
    left0_x: jnp.ndarray,
    prev1_y: jnp.ndarray,
    left0_y: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    act: str = "relu6",
    tile_h: int | None = None,
    interpret: bool = False,
):
    """Fused pair of temporal-shift 3x3 convs (warm path).

    x: (T, H, W, C) layer input; prev1_x/left0_x: c1's carry (frame a-1
    full, frame a-2 fold-slice); prev1_y/left0_y: c2's carry (c1's
    OUTPUT at frames a-1 / a-2). Returns (y2 (T, H, W, C),
    y1_last2 (2, H, W, C)) where y1_last2 holds c1's outputs for frames
    a+T-2 and a+T-1 (the next chunk's c2 carry)."""
    t, h, wd, c = x.shape
    assert t >= 2, t
    fold = c // 8
    fold_w = 128 // c
    wp_ = wd // fold_w
    if tile_h is None:
        tile_h = pick_tile_h_pair(h, wp_)
        if tile_h is None:
            raise ValueError(f"no valid pair tile_h for H={h}")
    n_row_tiles = h // tile_h
    wpk = jnp.stack(
        [pack_weights(w1.astype(jnp.bfloat16)),
         pack_weights(w2.astype(jnp.bfloat16))]
    )
    b_lane = jnp.stack([
        jnp.tile(b1.astype(jnp.float32), fold_w),
        jnp.tile(b2.astype(jnp.float32), fold_w),
    ])

    def hist_of(prev1, left0):
        left_full = (
            jnp.zeros((h, wd, c), x.dtype)
            .at[..., fold : 2 * fold]
            .set(left0.astype(x.dtype))
        )
        return jnp.concatenate([left_full, prev1.astype(x.dtype)], axis=0).reshape(
            2 * h, wp_, 128
        )

    hist1 = hist_of(prev1_x, left0_x)
    hist2 = hist_of(prev1_y, left0_y)
    xv = x.reshape(t * h, wp_, 128)

    grid = (n_row_tiles, t)
    out, carry = pl.pallas_call(
        partial(
            _pair_kernel,
            tile_h=tile_h,
            n_row_tiles=n_row_tiles,
            n_t=t,
            act=act,
            c_orig=c,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x
            pl.BlockSpec(memory_space=pl.ANY),      # hist1 (x carry)
            pl.BlockSpec(memory_space=pl.ANY),      # hist2 (y1 carry)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (2,9,128,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (2,128)
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, tile_h, wp_, 128),
                lambda i_, t_: (t_, i_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_h, wp_, 128),
                lambda i_, t_, n=t: (jnp.maximum(t_ - (n - 2), 0), i_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, n_row_tiles, tile_h, wp_, 128), x.dtype),
            jax.ShapeDtypeStruct((2, n_row_tiles, tile_h, wp_, 128), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, tile_h + 4, wp_, 128), x.dtype),   # x ring
            pltpu.VMEM((NSLOT, tile_h + 2, wp_, 128), x.dtype),   # y1 ring
            pltpu.VMEM((tile_h + 4, wp_ + 2, 128), x.dtype),      # mixed1
            pltpu.VMEM((tile_h + 2, wp_ + 2, 128), x.dtype),      # mixed2
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        interpret=interpret,
    )(xv, hist1, hist2, wpk, b_lane)
    return (
        out.reshape(t, h, wd, c),
        carry.reshape(2, h, wd, c),
    )
