"""Pallas TPU kernel: fused stack of L 3x3 same-pad conv + PReLU layers.

Why this exists: the SRVGG body is 32 back-to-back 3x3 C64 convs
(reference src/upscale/model/realesrgan/factory.py:42-69). Run layer by
layer, every conv round-trips the full (N, H, W, 64) activation through
HBM — ~1 GB read + write per layer per 720p micro-batch — and the model
is HBM-bandwidth-bound, not MXU-bound. This kernel processes L layers
per HBM round trip: each grid step DMAs one spatial tile (with halo)
into VMEM, runs all L convs on the MXU with the shrinking-valid-region
trick, and writes only the final tile — activation traffic drops ~Lx.

Pixel-pair channel folding: TPU DMA needs the minor dim aligned to the
128-lane tile, and C=64 is not. Two adjacent width pixels are folded
into one 128-channel "pair pixel" (N, H, W/2, 2C); each 3x3 conv then
becomes 3(dy) x 3(pair-shift) MXU matmuls against (128, 128)
block-structured weights built from the original taps:

    y_even = W-1 x[2b-1] + W0 x[2b]   + W1 x[2b+1]
    y_odd  = W-1 x[2b]   + W0 x[2b+1] + W1 x[2b+2]

so Wz[-1] carries W-1 into the hi->lo block, Wz[0] is the dense center,
Wz[+1] carries W1 into lo->hi. The zero blocks cost 2x MAC count, but at
N=K=128 the MXU runs 2x wider than the C=64 original — net even — and
every DMA/vector op is fully lane-aligned.

Tiles default to (45, 80px): every resolution in the production lr
ladder (levels.py) divides evenly and the working set fits in ~7 MB of
VMEM, leaving room for the double-buffered in/out pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv_stack", "conv_stack_supported"]


def conv_stack_supported(h: int, w: int, c: int, tile: tuple[int, int] = (45, 80)) -> bool:
    th, tw = tile
    return h % th == 0 and w % tw == 0 and tw % 2 == 0 and c == 64


def _fold_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """(L, 3, 3, C, C) -> (L, 3, 3, 2C, 2C) pair-folded block weights."""
    L, _, _, c, _ = weights.shape
    wz = jnp.zeros((L, 3, 3, 2 * c, 2 * c), weights.dtype)
    w_m, w_0, w_p = weights[:, :, 0], weights[:, :, 1], weights[:, :, 2]
    # db = -1: hi -> lo via W-1
    wz = wz.at[:, :, 0, c:, :c].set(w_m)
    # db = 0: dense center
    wz = wz.at[:, :, 1, :c, :c].set(w_0)
    wz = wz.at[:, :, 1, c:, :c].set(w_p)
    wz = wz.at[:, :, 1, :c, c:].set(w_m)
    wz = wz.at[:, :, 1, c:, c:].set(w_0)
    # db = +1: lo -> hi via W+1
    wz = wz.at[:, :, 2, :c, c:].set(w_p)
    return wz


def _fold_weights_v2(weights: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(L, 3, 3, C, C) -> (Wd, Wg), each (L, 3, 2C, 2C).

    v2 removes v1's 2x MAC overhead: per row-tap dy, the same-pair terms
    are ONE dense (2C, 2C) matmul (Wd: all four blocks populated) and the
    cross-pair remainder is a second matmul (Wg: two blocks) whose halves
    are shifted by +-1 pair before accumulation — 6 matmuls/layer at
    128x128 vs 9 half-zero ones, a 9/6*0.5... net 1.33x MACs vs useful."""
    L, _, _, c, _ = weights.shape
    w_m, w_0, w_p = weights[:, :, 0], weights[:, :, 1], weights[:, :, 2]
    wd = jnp.zeros((L, 3, 2 * c, 2 * c), weights.dtype)
    wd = wd.at[:, :, :c, :c].set(w_0)      # lo -> lo
    wd = wd.at[:, :, c:, :c].set(w_p)      # hi -> lo (x[2b+1] via W1)
    wd = wd.at[:, :, :c, c:].set(w_m)      # lo -> hi (x[2b] via W-1)
    wd = wd.at[:, :, c:, c:].set(w_0)      # hi -> hi
    wg = jnp.zeros((L, 3, 2 * c, 2 * c), weights.dtype)
    wg = wg.at[:, :, c:, :c].set(w_m)      # x_hi[b-1] -> y_lo[b] (shift +1)
    wg = wg.at[:, :, :c, c:].set(w_p)      # x_lo[b+1] -> y_hi[b] (shift -1)
    return wd, wg


def _kernel_v2(x_hbm, wd_ref, wg_ref, a_ref, out_ref, buf, work, sems, *, L, TH, TWP, C2, grid):
    n_i, n_j = grid[1], grid[2]
    t = (pl.program_id(0) * n_i + pl.program_id(1)) * n_j + pl.program_id(2)
    total = grid[0] * n_i * n_j
    halo_h, halo_p = 2 * L, 2 * L
    C = C2 // 2

    def dma_for(step, slot):
        nn = step // (n_i * n_j)
        rem = step % (n_i * n_j)
        ii = rem // n_j
        jj = rem % n_j
        return pltpu.make_async_copy(
            x_hbm.at[
                nn, pl.ds(ii * TH, TH + halo_h), pl.ds(jj * TWP, TWP + halo_p), :
            ],
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
    src_is_buf = True
    for l in range(L):
        hc = TH + halo_h - 2 * l
        pc = TWP + halo_p - 2 * l
        ho, po = hc - 2, pc - 2
        acc = jnp.zeros((ho, po, C2), jnp.float32)
        for dy in range(3):
            if src_is_buf:
                x = buf[slot, dy : dy + ho, 0:pc, :]
            else:
                x = work[dy : dy + ho, 0:pc, :]
            xf = x.reshape(ho * pc, C2)
            P = jnp.dot(
                xf, wd_ref[l, dy], preferred_element_type=jnp.float32
            ).reshape(ho, pc, C2)
            G = jnp.dot(
                xf, wg_ref[l, dy], preferred_element_type=jnp.float32
            ).reshape(ho, pc, C2)
            acc = acc + P[:, 1 : pc - 1, :]
            # lo lanes take G shifted +1 pair, hi lanes take G shifted -1;
            # a lane-masked select avoids a mixed-offset lane concat that
            # Mosaic cannot lower
            lane = jax.lax.broadcasted_iota(jnp.int32, (ho, po, C2), 2)
            acc = acc + jnp.where(
                lane < C, G[:, 0 : pc - 2, :], G[:, 2:pc, :]
            )
        alpha = a_ref[l]
        y = jnp.where(acc >= 0, acc, acc * alpha[None, None, :])
        y = y.astype(jnp.bfloat16)

        margin = L - l - 1
        if margin > 0:
            ii = pl.program_id(1)
            jj = pl.program_id(2)
            row0 = jax.lax.broadcasted_iota(jnp.int32, (ho, po, 1), 0)
            col0 = jax.lax.broadcasted_iota(jnp.int32, (ho, po, 1), 1)
            top = jnp.where(ii == 0, margin, 0)
            bot = jnp.where(ii == n_i - 1, ho - margin, ho)
            left = jnp.where(jj == 0, margin, 0)
            right = jnp.where(jj == n_j - 1, po - margin, po)
            inside = (row0 >= top) & (row0 < bot) & (col0 >= left) & (col0 < right)
            y = jnp.where(inside, y, jnp.zeros_like(y))

        if src_is_buf:
            work[0:ho, 0:po, :] = y
        else:
            buf[slot, 0:ho, 0:po, :] = y
        src_is_buf = not src_is_buf

    if src_is_buf:
        out_ref[0] = buf[slot, 0:TH, 0:TWP, :]
    else:
        out_ref[0] = work[0:TH, 0:TWP, :]


def _kernel(x_hbm, w_ref, a_ref, out_ref, buf, work, sems, *, L, TH, TWP, C2, grid):
    n_i, n_j = grid[1], grid[2]
    t = (pl.program_id(0) * n_i + pl.program_id(1)) * n_j + pl.program_id(2)
    total = grid[0] * n_i * n_j
    halo_h, halo_p = 2 * L, 2 * L  # rows, pair-columns

    def dma_for(step, slot):
        nn = step // (n_i * n_j)
        rem = step % (n_i * n_j)
        ii = rem // n_j
        jj = rem % n_j
        return pltpu.make_async_copy(
            x_hbm.at[
                nn, pl.ds(ii * TH, TH + halo_h), pl.ds(jj * TWP, TWP + halo_p), :
            ],
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
    src_is_buf = True
    for l in range(L):
        hc = TH + halo_h - 2 * l
        pc = TWP + halo_p - 2 * l
        ho, po = hc - 2, pc - 2
        acc = jnp.zeros((ho * po, C2), jnp.float32)
        for dy in range(3):
            for db in range(3):
                if src_is_buf:
                    patch = buf[slot, dy : dy + ho, db : db + po, :]
                else:
                    patch = work[dy : dy + ho, db : db + po, :]
                acc = acc + jnp.dot(
                    patch.reshape(ho * po, C2),
                    w_ref[l, dy, db],
                    preferred_element_type=jnp.float32,
                )
        alpha = a_ref[l]
        y = jnp.where(acc >= 0, acc, acc * alpha[None, :])
        y = y.astype(jnp.bfloat16).reshape(ho, po, C2)

        # restore per-layer SAME zero-pad semantics at image borders: out-of-
        # image positions were computed from non-zero halo data for l > 0
        margin = L - l - 1
        if margin > 0:
            ii = pl.program_id(1)
            jj = pl.program_id(2)
            row0 = jax.lax.broadcasted_iota(jnp.int32, (ho, po, 1), 0)
            col0 = jax.lax.broadcasted_iota(jnp.int32, (ho, po, 1), 1)
            top = jnp.where(ii == 0, margin, 0)
            bot = jnp.where(ii == n_i - 1, ho - margin, ho)
            left = jnp.where(jj == 0, margin, 0)
            right = jnp.where(jj == n_j - 1, po - margin, po)
            inside = (row0 >= top) & (row0 < bot) & (col0 >= left) & (col0 < right)
            y = jnp.where(inside, y, jnp.zeros_like(y))

        if src_is_buf:
            work[0:ho, 0:po, :] = y
        else:
            buf[slot, 0:ho, 0:po, :] = y
        src_is_buf = not src_is_buf

    if src_is_buf:
        out_ref[0] = buf[slot, 0:TH, 0:TWP, :]
    else:
        out_ref[0] = work[0:TH, 0:TWP, :]


@partial(jax.jit, static_argnames=("tile", "version"))
def fused_conv_stack(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    alphas: jnp.ndarray,
    tile: tuple[int, int] = (45, 80),
    version: int = 2,
) -> jnp.ndarray:
    """x: (N, H, W, 64) bf16; weights: (L, 3, 3, 64, 64); alphas: (L, 64).
    Returns (N, H, W, 64) bf16 == L x [conv3x3(SAME, zero-pad) + PReLU].

    version=1: 9 half-zero (128,128) matmuls/layer (2x MAC overhead);
    version=2: 6 dense matmuls + shifted-half accumulation (1.33x)."""
    n, h, w, c = x.shape
    L = int(weights.shape[0])
    th, tw = tile
    assert h % th == 0 and w % tw == 0 and tw % 2 == 0 and c == 64, (x.shape, tile)
    twp = tw // 2  # pair columns per tile
    c2 = 2 * c

    xz = x.astype(jnp.bfloat16).reshape(n, h, w // 2, c2)
    xp = jnp.pad(xz, ((0, 0), (L, L), (L, L), (0, 0)))
    az = jnp.concatenate([alphas, alphas], axis=-1).astype(jnp.float32)
    grid = (n, h // th, w // tw)
    scratch = [
        pltpu.VMEM((2, th + 2 * L, twp + 2 * L, c2), jnp.bfloat16),
        pltpu.VMEM((th + 2 * L, twp + 2 * L, c2), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    out_spec = pl.BlockSpec(
        (1, th, twp, c2), lambda ni, i, j: (ni, i, j, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, h, w // 2, c2), jnp.bfloat16)

    if version == 2:
        wd, wg = _fold_weights_v2(weights.astype(jnp.bfloat16))
        out = pl.pallas_call(
            partial(_kernel_v2, L=L, TH=th, TWP=twp, C2=c2, grid=grid),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
        )(xp, wd, wg, az)
    else:
        wz = _fold_weights(weights.astype(jnp.bfloat16))
        out = pl.pallas_call(
            partial(_kernel, L=L, TH=th, TWP=twp, C2=c2, grid=grid),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
        )(xp, wz, az)
    return out.reshape(n, h, w, c)
