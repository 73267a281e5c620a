"""Pair-folded conv stack in pure XLA.

The SRVGG body's 64-channel 3x3 convs cap the MXU at half its output
width. Folding two adjacent width pixels into one 128-channel "pair
pixel" re-expresses each conv as TWO 3x1 convs over the folded tensor
(structure from ops/pallas/conv_stack.py v2):

  same-pair terms   : conv with Wd (3, 1, 2C, 2C), all blocks dense
  cross-pair terms  : conv with Wg (3, 1, 2C, 2C), then the lo half
                      shifts +1 pair and the hi half -1 pair (zero edge)

MAC count is 4/3 of the direct conv. Unlike the Pallas kernels this is
EXACT (the shifts inject the same zeros a SAME-pad conv sees).

MEASURED OUTCOME (v5e, 720p batch 4, L=8): folded 124.8 ms vs direct
49.4 ms — XLA lowers the (3,1) C=128 convs poorly and the lane blends
break fusion. Meanwhile the direct conv chain reaches 44.1 TFLOP/s,
~90% of the 49.3 TFLOP/s N=64 MXU ceiling: the SRVGG body is already at
its bf16 hardware limit, and all three folding attempts (Pallas v1/v2,
this XLA variant) are kept as negative-result documentation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sharkshark_tpu.ops import conv2d, prelu

__all__ = ["fold_weights_xla", "folded_conv_prelu_stack"]


def fold_weights_xla(weights: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(L, 3, 3, C, C) HWIO tap weights -> (Wd, Wg) each (L, 3, 1, 2C, 2C)."""
    L = weights.shape[0]
    c = weights.shape[-1]
    w_m, w_0, w_p = weights[:, :, 0], weights[:, :, 1], weights[:, :, 2]
    wd = jnp.zeros((L, 3, 1, 2 * c, 2 * c), weights.dtype)
    wd = wd.at[:, :, 0, :c, :c].set(w_0)
    wd = wd.at[:, :, 0, c:, :c].set(w_p)
    wd = wd.at[:, :, 0, :c, c:].set(w_m)
    wd = wd.at[:, :, 0, c:, c:].set(w_0)
    wg = jnp.zeros((L, 3, 1, 2 * c, 2 * c), weights.dtype)
    wg = wg.at[:, :, 0, c:, :c].set(w_m)  # x_hi[b-1] -> y_lo[b]
    wg = wg.at[:, :, 0, :c, c:].set(w_p)  # x_lo[b+1] -> y_hi[b]
    return wd, wg


def _shift_blend(g: jnp.ndarray, c: int) -> jnp.ndarray:
    """lo lanes from g shifted +1 pair (reads b-1), hi lanes shifted -1
    (reads b+1), zeros at the edges — the cross-pair remainder."""
    zero = jnp.zeros_like(g[:, :, :1])
    g_from_left = jnp.concatenate([zero, g[:, :, :-1]], axis=2)
    g_from_right = jnp.concatenate([g[:, :, 1:], zero], axis=2)
    return jnp.concatenate(
        [g_from_left[..., :c], g_from_right[..., c:]], axis=-1
    )


def folded_conv_prelu_stack(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    alphas: jnp.ndarray,
) -> jnp.ndarray:
    """x: (N, H, W, C); weights (L, 3, 3, C, C); alphas (L, C).
    == L sequential [conv3x3(SAME zero-pad) + PReLU], exactly."""
    n, h, w, c = x.shape
    assert w % 2 == 0, x.shape
    wd, wg = fold_weights_xla(weights)
    a2 = jnp.concatenate([alphas, alphas], axis=-1)
    z = x.reshape(n, h, w // 2, 2 * c)
    for l in range(weights.shape[0]):
        d = conv2d(z, wd[l], padding=(1, 0))
        g = conv2d(z, wg[l], padding=(1, 0))
        z = prelu(d + _shift_blend(g, c), a2[l].astype(d.dtype))
    return z.reshape(n, h, w, c)
