"""Pallas temporal-shift conv kernel vs the XLA formulation
(models/bsvd._shift_conv_chunk), interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sharkshark_tpu.models import bsvd
from sharkshark_tpu.ops.pallas.tsm_conv import (
    pick_tile_h,
    tsm_conv,
    tsm_conv_supported,
)

RNG = np.random.default_rng(11)


def _mk(t, h, w, c):
    x = jnp.asarray(RNG.standard_normal((t, 1, h, w, c)), jnp.float32)
    center = jnp.asarray(RNG.standard_normal((1, h, w, c)), jnp.float32)
    left = jnp.asarray(RNG.standard_normal((1, h, w, c // 8)), jnp.float32)
    wt = jnp.asarray(RNG.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b = jnp.asarray(RNG.standard_normal((c,)) * 0.1, jnp.float32)
    return x, center, left, wt, b


@pytest.mark.parametrize("t,h,w,c,act", [
    (4, 16, 8, 64, "relu6"),
    (2, 24, 16, 128, "relu6"),
    (4, 16, 8, 64, "relu"),
])
def test_tsm_conv_matches_xla_shift_conv(t, h, w, c, act):
    x, center, left, wt, b = _mk(t, h, w, c)
    st = {"left": left, "center": center}
    want, new_st = bsvd._shift_conv_chunk({"w": wt, "b": b}, st, x, act)

    got = tsm_conv(
        x[:, 0].astype(jnp.bfloat16),
        center[0].astype(jnp.bfloat16),
        left[0].astype(jnp.bfloat16),
        wt,
        b,
        act=act,
        interpret=True,
    )
    # kernel runs bf16 with f32 accumulation like the XLA path; compare
    # against a bf16-quantized reference
    want_bf = np.asarray(
        bsvd._shift_conv_chunk(
            {"w": wt.astype(jnp.bfloat16), "b": b},
            {"left": left.astype(jnp.bfloat16), "center": center.astype(jnp.bfloat16)},
            x.astype(jnp.bfloat16),
            act,
        )[0]
    ).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(got[:, None]).astype(np.float32), want_bf, rtol=0.05, atol=0.05
    )
    # full-precision sanity: correlation with the f32 reference
    g = np.asarray(got).astype(np.float32).ravel()
    r = np.asarray(want)[:, 0].astype(np.float32).ravel()
    assert np.corrcoef(g, r)[0, 1] > 0.999


def test_supported_shapes():
    assert tsm_conv_supported((4, 1, 360, 640, 64))
    assert tsm_conv_supported((4, 1, 180, 320, 128))
    assert not tsm_conv_supported((4, 2, 360, 640, 64))   # N > 1
    assert not tsm_conv_supported((1, 1, 360, 640, 64))   # T < 2
    assert not tsm_conv_supported((4, 1, 360, 640, 32))   # unsupported C
    assert pick_tile_h(360, 320) == 15 and pick_tile_h(180, 320) == 15
    assert pick_tile_h(7) is None


@pytest.mark.parametrize("t,h,w,c", [(4, 16, 8, 64), (2, 24, 16, 128), (3, 16, 8, 64)])
def test_tsm_conv_pair_matches_sequential(t, h, w, c):
    """Pair-fused kernel == two sequential _shift_conv_chunk calls (warm
    regime), including the y1 carry for the next chunk."""
    from sharkshark_tpu.ops.pallas.tsm_conv import tsm_conv_pair

    x, center, left, w1, b1 = _mk(t, h, w, c)
    _, center2, left2, w2, b2 = _mk(t, h, w, c)
    st1 = {"left": left, "center": center}
    st2 = {"left": left2, "center": center2}
    y1_ref, ns1 = bsvd._shift_conv_chunk(
        {"w": w1.astype(jnp.bfloat16), "b": b1},
        {"left": left.astype(jnp.bfloat16), "center": center.astype(jnp.bfloat16)},
        x.astype(jnp.bfloat16), "relu6")
    y2_ref, ns2 = bsvd._shift_conv_chunk(
        {"w": w2.astype(jnp.bfloat16), "b": b2},
        {"left": left2.astype(jnp.bfloat16), "center": center2.astype(jnp.bfloat16)},
        y1_ref, "relu6")

    got_y2, got_y1_last2 = tsm_conv_pair(
        x[:, 0].astype(jnp.bfloat16),
        center[0].astype(jnp.bfloat16), left[0].astype(jnp.bfloat16),
        center2[0].astype(jnp.bfloat16), left2[0].astype(jnp.bfloat16),
        w1, b1, w2, b2, act="relu6", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_y2[:, None]).astype(np.float32),
        np.asarray(y2_ref).astype(np.float32), rtol=0.06, atol=0.06,
    )
    # next-chunk c2 carry: y1 of the last two frames
    np.testing.assert_allclose(
        np.asarray(got_y1_last2[1]).astype(np.float32),
        np.asarray(ns2["center"][0]).astype(np.float32), rtol=0.06, atol=0.06,
    )
    fold = c // 8
    np.testing.assert_allclose(
        np.asarray(got_y1_last2[0, ..., fold:2*fold]).astype(np.float32),
        np.asarray(ns2["left"][0]).astype(np.float32), rtol=0.06, atol=0.06,
    )


def test_supported_gates_dtype_and_degenerate_grids():
    """f32 would overflow the 2-byte VMEM budget (falls back to XLA);
    heights whose only divisor yields a degenerate grid are rejected."""
    import jax.numpy as jnp

    assert tsm_conv_supported((4, 1, 360, 640, 64), jnp.bfloat16)
    assert not tsm_conv_supported((4, 1, 360, 640, 64), jnp.float32)
    # H=316 (630p rung padded /2): only divisor in range is 4 -> 79 tiles
    assert pick_tile_h(316, 320) is None
    assert not tsm_conv_supported((4, 1, 316, 640, 64))
