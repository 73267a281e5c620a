"""Tests for the jitted production upscale steps (upscale/steps.py,
tile.py, jit_cache.py) against small random models — shape/dtype
contracts, denoise-state threading, and tile-vs-whole equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharkshark_tpu.models import bsvd, egvsr, srvgg
from sharkshark_tpu.upscale import (
    HR_LEVELS,
    LR_LEVELS,
    ShapeCache,
    UpscaleSpec,
    egvsr_upscale_step,
    init_denoise_state,
    tile_upscale,
    upscale_multi,
    upscale_single_denoise,
)

TINY_SRVGG = srvgg.SRVGGConfig(num_feat=16, num_conv=2)
TINY_BSVD = bsvd.BSVDConfig(chns=(8, 16, 24))
TINY_EGVSR = egvsr.EGVSRConfig(nf=16, nb=2)

SPEC = UpscaleSpec(
    lr_shape=(36, 64),
    output_shape=(72, 128),
    compute_dtype=jnp.float32,
)


def _srvgg_apply(params, x):
    return srvgg.apply(params, x, cfg=TINY_SRVGG)


@pytest.fixture(scope="module")
def sr_params():
    return srvgg.init_params(jax.random.PRNGKey(0), TINY_SRVGG)


def test_levels_tables():
    assert LR_LEVELS[3] == (720, 1280)
    assert HR_LEVELS[0] == (1440, 2560)


def test_upscale_multi_contract(sr_params):
    frames = jax.random.randint(
        jax.random.PRNGKey(1), (2, 48, 80, 3), 0, 256, jnp.uint8
    )
    out = upscale_multi(_srvgg_apply, sr_params, frames, SPEC)
    assert out.shape == (2, 72, 128, 3)
    assert out.dtype == jnp.uint8
    # already at/below lr_shape: no pre-resize branch
    small = frames[:, :36, :64]
    out2 = upscale_multi(_srvgg_apply, sr_params, small, SPEC)
    assert out2.shape == (2, 72, 128, 3)


def test_upscale_multi_jits(sr_params):
    frames = jnp.zeros((1, 36, 64, 3), jnp.uint8)
    fn = jax.jit(lambda p, f: upscale_multi(_srvgg_apply, p, f, SPEC))
    out = fn(sr_params, frames)
    assert out.shape == (1, 72, 128, 3)


def test_upscale_single_denoise_threads_state(sr_params):
    params = {
        "sr": sr_params,
        "denoise": bsvd.init_params(jax.random.PRNGKey(2), TINY_BSVD),
    }
    state = init_denoise_state(1, SPEC, TINY_BSVD)
    frame = jax.random.randint(
        jax.random.PRNGKey(3), (1, 36, 64, 3), 0, 256, jnp.uint8
    )
    step = jax.jit(
        lambda p, s, f: upscale_single_denoise(
            _srvgg_apply, p, s, f, SPEC, TINY_BSVD
        )
    )
    out1, state = step(params, state, frame)
    assert out1.shape == (1, 72, 128, 3) and out1.dtype == jnp.uint8
    assert int(state["t"]) == 1
    # step past the SHIFT_NUM pipeline delay so the stream output reflects
    # actual input (during warm-up the BSVD contribution is constant)
    for _ in range(bsvd.SHIFT_NUM + 1):
        out2, state = step(params, state, frame)
    assert int(state["t"]) == bsvd.SHIFT_NUM + 2
    # same input but different carried state -> different output
    assert not np.array_equal(np.asarray(out1), np.asarray(out2))


def test_egvsr_step(sr_params):
    params = egvsr.init_params(jax.random.PRNGKey(4), TINY_EGVSR)
    state = egvsr.init_recurrent_state(1, 36, 64, TINY_EGVSR)
    frame = jnp.zeros((1, 48, 80, 3), jnp.uint8)
    out, state2 = jax.jit(
        lambda p, s, f: egvsr_upscale_step(p, s, f, SPEC)
    )(params, state, frame)
    assert out.shape == (1, 72, 128, 3)


def test_tile_upscale_matches_whole(sr_params):
    img = jax.random.uniform(jax.random.PRNGKey(5), (1, 40, 56, 3))
    whole = _srvgg_apply(sr_params, img)
    tiled = tile_upscale(
        _srvgg_apply, sr_params, img, scale=4, tile=24, tile_pad=8
    )
    assert tiled.shape == whole.shape
    # interior matches; borders differ only where reflect-halo context
    # replaced true context, so compare away from tile seams' padding
    np.testing.assert_allclose(
        np.asarray(tiled[:, 40:120, 40:180]),
        np.asarray(whole[:, 40:120, 40:180]),
        atol=2e-2,
    )


def test_shape_cache_counts_signatures(sr_params):
    cache = ShapeCache(lambda p, f: upscale_multi(_srvgg_apply, p, f, SPEC))
    a = jnp.zeros((1, 36, 64, 3), jnp.uint8)
    b = jnp.zeros((2, 36, 64, 3), jnp.uint8)
    cache(sr_params, a)
    cache(sr_params, a)
    cache(sr_params, b)
    assert cache.num_signatures == 2


def test_denoise_handles_odd_ladder_shapes(sr_params):
    """lr_level 2 is 630x1120 — not a multiple of 4; the denoise steps must
    pad/crop for BSVD's two stride-2 stages (regression: shape crash)."""
    from sharkshark_tpu.upscale import upscale_batch_denoise

    spec = UpscaleSpec(
        lr_shape=(30, 44),  # not /4 in H; (32, 44) padded internally
        output_shape=(60, 88),
        compute_dtype=jnp.float32,
    )
    params = {
        "sr": sr_params,
        "denoise": bsvd.init_params(jax.random.PRNGKey(7), TINY_BSVD),
    }
    state = init_denoise_state(1, spec, TINY_BSVD)
    frames = jnp.zeros((2, 30, 44, 3), jnp.uint8)
    out, state = jax.jit(
        lambda p, s, f: upscale_batch_denoise(
            _srvgg_apply, p, s, f, spec, TINY_BSVD
        )
    )(params, state, frames)
    assert out.shape == (2, 60, 88, 3)
    assert int(state["t"]) == 2


def test_sr_sub_batch_is_exact(sr_params):
    """sr_sub_batch splits only the SR+post tail (per-image color stats),
    so outputs and state must match the unsplit step exactly."""
    from sharkshark_tpu.upscale import upscale_batch_denoise

    params = {
        "sr": sr_params,
        "denoise": bsvd.init_params(jax.random.PRNGKey(7), TINY_BSVD),
    }
    frames = jax.random.randint(
        jax.random.PRNGKey(8), (8, 36, 64, 3), 0, 256, jnp.uint8
    )
    s1 = init_denoise_state(1, SPEC, TINY_BSVD)
    s2 = init_denoise_state(1, SPEC, TINY_BSVD)
    o1, s1 = upscale_batch_denoise(
        _srvgg_apply, params, s1, frames, SPEC, TINY_BSVD, sr_sub_batch=4
    )
    o2, s2 = upscale_batch_denoise(
        _srvgg_apply, params, s2, frames, SPEC, TINY_BSVD
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
