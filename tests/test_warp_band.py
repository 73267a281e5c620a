"""Banded hat-matmul warp kernel vs the exact gather warp (interpret
mode on CPU; the TPU path is exercised by tools/bench_matrix.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharkshark_tpu.ops.pallas.warp_band import (
    WINDOW_FULL,
    banded_backward_warp,
    banded_warp_bases,
    banded_warp_supported,
)
from sharkshark_tpu.ops.warp import backward_warp, backward_warp_fast


def _smooth_flow(key, h, w, max_disp=20.0):
    """EGVSR-like flow: bilinearly upsampled from a coarse grid, bounded."""
    k1, k2 = jax.random.split(key)
    coarse = jax.random.uniform(
        k1, (1, max(h // 32, 2), max(w // 32, 2), 2), minval=-1.0, maxval=1.0
    )
    flow = jax.image.resize(coarse, (1, h, w, 2), "bilinear")
    return (flow * max_disp).astype(jnp.float32)


@pytest.mark.parametrize("disp", [3.0, 20.0, 90.0])
def test_banded_matches_gather_f32(disp):
    h, w, c = 32, 256, 3
    key = jax.random.PRNGKey(int(disp))
    x = jax.random.uniform(key, (1, h, w, c), dtype=jnp.float32)
    flow = _smooth_flow(jax.random.fold_in(key, 1), h, w, disp)

    bx, by, ok_fast, ok_full = banded_warp_bases(flow)
    ref = backward_warp(x, flow)
    assert bool(ok_full)  # in-bound flow always fits the FULL window
    window = None if bool(ok_fast) else WINDOW_FULL
    kw = {} if window is None else {"window": window}
    got = banded_backward_warp(
        x, flow, bx, by, compute_dtype=jnp.float32, interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_border_clamp_semantics():
    """Constant flow pushing far past every border must reproduce the
    clamped (border-padded) sample exactly."""
    h, w = 16, 128
    x = jnp.arange(h * w * 3, dtype=jnp.float32).reshape(1, h, w, 3) / (h * w * 3)
    for dx, dy in [(-80.5, 0.0), (80.5, 0.0), (0.0, -90.25), (30.5, 88.75)]:
        flow = jnp.full((1, h, w, 2), 0.0).at[..., 0].set(dx).at[..., 1].set(dy)
        bx, by, ok_fast, _ = banded_warp_bases(flow)
        assert bool(ok_fast)
        ref = backward_warp(x, flow)
        got = banded_backward_warp(
            x, flow, bx, by, compute_dtype=jnp.float32, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_rough_flow_takes_full_window():
    """Tile-local flow range beyond the fast band -> FULL window variant,
    which must fit any in-bound flow by construction."""
    h, w = 16, 128
    key = jax.random.PRNGKey(0)
    flow = jax.random.uniform(key, (1, h, w, 2), minval=-95.0, maxval=95.0)
    _, _, ok_fast, ok_full = banded_warp_bases(flow)
    assert not bool(ok_fast)
    assert bool(ok_full)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (1, h, w, 3))
    ref = backward_warp(x, flow)
    # FULL window in f32 must match the gather path
    bx, by, _, _ = banded_warp_bases(flow)
    got = banded_backward_warp(
        x, flow, bx, by, window=WINDOW_FULL, compute_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # public wrapper routes here too (bf16 tolerance)
    got = backward_warp_fast(x, flow, interpret=True)
    assert float(jnp.max(jnp.abs(got - ref))) < 3e-2


def test_unsupported_shapes_fall_back():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 128, 3))
    flow = _smooth_flow(jax.random.PRNGKey(1), 16, 128, 5.0)
    flow = jnp.concatenate([flow, flow], axis=0)
    assert not banded_warp_supported(x.shape)
    got = backward_warp_fast(x, flow, interpret=True)
    ref = backward_warp(x, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_bf16_mode_close():
    h, w = 32, 256
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (1, h, w, 3), dtype=jnp.float32)
    flow = _smooth_flow(jax.random.fold_in(key, 1), h, w, 12.0)
    bx, by, ok_fast, _ = banded_warp_bases(flow)
    assert bool(ok_fast)
    ref = backward_warp(x, flow)
    got = banded_backward_warp(
        x, flow, bx, by, compute_dtype=jnp.bfloat16, interpret=True
    )
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-2


def test_out_of_bound_flow_falls_back_to_gather():
    """|flow| beyond MAX_DISP exceeds the padded frame -> gather path."""
    h, w = 16, 128
    flow = jnp.full((1, h, w, 2), 150.0)
    _, _, ok_fast, ok_full = banded_warp_bases(flow)
    assert not bool(ok_fast) and not bool(ok_full)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3))
    got = backward_warp_fast(x, flow, interpret=True)
    ref = backward_warp(x, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_banded_warp_s2d_out_matches_xla_s2d():
    """s2d_out fusion == space_to_depth(warp) exactly (interpret mode)."""
    import jax.numpy as jnp

    from sharkshark_tpu.ops import space_to_depth
    from sharkshark_tpu.ops.warp import backward_warp_fast

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 16, 256, 3)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, 16, 256, 2)) * 2, jnp.float32)

    want = space_to_depth(
        backward_warp_fast(x, flow, compute_dtype=jnp.float32, interpret=True), 4
    )
    got = backward_warp_fast(
        x, flow, compute_dtype=jnp.float32, interpret=True, s2d_out=4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_turbo_window_matches_gather():
    """The TURBO window (nearly-uniform in-tile flow: the common live
    regime) must be exact where banded_warp_bases_for reports it ok."""
    from sharkshark_tpu.ops.pallas.warp_band import (
        WINDOW_TURBO,
        banded_warp_bases_for,
    )

    h, w, c = 32, 256, 3
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (1, h, w, c), dtype=jnp.float32)
    flow = _smooth_flow(jax.random.fold_in(key, 1), h, w, 3.0)
    bx, by, (ok_turbo,) = banded_warp_bases_for(flow, (WINDOW_TURBO,))
    assert bool(ok_turbo)
    ref = backward_warp(x, flow)
    got = banded_backward_warp(
        x, flow, bx, by, window=WINDOW_TURBO, compute_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_turbo_window_rejects_vertically_rough_flow():
    from sharkshark_tpu.ops.pallas.warp_band import (
        WINDOW_TURBO,
        banded_warp_bases_for,
    )

    h, w = 16, 128
    # 30 px of vertical flow range inside one tile exceeds TURBO's 24 rows
    flow = (
        jnp.zeros((1, h, w, 2))
        .at[0, 1::2, :, 1].set(15.0)
        .at[0, 0::2, :, 1].set(-15.0)
    )
    _, _, (ok_turbo,) = banded_warp_bases_for(flow, (WINDOW_TURBO,))
    assert not bool(ok_turbo)
