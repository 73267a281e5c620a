"""Smoke + contract tests for the secondary model zoo
(ESPCN / VESPCN / SOF-VSR)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharkshark_tpu.models import variants as V


def test_espcn_all_up_methods():
    for method in ["subconv", "reconv", "deconv"]:
        cfg = V.ESPCNConfig(scale=4, up_method=method)
        p = V.espcn_init(jax.random.PRNGKey(0), cfg)
        y = V.espcn_apply(p, jnp.zeros((2, 12, 16, 1)), cfg=cfg)
        assert y.shape == (2, 48, 64, 1), method
        # sigmoid output range
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_vespcn_center_frame():
    cfg = V.VESPCNConfig(scale=4, channel=1, depth=3)
    p = V.vespcn_init(jax.random.PRNGKey(1), cfg)
    seq = jax.random.uniform(jax.random.PRNGKey(2), (3, 16, 16, 1))
    y = V.vespcn_apply(p, seq, cfg=cfg)
    assert y.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_sofvsr():
    p = V.sofvsr_init(jax.random.PRNGKey(3))
    seq = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3))
    y = jax.jit(V.sofvsr_apply)(p, seq)
    assert y.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_sof_flow_warp_identity_for_zero_flow():
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 8, 8, 1))
    warped = V._sof_flow_warp(x, jnp.zeros((1, 8, 8, 2)))
    # zero flow but the ac-mismatch introduces a half-pixel-ish resample;
    # interior should be close, exact at the grid alignment points
    assert warped.shape == x.shape
    assert np.isfinite(np.asarray(warped)).all()
