"""Fused conv-stack pallas kernel vs sequential conv+PReLU reference
(interpret mode on CPU; the TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import experiments.conv_stack as cs
from sharkshark_tpu.ops import conv2d, prelu


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k)
    )


def _reference(x, w, a):
    y = x.astype(jnp.float32)
    for l in range(w.shape[0]):
        y = prelu(conv2d(y, w[l].astype(jnp.float32), padding=1), a[l])
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    return y


@pytest.mark.parametrize("L", [1, 3])
@pytest.mark.parametrize("shape", [(1, 90, 160), (2, 90, 240)])
def test_fused_stack_matches_sequential(L, shape):
    n, h, w_px = shape
    C = 64
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w_px, C)).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (L, 3, 3, C, C)) * 0.05).astype(jnp.bfloat16)
    a = jnp.linspace(0.1, 0.4, L * C).reshape(L, C).astype(jnp.float32)

    ref = _reference(x, w, a)
    got = cs.fused_conv_stack.__wrapped__(x, w, a, tile=(45, 80)).astype(jnp.float32)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() <= 0.02 * max(scale, 1.0), (err.max(), scale)


def test_supported_predicate():
    assert cs.conv_stack_supported(720, 1280, 64)
    assert cs.conv_stack_supported(1080, 1920, 64)
    assert not cs.conv_stack_supported(719, 1280, 64)
    assert not cs.conv_stack_supported(720, 1280, 48)
