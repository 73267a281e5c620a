"""Folded XLA conv stack exactness (kept as optimization research; see the
module docstring for the measured negative result)."""

import jax
import jax.numpy as jnp

from sharkshark_tpu.ops import conv2d, prelu
from experiments.folded_conv import folded_conv_prelu_stack


def test_folded_stack_exact():
    L, C = 3, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 20, C))
    w = jax.random.normal(jax.random.PRNGKey(1), (L, 3, 3, C, C)) * 0.05
    a = jnp.linspace(0.1, 0.4, L * C).reshape(L, C)
    ref = x
    for l in range(L):
        ref = prelu(conv2d(ref, w[l], padding=1), a[l])
    got = folded_conv_prelu_stack(x, w, a)
    assert float(jnp.abs(got - ref).max()) < 1e-4
