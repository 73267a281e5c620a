"""Training criteria for the VSR/TecoGAN training tree.

Parity with reference src/upscale/model/egvsr/models/optim/losses.py:6-65
and the criterion registry in optim/__init__.py:5-35: Charbonnier (robust
L1), MSE, CosineSimilarity, and the two GAN objectives (vanilla BCE-with-
logits, least-squares). All are pure functions over jnp arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "charbonnier_loss",
    "mse_loss",
    "cosine_similarity_loss",
    "vanilla_gan_loss",
    "lsgan_loss",
    "define_criterion",
]


def charbonnier_loss(x, y, eps: float = 1e-6, reduction: str = "sum"):
    diff = x - y
    loss = jnp.sqrt(diff * diff + eps)
    return jnp.sum(loss) if reduction == "sum" else jnp.mean(loss)


def mse_loss(x, y, reduction: str = "mean"):
    loss = (x - y) ** 2
    return jnp.sum(loss) if reduction == "sum" else jnp.mean(loss)


def cosine_similarity_loss(x, y, eps: float = 1e-8, axis: int = -1):
    """1 - mean cosine similarity along `axis` (reference uses the channel
    dim of NCHW; channel-last here)."""
    dot = jnp.sum(x * y, axis=axis)
    nx = jnp.linalg.norm(x, axis=axis)
    ny = jnp.linalg.norm(y, axis=axis)
    sim = dot / jnp.maximum(nx * ny, eps)
    return 1.0 - jnp.mean(sim)


def _bce_with_logits(logits, target):
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def vanilla_gan_loss(logits, status: bool, reduction: str = "mean"):
    target = jnp.full_like(logits, float(bool(status)))
    loss = _bce_with_logits(logits, target)
    return jnp.sum(loss) if reduction == "sum" else jnp.mean(loss)


def lsgan_loss(logits, status: bool, reduction: str = "mean"):
    target = jnp.full_like(logits, float(bool(status)))
    return mse_loss(logits, target, reduction)


_REGISTRY = {
    "CB": charbonnier_loss,
    "MSE": mse_loss,
    "CosineSimilarity": cosine_similarity_loss,
    "GAN": vanilla_gan_loss,
    "LSGAN": lsgan_loss,
}


def define_criterion(crit_opt: dict | None):
    """Registry lookup matching reference optim/__init__.py:5-35; returns
    None for a missing config block like the reference."""
    if crit_opt is None:
        return None
    name = crit_opt["type"]
    if name not in _REGISTRY:
        raise ValueError(f"unknown criterion: {name}")
    fn = _REGISTRY[name]
    kwargs = {k: v for k, v in crit_opt.items() if k not in ("type", "weight")}

    def crit(x, y):
        return fn(x, y, **kwargs)

    return crit
