"""LR schedules, as optax-style `step -> lr` functions.

Parity with reference optim/lr_schedules.py (CosineAnnealingLR_Restart,
from BasicSR) and the registry in optim/__init__.py:38-67 (FixedLR,
MultiStepLR, CosineAnnealingLR_Restart).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["fixed_lr", "multistep_lr", "cosine_annealing_restart", "define_lr_schedule"]


def fixed_lr(base_lr: float):
    def sched(step):
        return jnp.asarray(base_lr, jnp.float32)

    return sched


def multistep_lr(base_lr: float, milestones: list[int], gamma: float = 0.5):
    ms = np.asarray(sorted(milestones))

    def sched(step):
        k = jnp.sum(step >= jnp.asarray(ms))
        return base_lr * (gamma ** k.astype(jnp.float32))

    return sched


def cosine_annealing_restart(
    base_lr: float,
    periods: list[int],
    restart_weights: list[float] | None = None,
    eta_min: float = 0.0,
):
    """Cosine annealing with warm restarts: period i runs for periods[i]
    steps starting from base_lr * restart_weights[i], decaying to eta_min
    — functional equivalent of the reference's stateful scheduler."""
    restart_weights = restart_weights or [1.0] * len(periods)
    assert len(periods) == len(restart_weights)
    starts = np.cumsum([0] + list(periods[:-1]))
    ends = np.cumsum(periods)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(eta_min, jnp.float32)
        for start, period, weight in zip(starts, periods, restart_weights):
            in_period = (step >= start) & (step < start + period)
            t = jnp.clip((step - start) / period, 0.0, 1.0)
            cur = eta_min + (base_lr * weight - eta_min) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * t)
            )
            lr = jnp.where(in_period, cur, lr)
        # past the last restart: keep annealing at the final period's tail
        lr = jnp.where(step >= ends[-1], eta_min, lr)
        return lr

    return sched


def define_lr_schedule(sched_opt: dict | None, base_lr: float):
    """Registry matching reference optim/__init__.py:38-67."""
    if sched_opt is None:
        return fixed_lr(base_lr)
    name = sched_opt["type"]
    if name == "FixedLR":
        return fixed_lr(base_lr)
    if name == "MultiStepLR":
        return multistep_lr(base_lr, sched_opt["milestones"], sched_opt.get("gamma", 0.5))
    if name == "CosineAnnealingLR_Restart":
        return cosine_annealing_restart(
            base_lr,
            sched_opt["periods"],
            sched_opt.get("restart_weights"),
            sched_opt.get("eta_min", 0.0),
        )
    raise ValueError(f"unknown lr schedule: {name}")
