"""VSR (FRVSR/EGVSR) training step — functional optax rewrite of
reference models/vsr_model.py:46-119.

The reference wraps net_G + Adam + per-criterion weights in a stateful
VSRModel; here a TrainState pytree (params, opt_state, step) flows
through a pure `train_step` that is jit/pjit-compiled once — the whole
unrolled recurrence, both losses, backward, and the Adam update fuse
into a single XLA program, and the batch/spatial dims can be sharded
over a device mesh (parallel/sharded.py).

Loss parity: weighted Charbonnier pixel loss on the HR sequence plus the
warping loss `crit(backward_warp(lr_prev, lr_flow), lr_curr)` computed
from the flow tensors the forward pass already produced
(vsr_model.py:96-115).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import egvsr
from ..ops import backward_warp
from .losses import define_criterion

__all__ = ["VSRTrainConfig", "TrainState", "create_train_state", "make_train_step"]


class VSRTrainConfig(NamedTuple):
    model_cfg: egvsr.EGVSRConfig = egvsr.DEFAULT
    lr: float = 5e-5                      # reference train yml generator.lr
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.0
    pixel_crit: dict | None = None        # default CB below
    warping_crit: dict | None = None      # default CB weight 1 below
    pixel_weight: float = 1.0
    warping_weight: float = 1.0


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _make_optimizer(cfg: VSRTrainConfig, schedule: Callable | None = None):
    lr = schedule if schedule is not None else cfg.lr
    if cfg.weight_decay:
        return optax.adamw(
            lr, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay
        )
    return optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2)


def create_train_state(
    key: jax.Array,
    cfg: VSRTrainConfig = VSRTrainConfig(),
    schedule: Callable | None = None,
    params: Any | None = None,
) -> TrainState:
    if params is None:
        params = egvsr.init_params(key, cfg.model_cfg)
    tx = _make_optimizer(cfg, schedule)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_train_step(
    cfg: VSRTrainConfig = VSRTrainConfig(),
    schedule: Callable | None = None,
):
    """Returns `train_step(state, lr_data, gt_data) -> (state, logs)`.

    lr_data: (N, T, h, w, C) in [0,1]; gt_data: (N, T, h*s, w*s, C).
    """
    tx = _make_optimizer(cfg, schedule)
    pix_crit = define_criterion(cfg.pixel_crit or {"type": "CB"})
    warp_crit = (
        define_criterion(cfg.warping_crit)
        if cfg.warping_crit is not None
        else define_criterion({"type": "CB"})
    )

    def loss_fn(params, lr_data, gt_data):
        out = egvsr.forward_sequence(params, lr_data, cfg=cfg.model_cfg)
        loss_pix = cfg.pixel_weight * pix_crit(out["hr_data"], gt_data)
        loss = loss_pix
        logs = {"l_pix_G": loss_pix}
        if warp_crit is not None:
            lr_warp = backward_warp(out["lr_prev"], out["lr_flow"])
            loss_warp = cfg.warping_weight * warp_crit(lr_warp, out["lr_curr"])
            loss = loss + loss_warp
            logs["l_warp_G"] = loss_warp
        logs["l_total"] = loss
        return loss, logs

    def train_step(state: TrainState, lr_data, gt_data):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, lr_data, gt_data
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), logs

    return train_step
