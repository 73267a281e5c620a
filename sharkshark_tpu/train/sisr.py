"""Single-image SR training step (SRVGG / any per-frame generator).

The reference trains its recurrent VSR nets in the vendored EGVSR tree
(src/upscale/model/egvsr/models/vsr_model.py) but ships the production
SRVGG weights pre-trained (realesrgan/factory.py:140-150, downloaded).
On a no-egress host those weights cannot be fetched, so this module
closes the loop locally: the same optax/TrainState machinery as
train/vsr.py, with a per-frame forward (no recurrence, no warping loss)
— pixel criterion on (N*T) frames ridden as one batch through the MXU.

Used by train/driver.py when model.generator.name == 'srvgg'; the minted
params export back to the reference's torch state_dict naming
(tools/export_torch_srvgg.py) so the *production* import path
(torch_import.load_state_dict -> srvgg.from_torch, DNI included) serves
them unchanged.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import srvgg
from .losses import define_criterion
from .vsr import TrainState

__all__ = ["SISRTrainConfig", "create_sisr_state", "make_sisr_train_step"]


class SISRTrainConfig(NamedTuple):
    model_cfg: srvgg.SRVGGConfig = srvgg.GENERAL_X4V3
    lr: float = 2e-4
    beta1: float = 0.9
    beta2: float = 0.999
    pixel_crit: dict | None = None  # default Charbonnier
    pixel_weight: float = 1.0


def _make_optimizer(cfg: SISRTrainConfig, schedule: Callable | None = None):
    return optax.adam(
        schedule if schedule is not None else cfg.lr, b1=cfg.beta1, b2=cfg.beta2
    )


def create_sisr_state(
    key: jax.Array,
    cfg: SISRTrainConfig = SISRTrainConfig(),
    schedule: Callable | None = None,
    params=None,
) -> TrainState:
    if params is None:
        params = srvgg.init_params(key, cfg.model_cfg)
    tx = _make_optimizer(cfg, schedule)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_sisr_train_step(
    cfg: SISRTrainConfig = SISRTrainConfig(),
    schedule: Callable | None = None,
):
    """Returns `train_step(state, lr_data, gt_data) -> (state, logs)`.

    lr_data: (N, T, h, w, C) in [0,1] (T=1 for pure image datasets);
    gt_data: (N, T, h*s, w*s, C). Frames fold into the batch dim."""
    tx = _make_optimizer(cfg, schedule)
    pix_crit = define_criterion(cfg.pixel_crit or {"type": "CB"})

    def loss_fn(params, lr_data, gt_data):
        n, t, h, w, c = lr_data.shape
        lr_b = lr_data.reshape(n * t, h, w, c)
        gt_b = gt_data.reshape(n * t, *gt_data.shape[2:])
        out = srvgg.apply(params, lr_b, cfg=cfg.model_cfg)
        loss = cfg.pixel_weight * pix_crit(out, gt_b)
        return loss, {"l_pix_G": loss, "l_total": loss}

    def train_step(state: TrainState, lr_data, gt_data):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, lr_data, gt_data
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), logs

    return train_step
