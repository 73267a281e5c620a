"""VSR GAN (TecoGAN-style) training step — functional rewrite of
reference models/vsrgan_model.py:26-316.

One jitted `train_step(state, lr_data, gt_data)` carries BOTH optimizers:
- D pass: real/fake logits from the (spatial | spatio-temporal)
  discriminator; the 'adaptive' update policy becomes a `jnp.where` blend
  of (updated, unchanged) D params — the data-dependent skip stays inside
  the compiled graph instead of a host branch,
- G pass: pixel + warping + optional VGG-feature + ping-pong +
  feature-matching + GAN losses, exactly the reference's weighting
  scheme; the ping-pong augmentation (forward + reversed sequence) is
  applied to the inputs before the G forward like vsrgan_model.py:137-147.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import egvsr
from ..ops import backward_warp, resize
from . import discriminators as D
from .losses import define_criterion

__all__ = ["VSRGANConfig", "GANTrainState", "create_gan_state", "make_gan_train_step"]


class VSRGANConfig(NamedTuple):
    model_cfg: egvsr.EGVSRConfig = egvsr.DEFAULT
    disc_cfg: D.DiscriminatorConfig = D.DiscriminatorConfig()
    disc_type: str = "spatio_temporal"  # 'spatial' | 'spatio_temporal'
    lr_g: float = 5e-5
    lr_d: float = 5e-5
    beta1: float = 0.9
    beta2: float = 0.999
    pixel_weight: float = 1.0
    warping_weight: float = 1.0
    pingpong_weight: float = 0.5      # reference TecoGAN yml
    feature_weight: float = 0.2
    fm_weight: float = 1.0
    gan_weight: float = 0.01
    use_pingpong: bool = True
    use_feature_matching: bool = True
    crop_border_ratio: float = 0.75
    update_policy: str = "adaptive"   # 'adaptive' | 'always'
    update_threshold: float = 0.4
    fm_layer_norm: tuple = (12.0, 14.0, 24.0, 100.0)
    gan_crit: str = "GAN"             # 'GAN' | 'LSGAN'


class GANTrainState(NamedTuple):
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray
    cnt_upd_d: jnp.ndarray


def create_gan_state(
    key: jax.Array, cfg: VSRGANConfig = VSRGANConfig(),
    sched_g=None, sched_d=None,
) -> GANTrainState:
    """sched_g/sched_d: optional optax learning-rate schedules (the yaml
    lr_schedule); fixed cfg.lr_* otherwise."""
    kg, kd = jax.random.split(key)
    params_g = egvsr.init_params(kg, cfg.model_cfg)
    if cfg.disc_type == "spatial":
        params_d = D.init_spatial(kd, cfg.disc_cfg)
    else:
        params_d = D.init_spatio_temporal(kd, cfg.disc_cfg)
    tx_g = optax.adam(sched_g or cfg.lr_g, b1=cfg.beta1, b2=cfg.beta2)
    tx_d = optax.adam(sched_d or cfg.lr_d, b1=cfg.beta1, b2=cfg.beta2)
    return GANTrainState(
        params_g, params_d, tx_g.init(params_g), tx_d.init(params_d),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
    )


def make_gan_train_step(
    cfg: VSRGANConfig = VSRGANConfig(),
    feature_extractor: Callable | None = None,
    sched_g=None,
    sched_d=None,
):
    """Returns train_step(state, lr_data (N,T,h,w,C), gt_data (N,T,H,W,C))
    -> (state, logs). `feature_extractor(x)` -> list of feature maps for
    the VGG perceptual loss (None disables it, like a missing
    feature_crit block)."""
    tx_g = optax.adam(cfg.lr_g, b1=cfg.beta1, b2=cfg.beta2)
    tx_d = optax.adam(cfg.lr_d, b1=cfg.beta1, b2=cfg.beta2)
    pix_crit = define_criterion({"type": "CB"})
    warp_crit = define_criterion({"type": "CB"})
    pp_crit = define_criterion({"type": "CB"}) if cfg.use_pingpong else None
    fm_crit = define_criterion({"type": "CB", "reduction": "mean"}) if cfg.use_feature_matching else None
    feat_crit = define_criterion({"type": "CB", "reduction": "mean"}) if feature_extractor else None
    gan_crit = define_criterion({"type": cfg.gan_crit})
    mcfg, dcfg = cfg.model_cfg, cfg.disc_cfg
    s = mcfg.scale

    def d_forward(params_d, data, ctx, hr_flow_merge=None):
        if cfg.disc_type == "spatial":
            logits, feats = D.spatial_forward_sequence(
                params_d, data, ctx["bi_data"], dcfg
            )
            return logits, feats, None
        return D.spatio_temporal_forward_sequence(
            params_d,
            data,
            lr_data=ctx["lr_data"],
            bi_data=ctx["bi_data"],
            hr_flow=ctx["hr_flow"],
            fnet_params=ctx["params_g"]["fnet"],
            use_pp_crit=cfg.use_pingpong,
            crop_border_ratio=cfg.crop_border_ratio,
            hr_flow_merge=hr_flow_merge,
            cfg=dcfg,
        )

    def train_step(state: GANTrainState, lr_data, gt_data):
        n, t, lh, lw, c = lr_data.shape
        gh, gw = gt_data.shape[2], gt_data.shape[3]

        # bicubic upsampled conditional input (vsrgan_model.py:133-135)
        bi_data = resize(
            lr_data.reshape(n * t, lh, lw, c), (gh, gw), "bicubic"
        ).reshape(n, t, gh, gw, c)

        # ping-pong augmentation (:137-147)
        if cfg.use_pingpong:
            lr_data = jnp.concatenate(
                [lr_data, jnp.flip(lr_data, 1)[:, 1:]], axis=1
            )
            gt_data = jnp.concatenate(
                [gt_data, jnp.flip(gt_data, 1)[:, 1:]], axis=1
            )
            bi_data = jnp.concatenate(
                [bi_data, jnp.flip(bi_data, 1)[:, 1:]], axis=1
            )

        # ---- G forward (no grad yet; reused for the D step) ----
        g_out = egvsr.forward_sequence(state.params_g, lr_data, cfg=mcfg)
        hr_data = g_out["hr_data"]
        # hr_flow as (N, T-1, H, W, 2)
        hr_flow = g_out["hr_flow"]
        ctx = {
            "lr_data": lr_data,
            "bi_data": bi_data,
            "hr_flow": hr_flow,
            "params_g": state.params_g,
        }

        # ---- D losses ----
        def d_loss_fn(params_d):
            real_logits, real_feats, flow_merge = d_forward(
                params_d, gt_data, ctx
            )
            fake_logits, _, _ = d_forward(
                params_d, jax.lax.stop_gradient(hr_data), ctx, flow_merge
            )
            loss = gan_crit(real_logits, True) + gan_crit(fake_logits, False)
            return loss, (real_logits, fake_logits, real_feats, flow_merge)

        (loss_d, (real_logits, fake_logits, real_feats, flow_merge)), grads_d = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.params_d)
        )

        # adaptive D update policy (:193-215): skip when D is too strong
        log_real = jnp.log(jax.nn.sigmoid(real_logits) + 1e-8).mean()
        log_fake = jnp.log(jax.nn.sigmoid(fake_logits) + 1e-8).mean()
        distance = log_real - log_fake
        upd_d = (
            distance < cfg.update_threshold
            if cfg.update_policy == "adaptive"
            else jnp.asarray(True)
        )

        updates_d, new_opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, updates_d)
        params_d = jax.tree.map(
            lambda new, old: jnp.where(upd_d, new, old),
            new_params_d, state.params_d,
        )
        opt_d = jax.tree.map(
            lambda new, old: jnp.where(upd_d, new, old), new_opt_d, state.opt_d
        )

        # ---- G losses ----
        def g_loss_fn(params_g):
            out = egvsr.forward_sequence(params_g, lr_data, cfg=mcfg)
            hr = out["hr_data"]
            logs = {}
            loss = cfg.pixel_weight * pix_crit(hr, gt_data)
            logs["l_pix_G"] = loss

            lr_warp = backward_warp(out["lr_prev"], out["lr_flow"])
            l_warp = cfg.warping_weight * warp_crit(lr_warp, out["lr_curr"])
            loss += l_warp
            logs["l_warp_G"] = l_warp

            if feat_crit is not None:
                hr_m = hr.reshape(-1, gh, gw, c)
                gt_m = gt_data.reshape(-1, gh, gw, c)
                l_feat = 0.0
                for hf, gf in zip(feature_extractor(hr_m), feature_extractor(gt_m)):
                    l_feat += feat_crit(hf, jax.lax.stop_gradient(gf))
                l_feat = cfg.feature_weight * l_feat
                loss += l_feat
                logs["l_feat_G"] = l_feat

            if pp_crit is not None:
                # forward half vs reversed back half (:270-279)
                hr_fw = hr[:, : t - 1]
                hr_bw = jnp.flip(hr[:, t:], 1)
                l_pp = cfg.pingpong_weight * pp_crit(hr_fw, hr_bw)
                loss += l_pp
                logs["l_pp_G"] = l_pp

            g_ctx = dict(ctx, params_g=params_g)
            fake_logits_g, fake_feats_g, _ = d_forward(
                params_d, hr, g_ctx, flow_merge
            )
            if fm_crit is not None:
                l_fm = 0.0
                for i, (ff, rf) in enumerate(zip(fake_feats_g, real_feats)):
                    l_fm += fm_crit(ff, jax.lax.stop_gradient(rf)) / cfg.fm_layer_norm[i]
                l_fm = cfg.fm_weight * l_fm
                loss += l_fm
                logs["l_fm_G"] = l_fm

            l_gan = cfg.gan_weight * gan_crit(fake_logits_g, True)
            loss += l_gan
            logs["l_gan_G"] = l_gan
            logs["p_fake_G"] = fake_logits_g.mean()
            logs["l_total_G"] = loss
            return loss, logs

        (_, logs), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g
        )
        updates_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        logs.update(
            l_gan_D=jnp.where(upd_d, loss_d, 0.0),
            p_real_D=real_logits.mean(),
            p_fake_D=fake_logits.mean(),
            distance=distance,
        )
        return (
            GANTrainState(
                params_g, params_d, opt_g, opt_d,
                state.step + 1, state.cnt_upd_d + upd_d.astype(jnp.int32),
            ),
            logs,
        )

    return train_step
