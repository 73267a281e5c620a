"""SRVGGNetCompact — the production RealESRGAN upscaler core.

Capability parity with the inline SRVGGNetCompact in reference
src/upscale/model/realesrgan/factory.py:18-82: a stack of 3x3 convs with
PReLU, a (scale^2 * out_ch)-channel tail conv, PixelShuffle, plus a
nearest-upsampled residual of the input.  The `realesr-general-x4v3`
config (num_conv=32, num_feat=64) is the live-pipeline flagship; DNI
denoise blending happens at import time (torch_import.dni_blend),
matching reference factory.py:152-157.

TPU notes: NHWC, 64-channel body feeds the MXU directly; the nearest
residual is a take-gather XLA fuses into the epilogue.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv2d, prelu, leaky_relu, pixel_shuffle, pixel_shuffle_mxu, resize
from .torch_import import conv_from_torch, prelu_from_torch


class SRVGGConfig(NamedTuple):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 32       # 32 = general-x4v3 (S), 16 = animevideov3 (XS)
    upscale: int = 4
    act_type: str = "prelu"  # 'relu' | 'prelu' | 'leakyrelu'


GENERAL_X4V3 = SRVGGConfig(num_conv=32)
ANIMEVIDEO_V3 = SRVGGConfig(num_conv=16)


def init_params(key: jax.Array, cfg: SRVGGConfig = GENERAL_X4V3) -> dict:
    n_layers = cfg.num_conv + 1
    keys = jax.random.split(key, n_layers + 1)

    def conv(k, i, o):
        fan_in = i * 9
        w = jax.random.normal(k, (3, 3, i, o), jnp.float32) * np.sqrt(2.0 / fan_in)
        return {"w": w, "b": jnp.zeros((o,), jnp.float32)}

    convs = [conv(keys[0], cfg.num_in_ch, cfg.num_feat)]
    convs += [conv(keys[i], cfg.num_feat, cfg.num_feat) for i in range(1, n_layers)]
    tail = conv(keys[n_layers], cfg.num_feat, cfg.num_out_ch * cfg.upscale**2)
    acts = [
        {"alpha": jnp.full((cfg.num_feat,), 0.25, jnp.float32)}
        for _ in range(n_layers)
    ]
    return {"convs": convs, "acts": acts, "tail": tail}


def _act(x: jnp.ndarray, p: dict, act_type: str) -> jnp.ndarray:
    if act_type == "prelu":
        return prelu(x, p["alpha"])
    if act_type == "relu":
        return jnp.maximum(x, 0)
    if act_type == "leakyrelu":
        return leaky_relu(x, 0.1)
    raise ValueError(act_type)


def apply(params: dict, x: jnp.ndarray, *, cfg: SRVGGConfig = GENERAL_X4V3) -> jnp.ndarray:
    """x: (N, H, W, in_ch) in [0,1] -> (N, H*s, W*s, out_ch).

    The nearest-upsampled residual is added in pre-shuffle channel space
    (nearest_s(x) == pixel_shuffle(repeat(x, s^2)) exactly, phase-constant)
    so only one HR tensor is ever materialized — a separate nearest resize
    at 4x1080p made XLA pick a C-minor layout padded 42x and OOM HBM."""
    y = _body(params, x, cfg)
    if cfg.num_in_ch == cfg.num_out_ch:
        y = y + jnp.repeat(x.astype(y.dtype), cfg.upscale**2, axis=-1)
        return pixel_shuffle_mxu(y, cfg.upscale)
    y = pixel_shuffle_mxu(y, cfg.upscale)
    h, w = x.shape[-3], x.shape[-2]
    base = resize(x, (h * cfg.upscale, w * cfg.upscale), "nearest")
    return y + base.astype(y.dtype)


def _body(params: dict, x: jnp.ndarray, cfg: SRVGGConfig) -> jnp.ndarray:
    from ..ops.lanefold import lanefold_enabled

    if lanefold_enabled(x.shape[-2], 2):
        return _body_folded(params, x, cfg)
    y = x
    for conv_p, act_p in zip(params["convs"], params["acts"]):
        y = _act(conv2d(y, **conv_p, padding=1), act_p, cfg.act_type)
    return conv2d(y, **params["tail"], padding=1)


def _body_folded(params: dict, x: jnp.ndarray, cfg: SRVGGConfig) -> jnp.ndarray:
    """The conv stack in W-pair lane-folded layout (ops/lanefold.py):
    the C=64 body runs as dense 128-lane convs, measured ~25 % faster on
    v5e at 720p (1.41 -> 1.05 ms/conv at N=4; exact re-parametrization,
    f32 parity ~2e-7)."""
    from ..ops.lanefold import conv3x3_folded, fold_lanes, unfold_lanes

    y = fold_lanes(x, 2)
    for conv_p, act_p in zip(params["convs"], params["acts"]):
        y = conv3x3_folded(y, conv_p["w"], conv_p.get("b"), 2)
        if cfg.act_type == "prelu":
            y = prelu(y, jnp.tile(act_p["alpha"], 2))
        else:
            y = _act(y, act_p, cfg.act_type)
    return unfold_lanes(
        conv3x3_folded(y, params["tail"]["w"], params["tail"].get("b"), 2), 2
    )


def apply_down(params: dict, x: jnp.ndarray, d: int, *, cfg: SRVGGConfig = GENERAL_X4V3) -> jnp.ndarray:
    """Fast epilogue: x (N, H, W, C) -> (N, 4H/d, 4W/d, C), equal to
    bicubic-d-downscale(apply(params, x)) without ever materializing the
    4x image (ops/fused_epilogue.py). d=2 deviates on a <=1 px border;
    d=3 and d=4 are exact (pure subsample / pure channel mix). Requires
    upscale == 4; d=3 needs H, W divisible by 3."""
    from ..ops import fused_epilogue as fe

    assert cfg.upscale == 4 and d in (2, 3, 4), (cfg, d)
    # the fused-residual algebra below assumes the nearest-up residual of
    # x adds channel-for-channel (apply()'s num_in_ch == num_out_ch path)
    assert cfg.num_in_ch == cfg.num_out_ch, cfg
    y = _body(params, x, cfg)
    ps = {2: fe.ps4_bicubic_down2, 3: fe.ps4_bicubic_down3, 4: fe.ps4_bicubic_down4}[d]
    base_fn = {2: fe.nearest4_bicubic_down2, 3: fe.nearest4_bicubic_down3,
               4: fe.nearest4_bicubic_down4}[d]
    out = ps(y)
    return out + base_fn(x).astype(out.dtype)


def apply_down2(params: dict, x: jnp.ndarray, *, cfg: SRVGGConfig = GENERAL_X4V3) -> jnp.ndarray:
    """720p->1440p production transform (apply_down with d=2)."""
    return apply_down(params, x, 2, cfg=cfg)


def apply_down_rational(
    params: dict, x: jnp.ndarray, num: int, den: int, *,
    cfg: SRVGGConfig = GENERAL_X4V3,
) -> jnp.ndarray:
    """Fused epilogue for ANY rational downscale num/den of the 4x output
    (exact in the interior; <=1-block edge-replicated borders). Covers the
    whole ladder: 540p->1440p is 3/2, 900p->1440p is 5/2, 630p->1440p is
    7/4, etc. (ops/fused_epilogue.py)."""
    from ..ops import fused_epilogue as fe

    assert cfg.upscale == 4 and cfg.num_in_ch == cfg.num_out_ch, cfg
    y = _body(params, x, cfg)
    out = fe.ps4_bicubic_down_rational(y, num, den)
    base = fe.nearest4_bicubic_down_rational(x, num, den)
    return out + base.astype(out.dtype)


def from_torch(sd: dict[str, np.ndarray], cfg: SRVGGConfig = GENERAL_X4V3) -> dict:
    """Reference module list: body.[conv,act]*(num_conv+1) + tail conv at
    body.{2*(num_conv+1)} (factory.py:42-69)."""
    n_layers = cfg.num_conv + 1
    convs = [conv_from_torch(sd, f"body.{2 * i}.") for i in range(n_layers)]
    acts = [
        prelu_from_torch(sd, f"body.{2 * i + 1}.")
        if cfg.act_type == "prelu"
        else {}
        for i in range(n_layers)
    ]
    tail = conv_from_torch(sd, f"body.{2 * n_layers}.")
    return {"convs": convs, "acts": acts, "tail": tail}
