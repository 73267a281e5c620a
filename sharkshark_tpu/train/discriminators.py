"""TecoGAN discriminators, functional JAX.

Rebuild of reference models/networks/tecogan_nets.py:298-515:
DiscriminatorBlocks (4x stride-2 conv+BN+LeakyReLU pyramid, /16),
SpatialDiscriminator (optionally conditioned on the bicubic upsample),
SpatioTemporalDiscriminator (TecoGAN triplets: original | warped |
bicubic-conditional, concatenated channelwise per 3-frame clip).

BatchNorm runs in batch-stats mode — the discriminators exist only inside
the training step (exactly how the reference uses them: net_D.train() is
always on during GAN training), so no running-average state is carried.

Layout is NHWC; `forward_sequence` returns (logits, feature_list) like
the reference so the feature-matching loss can consume the pyramid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.egvsr import fnet_apply
from ..ops import backward_warp, conv2d, leaky_relu, resize

__all__ = [
    "DiscriminatorConfig",
    "init_spatial",
    "init_spatio_temporal",
    "spatial_forward",
    "spatio_temporal_forward",
    "spatial_forward_sequence",
    "spatio_temporal_forward_sequence",
]


class DiscriminatorConfig(NamedTuple):
    in_nc: int = 3
    spatial_size: int = 128
    tempo_range: int = 3
    scale: int = 4
    use_cond: bool = False  # spatial-D conditional input


def _conv_init(key, kh, kw, i, o):
    fan_in = i * kh * kw
    w = jax.random.normal(key, (kh, kw, i, o), jnp.float32) * np.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((o,), jnp.float32)}


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _init_blocks(key) -> dict:
    chans = [(64, 64), (64, 64), (64, 128), (128, 256)]
    ks = jax.random.split(key, 4)
    return {
        "blocks": [
            {"conv": _conv_init(ks[i], 4, 4, ci, co), "bn": _bn_init(co)}
            for i, (ci, co) in enumerate(chans)
        ]
    }


def _init_head(key, in_ch: int, spatial_size: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    feat = 256 * (spatial_size // 16) ** 2
    return {
        "conv_in": _conv_init(k1, 3, 3, in_ch, 64),
        "body": _init_blocks(k2),
        "dense": {
            "w": jax.random.normal(k3, (feat, 1), jnp.float32) / np.sqrt(feat),
            "b": jnp.zeros((1,), jnp.float32),
        },
    }


def init_spatial(key, cfg: DiscriminatorConfig = DiscriminatorConfig()) -> dict:
    mult = 2 if cfg.use_cond else 1
    return _init_head(key, cfg.in_nc * mult, cfg.spatial_size)


def init_spatio_temporal(key, cfg: DiscriminatorConfig = DiscriminatorConfig()) -> dict:
    # (conditional triplet, input triplet, warped triplet) -> mult 3
    return _init_head(key, cfg.in_nc * cfg.tempo_range * 3, cfg.spatial_size)


def _batch_norm(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    mean = x.mean(axis=(0, 1, 2), keepdims=True)
    var = x.var(axis=(0, 1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _blocks_forward(p: dict, x: jnp.ndarray) -> tuple[jnp.ndarray, list]:
    feats = []
    for blk in p["blocks"]:
        x = conv2d(x, blk["conv"]["w"], None, stride=2, padding=1)
        x = leaky_relu(_batch_norm(x, blk["bn"]), 0.2)
        feats.append(x)
    return x, feats


def _head_forward(p: dict, x: jnp.ndarray) -> tuple[jnp.ndarray, list]:
    y = leaky_relu(conv2d(x, **p["conv_in"], padding=1), 0.2)
    y, feats = _blocks_forward(p["body"], y)
    y = y.reshape(y.shape[0], -1)
    logits = y @ p["dense"]["w"] + p["dense"]["b"]
    return logits, feats


spatial_forward = _head_forward
spatio_temporal_forward = _head_forward


def spatial_forward_sequence(params, data, bi_data=None, cfg=DiscriminatorConfig()):
    """data: (N, T, H, W, C) -> logits (N*T, 1), feature list
    (reference tecogan_nets.py:494-515)."""
    n, t, h, w, c = data.shape
    x = data.reshape(n * t, h, w, c)
    if cfg.use_cond:
        assert bi_data is not None
        x = jnp.concatenate([bi_data.reshape(n * t, h, w, c), x], axis=-1)
    return _head_forward(params, x)


def _triplet_pack(x: jnp.ndarray, n_clip: int, h: int, w: int, c: int) -> jnp.ndarray:
    """(N, 3k, H, W, C) -> (n_clip, H, W, C*3) with TecoGAN's rrrgggbbb
    channel order (tecogan_nets.py:423-436)."""
    x = x.reshape(n_clip, 3, h, w, c)
    return x.transpose(0, 2, 3, 4, 1).reshape(n_clip, h, w, c * 3)


def spatio_temporal_forward_sequence(
    params,
    data,
    *,
    lr_data,
    bi_data,
    hr_flow,
    fnet_params=None,
    use_pp_crit: bool = True,
    crop_border_ratio: float = 1.0,
    hr_flow_merge=None,
    cfg: DiscriminatorConfig = DiscriminatorConfig(),
):
    """TecoGAN spatio-temporal D on 3-frame clips
    (reference tecogan_nets.py:366-460).

    data: (N, T, H, W, C) HR or GT sequence; hr_flow: (N, T-1, H, W, 2).
    Returns (logits (n_clip, 1), features, hr_flow_merge) — the merged
    flow is returned for reuse on the fake pass like the reference's
    ret_dict."""
    n, t, h, w, c = data.shape
    t = t // 3 * 3
    n_clip = n * t // 3

    if hr_flow_merge is None:
        if use_pp_crit:
            hr_flow_bw = hr_flow[:, 0:t:3]
            hr_flow_fw = jnp.flip(hr_flow, 1)[:, 1:t:3]
        else:
            assert fnet_params is not None
            lr_h, lr_w = lr_data.shape[2], lr_data.shape[3]
            lr_curr = lr_data[:, 1:t:3].reshape(n_clip, lr_h, lr_w, c)
            lr_next = lr_data[:, 2:t:3].reshape(n_clip, lr_h, lr_w, c)
            lr_flow_fw = fnet_apply(fnet_params, lr_curr, lr_next)
            hr_flow_fw = cfg.scale * resize(lr_flow_fw, (h, w), "bilinear")
            hr_flow_fw = hr_flow_fw.reshape(n, t // 3, h, w, 2)
            hr_flow_bw = hr_flow[:, 0:t:3]
        hr_flow_idle = jnp.zeros_like(hr_flow_bw)
        hr_flow_merge = jnp.stack(
            [hr_flow_bw, hr_flow_idle, hr_flow_fw], axis=2
        ).reshape(n_clip * 3, h, w, 2)
        hr_flow_merge = jax.lax.stop_gradient(hr_flow_merge)

    cond_data = _triplet_pack(bi_data[:, :t], n_clip, h, w, c)
    orig_data = _triplet_pack(data[:, :t], n_clip, h, w, c)

    warp = backward_warp(data[:, :t].reshape(n * t, h, w, c), hr_flow_merge)
    warp_data = _triplet_pack(warp.reshape(n, t, h, w, c), n_clip, h, w, c)
    # crop borders then zero-pad back (training stability, :443-446)
    s_size = cfg.spatial_size
    c_size = int(s_size * crop_border_ratio)
    n_pad = (s_size - c_size) // 2
    if n_pad > 0:
        core = warp_data[:, n_pad : n_pad + c_size, n_pad : n_pad + c_size, :]
        warp_data = jnp.pad(
            core, ((0, 0), (n_pad, n_pad), (n_pad, n_pad), (0, 0))
        )

    x = jnp.concatenate([orig_data, warp_data, cond_data], axis=-1)
    logits, feats = _head_forward(params, x)
    return logits, feats, hr_flow_merge
