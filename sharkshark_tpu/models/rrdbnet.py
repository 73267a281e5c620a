"""RRDBNet — the heavyweight RealESRGAN generator (x4/x2, anime-6B).

Capability parity with the basicsr RRDBNet the reference builds through
its model zoo (reference src/upscale/model/realesrgan/factory.py:112-127):
conv_first -> num_block x RRDB (3 residual-dense blocks of 5 growing convs,
leaky 0.2, residual scale 0.2) -> conv_body (+skip) -> 2x [nearest-up, conv,
lrelu] -> conv_hr -> conv_last.  scale=2 folds a pixel-unshuffle into the
input as the original does.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv2d, leaky_relu, resize
from .torch_import import conv_from_torch


class RRDBConfig(NamedTuple):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4


X4PLUS = RRDBConfig()
X4PLUS_ANIME_6B = RRDBConfig(num_block=6)
X2PLUS = RRDBConfig(scale=2)


def _conv_init(k, kh, kw, i, o, gain=0.1):
    fan_in = i * kh * kw
    w = jax.random.normal(k, (kh, kw, i, o), jnp.float32) * np.sqrt(2.0 / fan_in) * gain
    return {"w": w, "b": jnp.zeros((o,), jnp.float32)}


def _init_rdb(key, nf, gc):
    ks = jax.random.split(key, 5)
    return {
        f"conv{i + 1}": _conv_init(ks[i], 3, 3, nf + i * gc, gc if i < 4 else nf)
        for i in range(5)
    }


def init_params(key: jax.Array, cfg: RRDBConfig = X4PLUS) -> dict:
    in_ch = cfg.num_in_ch * (4 if cfg.scale == 2 else 1)
    nf, gc = cfg.num_feat, cfg.num_grow_ch
    keys = jax.random.split(key, cfg.num_block * 3 + 6)
    blocks = [
        {f"rdb{j + 1}": _init_rdb(keys[i * 3 + j], nf, gc) for j in range(3)}
        for i in range(cfg.num_block)
    ]
    base = cfg.num_block * 3
    return {
        "conv_first": _conv_init(keys[base], 3, 3, in_ch, nf, gain=1.0),
        "body": blocks,
        "conv_body": _conv_init(keys[base + 1], 3, 3, nf, nf, gain=1.0),
        "conv_up1": _conv_init(keys[base + 2], 3, 3, nf, nf, gain=1.0),
        "conv_up2": _conv_init(keys[base + 3], 3, 3, nf, nf, gain=1.0),
        "conv_hr": _conv_init(keys[base + 4], 3, 3, nf, nf, gain=1.0),
        "conv_last": _conv_init(keys[base + 5], 3, 3, nf, cfg.num_out_ch, gain=1.0),
    }


def _rdb_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    x1 = leaky_relu(conv2d(x, **p["conv1"], padding=1), 0.2)
    x2 = leaky_relu(conv2d(jnp.concatenate([x, x1], -1), **p["conv2"], padding=1), 0.2)
    x3 = leaky_relu(conv2d(jnp.concatenate([x, x1, x2], -1), **p["conv3"], padding=1), 0.2)
    x4 = leaky_relu(conv2d(jnp.concatenate([x, x1, x2, x3], -1), **p["conv4"], padding=1), 0.2)
    x5 = conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), **p["conv5"], padding=1)
    return x5 * jnp.asarray(0.2, x.dtype) + x


def _rrdb_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    out = _rdb_apply(p["rdb1"], x)
    out = _rdb_apply(p["rdb2"], out)
    out = _rdb_apply(p["rdb3"], out)
    return out * jnp.asarray(0.2, x.dtype) + x


def _pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC inverse pixel shuffle with torch channel order
    (c_out = c*r*r with c major, then dy, dx)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h', w', c, dy, dx
    return x.reshape(n, h // r, w // r, c * r * r)


def apply(params: dict, x: jnp.ndarray, *, cfg: RRDBConfig = X4PLUS) -> jnp.ndarray:
    if cfg.scale == 2:
        x = _pixel_unshuffle(x, 2)
    feat = conv2d(x, **params["conv_first"], padding=1)
    body = feat
    for blk in params["body"]:
        body = _rrdb_apply(blk, body)
    feat = feat + conv2d(body, **params["conv_body"], padding=1)
    h, w = feat.shape[-3], feat.shape[-2]
    feat = resize(feat, (h * 2, w * 2), "nearest")
    feat = leaky_relu(conv2d(feat, **params["conv_up1"], padding=1), 0.2)
    feat = resize(feat, (h * 4, w * 4), "nearest")
    feat = leaky_relu(conv2d(feat, **params["conv_up2"], padding=1), 0.2)
    feat = leaky_relu(conv2d(feat, **params["conv_hr"], padding=1), 0.2)
    return conv2d(feat, **params["conv_last"], padding=1)


def from_torch(sd: dict[str, np.ndarray], cfg: RRDBConfig = X4PLUS) -> dict:
    blocks = []
    for i in range(cfg.num_block):
        blocks.append(
            {
                f"rdb{j + 1}": {
                    f"conv{k + 1}": conv_from_torch(sd, f"body.{i}.rdb{j + 1}.conv{k + 1}.")
                    for k in range(5)
                }
                for j in range(3)
            }
        )
    return {
        "conv_first": conv_from_torch(sd, "conv_first."),
        "body": blocks,
        "conv_body": conv_from_torch(sd, "conv_body."),
        "conv_up1": conv_from_torch(sd, "conv_up1."),
        "conv_up2": conv_from_torch(sd, "conv_up2."),
        "conv_hr": conv_from_torch(sd, "conv_hr."),
        "conv_last": conv_from_torch(sd, "conv_last."),
    }
