"""Secondary VSR model zoo: ESPCN, VESPCN, SOF-VSR.

Capability parity with the reference's extra generators
(models/networks/{espcn,vespcn,sofvsr}_nets.py, selected via the yaml
`model.generator.name` registry in networks/__init__.py): single-frame
sub-pixel ESPCN, motion-compensated VESPCN (coarse-to-fine flownet + STN
warp), and SOF-VSR (3-level optical-flow RDB pyramid + draft-cube SR).

All are channel-last functional pytrees like the primary models. The
reference runs these on the Y channel (in_nc=1); channel count is a
config knob here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import backward_warp_ac0, conv2d, conv_transpose2d, leaky_relu, pixel_shuffle, resize

__all__ = [
    "ESPCNConfig", "espcn_init", "espcn_apply",
    "VESPCNConfig", "vespcn_init", "vespcn_apply",
    "SOFVSRConfig", "sofvsr_init", "sofvsr_apply",
]


def _conv(key, kh, kw, i, o, bias=True):
    fan_in = i * kh * kw
    p = {"w": jax.random.normal(key, (kh, kw, i, o), jnp.float32) * np.sqrt(2.0 / fan_in)}
    if bias:
        p["b"] = jnp.zeros((o,), jnp.float32)
    return p


# ---------------------------------------------------------------------------
# ESPCN (reference espcn_nets.py:12-60)
# ---------------------------------------------------------------------------


class ESPCNConfig(NamedTuple):
    scale: int = 4
    in_nc: int = 1
    out_nc: int = 1
    up_method: str = "subconv"  # 'subconv' | 'reconv' | 'deconv'


def espcn_init(key: jax.Array, cfg: ESPCNConfig = ESPCNConfig()) -> dict:
    ks = jax.random.split(key, 6)
    return {
        "conv1": _conv(ks[0], 5, 5, cfg.in_nc, 64),
        "conv2": _conv(ks[1], 3, 3, 64, 32),
        "conv3": _conv(ks[2], 3, 3, 32, 32),
        # reference hardcodes 1*scale^2 (Y-channel model, espcn_nets.py:16);
        # generalized to out_nc*scale^2 so RGB configs work too
        "pwconv": _conv(ks[3], 1, 1, 32, cfg.out_nc * cfg.scale**2),
        "reconv": _conv(ks[4], 1, 1, 32, cfg.out_nc),
        "deconv": _conv(ks[5], 5, 5, 32, cfg.out_nc),
    }


def espcn_apply(params: dict, x: jnp.ndarray, *, cfg: ESPCNConfig = ESPCNConfig()) -> jnp.ndarray:
    """x: (N, H, W, in_nc) -> sigmoid HR (N, sH, sW, out_nc)."""
    s = cfg.scale
    y = jnp.tanh(conv2d(x, **params["conv1"], padding=2))
    from ..ops.lanefold import conv3x3_folded, fold_lanes, lanefold_enabled, unfold_lanes

    import os as _os

    # MEASURED NEGATIVE on the dev v5e (round 4, probe_lanefold_stragglers):
    # folded 4.65 vs plain 4.51 ms at 360p x4 — ESPCN's body is only two
    # narrow convs bracketed by a 5x5 head and the subconv tail, so the
    # fold's 2-4x MAC multiplier isn't amortized.  Default OFF on TPU;
    # 'force' keeps the CPU parity tests exercising the folded lowering,
    # SHARKSHARK_LANEFOLD_ESPCN=1 re-enables for re-measurement.
    _espcn_fold = (
        _os.environ.get("SHARKSHARK_LANEFOLD") == "force"
        or _os.environ.get("SHARKSHARK_LANEFOLD_ESPCN") == "1"
    )
    if (
        _espcn_fold
        and params["conv2"]["w"].shape == (3, 3, 64, 32)
        and params["conv3"]["w"].shape == (3, 3, 32, 32)
        and lanefold_enabled(y.shape[-2], 4)
    ):
        # lane-folded body (ops/lanefold.py; ROADMAP straggler, round 4):
        # conv2 runs f=2 (64ch -> 128 in-lanes), conv3 f=4 (32ch -> 128
        # lanes); the f=2 -> f=4 refold between them is a free reshape.
        # Elementwise tanh commutes with the layout fold (exact).
        yf = jnp.tanh(conv3x3_folded(fold_lanes(y, 2), params["conv2"]["w"], params["conv2"].get("b"), 2))
        yf = fold_lanes(unfold_lanes(yf, 2), 4)
        y = unfold_lanes(jnp.tanh(conv3x3_folded(yf, params["conv3"]["w"], params["conv3"].get("b"), 4)), 4)
    else:
        y = jnp.tanh(conv2d(y, **params["conv2"], padding=1))
        y = jnp.tanh(conv2d(y, **params["conv3"], padding=1))
    if cfg.up_method == "deconv":
        y = conv_transpose2d(
            x=y, **params["deconv"], stride=s, padding=2, output_padding=s - 1
        )
    elif cfg.up_method == "reconv":
        h, w = y.shape[1], y.shape[2]
        y = resize(y, (h * s, w * s), "bilinear")
        y = conv2d(y, **params["reconv"])
    else:
        y = pixel_shuffle(conv2d(y, **params["pwconv"]), s)
    return jax.nn.sigmoid(y)


# ---------------------------------------------------------------------------
# VESPCN (reference vespcn_nets.py + utils/motion.py CoarseFineFlownet/STN)
# ---------------------------------------------------------------------------


class VESPCNConfig(NamedTuple):
    scale: int = 4
    channel: int = 1
    depth: int = 3


def _flownet_init(key, channel: int) -> dict:
    ks = jax.random.split(key, 10)
    return {
        "coarse": [
            _conv(ks[0], 5, 5, channel * 2, 24),
            _conv(ks[1], 3, 3, 24, 24),
            _conv(ks[2], 5, 5, 24, 24),
            _conv(ks[3], 3, 3, 24, 24),
            _conv(ks[4], 3, 3, 24, 32),
        ],
        "fine": [
            _conv(ks[5], 5, 5, channel * 3 + 2, 24),
            _conv(ks[6], 3, 3, 24, 24),
            _conv(ks[7], 3, 3, 24, 24),
            _conv(ks[8], 3, 3, 24, 24),
            _conv(ks[9], 3, 3, 24, 8),
        ],
    }


def _flownet_apply(p: dict, target: jnp.ndarray, ref: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """Coarse-to-fine flow from ref -> target (motion.py:139-178)."""
    c = p["coarse"]
    y = jnp.concatenate([ref, target], axis=-1)
    y = jnp.maximum(conv2d(y, **c[0], stride=2, padding=2), 0)
    y = jnp.maximum(conv2d(y, **c[1], padding=1), 0)
    y = jnp.maximum(conv2d(y, **c[2], stride=2, padding=2), 0)
    y = jnp.maximum(conv2d(y, **c[3], padding=1), 0)
    y = jnp.tanh(conv2d(y, **c[4], padding=1))
    flow_c = pixel_shuffle(y, 4)  # (N, H, W, 2)
    wc = backward_warp_ac0(ref, flow_c)
    f = p["fine"]
    y = jnp.concatenate([ref, target, flow_c, wc], axis=-1)
    y = jnp.maximum(conv2d(y, **f[0], stride=2, padding=2), 0)
    y = jnp.maximum(conv2d(y, **f[1], padding=1), 0)
    y = jnp.maximum(conv2d(y, **f[2], padding=1), 0)
    y = jnp.maximum(conv2d(y, **f[3], padding=1), 0)
    y = jnp.tanh(conv2d(y, **f[4], padding=1))
    flow_f = pixel_shuffle(y, 2) + flow_c
    return flow_f * gain


def vespcn_init(key: jax.Array, cfg: VESPCNConfig = VESPCNConfig()) -> dict:
    ks = jax.random.split(key, 10)
    c = cfg.channel
    return {
        "mc": _flownet_init(ks[0], c),
        "entry": _conv(ks[1], 3, 3, c * cfg.depth, 64),
        "body": [
            [_conv(ks[2 + 2 * i], 3, 3, 64, 64), _conv(ks[3 + 2 * i], 3, 3, 64, 64)]
            for i in range(3)
        ],
        "conv": _conv(ks[8], 3, 3, 64, 64 * cfg.scale**2),
        "exit": _conv(ks[9], 3, 3, 64, c),
    }


def vespcn_apply(params: dict, lr_seq: jnp.ndarray, *, cfg: VESPCNConfig = VESPCNConfig()) -> jnp.ndarray:
    """lr_seq: (T, H, W, C) window of `depth` frames -> HR center frame
    (1, sH, sW, C) (reference VESPNet.forward, vespcn_nets.py:73-102)."""
    t = lr_seq.shape[0]
    assert t == cfg.depth, (t, cfg.depth)
    center = cfg.depth // 2
    target = lr_seq[center : center + 1]
    warps = []
    for i in range(cfg.depth):
        if i == center:
            continue
        ref = lr_seq[i : i + 1]
        flow = _flownet_apply(params["mc"], target, ref, gain=32.0)
        warps.append(backward_warp_ac0(ref, flow))
    warps.append(target)
    x = jnp.concatenate(warps, axis=-1)

    # SRNet (reference vespcn_nets.py:46-66; VALID convs at entry/conv/exit)
    y = conv2d(x, **params["entry"], padding=1)
    z = y
    for blk in params["body"]:
        r = jnp.maximum(z, 0)
        r = jnp.maximum(conv2d(r, **blk[0], padding=1), 0)
        z = conv2d(r, **blk[1], padding=1) + z
    z = jnp.maximum(z, 0) + y
    z = conv2d(z, **params["conv"], padding=1)
    z = pixel_shuffle(z, cfg.scale)
    return conv2d(z, **params["exit"], padding=1)


# ---------------------------------------------------------------------------
# SOF-VSR (reference sofvsr_nets.py:20-210)
# ---------------------------------------------------------------------------


class SOFVSRConfig(NamedTuple):
    scale: int = 4
    n_dense_ofr: int = 4
    n_dense_sr: int = 5


def _rdb_init(key, n_dense: int, channels: int, growth: int) -> dict:
    ks = jax.random.split(key, n_dense + 1)
    layers = []
    c = channels
    for i in range(n_dense):
        layers.append(_conv(ks[i], 3, 3, c, growth, bias=False))
        c += growth
    return {"dense": layers, "fuse": _conv(ks[-1], 1, 1, c, channels, bias=False)}


def _rdb_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x
    for layer in p["dense"]:
        out = leaky_relu(conv2d(y, **layer, padding=1), 0.1)
        y = jnp.concatenate([y, out], axis=-1)
    return conv2d(y, **p["fuse"]) + x


def _ofr_level_init(key, in_ch: int, out_ch: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "conv1": _conv(ks[0], 3, 3, in_ch, 32, bias=False),
        "rdb1": _rdb_init(ks[1], 4, 32, 32),
        "rdb2": _rdb_init(ks[2], 4, 32, 32),
        "bottleneck": _conv(ks[3], 3, 3, 64, out_ch, bias=False),
        "conv2": _conv(jax.random.fold_in(key, 9), 3, 3, out_ch, out_ch),
    }


def _ofr_level_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = conv2d(x, **p["conv1"], padding=1)
    b1 = _rdb_apply(p["rdb1"], y)
    b2 = _rdb_apply(p["rdb2"], b1)
    y = conv2d(jnp.concatenate([b1, b2], axis=-1), **p["bottleneck"], padding=1)
    return conv2d(y, **p["conv2"], padding=1)


def sofvsr_init(key: jax.Array, cfg: SOFVSRConfig = SOFVSRConfig()) -> dict:
    ks = jax.random.split(key, 10)
    s = cfg.scale
    sr_rdbs = [_rdb_init(ks[3 + i], 5, 64, 32) for i in range(5)]
    return {
        "ofr_l1": _ofr_level_init(ks[0], 2, 2),
        "ofr_l2": _ofr_level_init(ks[1], 6, 2),
        "ofr_l3": _ofr_level_init(ks[2], 6, 2 * s * s),
        "sr_conv": _conv(ks[8], 3, 3, 3 + 2 * s * s, 64, bias=False),
        "sr_rdbs": sr_rdbs,
        "sr_bottleneck": _conv(ks[9], 1, 1, 64 * 6, s * s, bias=False),
        "sr_conv2": _conv(jax.random.fold_in(key, 7), 3, 3, s * s, s * s),
    }


def _avgpool2(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _sof_flow_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Reference optical_flow_warp (sofvsr_nets.py:20-44): base grid built
    with the align_corners=TRUE normalization, flow added as
    flow * 31/(size-1) in normalized units, sampled with grid_sample's
    default align_corners=FALSE + border padding. The mismatch is part of
    the trained model's semantics, so it is reproduced exactly."""
    from ..ops.warp import grid_sample_bilinear

    n, h, w, _ = image.shape
    iu = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)[None, None, :]
    iv = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)[None, :, None]
    gx = iu + flow[..., 0].astype(jnp.float32) * (31.0 / (w - 1))
    gy = iv + flow[..., 1].astype(jnp.float32) * (31.0 / (h - 1))
    # convert ac=False sample coords to the ac=True sampler's frame
    px = (gx + 1.0) * (w / 2.0) - 0.5
    py = (gy + 1.0) * (h / 2.0) - 0.5
    g1x = px / ((w - 1.0) / 2.0) - 1.0
    g1y = py / ((h - 1.0) / 2.0) - 1.0
    return grid_sample_bilinear(image, jnp.stack([g1x, g1y], axis=-1))


def _ofrnet_apply(params: dict, x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """x: (N, H, W, 2) frame pair -> HR flow (N, sH, sW, 2)
    (reference OFRnet.forward, sofvsr_nets.py:107-147)."""
    # level 1: half resolution
    x_l1 = _avgpool2(x)
    flow_l1 = _ofr_level_apply(params["ofr_l1"], x_l1)
    h, w = x.shape[1], x.shape[2]
    flow_l1_up = resize(flow_l1, (h, w), "bilinear")
    # level 2: full resolution
    warped = _sof_flow_warp(x[..., 0:1], flow_l1_up)
    res = x[..., 1:2] - warped
    x_l2 = jnp.concatenate([x, warped, res, flow_l1_up], axis=-1)
    flow_l2 = _ofr_level_apply(params["ofr_l2"], x_l2) + flow_l1_up
    # level 3: HR flow
    warped2 = _sof_flow_warp(x[..., 0:1], flow_l2)
    res2 = x[..., 1:2] - warped2
    x_l3 = jnp.concatenate([x, warped2, res2, flow_l2], axis=-1)
    flow_l3 = _ofr_level_apply(params["ofr_l3"], x_l3)
    flow_l3 = pixel_shuffle(flow_l3, scale) + resize(
        flow_l2, (h * scale, w * scale), "bilinear"
    )
    return flow_l3


def sofvsr_apply(params: dict, lr_seq: jnp.ndarray, *, cfg: SOFVSRConfig = SOFVSRConfig()) -> jnp.ndarray:
    """lr_seq: (N, H, W, 3) = (prev, cur, next) Y frames stacked in the
    channel dim -> HR center (N, sH, sW, 1)
    (reference SOFNet.forward, sofvsr_nets.py:186-210)."""
    s = cfg.scale
    h, w = lr_seq.shape[1], lr_seq.shape[2]
    in01 = jnp.stack([lr_seq[..., 0], lr_seq[..., 1]], axis=-1)
    in21 = jnp.stack([lr_seq[..., 2], lr_seq[..., 1]], axis=-1)
    flow01 = _ofrnet_apply(params, in01, s)
    flow21 = _ofrnet_apply(params, in21, s)

    drafts = [lr_seq]
    for i in range(s):
        for j in range(s):
            drafts.append(_sof_flow_warp(lr_seq[..., 0:1], flow01[:, i::s, j::s, :] / s))
            drafts.append(_sof_flow_warp(lr_seq[..., 2:3], flow21[:, i::s, j::s, :] / s))
    cube = jnp.concatenate(drafts, axis=-1)

    y = conv2d(cube, **params["sr_conv"], padding=1)
    feats = [y]
    b = y
    for rdb in params["sr_rdbs"]:
        b = _rdb_apply(rdb, b)
        feats.append(b)
    out = conv2d(jnp.concatenate(feats[1:] + [y], axis=-1), **params["sr_bottleneck"])
    out = conv2d(out, **params["sr_conv2"], padding=1)
    return pixel_shuffle(out, s)
