"""Golden / parity tests for the model zoo.

Strategy (SURVEY.md §4): the only reference weights present in the mirror
are FSRCNN's T91 checkpoints, so FSRCNN gets a real-weight golden test; the
other cores are verified against clean-room torch-functional executions of
the *same random weights* (state dicts generated here, imported via
models.torch_import), which pins the architecture + weight-layout mapping.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sharkshark_tpu.models import bsvd, egvsr, fsrcnn, rrdbnet, srvgg
from sharkshark_tpu.models.torch_import import load_state_dict, dni_blend

RNG = np.random.default_rng(7)
FSRCNN_PTH = "/root/reference/src/upscale/model/fsrcnn/fsrcnn_x4-T91.pth"


def nchw(x):
    return np.moveaxis(x, -1, 1)


def nhwc(x):
    return np.moveaxis(x, 1, -1)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


# ------------------------------------------------------------------ FSRCNN


@pytest.mark.skipif(not os.path.exists(FSRCNN_PTH), reason="reference weights not mounted")
def test_fsrcnn_real_weights_match_torch_functional():
    sd = load_state_dict(FSRCNN_PTH)
    x = RNG.random((2, 24, 32, 1)).astype(np.float32)

    # torch-functional forward straight off the state dict
    y = t(nchw(x))
    y = F.prelu(F.conv2d(y, t(sd["feature_extraction.0.weight"]), t(sd["feature_extraction.0.bias"]), padding=2),
                t(sd["feature_extraction.1.weight"]))
    y = F.prelu(F.conv2d(y, t(sd["shrink.0.weight"]), t(sd["shrink.0.bias"])), t(sd["shrink.1.weight"]))
    for i in range(4):
        y = F.prelu(F.conv2d(y, t(sd[f"map.{2*i}.weight"]), t(sd[f"map.{2*i}.bias"]), padding=1),
                    t(sd[f"map.{2*i+1}.weight"]))
    y = F.prelu(F.conv2d(y, t(sd["expand.0.weight"]), t(sd["expand.0.bias"])), t(sd["expand.1.weight"]))
    want = F.conv_transpose2d(y, t(sd["deconv.weight"]), t(sd["deconv.bias"]),
                              stride=4, padding=4, output_padding=3).numpy()

    params = fsrcnn.from_torch(sd)
    got = nchw(np.asarray(fsrcnn.apply(params, jnp.asarray(x), factor=4)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------- SRVGG


def _srvgg_torch_sd(cfg: srvgg.SRVGGConfig, rng):
    sd = {}
    chans = [(cfg.num_in_ch, cfg.num_feat)] + [(cfg.num_feat, cfg.num_feat)] * cfg.num_conv
    for i, (ci, co) in enumerate(chans):
        sd[f"body.{2*i}.weight"] = rng.standard_normal((co, ci, 3, 3)).astype(np.float32) * 0.1
        sd[f"body.{2*i}.bias"] = rng.standard_normal((co,)).astype(np.float32) * 0.1
        sd[f"body.{2*i+1}.weight"] = rng.random((co,)).astype(np.float32)
    n = 2 * (cfg.num_conv + 1)
    co = cfg.num_out_ch * cfg.upscale**2
    sd[f"body.{n}.weight"] = rng.standard_normal((co, cfg.num_feat, 3, 3)).astype(np.float32) * 0.1
    sd[f"body.{n}.bias"] = rng.standard_normal((co,)).astype(np.float32) * 0.1
    return sd


def _srvgg_torch_forward(sd, cfg, x_nchw):
    y = t(x_nchw)
    for i in range(cfg.num_conv + 1):
        y = F.conv2d(y, t(sd[f"body.{2*i}.weight"]), t(sd[f"body.{2*i}.bias"]), padding=1)
        y = F.prelu(y, t(sd[f"body.{2*i+1}.weight"]))
    n = 2 * (cfg.num_conv + 1)
    y = F.conv2d(y, t(sd[f"body.{n}.weight"]), t(sd[f"body.{n}.bias"]), padding=1)
    y = F.pixel_shuffle(y, cfg.upscale)
    base = F.interpolate(t(x_nchw), scale_factor=float(cfg.upscale), mode="nearest")
    return (y + base).numpy()


def test_srvgg_matches_torch():
    cfg = srvgg.SRVGGConfig(num_conv=4, num_feat=16)
    sd = _srvgg_torch_sd(cfg, RNG)
    x = RNG.random((2, 12, 10, 3)).astype(np.float32)
    want = _srvgg_torch_forward(sd, cfg, nchw(x))
    params = srvgg.from_torch(sd, cfg)
    got = nchw(np.asarray(srvgg.apply(params, jnp.asarray(x), cfg=cfg)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_srvgg_dni_blend_is_linear():
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=8)
    sd_a = _srvgg_torch_sd(cfg, np.random.default_rng(1))
    sd_b = _srvgg_torch_sd(cfg, np.random.default_rng(2))
    blended = dni_blend(sd_a, sd_b, 0.3)
    for k in sd_a:
        np.testing.assert_allclose(blended[k], 0.3 * sd_a[k] + 0.7 * sd_b[k], rtol=1e-6)


# ----------------------------------------------------------------- RRDBNet


def _rrdb_torch_sd(cfg, rng):
    sd = {}

    def conv(name, ci, co):
        sd[name + ".weight"] = rng.standard_normal((co, ci, 3, 3)).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.standard_normal((co,)).astype(np.float32) * 0.05

    in_ch = cfg.num_in_ch * (4 if cfg.scale == 2 else 1)
    nf, gc = cfg.num_feat, cfg.num_grow_ch
    conv("conv_first", in_ch, nf)
    for i in range(cfg.num_block):
        for j in range(3):
            for k in range(5):
                ci = nf + k * gc
                co = gc if k < 4 else nf
                conv(f"body.{i}.rdb{j+1}.conv{k+1}", ci, co)
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr"):
        conv(name, nf, nf)
    conv("conv_last", nf, cfg.num_out_ch)
    return sd


def _rrdb_torch_forward(sd, cfg, x_nchw):
    lrelu = lambda v: F.leaky_relu(v, 0.2)
    cv = lambda v, n: F.conv2d(v, t(sd[n + ".weight"]), t(sd[n + ".bias"]), padding=1)

    x = t(x_nchw)
    if cfg.scale == 2:
        x = F.pixel_unshuffle(x, 2)
    feat = cv(x, "conv_first")
    body = feat
    for i in range(cfg.num_block):
        rrdb_in = body
        for j in range(3):
            rdb_in = body
            xs = [body]
            for k in range(4):
                xs.append(lrelu(cv(torch.cat(xs, 1), f"body.{i}.rdb{j+1}.conv{k+1}")))
            x5 = cv(torch.cat(xs, 1), f"body.{i}.rdb{j+1}.conv5")
            body = x5 * 0.2 + rdb_in
        body = body * 0.2 + rrdb_in
    feat = feat + cv(body, "conv_body")
    feat = lrelu(cv(F.interpolate(feat, scale_factor=2.0, mode="nearest"), "conv_up1"))
    feat = lrelu(cv(F.interpolate(feat, scale_factor=2.0, mode="nearest"), "conv_up2"))
    return cv(lrelu(cv(feat, "conv_hr")), "conv_last").numpy()


@pytest.mark.parametrize("scale", [4, 2])
def test_rrdbnet_matches_torch(scale):
    cfg = rrdbnet.RRDBConfig(num_feat=16, num_block=2, num_grow_ch=8, scale=scale)
    sd = _rrdb_torch_sd(cfg, RNG)
    x = RNG.random((1, 8, 12, 3)).astype(np.float32)
    want = _rrdb_torch_forward(sd, cfg, nchw(x))
    params = rrdbnet.from_torch(sd, cfg)
    got = nchw(np.asarray(rrdbnet.apply(params, jnp.asarray(x), cfg=cfg)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
