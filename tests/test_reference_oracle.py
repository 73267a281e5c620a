"""Parity tests against the ACTUAL reference implementations.

The reference repo is mounted read-only at /root/reference; torch (CPU)
is installed.  These tests import the reference's own model classes —
BSVD (model.py), SRVGGNetCompact (realesrgan/factory.py), FRNet
(egvsr/egvsr.py), FSRCNN (fsrcnn/model.py) — as *test oracles*: shared
random weights are pushed through both the reference module and our JAX
rebuild, and the outputs must agree.  No reference code is copied; it is
executed in place.

Import strategy notes:
- bsvd/model.py and fsrcnn/model.py are self-contained given torch; they
  load via importlib from the absolute path.
- bsvd hardcodes device='cuda' for its state buffers, so the module-level
  `torch.device` is patched to always return cpu for these tests.
- realesrgan/factory.py imports basicsr/realesrgan (not installed); only
  the inline SRVGGNetCompact class (factory.py:18-82) is needed, so that
  class's source region is exec'd standalone.
- egvsr/egvsr.py uses package-relative imports; a synthetic package whose
  __path__ points at the reference directory satisfies them.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REF = "/root/reference/src/upscale/model"
RNG = np.random.default_rng(7)


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))


def nchw(x):  # NHWC ndarray -> torch NCHW
    return t(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def nhwc(x):  # torch NCHW -> NHWC ndarray
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


def sd_numpy(module):
    return {k: v.detach().cpu().numpy().astype(np.float32)
            for k, v in module.state_dict().items()}


# --------------------------------------------------------------- BSVD

@pytest.fixture(scope="module")
def ref_bsvd_mod():
    return _load_module("ref_bsvd_oracle", f"{REF}/bsvd/model.py")


def _cpu_device_patch(monkeypatch, mod):
    real_device = torch.device

    def cpu_device(*args, **kwargs):
        return real_device("cpu")

    monkeypatch.setattr(mod.torch, "device", cpu_device, raising=True)


def test_bsvd_oracle_streaming(monkeypatch, ref_bsvd_mod):
    """Our denoise_clip bit-matches the reference BSVD's streaming
    protocol (model.py:94-138,526-580) with shared random weights."""
    from sharkshark_tpu.models import bsvd

    _cpu_device_patch(monkeypatch, ref_bsvd_mod)
    ref = ref_bsvd_mod.BSVD(
        chns=[8, 16, 32], mid_ch=8, in_ch=4, out_ch=3,
        norm="none", act="relu6", interm_ch=6, pretrain_ckpt=None,
    ).eval()

    # module state_dict -> the checkpoint dialect our from_torch consumes.
    # The reference's per-block load() functions (model.py:276-306) define
    # the mapping: DownBlock stores its memconv under convblock.3, UpBlock
    # stores memconv under convblock.0 and its conv under convblock.1, and
    # MemCvBlock renames 'op.conv.' <-> 'net.' (model.py:167-169).
    sd = {}
    for k, v in sd_numpy(ref).items():
        if ".convblock.0." in k and "upc" in k and ".memconv." not in k:
            k = k.replace(".convblock.0.", ".convblock.1.")
        if ".memconv." in k:
            k = k.replace(
                ".memconv.", ".convblock.3." if "downc" in k else ".convblock.0."
            )
        k = k.replace(".op.conv.", ".net.")
        k = k.replace("temp1.", "base_model.nets_list.0.", 1)
        k = k.replace("temp2.", "base_model.nets_list.1.", 1)
        sd[k] = v
    cfg = bsvd.BSVDConfig(chns=(8, 16, 32), mid_ch=8, in_ch=4, out_ch=3,
                          interm_ch=6)
    params = bsvd.from_torch(sd, cfg)

    T, H, W = 6, 16, 16
    frames = RNG.standard_normal((T, 1, H, W, 4), dtype=np.float32) * 0.3

    # drive the reference protocol: feed T frames, then flush with Nones
    # until T non-None outputs arrive (streaming_forward's loop without
    # its .cuda() calls — model.py:542-571)
    outs = []
    with torch.no_grad():
        feeds = [nchw(frames[i]) for i in range(T)] + [None] * (
            bsvd.SHIFT_NUM + 1
        )
        for x in feeds:
            y = ref.feedin_one_element(x)
            if isinstance(y, torch.Tensor):
                outs.append(nhwc(y))
            if len(outs) == T:
                break
    assert len(outs) == T
    want = np.stack(outs, axis=0)

    got = np.asarray(bsvd.denoise_clip(params, jnp.asarray(frames), cfg=cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------- SRVGG

def _load_srvgg_class():
    """Exec only the inline SRVGGNetCompact class from the reference
    factory (factory.py:18-82) — its basicsr/realesrgan imports are not
    installed, and the class itself depends only on torch."""
    src = open(f"{REF}/realesrgan/factory.py").read()
    start = src.index("class SRVGGNetCompact")
    end = src.index("\n@dataclass", start)
    ns = {"nn": torch.nn, "F": torch.nn.functional, "torch": torch}
    exec(compile(src[start:end], "ref_srvgg_oracle", "exec"), ns)
    return ns["SRVGGNetCompact"]


def test_srvgg_oracle():
    from sharkshark_tpu.models import srvgg

    klass = _load_srvgg_class()
    ref = klass(num_in_ch=3, num_out_ch=3, num_feat=16, num_conv=4,
                upscale=4, act_type="prelu").eval()
    cfg = srvgg.SRVGGConfig(num_feat=16, num_conv=4, upscale=4)
    params = srvgg.from_torch(sd_numpy(ref), cfg)

    x = RNG.random((2, 12, 20, 3), dtype=np.float32)
    with torch.no_grad():
        want = nhwc(ref(nchw(x)))
    got = np.asarray(srvgg.apply(params, jnp.asarray(x), cfg=cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------- EGVSR

@pytest.fixture(scope="module")
def ref_egvsr_mod():
    pkg = types.ModuleType("ref_egvsr_pkg")
    pkg.__path__ = [f"{REF}/egvsr"]
    pkg.__package__ = "ref_egvsr_pkg"
    sys.modules["ref_egvsr_pkg"] = pkg
    return _load_module("ref_egvsr_pkg.egvsr", f"{REF}/egvsr/egvsr.py")


def test_egvsr_frnet_oracle_step(ref_egvsr_mod):
    """frnet_step matches the reference FRNet.forward (egvsr.py:180-212)
    with shared random weights, exact gather warp."""
    from sharkshark_tpu.models import egvsr

    ref = ref_egvsr_mod.FRNet(in_nc=3, out_nc=3, nf=64, nb=2,
                              degradation="BI", scale=4).eval()
    cfg = egvsr.EGVSRConfig(nf=64, nb=2)
    params = egvsr.from_torch(sd_numpy(ref), cfg)

    H, W = 16, 24  # multiples of 8: exercises the un-padded flow path
    lr_curr = RNG.random((1, H, W, 3), dtype=np.float32)
    lr_prev = RNG.random((1, H, W, 3), dtype=np.float32)
    hr_prev = RNG.random((1, 4 * H, 4 * W, 3), dtype=np.float32)

    with torch.no_grad():
        want = nhwc(ref(nchw(lr_curr), nchw(lr_prev), nchw(hr_prev)))
    got = np.asarray(
        egvsr.frnet_step(params, jnp.asarray(lr_curr), jnp.asarray(lr_prev),
                         jnp.asarray(hr_prev), cfg=cfg, fast_warp=False)
    )
    # warp gathers amplify tiny flow-field float diffs at a few pixels
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)
    assert np.median(np.abs(got - want)) < 1e-5


def test_egvsr_forward_sequence_oracle(ref_egvsr_mod):
    """Training-path forward_sequence matches the reference's recurrent
    unroll (egvsr.py:214-265) frame by frame."""
    from sharkshark_tpu.models import egvsr

    ref = ref_egvsr_mod.FRNet(in_nc=3, out_nc=3, nf=64, nb=2,
                              degradation="BI", scale=4).eval()
    cfg = egvsr.EGVSRConfig(nf=64, nb=2)
    params = egvsr.from_torch(sd_numpy(ref), cfg)

    N, T, H, W = 1, 3, 16, 16
    lr = RNG.random((N, T, H, W, 3), dtype=np.float32)
    lr_t = t(np.transpose(lr, (0, 1, 4, 2, 3)))  # NTCHW
    with torch.no_grad():
        out = ref.forward_sequence(lr_t)
    want = np.transpose(
        (out["hr_data"] if isinstance(out, dict) else out).numpy(),
        (0, 1, 3, 4, 2),
    )
    got = np.asarray(egvsr.forward_sequence(params, jnp.asarray(lr), cfg=cfg)["hr_data"])
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)
    assert np.median(np.abs(got - want)) < 1e-5


# --------------------------------------------------------------- FSRCNN

def test_fsrcnn_oracle_real_weights():
    """Our FSRCNN with the reference's checked-in T91 weights matches the
    reference FSRCNN module (model.py:6-72) on the same input."""
    from sharkshark_tpu.models import fsrcnn
    from sharkshark_tpu.models.torch_import import load_state_dict

    ref_mod = _load_module("ref_fsrcnn_oracle", f"{REF}/fsrcnn/model.py")
    ref = ref_mod.FSRCNN(upscale_factor=4).eval()
    ckpt = f"{REF}/fsrcnn/fsrcnn_x4-T91.pth"
    sd = load_state_dict(ckpt)
    ref.load_state_dict({k: t(v) for k, v in sd.items()})
    params = fsrcnn.from_torch(sd)

    x = RNG.random((1, 14, 18, 1), dtype=np.float32)
    with torch.no_grad():
        want = nhwc(ref(nchw(x)))
    got = np.asarray(fsrcnn.apply(params, jnp.asarray(x), factor=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fsrcnn_x2_oracle_real_weights():
    """x2 factor against the reference's checked-in fsrcnn_x2-T91.pth
    (the x2 path was never exercised with real weights before — VERDICT
    r2 residual micro-surface)."""
    from sharkshark_tpu.models import fsrcnn
    from sharkshark_tpu.models.torch_import import load_state_dict

    ref_mod = _load_module("ref_fsrcnn_oracle_x2", f"{REF}/fsrcnn/model.py")
    ref = ref_mod.FSRCNN(upscale_factor=2).eval()
    ckpt = f"{REF}/fsrcnn/fsrcnn_x2-T91.pth"
    sd = load_state_dict(ckpt)
    ref.load_state_dict({k: t(v) for k, v in sd.items()})
    params = fsrcnn.from_torch(sd)

    x = RNG.random((1, 14, 18, 1), dtype=np.float32)
    with torch.no_grad():
        want = nhwc(ref(nchw(x)))
    got = np.asarray(fsrcnn.apply(params, jnp.asarray(x), factor=2))
    assert got.shape == want.shape == (1, 28, 36, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------- BD / production EGVSR mode

def test_tecogan_bicubic_upsample_oracle():
    """ops.upsample_tecogan bit-matches the reference's BicubicUpsample
    module (net_utils.py:111-166) — the BD-mode flow upsampler of the
    production FRNet (egvsr_upscaler.py:26)."""
    nu = _load_module("ref_net_utils_oracle",
                      "/root/reference/src/upscale/model/egvsr/utils/net_utils.py")
    from sharkshark_tpu.ops import upsample_tecogan

    x = RNG.random((2, 5, 7, 3), dtype=np.float32)
    ref = nu.BicubicUpsample(4)
    with torch.no_grad():
        want = nhwc(ref(nchw(x)))
    got = np.asarray(upsample_tecogan(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_egvsr_frnet_oracle_step_bd(ref_egvsr_mod):
    """frnet_step with degradation='BD' (the production mode: TecoGAN
    bicubic flow upsample) matches the reference FRNet.forward."""
    from sharkshark_tpu.models import egvsr

    ref = ref_egvsr_mod.FRNet(in_nc=3, out_nc=3, nf=64, nb=2,
                              degradation="BD", scale=4).eval()
    cfg = egvsr.EGVSRConfig(nf=64, nb=2, degradation="BD")
    params = egvsr.from_torch(sd_numpy(ref), cfg)

    H, W = 16, 24
    lr_curr = RNG.random((1, H, W, 3), dtype=np.float32)
    lr_prev = RNG.random((1, H, W, 3), dtype=np.float32)
    hr_prev = RNG.random((1, 4 * H, 4 * W, 3), dtype=np.float32)

    with torch.no_grad():
        want = nhwc(ref(nchw(lr_curr), nchw(lr_prev), nchw(hr_prev)))
    got = np.asarray(
        egvsr.frnet_step(params, jnp.asarray(lr_curr), jnp.asarray(lr_prev),
                         jnp.asarray(hr_prev), cfg=cfg, fast_warp=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)
    assert np.median(np.abs(got - want)) < 1e-5


def test_egvsr_config_from_torch_production_shape(ref_egvsr_mod):
    """config_from_torch recovers the production instantiation
    (nb=10, BD — egvsr_upscaler.py:26) and the class default (nb=16, BI)
    from their state dicts alone."""
    from sharkshark_tpu.models import egvsr

    prod = ref_egvsr_mod.FRNet(in_nc=3, out_nc=3, nf=64, nb=10,
                               degradation="BD", scale=4)
    cfg = egvsr.config_from_torch(sd_numpy(prod))
    assert (cfg.nb, cfg.nf, cfg.degradation) == (10, 64, "BD")
    assert (cfg.in_nc, cfg.out_nc, cfg.scale) == (3, 3, 4)

    default = ref_egvsr_mod.FRNet(in_nc=3, out_nc=3, nf=64, nb=16,
                                  degradation="BI", scale=4)
    cfg = egvsr.config_from_torch(sd_numpy(default))
    assert (cfg.nb, cfg.degradation) == (16, "BI")
