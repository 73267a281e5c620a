"""Lane-folded conv re-parametrizations (ops/lanefold.py) must match the
plain convs they replace — stride-1, stride-2 and conv+PixelShuffle(2)
forms, at the fold factors the BSVD warm chunk path uses (f=4 for C=32
full-res, f_in=2/4 for the down convs, f_in=1/2 for the up convs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharkshark_tpu.ops import conv2d, pixel_shuffle
from sharkshark_tpu.ops.lanefold import (
    conv3x3_folded,
    conv_ps2_folded,
    conv_stride2_folded,
    fold_lanes,
    unfold_lanes,
)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.2


def test_fold_unfold_roundtrip():
    x = _rand(jax.random.PRNGKey(0), (2, 6, 16, 5))
    for f in (2, 4):
        xf = fold_lanes(x, f)
        assert xf.shape == (2, 6, 16 // f, f * 5)
        np.testing.assert_array_equal(unfold_lanes(xf, f), x)
        # lane u*C + c holds original pixel (w*f + u, c)
        np.testing.assert_array_equal(xf[0, 0, 0, 5:10], x[0, 0, 1, :])


@pytest.mark.parametrize("f,ci,co", [(4, 4, 30), (4, 30, 32), (4, 32, 32), (2, 32, 3)])
def test_conv3x3_folded(f, ci, co):
    k = jax.random.PRNGKey(f * 100 + ci)
    x = _rand(k, (2, 8, 16, ci))
    w = _rand(jax.random.fold_in(k, 1), (3, 3, ci, co))
    b = _rand(jax.random.fold_in(k, 2), (co,))
    ref = conv2d(x, w, b, padding=1)
    got = unfold_lanes(conv3x3_folded(fold_lanes(x, f), w, b, f), f)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


@pytest.mark.parametrize("f_in,ci,co", [(4, 32, 64), (2, 64, 128)])
def test_conv_stride2_folded(f_in, ci, co):
    k = jax.random.PRNGKey(f_in * 7 + ci)
    x = _rand(k, (2, 8, 16, ci))
    w = _rand(jax.random.fold_in(k, 1), (3, 3, ci, co))
    b = _rand(jax.random.fold_in(k, 2), (co,))
    ref = conv2d(x, w, b, stride=2, padding=1)
    got = unfold_lanes(conv_stride2_folded(fold_lanes(x, f_in), w, b, f_in), f_in // 2)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


@pytest.mark.parametrize("f_in,ci,co", [(1, 128, 64), (2, 64, 32)])
def test_conv_ps2_folded(f_in, ci, co):
    k = jax.random.PRNGKey(f_in * 13 + ci)
    x = _rand(k, (2, 6, 8, ci))
    w = _rand(jax.random.fold_in(k, 1), (3, 3, ci, 4 * co))
    b = _rand(jax.random.fold_in(k, 2), (4 * co,))
    ref = pixel_shuffle(conv2d(x, w, b, padding=1), 2)
    got = unfold_lanes(conv_ps2_folded(fold_lanes(x, f_in), w, b, f_in), 2 * f_in)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_conv_ps2_folded_no_bias():
    k = jax.random.PRNGKey(3)
    x = _rand(k, (1, 4, 8, 8))
    w = _rand(jax.random.fold_in(k, 1), (3, 3, 8, 16))
    ref = pixel_shuffle(conv2d(x, w, None, padding=1), 2)
    got = unfold_lanes(conv_ps2_folded(fold_lanes(x, 2), w, None, 2), 4)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_srvgg_body_folded_matches_plain(monkeypatch):
    """The folded SRVGG body (SHARKSHARK_LANEFOLD=force) matches the
    plain conv stack within accumulation-order tolerance."""
    from sharkshark_tpu.models import srvgg

    cfg = srvgg.SRVGGConfig(num_conv=3, num_feat=16)
    params = srvgg.init_params(jax.random.PRNGKey(0), cfg)
    x = _rand(jax.random.PRNGKey(1), (2, 8, 12, 3)) * 0.5 + 0.5
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "0")
    plain = srvgg.apply(params, x, cfg=cfg)
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    folded = srvgg.apply(params, x, cfg=cfg)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain), rtol=0, atol=1e-4)


def test_srvgg_body_folded_odd_width_falls_back(monkeypatch):
    from sharkshark_tpu.models import srvgg

    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=8)
    params = srvgg.init_params(jax.random.PRNGKey(0), cfg)
    x = _rand(jax.random.PRNGKey(1), (1, 6, 11, 3))  # odd W
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    out = srvgg.apply(params, x, cfg=cfg)
    assert out.shape == (1, 24, 44, 3)


def test_egvsr_srnet_folded_matches_plain(monkeypatch):
    from sharkshark_tpu.models import egvsr

    cfg = egvsr.EGVSRConfig(nb=2)
    params = egvsr.init_params(jax.random.PRNGKey(0), cfg)
    lr = _rand(jax.random.PRNGKey(1), (1, 8, 12, 3)) * 0.5 + 0.5
    hr_tran = _rand(jax.random.PRNGKey(2), (1, 8, 12, 48)) * 0.2
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "0")
    plain = egvsr.srnet_apply(params["srnet"], lr, hr_tran)
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    folded = egvsr.srnet_apply(params["srnet"], lr, hr_tran)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain), rtol=0, atol=1e-4)


def test_egvsr_fnet_folded_matches_plain(monkeypatch):
    from sharkshark_tpu.models import egvsr

    cfg = egvsr.EGVSRConfig(nb=1)
    params = egvsr.init_params(jax.random.PRNGKey(0), cfg)
    a = _rand(jax.random.PRNGKey(1), (1, 16, 24, 3)) * 0.5 + 0.5
    b = _rand(jax.random.PRNGKey(2), (1, 16, 24, 3)) * 0.5 + 0.5
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "0")
    plain = egvsr.fnet_apply(params["fnet"], a, b)
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    folded = egvsr.fnet_apply(params["fnet"], a, b)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain), rtol=0, atol=1e-5)


@pytest.mark.parametrize("parts", [2, 4])
def test_conv3x3_folded_hsplit(parts):
    from sharkshark_tpu.ops.lanefold import conv3x3_folded, conv3x3_folded_hsplit

    k = jax.random.PRNGKey(parts)
    x = _rand(k, (2, 8, 4, 128))
    w = _rand(jax.random.fold_in(k, 1), (3, 3, 32, 32))
    b = _rand(jax.random.fold_in(k, 2), (32,))
    ref = conv3x3_folded(x, w, b, 4)
    got = conv3x3_folded_hsplit(x, w, b, 4, parts=parts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=2e-5)


def test_folded_paths_differentiate(monkeypatch):
    """Training on TPU routes through the folded bodies — gradients must
    flow (the fold is plain lax.conv + weight scatter, both
    differentiable)."""
    from sharkshark_tpu.models import srvgg

    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    cfg = srvgg.SRVGGConfig(num_conv=2, num_feat=8)
    params = srvgg.init_params(jax.random.PRNGKey(0), cfg)
    x = _rand(jax.random.PRNGKey(1), (1, 8, 12, 3)) * 0.5 + 0.5

    def loss(p):
        return jnp.mean(srvgg.apply(p, x, cfg=cfg) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_espcn_body_folded_matches_plain(monkeypatch):
    """Force-mode routes ESPCN's conv2/conv3 through the f=2/f=4 folded
    lowering (models/variants.py espcn_apply) — must match the plain
    body within accumulation-order tolerance (ADVICE r4: the routed fold
    shipped without a regression test)."""
    from sharkshark_tpu.models.variants import ESPCNConfig, espcn_apply, espcn_init

    cfg = ESPCNConfig(scale=2)
    params = espcn_init(jax.random.PRNGKey(0), cfg)
    x = _rand(jax.random.PRNGKey(1), (2, 8, 16, 1)) * 0.5 + 0.5
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "0")
    monkeypatch.delenv("SHARKSHARK_LANEFOLD_ESPCN", raising=False)
    plain = espcn_apply(params, x, cfg=cfg)
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    folded = espcn_apply(params, x, cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(plain), rtol=0, atol=1e-5
    )


def test_fsrcnn_map_stack_folded_matches_plain(monkeypatch):
    """Force-mode folds FSRCNN's S=12 mapping stack at f=8 with the PReLU
    alpha tiled across sub-pixels (models/fsrcnn.py _map_stack)."""
    from sharkshark_tpu.models import fsrcnn

    params = fsrcnn.init_params(jax.random.PRNGKey(0))
    x = _rand(jax.random.PRNGKey(1), (1, 8, 16, 1)) * 0.5 + 0.5
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "0")
    plain = fsrcnn.apply(params, x)
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    folded = fsrcnn.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(plain), rtol=0, atol=1e-4
    )


def test_bsvd_stream_step_folded_matches_plain(monkeypatch):
    """Force-mode routes bsvd.stream_step's full-res C<=32 convs through
    the f=4 folded lowering (_conv_fullres_step) — the streamed outputs
    must match the plain lowering frame for frame."""
    from sharkshark_tpu.models import bsvd

    cfg = bsvd.BSVDConfig(chns=(8, 16, 32), mid_ch=8, interm_ch=8)
    params = bsvd.init_params(jax.random.PRNGKey(0), cfg)
    frames = _rand(jax.random.PRNGKey(1), (20, 1, 8, 8, cfg.in_ch)) * 0.3

    def run():
        st = bsvd.init_stream_state(1, 8, 8, cfg)
        ys = []
        for i in range(frames.shape[0]):
            y, st = bsvd.stream_step(params, st, frames[i], cfg=cfg)
            ys.append(np.asarray(y))
        return np.stack(ys)

    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "0")
    plain = run()
    monkeypatch.setenv("SHARKSHARK_LANEFOLD", "force")
    folded = run()
    np.testing.assert_allclose(folded, plain, rtol=0, atol=1e-4)
