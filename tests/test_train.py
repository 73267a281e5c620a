"""Training-tree tests: loss parity with torch formulas, schedule shapes,
and a smoke train loop that actually reduces the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharkshark_tpu.models import egvsr
from sharkshark_tpu.train import (
    VSRTrainConfig,
    charbonnier_loss,
    cosine_annealing_restart,
    cosine_similarity_loss,
    create_train_state,
    define_criterion,
    define_lr_schedule,
    lsgan_loss,
    make_train_step,
    multistep_lr,
    vanilla_gan_loss,
)

TINY = egvsr.EGVSRConfig(nf=16, nb=1)


def test_charbonnier_matches_torch_formula():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 4).astype(np.float32)
    y = rng.randn(2, 3, 4).astype(np.float32)
    want = np.sum(np.sqrt((x - y) ** 2 + 1e-6))
    got = charbonnier_loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gan_losses():
    logits = jnp.asarray([[0.0, 2.0], [-2.0, 1.0]])
    # vanilla: BCEWithLogits against constant target
    v_real = vanilla_gan_loss(logits, True)
    v_fake = vanilla_gan_loss(logits, False)
    sig = 1 / (1 + np.exp(-np.asarray(logits)))
    np.testing.assert_allclose(v_real, -np.mean(np.log(sig)), rtol=1e-5)
    np.testing.assert_allclose(v_fake, -np.mean(np.log(1 - sig)), rtol=1e-5)
    # lsgan: mse against 1/0
    np.testing.assert_allclose(
        lsgan_loss(logits, True), np.mean((np.asarray(logits) - 1) ** 2), rtol=1e-6
    )


def test_cosine_similarity_loss_zero_for_identical():
    x = jnp.ones((2, 5, 3))
    assert float(cosine_similarity_loss(x, x)) == pytest.approx(0.0, abs=1e-6)


def test_criterion_registry():
    assert define_criterion(None) is None
    crit = define_criterion({"type": "CB", "reduction": "mean"})
    assert float(crit(jnp.ones(3), jnp.ones(3))) == pytest.approx(1e-3, rel=1e-2)
    with pytest.raises(ValueError):
        define_criterion({"type": "nope"})


def test_multistep_schedule():
    sched = multistep_lr(1.0, [10, 20], gamma=0.1)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(25)) == pytest.approx(0.01, rel=1e-5)


def test_cosine_restart_schedule():
    sched = cosine_annealing_restart(1.0, periods=[10, 10], restart_weights=[1.0, 0.5])
    assert float(sched(0)) == pytest.approx(1.0)
    # end of first period ~ eta_min
    assert float(sched(9)) < 0.1
    # restart at half weight
    assert float(sched(10)) == pytest.approx(0.5)
    via_registry = define_lr_schedule(
        {"type": "CosineAnnealingLR_Restart", "periods": [10, 10]}, 1.0
    )
    assert float(via_registry(0)) == pytest.approx(1.0)


def test_train_step_reduces_loss():
    cfg = VSRTrainConfig(model_cfg=TINY, lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg))

    key = jax.random.PRNGKey(1)
    lr_data = jax.random.uniform(key, (2, 3, 8, 8, 3))
    gt_data = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 32, 32, 3))

    state, logs0 = step(state, lr_data, gt_data)
    for _ in range(10):
        state, logs = step(state, lr_data, gt_data)
    assert float(logs["l_total"]) < float(logs0["l_total"])
    assert int(state.step) == 11
    assert "l_pix_G" in logs and "l_warp_G" in logs


def test_sisr_train_step_reduces_loss():
    """Single-image SR branch (train/sisr.py, driver generator 'srvgg'):
    repeated steps on a fixed batch must drive the pixel loss down."""
    from sharkshark_tpu.models import srvgg
    from sharkshark_tpu.train.sisr import (
        SISRTrainConfig,
        create_sisr_state,
        make_sisr_train_step,
    )

    cfg = SISRTrainConfig(
        model_cfg=srvgg.SRVGGConfig(num_feat=16, num_conv=2), lr=1e-3
    )
    state = create_sisr_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_sisr_train_step(cfg))
    lr_data = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 8, 8, 3))
    gt_data = jax.random.uniform(jax.random.PRNGKey(2), (2, 1, 32, 32, 3))
    state, logs0 = step(state, lr_data, gt_data)
    for _ in range(20):
        state, logs = step(state, lr_data, gt_data)
    assert float(logs["l_total"]) < float(logs0["l_total"])
    assert int(state.step) == 21


def test_denoise_clip_forward_matches_scan_path():
    """train/denoise.clip_forward (one layer-major chunk over clip +
    SHIFT_NUM flush) must equal bsvd.denoise_clip (the scan path that is
    itself bit-matched against the reference streaming protocol)."""
    from sharkshark_tpu.models import bsvd
    from sharkshark_tpu.train.denoise import clip_forward

    params = bsvd.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 1, 16, 16, 4))
    a = clip_forward(params, x)
    b = bsvd.denoise_clip(params, x)
    assert a.shape == b.shape == (5, 1, 16, 16, 3)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4


def test_denoise_train_step_reduces_loss():
    """BSVD denoise branch (train/denoise.py, driver generator 'bsvd'):
    blind-Gaussian noise is sampled on device per step; repeated steps on
    a fixed clean batch must drive the Charbonnier loss down."""
    from sharkshark_tpu.train.denoise import (
        DenoiseTrainConfig,
        create_denoise_state,
        make_denoise_train_step,
    )

    cfg = DenoiseTrainConfig(lr=1e-3)
    state = create_denoise_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_denoise_train_step(cfg))
    gt = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 16, 16, 3))
    state, logs0 = step(state, None, gt)
    for _ in range(10):
        state, logs = step(state, None, gt)
    assert float(logs["l_total"]) < float(logs0["l_total"])
    assert int(state.step) == 11
    assert 10.0 / 255.0 <= float(logs["sigma_mean"]) <= 50.0 / 255.0


def test_denoise_noise_stream_is_restart_stable():
    """Resuming from iter k must replay the same noise (the step derives
    its PRNG from noise_seed + state.step, not from a host RNG)."""
    from sharkshark_tpu.train.denoise import (
        DenoiseTrainConfig,
        create_denoise_state,
        make_denoise_train_step,
    )

    cfg = DenoiseTrainConfig(lr=1e-3)
    step = jax.jit(make_denoise_train_step(cfg))
    gt = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 16, 16, 3))

    s = create_denoise_state(jax.random.PRNGKey(0), cfg)
    s, _ = step(s, None, gt)
    _, logs_a = step(s, None, gt)

    # "resume": fresh optimizer replays from the same params/step
    s2 = create_denoise_state(jax.random.PRNGKey(0), cfg)._replace(
        params=s.params, step=s.step
    )
    _, logs_b = step(s2, None, gt)
    assert float(logs_a["sigma_mean"]) == float(logs_b["sigma_mean"])
    assert float(logs_a["l_pix_G"]) == float(logs_b["l_pix_G"])


def test_export_torch_bsvd_round_trip():
    """tools/export_torch_bsvd params_to_state_dict must invert
    models/bsvd.from_torch exactly (the minted-weight production path)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import numpy as np
    from export_torch_bsvd import params_to_state_dict

    from sharkshark_tpu.models import bsvd

    params = bsvd.init_params(jax.random.PRNGKey(3))
    sd = {k: v.numpy() for k, v in params_to_state_dict(params).items()}
    back = bsvd.from_torch(sd)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        assert np.allclose(np.asarray(a), np.asarray(b))
