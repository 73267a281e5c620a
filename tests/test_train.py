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
