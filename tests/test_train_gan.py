"""GAN training tree tests: discriminators, the full VSRGAN step,
datasets/degradation, metrics, checkpoint roundtrip, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharkshark_tpu.models import egvsr
from sharkshark_tpu.train import (
    GANTrainState,
    VSRGANConfig,
    checkpoint,
    create_gan_state,
    datasets,
    discriminators as D,
    make_gan_train_step,
    metrics,
    model_summary,
)

TINY_G = egvsr.EGVSRConfig(nf=16, nb=1)
TINY_D = D.DiscriminatorConfig(spatial_size=32)


def test_spatial_discriminator_shapes():
    params = D.init_spatial(jax.random.PRNGKey(0), TINY_D)
    x = jnp.zeros((2, 3, 32, 32, 3))
    logits, feats = D.spatial_forward_sequence(params, x, cfg=TINY_D)
    assert logits.shape == (6, 1)
    assert len(feats) == 4
    assert feats[-1].shape == (6, 2, 2, 256)


def test_spatio_temporal_discriminator_shapes():
    params = D.init_spatio_temporal(jax.random.PRNGKey(0), TINY_D)
    n, t, h, w = 1, 3, 32, 32
    data = jnp.zeros((n, t, h, w, 3))
    lr = jnp.zeros((n, t, 8, 8, 3))
    bi = jnp.zeros((n, t, h, w, 3))
    flow = jnp.zeros((n, t - 1, h, w, 2))
    logits, feats, merge = D.spatio_temporal_forward_sequence(
        params, data, lr_data=lr, bi_data=bi, hr_flow=flow,
        use_pp_crit=True, cfg=TINY_D,
    )
    assert logits.shape == (1, 1)
    assert merge.shape == (3, h, w, 2)
    # flow merge reuse path
    logits2, _, _ = D.spatio_temporal_forward_sequence(
        params, data, lr_data=lr, bi_data=bi, hr_flow=flow,
        hr_flow_merge=merge, cfg=TINY_D,
    )
    np.testing.assert_allclose(logits, logits2, rtol=1e-5)


def test_gan_train_step_runs_and_updates():
    cfg = VSRGANConfig(
        model_cfg=TINY_G,
        disc_cfg=TINY_D,
        update_policy="always",
    )
    state = create_gan_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_gan_train_step(cfg))
    n, t, lh, lw = 1, 3, 8, 8
    lr = jax.random.uniform(jax.random.PRNGKey(1), (n, t, lh, lw, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (n, t, 32, 32, 3))
    old_g = state.params_g["srnet"]["conv_out"]["w"]
    old_d = jax.tree.leaves(state.params_d)[0]
    state, logs = step(state, lr, gt)
    assert int(state.step) == 1 and int(state.cnt_upd_d) == 1
    for key in ["l_pix_G", "l_warp_G", "l_pp_G", "l_fm_G", "l_gan_G", "l_gan_D"]:
        assert np.isfinite(float(logs[key])), key
    assert not np.allclose(old_g, state.params_g["srnet"]["conv_out"]["w"])
    assert not np.allclose(old_d, jax.tree.leaves(state.params_d)[0])


def test_gan_adaptive_policy_can_skip_d():
    cfg = VSRGANConfig(
        model_cfg=TINY_G, disc_cfg=TINY_D,
        update_policy="adaptive", update_threshold=-1e9,  # never update D
    )
    state = create_gan_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_gan_train_step(cfg))
    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 8, 8, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 32, 32, 3))
    old_d = jax.tree.leaves(state.params_d)[0]
    state, logs = step(state, lr, gt)
    assert int(state.cnt_upd_d) == 0
    np.testing.assert_allclose(old_d, jax.tree.leaves(state.params_d)[0])
    assert float(logs["l_gan_D"]) == 0.0


def test_bd_degradation_shapes():
    kernel = datasets.gaussian_downsample_kernel(sigma=1.5)
    assert kernel.shape == (9 * 2 + 1 - 8, 11, 1, 1) or kernel.shape[0] == kernel.shape[1]
    gt = jnp.ones((1, 2, 40 + 8, 40 + 8, 3))
    out = datasets.prepare_data(gt, kernel, scale=4, sigma=1.5)
    assert out["lr"].shape == (1, 2, 10, 10, 3)
    assert out["gt"].shape == (1, 2, 40, 40, 3)
    # interior of a constant image stays constant under a normalized kernel
    np.testing.assert_allclose(np.asarray(out["lr"][0, 0, 4, 4]), 1.0, rtol=1e-5)


def test_paired_folder_dataset(tmp_path):
    import cv2

    for split, size in [("gt", 32), ("lr", 8)]:
        d = tmp_path / split / "seq000"
        d.mkdir(parents=True)
        for i in range(3):
            cv2.imwrite(str(d / f"{i:04d}.png"), np.full((size, size, 3), i * 10, np.uint8))
    ds = datasets.PairedFolderDataset(str(tmp_path / "gt"), str(tmp_path / "lr"))
    assert len(ds) == 1
    s = ds[0]
    assert s["gt"].shape == (3, 32, 32, 3) and s["gt"].dtype == np.uint8
    assert s["lr"].shape == (3, 8, 8, 3) and s["lr"].dtype == np.float32
    loader = datasets.create_dataloader(ds, batch_size=1, shuffle=False)
    batch = next(iter(loader))
    assert batch["gt"].shape == (1, 3, 32, 32, 3)


def test_psnr_and_tof():
    img = np.random.RandomState(0).randint(0, 256, (32, 32, 3), np.uint8)
    assert metrics.compute_psnr(img, img, "rgb") == float("inf")
    noisy = np.clip(img.astype(int) + 5, 0, 255).astype(np.uint8)
    p = metrics.compute_psnr(img, noisy, "rgb")
    assert 30 < p < 40
    # y-colorspace differs from rgb
    assert metrics.compute_psnr(img, noisy, "y") != p
    t = metrics.compute_tof(img, img, noisy, noisy)
    assert np.isfinite(t)


def test_metric_calculator_aggregation(tmp_path):
    calc = metrics.MetricCalculator(metrics=["PSNR", "tOF"])
    seq = np.random.RandomState(0).randint(0, 256, (3, 16, 16, 3), np.uint8)
    calc.compute_sequence_metrics("seq0", seq, seq)
    avg = calc.average()
    assert avg["PSNR"] == float("inf") and avg["tOF"] == 0.0
    path = str(tmp_path / "m.json")
    calc.save(path, "test")
    assert os.path.exists(path)


def test_checkpoint_roundtrip(tmp_path):
    from sharkshark_tpu.train import VSRTrainConfig, create_train_state

    cfg = VSRTrainConfig(model_cfg=TINY_G)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    path = checkpoint.save_checkpoint(str(tmp_path), state, 7)
    assert checkpoint.latest_checkpoint(str(tmp_path)) == path
    template = create_train_state(jax.random.PRNGKey(1), cfg)
    restored = checkpoint.load_checkpoint(path, template)
    np.testing.assert_allclose(
        np.asarray(state.params["srnet"]["conv_in"]["w"]),
        np.asarray(restored.params["srnet"]["conv_in"]["w"]),
    )


def test_profile_model_reports_flops():
    params = egvsr.init_params(jax.random.PRNGKey(0), TINY_G)
    lr = jnp.zeros((2, 1, 16, 16, 3))

    def fwd(p, x):
        return egvsr.infer_sequence(p, x)

    stats = model_summary.profile_model(fwd, params, lr)
    assert stats["flops"] > 0
    assert model_summary.count_params(params) > 1000
