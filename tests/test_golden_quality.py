"""Golden end-to-end quality check: the production step with real
checked-in FSRCNN weights must reconstruct a real image better than plain
interpolation (the SURVEY §4 golden-image strategy; reference ships
sample PNGs + the T91 weights)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharkshark_tpu.models import fsrcnn, torch_import
from sharkshark_tpu.ops import resize
from sharkshark_tpu.train.metrics import compute_psnr
from sharkshark_tpu.upscale import UpscaleSpec, upscale_multi

WEIGHTS = "/root/reference/src/upscale/model/fsrcnn/fsrcnn_x4-T91.pth"
SAMPLE = "/root/reference/samples/images/shark1.png"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(WEIGHTS) and os.path.exists(SAMPLE)),
    reason="reference weights/sample not present",
)


def test_fsrcnn_beats_interpolation_on_real_image():
    """Standard FSRCNN evaluation protocol: the T91 weights are a
    Y-channel (luma) model — SR the Y plane, compare PSNR on Y. (The
    reference's live service feeds RGB planes through the same 1-channel
    net, which trades PSNR for simplicity; this test checks the *model
    core* reconstructs better than interpolation under its training
    protocol.)"""
    from PIL import Image

    from sharkshark_tpu.train.metrics import rgb_to_ycbcr

    params = fsrcnn.from_torch(torch_import.load_state_dict(WEIGHTS))
    # detailed region (text + tile texture), 128x192
    gt_rgb = np.asarray(Image.open(SAMPLE).convert("RGB"))[20:148, 360:552]
    gt_y = rgb_to_ycbcr(gt_rgb)[..., 0].astype(np.float32) / 255.0

    # degradation must be ANTIALIASED (T91 = MATLAB imresize); torch-style
    # bicubic without antialias creates out-of-distribution aliasing that
    # drops the model below plain interpolation — 'area' approximates it
    lr_y = np.asarray(
        jnp.clip(resize(jnp.asarray(gt_y)[..., None], (32, 48), "area"), 0, 1)
    )
    sr_y = np.asarray(
        jnp.clip(fsrcnn.apply(params, jnp.asarray(lr_y)[None], factor=4)[0], 0, 1)
    )
    bil_y = np.asarray(
        jnp.clip(resize(jnp.asarray(lr_y), (128, 192), "bilinear"), 0, 1)
    )

    def psnr(a, b):
        return compute_psnr(
            (a * 255).astype(np.uint8), (b * 255).astype(np.uint8), "rgb"
        )

    psnr_model = psnr(gt_y[..., None], sr_y)
    psnr_naive = psnr(gt_y[..., None], bil_y)
    assert psnr_model > psnr_naive + 0.5, (psnr_model, psnr_naive)
    assert psnr_model > 24, psnr_model


# ---- gated golden tests: activate once real weights are ingested ----
# (no network egress on this host: see BASELINE.md "weights situation"
# and tools/ingest_weights.py)

WDIR = os.environ.get("SHARKSHARK_WEIGHT_DIR", os.path.join(
    os.path.dirname(__file__), "..", "weights"))


def _w(name):
    return os.path.join(WDIR, name)


@pytest.mark.skipif(
    not os.path.exists(_w("realesr-general-x4v3.pth")),
    reason="ingest realesr-general-x4v3.pth to enable (tools/ingest_weights.py)",
)
def test_srvgg_real_weights_beat_interpolation():
    from PIL import Image

    from sharkshark_tpu.models import srvgg
    from sharkshark_tpu.train.metrics import compute_psnr as psnr

    sd = torch_import.load_state_dict(_w("realesr-general-x4v3.pth"))
    params = srvgg.from_torch(sd, srvgg.GENERAL_X4V3)
    gt = np.asarray(Image.open(SAMPLE).convert("RGB"))[20:148, 360:552]
    lr = np.asarray(jnp.clip(resize(
        jnp.asarray(gt, jnp.float32)[None] / 255.0, (32, 48), "area"), 0, 1))
    sr = np.asarray(jnp.clip(
        srvgg.apply(params, jnp.asarray(lr), cfg=srvgg.GENERAL_X4V3)[0], 0, 1))
    bil = np.asarray(jnp.clip(resize(jnp.asarray(lr)[0], (128, 192), "bilinear"), 0, 1))
    p_sr = psnr((sr * 255).astype(np.uint8), gt, "rgb")
    p_bil = psnr((bil * 255).astype(np.uint8), gt, "rgb")
    assert p_sr > p_bil, (p_sr, p_bil)


@pytest.mark.skipif(
    not os.path.exists(_w("bsvd-32.pth")),
    reason="ingest bsvd-32.pth to enable (tools/ingest_weights.py)",
)
def test_bsvd_real_weights_denoise_gain():
    from PIL import Image

    from sharkshark_tpu.models import bsvd

    params = bsvd.from_torch(torch_import.load_state_dict(_w("bsvd-32.pth")))
    gt = np.asarray(Image.open(SAMPLE).convert("RGB"))[:64, :96].astype(np.float32) / 255.0
    rng = np.random.default_rng(0)
    noisy = np.clip(gt + rng.normal(0, 0.1, gt.shape).astype(np.float32), 0, 1)
    clip = np.repeat(noisy[None], 8, axis=0)[:, None]  # (T, N, H, W, 3)
    noise_map = np.full(clip.shape[:-1] + (1,), 0.1, np.float32)
    x4 = np.concatenate([clip, noise_map], axis=-1)
    den = np.asarray(bsvd.denoise_clip(params, jnp.asarray(x4)))[4, 0]
    mse_noisy = float(((noisy - gt) ** 2).mean())
    mse_den = float(((np.clip(den, 0, 1) - gt) ** 2).mean())
    assert mse_den < mse_noisy, (mse_den, mse_noisy)


@pytest.mark.skipif(
    not os.path.exists(_w("EGVSR_iter420000.pth")),
    reason="ingest EGVSR_iter420000.pth to enable (tools/ingest_weights.py)",
)
def test_egvsr_real_weights_beat_interpolation():
    from PIL import Image

    from sharkshark_tpu.models import egvsr
    from sharkshark_tpu.train.metrics import compute_psnr as psnr

    params = egvsr.from_torch(torch_import.load_state_dict(_w("EGVSR_iter420000.pth")))
    gt = np.asarray(Image.open(SAMPLE).convert("RGB"))[20:148, 360:552]
    lr = np.asarray(jnp.clip(resize(
        jnp.asarray(gt, jnp.float32)[None] / 255.0, (32, 48), "area"), 0, 1))
    st = egvsr.init_recurrent_state(1, 32, 48)
    sr = None
    for _ in range(3):  # recurrence warm-up on a static scene
        sr, st = egvsr.infer_step(params, st, jnp.asarray(lr), fast_warp=False)
    sr = np.asarray(jnp.clip(sr[0], 0, 1))
    bil = np.asarray(jnp.clip(resize(jnp.asarray(lr)[0], (128, 192), "bilinear"), 0, 1))
    p_sr = psnr((sr * 255).astype(np.uint8), gt, "rgb")
    p_bil = psnr((bil * 255).astype(np.uint8), gt, "rgb")
    assert p_sr > p_bil, (p_sr, p_bil)


HOLDOUT = "/root/reference/samples/images/bsvd.png"  # excluded from training


@pytest.mark.skipif(
    not os.path.exists(_w(os.path.join("minted", "srvgg-derived-x4.pth"))),
    reason="mint weights first (train/driver.py + tools/export_torch_srvgg.py)",
)
def test_minted_srvgg_beats_interpolation_on_holdout():
    """Locally-trained production-architecture SRVGG (train/driver.py on
    the derived-from-stills dataset, exported via export_torch_srvgg)
    must beat bicubic on the HELD-OUT frame through the unchanged
    production import path — the no-egress substitute for the
    reference's downloaded realesr-general-x4v3 quality evidence."""
    import cv2
    from PIL import Image

    from sharkshark_tpu.models import srvgg
    from sharkshark_tpu.train.metrics import compute_psnr as psnr

    sd = torch_import.load_state_dict(_w(os.path.join("minted", "srvgg-derived-x4.pth")))
    params = srvgg.from_torch(sd, srvgg.GENERAL_X4V3)
    gt = np.asarray(Image.open(HOLDOUT).convert("RGB"))[80:336, 320:704]
    h, w = gt.shape[:2]
    # the training degradation: cv2 bicubic downscale (make_derived_dataset)
    lr = cv2.resize(gt, (w // 4, h // 4), interpolation=cv2.INTER_CUBIC)
    lr_f = jnp.asarray(lr, jnp.float32)[None] / 255.0
    sr = np.asarray(jnp.clip(srvgg.apply(params, lr_f, cfg=srvgg.GENERAL_X4V3)[0], 0, 1))
    bic = cv2.resize(lr, (w, h), interpolation=cv2.INTER_CUBIC)
    p_sr = psnr((sr * 255).astype(np.uint8), gt, "y")
    p_bic = psnr(bic, gt, "y")
    assert p_sr > p_bic + 0.3, (p_sr, p_bic)


@pytest.mark.skipif(
    not os.path.exists(_w(os.path.join("minted", "egvsr-derived-x4.pth"))),
    reason="mint weights first (configs/egvsr_derived.yml + tools/export_torch_egvsr.py)",
)
def test_minted_egvsr_beats_interpolation_on_holdout():
    """Locally-trained FRNet (full recurrent VSR train path: pixel +
    warping loss on panned sequences) must beat bicubic on a held-out
    panned sequence through the production import path."""
    import cv2
    from PIL import Image

    from sharkshark_tpu.models import egvsr
    from sharkshark_tpu.train.metrics import compute_psnr as psnr

    sd = torch_import.load_state_dict(_w(os.path.join("minted", "egvsr-derived-x4.pth")))
    params = egvsr.from_torch(sd, egvsr.EGVSRConfig(nb=10))
    img = np.asarray(Image.open(HOLDOUT).convert("RGB"))
    # 4-frame pan, exactly the derived-dataset motion model
    gts = [img[80 + 2 * j : 272 + 2 * j, 320 + 2 * j : 576 + 2 * j] for j in range(4)]
    lrs = [
        cv2.resize(g, (64, 48), interpolation=cv2.INTER_CUBIC) for g in gts
    ]
    lr_seq = jnp.asarray(np.stack(lrs), jnp.float32)[:, None] / 255.0
    hr = np.asarray(
        jnp.clip(egvsr.infer_sequence(params, lr_seq)[-1, 0], 0, 1)
    )
    hr_u8 = (hr * 255 + 0.5).astype(np.uint8)
    bic = cv2.resize(lrs[-1], (256, 192), interpolation=cv2.INTER_CUBIC)
    p_sr = psnr(hr_u8, gts[-1], "y")
    p_bic = psnr(bic, gts[-1], "y")
    assert p_sr > p_bic, (p_sr, p_bic)


@pytest.mark.skipif(
    not os.path.exists(_w(os.path.join("minted", "bsvd-derived-32.pth"))),
    reason="mint weights first (configs/bsvd_derived.yml + tools/export_torch_bsvd.py)",
)
def test_minted_bsvd_denoises_holdout_clip():
    """Locally-trained production-architecture BSVD (train/denoise.py
    blind-Gaussian recipe — a capability extension: the reference ships
    bsvd-32/64.pth pretrained-only with no train path) must clean a
    noisy held-out panned clip well past the noisy input's PSNR through
    the production import path + streaming-equivalent clip forward."""
    from PIL import Image

    from sharkshark_tpu.models import bsvd
    from sharkshark_tpu.train.metrics import compute_psnr as psnr

    sd = torch_import.load_state_dict(_w(os.path.join("minted", "bsvd-derived-32.pth")))
    params = bsvd.from_torch(sd, bsvd.BSVD_32)
    img = np.asarray(Image.open(HOLDOUT).convert("RGB"))
    # 4-frame pan over the holdout (derived-dataset motion model)
    gts = np.stack(
        [img[80 + 2 * j : 272 + 2 * j, 320 + 2 * j : 576 + 2 * j] for j in range(4)]
    )
    sigma = 25.0 / 255.0
    rng = np.random.RandomState(7)
    clean = gts.astype(np.float32) / 255.0
    noisy = clean + rng.normal(0.0, sigma, clean.shape).astype(np.float32)
    nmap = np.full(clean.shape[:-1] + (1,), sigma, np.float32)
    x = jnp.asarray(np.concatenate([noisy, nmap], axis=-1))[:, None]
    den = np.asarray(jnp.clip(bsvd.denoise_clip(params, x)[:, 0], 0, 1))
    den_u8 = (den * 255 + 0.5).astype(np.uint8)
    noisy_u8 = (np.clip(noisy, 0, 1) * 255 + 0.5).astype(np.uint8)
    p_den = np.mean([psnr(den_u8[j], gts[j], "y") for j in range(4)])
    p_noisy = np.mean([psnr(noisy_u8[j], gts[j], "y") for j in range(4)])
    assert p_den > p_noisy + 3.0, (p_den, p_noisy)
