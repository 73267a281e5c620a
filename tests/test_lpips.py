"""LPIPS (net-lin alex) end-to-end: real linear calibration weights +
independent torch cross-check of the distance math.

The reference ships the LPIPS v0.1 linear weights
(src/upscale/model/egvsr/official_metrics/LPIPSmodels/v0.1/alex.pth);
the torchvision AlexNet backbone weights are not on this image, so the
backbone runs with synthetic weights here — the torch reimplementation
below (clean-room from the PNetLin formula, reference
LPIPS/models/networks_basic.py) uses the SAME backbone weights, making
the comparison exact for everything our implementation owns: weight
import/transposition, the conv/pool feature stack, unit-normalization,
and the clamped 1x1 linear calibration."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sharkshark_tpu.train.metrics import _SCALE, _SHIFT, LPIPS

LIN_PATH = (
    "/root/reference/src/upscale/model/egvsr/official_metrics/"
    "LPIPSmodels/v0.1/alex.pth"
)

# torchvision alexnet .features conv shapes: (out, in, kh, kw), stride, pad
_ALEX_SPECS = {
    0: ((64, 3, 11, 11), 4, 2),
    3: ((192, 64, 5, 5), 1, 2),
    6: ((384, 192, 3, 3), 1, 1),
    8: ((256, 384, 3, 3), 1, 1),
    10: ((256, 256, 3, 3), 1, 1),
}

needs_ref_lin = pytest.mark.skipif(
    not os.path.exists(LIN_PATH), reason="LPIPS lin weights not available"
)


def _synthetic_alexnet(tmp_path):
    rng = np.random.default_rng(11)
    sd = {}
    for i, (shape, _, _) in _ALEX_SPECS.items():
        sd[f"features.{i}.weight"] = torch.from_numpy(
            (rng.normal(size=shape) * 0.05).astype(np.float32)
        )
        sd[f"features.{i}.bias"] = torch.from_numpy(
            (rng.normal(size=shape[0]) * 0.01).astype(np.float32)
        )
    path = str(tmp_path / "alexnet_synth.pth")
    torch.save(sd, path)
    return path, sd


def _torch_lpips(sd, lin_sd, img0, img1):
    """Independent PNetLin: scale -> conv/relu/pool taps -> unit-norm ->
    squared diff -> clamped 1x1 lin -> spatial mean -> sum over slices."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        taps = []
        for i, (shape, stride, pad) in _ALEX_SPECS.items():
            x = F.conv2d(x, sd[f"features.{i}.weight"], sd[f"features.{i}.bias"],
                         stride=stride, padding=pad)
            x = F.relu(x)
            taps.append(x)
            if i in (0, 3):
                x = F.max_pool2d(x, 3, 2)
        return taps

    total = 0.0
    for k, (a, b) in enumerate(zip(feats(img0), feats(img1))):
        a = a / (a.norm(dim=1, keepdim=True) + 1e-10)
        b = b / (b.norm(dim=1, keepdim=True) + 1e-10)
        w = lin_sd[f"lin{k}.model.1.weight"].clamp(min=0)
        val = F.conv2d((a - b) ** 2, w)
        total = total + val.mean(dim=(2, 3))[:, 0]
    return total


@needs_ref_lin
def test_real_lin_weights_parse():
    lp_lin = torch.load(LIN_PATH, map_location="cpu", weights_only=True)
    for k, c in enumerate((64, 192, 384, 256, 256)):
        assert tuple(lp_lin[f"lin{k}.model.1.weight"].shape) == (1, c, 1, 1)


@needs_ref_lin
def test_lpips_matches_torch_reference(tmp_path):
    alex_path, sd = _synthetic_alexnet(tmp_path)
    model = LPIPS(alex_path, LIN_PATH)

    rng = np.random.default_rng(3)
    img0 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), -1, 1).astype(np.float32)

    got = np.asarray(model(jnp.asarray(img0), jnp.asarray(img1)))

    lin_sd = torch.load(LIN_PATH, map_location="cpu", weights_only=True)
    want = _torch_lpips(
        sd, lin_sd,
        torch.from_numpy(img0.transpose(0, 3, 1, 2)),
        torch.from_numpy(img1.transpose(0, 3, 1, 2)),
    ).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)
    # identical inputs -> zero distance; perturbed -> positive
    zero = np.asarray(model(jnp.asarray(img0), jnp.asarray(img0)))
    assert np.all(zero < 1e-6) and np.all(got > zero + 1e-6)


# ---------------------------------------------------------------------------
# Out-of-box minted LPIPS (tools/mint_lpips.py; weights checked in under
# weights/minted/ — VERDICT r3 item 6: `metrics: [LPIPS]` must run on a
# fresh offline checkout)
# ---------------------------------------------------------------------------

from sharkshark_tpu.train.metrics import (  # noqa: E402
    MINTED_ALEX_PATH,
    MINTED_LIN_PATH,
    MetricCalculator,
)

needs_minted = pytest.mark.skipif(
    not (os.path.exists(MINTED_ALEX_PATH) and os.path.exists(MINTED_LIN_PATH)),
    reason="mint LPIPS weights first (tools/mint_lpips.py)",
)


@needs_minted
def test_minted_lpips_loads_and_ranks_distortions():
    model = LPIPS.minted()
    rng = np.random.default_rng(7)
    base = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    # smooth the uniform noise so "image + noise" is meaningful
    import cv2

    base = cv2.GaussianBlur(base[0], (0, 0), 4)[None]
    ds = []
    for sigma in (0.02, 0.08, 0.2):
        noisy = np.clip(base + rng.normal(0, sigma, base.shape), 0, 1)
        d = model(
            jnp.asarray(base * 2 - 1, jnp.float32),
            jnp.asarray(noisy * 2 - 1, jnp.float32),
        )
        ds.append(float(d[0]))
    assert ds[0] < ds[1] < ds[2], ds
    zero = float(model(jnp.asarray(base * 2 - 1), jnp.asarray(base * 2 - 1))[0])
    assert zero < 1e-6


@needs_minted
def test_metric_calculator_lpips_out_of_box():
    """MetricCalculator with metrics=[LPIPS] and the minted weights —
    the exact path train/driver.py test mode takes with a
    `metrics: [PSNR, LPIPS]` config and no lpips_weights override."""
    calc = MetricCalculator(metrics=["PSNR", "LPIPS"], lpips=LPIPS.minted())
    rng = np.random.default_rng(5)
    gt = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    pred = np.clip(
        gt.astype(np.int16) + rng.integers(-20, 21, gt.shape), 0, 255
    ).astype(np.uint8)
    res = calc.compute_sequence_metrics("seq0", gt, pred)
    assert np.isfinite(res["PSNR"]) and np.isfinite(res["LPIPS"])
    assert res["LPIPS"] > 0
    same = calc.compute_sequence_metrics("seq1", gt, gt)
    assert same["LPIPS"] < 1e-6


@needs_minted
def test_metric_json_stamps_lpips_provenance(tmp_path):
    """Every metrics JSON the driver writes must say whether its LPIPS
    numbers came from minted or ingested weights (VERDICT r4 item 8) —
    minted values are a rank metric, not LPIPS v0.1."""
    import json

    lp = LPIPS.minted()
    assert lp.provenance == "minted"
    calc = MetricCalculator(metrics=["LPIPS"], lpips=lp)
    rng = np.random.default_rng(5)
    gt = rng.integers(0, 256, (1, 48, 48, 3), dtype=np.uint8)
    calc.compute_sequence_metrics("seq0", gt, gt)
    path = str(tmp_path / "test_avg.json")
    calc.save(path, "iter 1")
    with open(path) as f:
        data = json.load(f)
    assert data["iter 1"]["lpips_weights"] == "minted"
    # PSNR-only JSONs must NOT carry the stamp
    calc2 = MetricCalculator(metrics=["PSNR"])
    calc2.compute_sequence_metrics("seq0", gt, gt)
    calc2.save(path, "iter 2")
    with open(path) as f:
        data = json.load(f)
    assert "lpips_weights" not in data["iter 2"]
