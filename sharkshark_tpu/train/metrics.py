"""Quality metrics: PSNR (RGB/Y), tOF, LPIPS, with per-sequence
aggregation and JSON persistence.

Rebuild of reference metrics/metric_calculator.py:14-261 and the vendored
LPIPS tree. PSNR and tOF reproduce the reference formulas exactly (BT.601
Y channel; Farneback optical-flow end-point error via cv2). LPIPS is a
JAX port of the net-lin AlexNet model (5 feature taps, unit-normalized,
1x1 linear calibration): weights import from a torchvision alexnet state
dict + the LPIPS linear .pth. Out of the box, LPIPS.minted() loads the
checked-in locally trained backbone+calibration (tools/mint_lpips.py,
ranking-calibrated on the derived corpus); for bit-parity with the
reference's vendored metric, ingest torchvision's alexnet weights and
the LPIPS v0.1 alex.pth linears and construct LPIPS(alex, lin) directly.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np

import jax.numpy as jnp

from ..models.torch_import import load_state_dict
from ..ops import conv2d
from ..utils import get_logger

__all__ = ["rgb_to_ycbcr", "compute_psnr", "compute_tof", "LPIPS", "MetricCalculator"]

log = get_logger("train.metrics")


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """uint8 RGB HWC -> uint8 YCbCr (BT.601, same as the reference's
    data_utils.rgb_to_ycbcr)."""
    T = np.array(
        [
            [0.256788235294118, -0.148223529411765, 0.439215686274510],
            [0.504129411764706, -0.290992156862745, -0.367788235294118],
            [0.097905882352941, 0.439215686274510, -0.071427450980392],
        ],
        dtype=np.float64,
    )
    O = np.array([16, 128, 128], np.float64)
    img = img.astype(np.float64)
    out = img @ T + O
    return out.clip(0, 255).round().astype(np.uint8)


def compute_psnr(true_img: np.ndarray, pred_img: np.ndarray, colorspace: str = "y") -> float:
    """PSNR on uint8 images (reference :208-225)."""
    if colorspace != "rgb":
        true_img = rgb_to_ycbcr(true_img)[..., 0]
        pred_img = rgb_to_ycbcr(pred_img)[..., 0]
    diff = true_img.astype(np.float64) - pred_img.astype(np.float64)
    rmse = np.sqrt(np.mean(diff**2))
    if rmse == 0:
        return float("inf")
    return float(20 * np.log10(255.0 / rmse))


def compute_tof(
    true_pre: np.ndarray, true_cur: np.ndarray,
    pred_pre: np.ndarray, pred_cur: np.ndarray,
) -> float:
    """Temporal optical-flow EPE between consecutive frames
    (reference :243-261)."""
    import cv2

    def gray(x):
        return cv2.cvtColor(x, cv2.COLOR_RGB2GRAY)

    args = (0.5, 3, 15, 3, 5, 1.2, 0)
    true_of = cv2.calcOpticalFlowFarneback(gray(true_pre), gray(true_cur), None, *args)
    pred_of = cv2.calcOpticalFlowFarneback(gray(pred_pre), gray(pred_cur), None, *args)
    diff = true_of - pred_of
    return float(np.mean(np.sqrt(np.sum(diff**2, axis=-1))))


# ---------------------------------------------------------------------------
# LPIPS (net-lin, alex)
# ---------------------------------------------------------------------------

_ALEX_CHANNELS = (64, 192, 384, 256, 256)
# torchvision alexnet .features conv layer indices per LPIPS slice
_ALEX_CONVS = ((0,), (3,), (6,), (8,), (10,))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_MINTED_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", "weights", "minted"
)
MINTED_ALEX_PATH = os.path.abspath(
    os.path.join(_MINTED_DIR, "lpips-alex-derived.pth")
)
MINTED_LIN_PATH = os.path.abspath(
    os.path.join(_MINTED_DIR, "lpips-lin-derived.pth")
)


class LPIPS:
    """net-lin AlexNet LPIPS distance (reference LPIPS/models/
    networks_basic.py PNetLin + pretrained_networks.alexnet)."""

    def __init__(self, alexnet_sd_path: str, linear_sd_path: str):
        if not (os.path.exists(alexnet_sd_path) and os.path.exists(linear_sd_path)):
            raise FileNotFoundError(
                "LPIPS needs torchvision alexnet weights and the LPIPS "
                f"linear weights ({alexnet_sd_path}, {linear_sd_path})"
            )
        alex = load_state_dict(alexnet_sd_path)
        self.convs = []
        for i in range(13):  # features.0..12
            wk = f"features.{i}.weight"
            if wk in alex:
                w = alex[wk].transpose(2, 3, 1, 0)  # OIHW -> HWIO
                b = alex[f"features.{i}.bias"]
                self.convs.append((i, jnp.asarray(w), jnp.asarray(b)))
        lin = load_state_dict(linear_sd_path)
        self.lins = [
            jnp.asarray(lin[f"lin{i}.model.1.weight"][:, :, 0, 0].T)  # (C,1)
            for i in range(5)
        ]
        # Provenance travels into every metrics JSON (MetricCalculator
        # .save): minted-LPIPS values are a self-consistent rank metric
        # but NOT comparable to published LPIPS v0.1 numbers.
        minted = (
            os.path.abspath(alexnet_sd_path) == MINTED_ALEX_PATH
            and os.path.abspath(linear_sd_path) == MINTED_LIN_PATH
        )
        self.provenance = "minted" if minted else "ingested"

    @classmethod
    def minted(cls) -> "LPIPS":
        """Out-of-box LPIPS from the checked-in minted backbone +
        calibration (tools/mint_lpips.py — AlexNet-architecture features
        and 1x1 linears trained on a distortion-ranking objective over
        the derived corpus; held-out monotonicity validated at mint
        time).  The reference instead vendors torchvision's pretrained
        alexnet + the LPIPS v0.1 alex.pth linears
        (metrics/metric_calculator.py:228-243); ingest those and call
        LPIPS(alex_path, lin_path) for bit-parity with its numbers —
        minted-LPIPS values live on a different (self-consistent) scale."""
        return cls(MINTED_ALEX_PATH, MINTED_LIN_PATH)

    def _features(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: (N, H, W, 3) in [-1, 1] -> 5 feature maps. AlexNet feature
        stack: conv-relu[-pool] x5 with the LPIPS tap points."""
        taps = []
        # conv indices in torchvision alexnet.features:
        # 0 conv(s4,p2) 1 relu 2 pool / 3 conv(p2) 4 relu 5 pool /
        # 6 conv(p1) 7 relu / 8 conv(p1) 9 relu / 10 conv(p1) 11 relu 12 pool
        conv_params = {i: (w, b) for i, w, b in self.convs}

        def conv(x, i, stride, pad):
            w, b = conv_params[i]
            return conv2d(x, w, b, stride=stride, padding=pad)

        def pool(x):
            import jax

            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )

        y = jnp.maximum(conv(x, 0, 4, 2), 0); taps.append(y); y = pool(y)
        y = jnp.maximum(conv(y, 3, 1, 2), 0); taps.append(y); y = pool(y)
        y = jnp.maximum(conv(y, 6, 1, 1), 0); taps.append(y)
        y = jnp.maximum(conv(y, 8, 1, 1), 0); taps.append(y)
        y = jnp.maximum(conv(y, 10, 1, 1), 0); taps.append(y)
        return taps

    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        """img0/img1: (N, H, W, 3) in [-1, 1]; returns (N,) distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        f0 = self._features((img0 - shift) / scale)
        f1 = self._features((img1 - shift) / scale)
        total = 0.0
        for a, b, lin in zip(f0, f1, self.lins):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            val = diff @ jnp.maximum(lin, 0)  # 1x1 conv with clamped weights
            total = total + val.mean(axis=(1, 2))[:, 0]
        return total


class MetricCalculator:
    """Per-sequence metric aggregation + JSON persistence (reference
    metric_calculator.py:14-100,204-230)."""

    def __init__(
        self,
        metrics: list[str] = ("PSNR",),
        psnr_colorspace: str = "y",
        lpips: LPIPS | None = None,
    ):
        self.metrics = list(metrics)
        self.psnr_colorspace = psnr_colorspace
        self.lpips = lpips
        self.reset()

    def reset(self) -> None:
        self.seq_results: "OrderedDict[str, dict]" = OrderedDict()

    def compute_sequence_metrics(self, seq_idx: str, true_seq: np.ndarray, pred_seq: np.ndarray) -> dict:
        """true_seq/pred_seq: (T, H, W, 3) uint8."""
        per_metric: dict[str, list[float]] = {m: [] for m in self.metrics}
        for t in range(len(true_seq)):
            tru, prd = true_seq[t], pred_seq[t]
            h = min(tru.shape[0], prd.shape[0])
            w = min(tru.shape[1], prd.shape[1])
            tru, prd = tru[:h, :w], prd[:h, :w]
            for m in self.metrics:
                if m == "PSNR":
                    per_metric[m].append(compute_psnr(tru, prd, self.psnr_colorspace))
                elif m == "LPIPS":
                    if self.lpips is None:
                        raise RuntimeError("LPIPS weights not configured")
                    d = self.lpips(
                        jnp.asarray(tru, jnp.float32)[None] * 2 / 255.0 - 1.0,
                        jnp.asarray(prd, jnp.float32)[None] * 2 / 255.0 - 1.0,
                    )
                    per_metric[m].append(float(d[0]))
                elif m == "tOF" and t > 0:
                    # previous frames must carry the same crop — Farneback
                    # needs equal-sized image pairs
                    per_metric[m].append(
                        compute_tof(
                            true_seq[t - 1][:h, :w], tru,
                            pred_seq[t - 1][:h, :w], prd,
                        )
                    )
        avg = {m: float(np.mean(v)) for m, v in per_metric.items() if v}
        self.seq_results[seq_idx] = avg
        return avg

    def average(self) -> dict[str, float]:
        out = {}
        for m in self.metrics:
            vals = [r[m] for r in self.seq_results.values() if m in r]
            if vals:
                out[m] = float(np.mean(vals))
        return out

    def save(self, path: str, label: str = "average") -> None:
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data[label] = {"sequences": self.seq_results, "average": self.average()}
        if "LPIPS" in self.metrics and self.lpips is not None:
            # 'minted' values are a self-consistent rank metric, NOT
            # LPIPS v0.1 — only 'ingested' (reference alex.pth +
            # calibrated linears) numbers compare to published scores.
            data[label]["lpips_weights"] = self.lpips.provenance
        with open(path, "w") as f:
            json.dump(data, f, indent=2)
