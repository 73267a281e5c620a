"""Training/test datasets + degradation for the VSR tree.

Rebuild of reference data/ ({base,paired_folder,paired_lmdb,
unpaired_lmdb}_dataset.py, __init__.py:10-115):

- PairedFolderDataset — gt/lr sequence folders, NTHWC rgb arrays
- PairedLMDBDataset / UnpairedLMDBDataset — Vimeo-style LMDB with
  meta_info.pkl keys `idx_HxW_frm`, random crops, flips/transpose
  augmentation and the moving-first-frame trick; gated on the optional
  lmdb package
- create_dataloader — torch DataLoader over numpy samples (host-side
  machinery only; batches feed jitted steps as numpy)
- gaussian_downsample_kernel / prepare_data — BD degradation: 13x13
  Gaussian conv with stride `scale` ON DEVICE inside the jitted caller,
  plus gt border removal (reference data/__init__.py:73-115)

Layout note: the reference emits NTCHW float tensors; this tree is
channel-last NTHWC end to end.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
import random
from typing import Any

import numpy as np

import jax.numpy as jnp

from ..ops import conv2d
from ..utils import get_logger, has_module

__all__ = [
    "PairedFolderDataset",
    "PairedFolderTrainDataset",
    "PairedLMDBDataset",
    "UnpairedLMDBDataset",
    "create_dataloader",
    "gaussian_downsample_kernel",
    "prepare_data",
]

log = get_logger("train.datasets")


def retrieve_files(directory: str) -> list[str]:
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    return sorted(
        osp.join(directory, f)
        for f in os.listdir(directory)
        if f.lower().endswith(exts)
    )


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    return cv2.imread(path)[..., ::-1]


class PairedFolderDataset:
    """gt/lr paired sequence folders (reference paired_folder_dataset.py).
    Returns dicts: gt (T,H,W,C) uint8, lr (T,h,w,C) float32, seq_idx."""

    def __init__(self, gt_seq_dir: str, lr_seq_dir: str, filter_file: str | None = None):
        self.gt_seq_dir = gt_seq_dir
        self.lr_seq_dir = lr_seq_dir
        keys = set(os.listdir(gt_seq_dir)) & set(os.listdir(lr_seq_dir))
        if filter_file:
            with open(filter_file) as f:
                keys &= {line.strip() for line in f}
        self.keys = sorted(keys)

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, item: int) -> dict[str, Any]:
        key = self.keys[item]
        gt = np.stack([_imread_rgb(p) for p in retrieve_files(osp.join(self.gt_seq_dir, key))])
        lr = np.stack(
            [
                _imread_rgb(p).astype(np.float32) / 255.0
                for p in retrieve_files(osp.join(self.lr_seq_dir, key))
            ]
        )
        return {"gt": gt, "lr": lr, "seq_idx": key}


class _LMDBBase:
    """Vimeo-style LMDB: meta_info.pkl with 'keys' like 'idx_HxW_frm'
    (reference base_dataset.py:52-77, paired_lmdb_dataset.py:13-167)."""

    def __init__(self, seq_dir: str):
        if not has_module("lmdb"):
            raise RuntimeError("lmdb package is required for LMDB datasets")
        import lmdb

        self.seq_dir = seq_dir
        with open(osp.join(seq_dir, "meta_info.pkl"), "rb") as f:
            self.meta = pickle.load(f)
        self.keys = self.meta["keys"]
        self.env = lmdb.open(
            seq_dir, readonly=True, lock=False, readahead=False, meminit=False
        )

    def parse_lmdb_key(self, key: str) -> tuple[int, tuple[int, int], int]:
        idx, hw, frm = key.split("_")
        h, w = map(int, hw.split("x"))
        return int(idx), (h, w), int(frm)

    def read_lmdb_frame(self, key: str, size: tuple[int, int, int]) -> np.ndarray:
        with self.env.begin(write=False) as txn:
            buf = txn.get(key.encode("ascii"))
        return np.frombuffer(buf, np.uint8).reshape(size)


def _augment_clip(frames: list[np.ndarray], rng: random.Random) -> list[np.ndarray]:
    """Random flips + transpose (reference paired_lmdb_dataset augment)."""
    if rng.random() < 0.5:
        frames = [f[::-1] for f in frames]
    if rng.random() < 0.5:
        frames = [f[:, ::-1] for f in frames]
    if rng.random() < 0.5:
        frames = [f.transpose(1, 0, 2) for f in frames]
    return [np.ascontiguousarray(f) for f in frames]


class PairedLMDBDataset(_LMDBBase):
    """BI degradation training set: paired gt/lr LMDBs with synchronized
    random crops + moving-first-frame augmentation."""

    def __init__(
        self,
        gt_seq_dir: str,
        lr_seq_dir: str,
        scale: int = 4,
        crop_size: int = 128,
        tempo_extent: int = 10,
        moving_first_frame: bool = False,
        moving_factor: float = 1.0,
        seed: int | None = None,
    ):
        super().__init__(gt_seq_dir)
        self.lr = _LMDBBase(lr_seq_dir)
        self.scale = scale
        self.crop_size = crop_size
        self.tempo_extent = tempo_extent
        self.moving_first_frame = moving_first_frame
        self.moving_factor = moving_factor
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, item: int) -> dict[str, Any]:
        key = self.keys[item]
        idx, (gh, gw), frm = self.parse_lmdb_key(key)
        s = self.scale
        lh, lw = gh // s, gw // s
        cs = self.crop_size
        lcs = cs // s

        gt_frames, lr_frames = [], []
        if self.moving_first_frame and self.rng.random() < self.moving_factor:
            # synthesize motion by panning a random window over frame 0
            gt0 = self.read_lmdb_frame(key, (gh, gw, 3))
            lr_key = self.lr.keys[item]
            lr0 = self.lr.read_lmdb_frame(lr_key, (lh, lw, 3))
            max_dy = (gh - cs) // s
            max_dx = (gw - cs) // s
            y = self.rng.randint(0, max(max_dy, 0))
            x = self.rng.randint(0, max(max_dx, 0))
            vy = self.rng.randint(-2, 2)
            vx = self.rng.randint(-2, 2)
            for t in range(self.tempo_extent):
                yy = int(np.clip(y + vy * t, 0, max(max_dy, 0)))
                xx = int(np.clip(x + vx * t, 0, max(max_dx, 0)))
                gt_frames.append(gt0[yy * s : yy * s + cs, xx * s : xx * s + cs])
                lr_frames.append(lr0[yy : yy + lcs, xx : xx + lcs])
        else:
            y = self.rng.randint(0, max((gh - cs) // s, 0))
            x = self.rng.randint(0, max((gw - cs) // s, 0))
            start = self.rng.randint(0, max(frm - self.tempo_extent, 0))
            for t in range(self.tempo_extent):
                ti = min(start + t, frm - 1)
                gt_key = f"{idx}_{gh}x{gw}_{frm}_{ti:04d}"
                lr_key = f"{idx}_{lh}x{lw}_{frm}_{ti:04d}"
                try:
                    gt = self.read_lmdb_frame(gt_key, (gh, gw, 3))
                    lr = self.lr.read_lmdb_frame(lr_key, (lh, lw, 3))
                except Exception:
                    # single-blob-per-sequence layout fallback
                    gt = self.read_lmdb_frame(key, (gh, gw, 3))
                    lr = self.lr.read_lmdb_frame(self.lr.keys[item], (lh, lw, 3))
                gt_frames.append(gt[y * s : y * s + cs, x * s : x * s + cs])
                lr_frames.append(lr[y : y + lcs, x : x + lcs])

        both = _augment_clip(gt_frames + lr_frames, self.rng)
        gt_frames, lr_frames = both[: len(gt_frames)], both[len(gt_frames):]
        return {
            "gt": np.stack(gt_frames).astype(np.float32) / 255.0,
            "lr": np.stack(lr_frames).astype(np.float32) / 255.0,
        }


class UnpairedLMDBDataset(_LMDBBase):
    """BD degradation training set: gt-only LMDB; lr is generated on
    device by prepare_data (reference unpaired_lmdb_dataset.py)."""

    def __init__(
        self,
        gt_seq_dir: str,
        crop_size: int = 160,
        tempo_extent: int = 10,
        moving_first_frame: bool = False,
        moving_factor: float = 1.0,
        seed: int | None = None,
    ):
        super().__init__(gt_seq_dir)
        self.crop_size = crop_size
        self.tempo_extent = tempo_extent
        self.moving_first_frame = moving_first_frame
        self.moving_factor = moving_factor
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, item: int) -> dict[str, Any]:
        key = self.keys[item]
        idx, (gh, gw), frm = self.parse_lmdb_key(key)
        cs = self.crop_size
        frames = []
        y = self.rng.randint(0, max(gh - cs, 0))
        x = self.rng.randint(0, max(gw - cs, 0))
        start = self.rng.randint(0, max(frm - self.tempo_extent, 0))
        for t in range(self.tempo_extent):
            ti = min(start + t, frm - 1)
            fkey = f"{idx}_{gh}x{gw}_{frm}_{ti:04d}"
            try:
                f = self.read_lmdb_frame(fkey, (gh, gw, 3))
            except Exception:
                f = self.read_lmdb_frame(key, (gh, gw, 3))
            frames.append(f[y : y + cs, x : x + cs])
        frames = _augment_clip(frames, self.rng)
        return {"gt": np.stack(frames).astype(np.float32) / 255.0}


class PairedFolderTrainDataset:
    """Training over paired gt/lr folders: random temporal window +
    synchronized random crop + flip augmentation. Not in the reference
    (its train path is LMDB-only) — added so training runs on plain
    image-sequence dirs without an LMDB build step."""

    def __init__(
        self,
        gt_seq_dir: str,
        lr_seq_dir: str,
        scale: int = 4,
        crop_size: int = 128,
        tempo_extent: int = 10,
        seed: int | None = None,
    ):
        self.inner = PairedFolderDataset(gt_seq_dir, lr_seq_dir)
        self.scale = scale
        self.crop_size = crop_size
        self.tempo_extent = tempo_extent
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.inner)

    def __getitem__(self, item: int) -> dict[str, Any]:
        s = self.scale
        sample = self.inner[item]
        gt, lr = sample["gt"].astype(np.float32) / 255.0, sample["lr"]
        t_total = gt.shape[0]
        te = min(self.tempo_extent, t_total)
        start = self.rng.randint(0, t_total - te)
        gt, lr = gt[start : start + te], lr[start : start + te]
        lcs = min(self.crop_size // s, lr.shape[1], lr.shape[2])
        y = self.rng.randint(0, lr.shape[1] - lcs)
        x = self.rng.randint(0, lr.shape[2] - lcs)
        gt = gt[:, y * s : (y + lcs) * s, x * s : (x + lcs) * s]
        lr = lr[:, y : y + lcs, x : x + lcs]
        both = _augment_clip(list(gt) + list(lr), self.rng)
        return {
            "gt": np.stack(both[:te]),
            "lr": np.stack(both[te:]),
        }


def create_dataloader(dataset, batch_size: int = 1, shuffle: bool = True,
                      num_workers: int = 0):
    """torch DataLoader over numpy dict samples (host machinery only)."""
    import torch.utils.data as tud

    def collate(samples):
        out = {}
        for k in samples[0]:
            vals = [s[k] for s in samples]
            out[k] = np.stack(vals) if isinstance(vals[0], np.ndarray) else vals
        return out

    return tud.DataLoader(
        dataset, batch_size=batch_size, shuffle=shuffle,
        num_workers=num_workers, collate_fn=collate,
    )


def gaussian_downsample_kernel(sigma: float = 1.5, ksize: int | None = None) -> np.ndarray:
    """BD degradation kernel (reference data_utils.create_kernel): 2-D
    gaussian, shape (k, k, 1, 1) for a depthwise strided conv."""
    if ksize is None:
        ksize = 2 * int(sigma * 3.0) + 1
    ax = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    k /= k.sum()
    return k.astype(np.float32).reshape(ksize, ksize, 1, 1)


def prepare_data(gt_with_border: jnp.ndarray, kernel: np.ndarray, scale: int = 4,
                 sigma: float = 1.5) -> dict[str, jnp.ndarray]:
    """BD degradation on device (reference data/__init__.py:85-112):
    lr = stride-`scale` gaussian conv of gt; gt loses the border.
    gt_with_border: (N, T, H, W, C) float [0,1]."""
    n, t, gh, gw, c = gt_with_border.shape
    border = int(sigma * 3.0)
    lh, lw = (gh - 2 * border) // scale, (gw - 2 * border) // scale

    x = gt_with_border.reshape(n * t, gh, gw, c)
    k = jnp.asarray(kernel)
    kc = jnp.tile(k, (1, 1, 1, c))  # depthwise
    lr = conv2d(x, kc, stride=scale, padding=0, groups=c)
    lr = lr[:, :lh, :lw].reshape(n, t, lh, lw, c)

    gt = x[:, border : border + scale * lh, border : border + scale * lw]
    gt = gt.reshape(n, t, scale * lh, scale * lw, c)
    return {"gt": gt, "lr": lr}
