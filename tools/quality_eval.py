#!/usr/bin/env python
"""Standalone quality evaluation: PSNR / tOF / (optional) LPIPS between a
ground-truth and a prediction frame directory tree.

The reference computes these only inside the training loop
(metrics/metric_calculator.py); this exposes the same metrics as a CLI so
restream output or any two directories of frames can be compared.

Usage:
  python tools/quality_eval.py --gt data/Vid4/GT --pred results/Vid4 \
      --metrics PSNR tOF --json out.json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True, help="dir of sequence dirs of frames")
    p.add_argument("--pred", required=True)
    p.add_argument("--metrics", nargs="+", default=["PSNR", "tOF"])
    p.add_argument("--psnr-colorspace", default="y", choices=["y", "rgb"])
    p.add_argument("--json", default=None)
    p.add_argument("--lpips-alexnet", default=None, help="torchvision alexnet .pth")
    p.add_argument("--lpips-linear", default=None, help="LPIPS linear .pth")
    args = p.parse_args(argv)

    import numpy as np

    from sharkshark_tpu.train.datasets import PairedFolderDataset, retrieve_files
    from sharkshark_tpu.train.metrics import LPIPS, MetricCalculator

    lpips = None
    if "LPIPS" in args.metrics:
        lpips = LPIPS(args.lpips_alexnet, args.lpips_linear)
    calc = MetricCalculator(
        metrics=args.metrics, psnr_colorspace=args.psnr_colorspace, lpips=lpips
    )

    import cv2

    seqs = sorted(set(os.listdir(args.gt)) & set(os.listdir(args.pred)))
    assert seqs, f"no common sequences under {args.gt} and {args.pred}"
    for seq in seqs:
        gt = np.stack(
            [cv2.imread(f)[..., ::-1] for f in retrieve_files(os.path.join(args.gt, seq))]
        )
        pred = np.stack(
            [cv2.imread(f)[..., ::-1] for f in retrieve_files(os.path.join(args.pred, seq))]
        )
        n = min(len(gt), len(pred))
        res = calc.compute_sequence_metrics(seq, gt[:n], pred[:n])
        print(f"{seq}: " + " ".join(f"{k}={v:.4f}" for k, v in res.items()))

    avg = calc.average()
    print("average: " + " ".join(f"{k}={v:.4f}" for k, v in avg.items()))
    if args.json:
        calc.save(args.json, "eval")
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
