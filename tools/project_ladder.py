#!/usr/bin/env python
"""Per-rung chip-floor analysis + full-rate-v5e projection (VERDICT r2
item 7): for every ladder rung, compute the SR-body compute/bandwidth
floors from the measured chip envelope, compare the measured fps, and
project what a full-rate v5e (197 TFLOP/s bf16, 819 GB/s HBM) delivers.

Floors are per-layer max(MXU, HBM) summed over the SRVGG body (the conv
chain dominates; the fused epilogue adds one tail-conv-sized term). The
dev-chip envelope comes from BASELINE.md round-2 probes:
  in-graph N=64-width MXU bound: ~67 TFLOP/s (the batched conv chain
  achieves more than the isolated-conv probe's 46.6) vs 134 TFLOP/s at
  full MXU width -> width efficiency 0.5
  HBM copy: ~220 GB/s measured vs 819 spec.

Usage: python tools/project_ladder.py [--measured fps.json]
  --measured: bench_matrix.py JSON output to merge measured fps rows;
  without it the table carries floors/projections only.
"""

from __future__ import annotations

import argparse
import json
import sys

# measured dev-chip envelope (BASELINE.md round 2)
DEV_MXU_C64 = 67.0e12        # in-graph conv-chain bound at C=64
DEV_MXU_FULLWIDTH = 134.0e12
DEV_HBM = 220e9
# v5e spec
V5E_MXU = 197e12
V5E_HBM = 819e9

LR_LEVELS = {0: (360, 640), 1: (540, 960), 2: (630, 1120),
             3: (720, 1280), 4: (900, 1600), 5: (1080, 1920)}

NF, NCONV = 64, 32


def body_floors(h: int, w: int, mxu_rate: float, hbm_rate: float,
                batch: int = 4):
    """Per-frame floor (ms) for the SRVGG body at LR (h, w)."""
    px = h * w
    # per mid layer: 9*64*64 MACs/px; first 9*3*64; tail 9*64*48
    mac_mid = 9 * NF * NF * px
    mac_edge = (9 * 3 * NF + 9 * NF * 48) * px
    flops = 2 * ((NCONV - 1) * mac_mid + mac_edge)
    # per mid layer bytes: read + write of the C=64 bf16 activation
    bytes_mid = 2 * px * NF * 2
    mxu_ms = flops / mxu_rate * 1e3
    # per-layer serial max: all mid layers alike
    t_mid = max(2 * mac_mid / mxu_rate, bytes_mid / hbm_rate)
    t_edge = 2 * mac_edge / mxu_rate + (px * (3 + 48) * 2 + bytes_mid) / hbm_rate
    floor_s = (NCONV - 1) * t_mid + t_edge
    return floor_s * 1e3, mxu_ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", default=None,
                    help="bench_matrix JSON to merge measured fps from")
    args = ap.parse_args()

    measured = {}
    if args.measured:
        with open(args.measured) as f:
            for row in json.load(f).get("matrix", []):
                if "lr_level" in row:
                    measured[row["lr_level"]] = row["fps"]

    rows = []
    for lvl, (h, w) in LR_LEVELS.items():
        mxu = DEV_MXU_C64
        floor_dev, _ = body_floors(h, w, mxu, DEV_HBM)
        # full-rate projection: same width efficiency, spec rates
        mxu_v5e = mxu / DEV_MXU_FULLWIDTH * V5E_MXU
        floor_v5e, _ = body_floors(h, w, mxu_v5e, V5E_HBM)
        row = {
            "lr_level": lvl, "lr": f"{h}x{w}",
            "floor_ms_devchip": round(floor_dev, 1),
            "floor_fps_devchip": round(1000 / floor_dev, 1),
            "floor_ms_v5e_fullrate": round(floor_v5e, 1),
            "floor_fps_v5e_fullrate": round(1000 / floor_v5e, 1),
        }
        if lvl in measured:
            f = measured[lvl]
            row["measured_fps"] = f
            row["efficiency_vs_floor"] = round(f * floor_dev / 1000, 2)
            row["projected_fps_v5e"] = round(f * floor_dev / floor_v5e, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"ladder_projection": rows}))


if __name__ == "__main__":
    main()
