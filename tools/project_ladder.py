#!/usr/bin/env python
"""Per-rung chip-floor analysis + full-rate-v5e projection (VERDICT r2
item 7): for every ladder rung, compute the SR-body compute/bandwidth
floors from the measured chip envelope, compare the measured fps, and
project what a full-rate v5e (197 TFLOP/s bf16, 819 GB/s HBM) delivers.

Floors are per-layer max(MXU, HBM) summed over the SRVGG body (the conv
chain dominates; the fused epilogue adds one tail-conv-sized term).

Round-3 model: the lane-folded body (ops/lanefold.py, 2x MACs at dense
128 lanes) sustains ~139 TF/s of folded MACs in-graph = ~70 TF/s on the
ORIGINAL conv FLOPs — the r2 "C=64 width bound" is retired (it was a
lowering artifact; see BASELINE.md).  The dev-chip rate here is that
measured effective-original rate; the v5e projection scales the folded
rate to the 197 TF/s spec (same 2x MAC overhead -> 98.5 effective).
The in-graph rate varies ~15 % with shape (1080p sustains ~78 TF/s
effective vs 720p's 70), so treat floors as estimates: measured fps
within +-15 % of the floor means the rung is rate-bound, not that the
model is exact.

Usage: python tools/project_ladder.py [--measured fps.json]
  --measured: bench_matrix.py JSON output to merge measured fps rows;
  without it the table carries floors/projections only.
"""

from __future__ import annotations

import argparse
import json
import sys

# measured dev-chip envelope (BASELINE.md round 3, lane-folded body)
DEV_MXU_C64 = 70.0e12        # effective rate on ORIGINAL FLOPs (139/2)
DEV_MXU_FULLWIDTH = 139.0e12  # sustained folded-MAC rate in-graph
# In-graph conv activations stream at ~300 GB/s (0.8 ms/conv-frame at
# 236 MB r+w), ABOVE the 166-230 GB/s eltwise probes — another probe vs
# in-graph discrepancy on this tunnel; the higher figure is the one the
# body actually achieves, so it is the honest floor denominator
DEV_HBM = 300e9
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
