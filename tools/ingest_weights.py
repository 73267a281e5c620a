#!/usr/bin/env python
"""Ingest externally-obtained model weights into the local weight dir.

This host has no network egress, so the zoo's auto-download
(models/zoo.py fetch_weights, mirroring reference
realesrgan/factory.py:140-150) cannot run; users must copy `.pth` files
in by hand.  This tool validates a candidate file BEFORE it lands:

  python tools/ingest_weights.py --model realesr-general-x4v3 /path/x.pth
  python tools/ingest_weights.py --model bsvd-32 /path/bsvd-32.pth
  python tools/ingest_weights.py --model egvsr /path/EGVSR_iter420000.pth

It loads the torch checkpoint (CPU, weights_only), converts it through
the matching from_torch importer (which checks every expected key and
shape), runs a tiny forward pass, and only then copies the file into
SHARKSHARK_WEIGHT_DIR (default ./weights) under the canonical name the
zoo / services look for.  Golden quality tests
(tests/test_golden_quality.py) activate automatically once the files
exist.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CANONICAL = {
    # zoo names resolve through models/zoo.py; these are extras
    "bsvd-32": "bsvd-32.pth",
    "bsvd-64": "bsvd-64.pth",
    "egvsr": "EGVSR_iter420000.pth",
}


def validate(model: str, path: str) -> None:
    import jax
    import jax.numpy as jnp

    from sharkshark_tpu.models import bsvd, egvsr, torch_import
    from sharkshark_tpu.models.zoo import ZOO

    sd = torch_import.load_state_dict(path)
    if model in ZOO:
        entry = ZOO[model]
        if entry.arch == "srvgg":
            from sharkshark_tpu.models import srvgg

            params = srvgg.from_torch(sd, entry.cfg)
            out = srvgg.apply(
                params, jnp.zeros((1, 8, 8, 3)), cfg=entry.cfg
            )
            assert out.shape == (1, 8 * entry.scale, 8 * entry.scale, 3)
        else:
            from sharkshark_tpu.models import rrdbnet

            params = rrdbnet.from_torch(sd, entry.cfg)
            out = rrdbnet.apply(params, jnp.zeros((1, 8, 8, 3)), cfg=entry.cfg)
            assert out.shape[1] == 8 * entry.scale
    elif model.startswith("bsvd"):
        cfg = bsvd.BSVD_32 if model == "bsvd-32" else bsvd.BSVD_64
        params = bsvd.from_torch(sd, cfg)
        out = bsvd.apply_single(
            params, jnp.zeros((1, 8, 8, cfg.in_ch)), cfg=cfg
        )
        assert out.shape == (1, 8, 8, cfg.out_ch)
    elif model == "egvsr":
        # infer nb/nf/degradation from the file itself — the reference's
        # production EGVSR_iter420000.pth is nb=10, not the class default
        cfg = egvsr.config_from_torch(sd)
        params = egvsr.from_torch(sd, cfg)
        st = egvsr.init_recurrent_state(1, 8, 8)
        out, _ = egvsr.infer_step(params, st, jnp.zeros((1, 8, 8, 3)),
                                  cfg=cfg, fast_warp=False)
        assert out.shape == (1, 32, 32, 3)
    else:
        raise SystemExit(f"unknown model {model!r}; choose from "
                         f"{sorted(ZOO) + sorted(CANONICAL)}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="candidate .pth file")
    ap.add_argument("--model", required=True)
    ap.add_argument(
        "--weight-dir",
        default=os.environ.get("SHARKSHARK_WEIGHT_DIR", "./weights"),
    )
    args = ap.parse_args()

    validate(args.model, args.path)

    from sharkshark_tpu.models.zoo import ZOO

    if args.model in ZOO:
        # keep the release file name the zoo resolves (url basename);
        # ambiguous for DNI pairs, so match by what the file contains
        name = os.path.basename(args.path)
        targets = [os.path.basename(u) for u in ZOO[args.model].urls]
        if name not in targets:
            name = targets[-1]
    else:
        name = CANONICAL[args.model]
    os.makedirs(args.weight_dir, exist_ok=True)
    dst = os.path.join(args.weight_dir, name)
    shutil.copy2(args.path, dst)
    print(f"validated and installed: {dst}")


if __name__ == "__main__":
    main()
