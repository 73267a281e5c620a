#!/usr/bin/env python
"""Export minted BSVD params (orbax checkpoint from train/driver.py,
configs/bsvd_derived.yml) to the reference's torch state_dict naming
(reference src/upscale/model/bsvd/model.py:276-306 load functions:
`base_model.nets_list.{0,1}.<block>.convblock.<i>...`), so the
PRODUCTION import path — torch_import.load_state_dict ->
bsvd.from_torch — serves locally-trained denoise weights exactly as it
serves the reference's bsvd-32.pth / bsvd-64.pth.

Usage:
  python tools/export_torch_bsvd.py --ckpt /tmp/ss4_bsvd_ckpt \
      --out weights/minted/bsvd-derived-32.pth [--variant 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# jax param name -> torch prefix inside one DenBlock (inverse of
# models/bsvd.py _denblock_from_torch)
_BLOCK_MAP = {
    "inc0": "inc.convblock.0.",
    "inc1": "inc.convblock.3.",
    "down0": "downc0.convblock.0.",
    "down1": "downc1.convblock.0.",
    "up2": "upc2.convblock.1.",
    "up1": "upc1.convblock.1.",
    "outc0": "outc.convblock.0.",
    "outc1": "outc.convblock.3.",
}
_MEM_MAP = {
    "down0_mem": "downc0.convblock.3.",
    "down1_mem": "downc1.convblock.3.",
    "up2_mem": "upc2.convblock.0.",
    "up1_mem": "upc1.convblock.0.",
}


def params_to_state_dict(params: dict) -> dict:
    """JAX pytree (convs HWIO) -> torch tensors (OIHW) in the reference's
    two-net naming."""
    import torch

    sd = {}

    def conv(prefix, p):
        w = np.transpose(np.asarray(p["w"], np.float32), (3, 2, 0, 1)).copy()
        sd[prefix + "weight"] = torch.from_numpy(w)
        if "b" in p:
            sd[prefix + "bias"] = torch.from_numpy(
                np.asarray(p["b"], np.float32).copy()
            )

    for i, net in enumerate(("temp1", "temp2")):
        base = f"base_model.nets_list.{i}."
        block = params[net]
        for name, prefix in _BLOCK_MAP.items():
            conv(base + prefix, block[name])
        for name, prefix in _MEM_MAP.items():
            conv(base + prefix + "c1.net.", block[name]["c1"])
            conv(base + prefix + "c2.net.", block[name]["c2"])
    return sd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax ckpt dir (or root)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--variant", type=int, default=32, choices=(32, 64))
    args = ap.parse_args()

    import torch

    import orbax.checkpoint as ocp

    from sharkshark_tpu.train import checkpoint as ckpt_mod

    path = ckpt_mod.latest_checkpoint(args.ckpt) or args.ckpt
    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    params = tree["params"] if "params" in tree else tree[0]
    sd = params_to_state_dict(params)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save(sd, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")

    # round-trip check through the production importer
    from sharkshark_tpu.models import bsvd
    from sharkshark_tpu.models.torch_import import load_state_dict

    cfg = bsvd.BSVD_64 if args.variant == 64 else bsvd.BSVD_32
    back = bsvd.from_torch(load_state_dict(args.out), cfg)
    for net in ("temp1", "temp2"):
        w0 = np.asarray(params[net]["inc0"]["w"], np.float32)
        assert np.allclose(np.asarray(back[net]["inc0"]["w"]), w0), net
        w1 = np.asarray(params[net]["up1_mem"]["c2"]["w"], np.float32)
        assert np.allclose(np.asarray(back[net]["up1_mem"]["c2"]["w"]), w1), net
    print("round-trip through torch_import/from_torch ok")


if __name__ == "__main__":
    main()
