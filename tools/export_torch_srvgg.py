#!/usr/bin/env python
"""Export minted SRVGG params (orbax checkpoint from train/driver.py) to
the reference's torch state_dict naming, so the PRODUCTION import path —
torch_import.load_state_dict -> srvgg.from_torch, incl. DNI blending —
serves locally-trained weights exactly as it serves the reference's
downloaded realesr-general-x4v3.pth (reference realesrgan/factory.py:
18-82 module naming: body.{2i}.weight/bias convs, body.{2i+1}.weight
PReLU, tail at body.{2(num_conv+1)}).

Usage:
  python tools/export_torch_srvgg.py --ckpt /tmp/ss4_srvgg_ckpt \
      --out weights/minted/srvgg-derived-x4.pth [--num-conv 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def params_to_state_dict(params: dict) -> dict:
    """JAX pytree (convs HWIO) -> torch tensors (OIHW) in body.N naming."""
    import torch

    sd = {}

    def conv(prefix, p):
        w = np.transpose(np.asarray(p["w"], np.float32), (3, 2, 0, 1)).copy()
        sd[prefix + "weight"] = torch.from_numpy(w)
        if "b" in p:
            sd[prefix + "bias"] = torch.from_numpy(
                np.asarray(p["b"], np.float32).copy()
            )

    n_layers = len(params["convs"])
    for i in range(n_layers):
        conv(f"body.{2 * i}.", params["convs"][i])
        act = params["acts"][i]
        if "alpha" in act:
            sd[f"body.{2 * i + 1}.weight"] = torch.from_numpy(
                np.asarray(act["alpha"], np.float32).copy()
            )
    conv(f"body.{2 * n_layers}.", params["tail"])
    return sd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax ckpt dir (or root)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-conv", type=int, default=32)
    args = ap.parse_args()

    import torch

    import orbax.checkpoint as ocp

    from sharkshark_tpu.train import checkpoint as ckpt_mod

    path = ckpt_mod.latest_checkpoint(args.ckpt) or args.ckpt
    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    params = tree["params"] if "params" in tree else tree[0]
    sd = params_to_state_dict(params)
    n_layers = args.num_conv + 1
    assert f"body.{2 * n_layers}.weight" in sd, sorted(sd)[-3:]

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save({"params": sd}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")

    # round-trip check through the production importer
    from sharkshark_tpu.models import srvgg
    from sharkshark_tpu.models.torch_import import load_state_dict

    cfg = srvgg.SRVGGConfig(num_conv=args.num_conv)
    back = srvgg.from_torch(load_state_dict(args.out), cfg)
    w0 = np.asarray(params["convs"][0]["w"], np.float32)
    assert np.allclose(np.asarray(back["convs"][0]["w"]), w0), "round-trip mismatch"
    print("round-trip through torch_import/from_torch ok")


if __name__ == "__main__":
    main()
