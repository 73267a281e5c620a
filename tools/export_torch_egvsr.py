#!/usr/bin/env python
"""Export minted EGVSR (FRNet) params to the reference's torch
state_dict naming (fnet.encoderN/decoderN/flow, srnet.conv_in/resblocks/
conv_out — reference src/upscale/model/egvsr/egvsr.py:16-130), so the
production import path (torch_import.load_state_dict ->
egvsr.from_torch) serves locally-trained weights like the real
EGVSR_iter420000.pth.

Usage:
  python tools/export_torch_egvsr.py --ckpt /tmp/ss4_egvsr_ckpt \
      --out weights/minted/egvsr-derived-x4.pth [--nb 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def params_to_state_dict(params: dict) -> dict:
    import torch

    sd = {}

    def conv(prefix, p):
        w = np.transpose(np.asarray(p["w"], np.float32), (3, 2, 0, 1)).copy()
        sd[prefix + "weight"] = torch.from_numpy(w)
        if "b" in p:
            sd[prefix + "bias"] = torch.from_numpy(
                np.asarray(p["b"], np.float32).copy()
            )

    f = params["fnet"]
    for ours, ref in [("enc1", "encoder1"), ("enc2", "encoder2"),
                      ("enc3", "encoder3"), ("dec1", "decoder1"),
                      ("dec2", "decoder2"), ("dec3", "decoder3"),
                      ("flow", "flow")]:
        conv(f"fnet.{ref}.0.", f[ours][0])
        conv(f"fnet.{ref}.2.", f[ours][1])
    s = params["srnet"]
    conv("srnet.conv_in.0.", s["conv_in"])
    for i, blk in enumerate(s["blocks"]):
        conv(f"srnet.resblocks.{i}.conv.0.", blk[0])
        conv(f"srnet.resblocks.{i}.conv.2.", blk[1])
    conv("srnet.conv_out.", s["conv_out"])
    return sd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--nb", type=int, default=10)
    ap.add_argument("--degradation", default="BI", choices=["BI", "BD"],
                    help="BD writes the BicubicUpsample kernels buffer so "
                    "config_from_torch detects the BD flow-upsample mode")
    args = ap.parse_args()

    import torch

    import orbax.checkpoint as ocp

    from sharkshark_tpu.train import checkpoint as ckpt_mod

    path = ckpt_mod.latest_checkpoint(args.ckpt) or args.ckpt
    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    params = tree["params"] if "params" in tree else tree[0]
    sd = params_to_state_dict(params)
    if args.degradation == "BD":
        # the reference BD net registers this buffer (net_utils.py:143);
        # its presence is how config_from_torch identifies BD checkpoints
        from sharkshark_tpu.ops.resize import _tecogan_kernels

        import torch as _torch

        sd["upsample_func.kernels"] = _torch.tensor(
            _tecogan_kernels(4), dtype=_torch.float32
        )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save(sd, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")

    from sharkshark_tpu.models import egvsr
    from sharkshark_tpu.models.torch_import import load_state_dict

    cfg = egvsr.EGVSRConfig(nb=args.nb, degradation=args.degradation)
    sd_back = load_state_dict(args.out)
    assert egvsr.config_from_torch(sd_back).degradation == args.degradation
    back = egvsr.from_torch(sd_back, cfg)
    w0 = np.asarray(params["srnet"]["conv_in"]["w"], np.float32)
    assert np.allclose(np.asarray(back["srnet"]["conv_in"]["w"]), w0)
    print("round-trip through torch_import/from_torch ok")


if __name__ == "__main__":
    main()
