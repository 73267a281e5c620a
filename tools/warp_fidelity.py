#!/usr/bin/env python
"""Fidelity check of the banded warp kernel vs the exact gather sampler.

Warps a real image at 4K with smooth synthetic flows of increasing
magnitude (EGVSR-like: bilinearly upsampled coarse fields) and reports
bf16-kernel vs f32-gather PSNR per window variant.

Measured (v5e, shark1.png at 2160x3840): 62.5 dB / max err 0.003 (<1
uint8 LSB) for both the FAST and FULL windows — visually lossless.

Usage: python tools/warp_fidelity.py [--image path] [--disps 4 20 90]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--image",
        default="/root/reference/samples/images/shark1.png",
        help="source image (resized to --size)",
    )
    p.add_argument("--size", nargs=2, type=int, default=[2160, 3840])
    p.add_argument("--disps", nargs="+", type=float, default=[4.0, 20.0, 90.0])
    p.add_argument("--cells", type=int, default=32, help="flow knot spacing (px)")
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sharkshark_tpu.ops.pallas.warp_band import (
        WINDOW_FULL,
        banded_backward_warp,
        banded_warp_bases,
    )
    from sharkshark_tpu.ops.warp import backward_warp

    h, w = args.size
    img = Image.open(args.image).convert("RGB").resize((w, h))
    x = jnp.asarray(np.asarray(img, np.float32)[None] / 255.0)

    rows = []
    for disp in args.disps:
        coarse = jax.random.uniform(
            jax.random.PRNGKey(int(disp)),
            (1, h // args.cells, w // args.cells, 2),
            minval=-1.0,
            maxval=1.0,
        )
        flow = (jax.image.resize(coarse, (1, h, w, 2), "bilinear") * disp).astype(
            jnp.float32
        )
        bx, by, ok_fast, _ = banded_warp_bases(flow)
        ref = np.asarray(backward_warp(x, flow), np.float32)
        kw = {} if bool(ok_fast) else {"window": WINDOW_FULL}
        got = np.asarray(
            banded_backward_warp(x, flow, bx, by, compute_dtype=jnp.bfloat16, **kw),
            np.float32,
        )
        mse = float(np.mean((got - ref) ** 2))
        row = {
            "disp_px": disp,
            "window": "fast" if bool(ok_fast) else "full",
            "psnr_db": round(10 * np.log10(1.0 / max(mse, 1e-12)), 1),
            "max_abs_err": round(float(np.max(np.abs(got - ref))), 5),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"warp_fidelity": rows}))


if __name__ == "__main__":
    main()
