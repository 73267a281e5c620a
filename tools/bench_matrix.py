#!/usr/bin/env python
"""Throughput matrix across the resolution ladders (one chip).

bench.py prints the single headline number for the driver; this sweeps
(lr_level, hr_level) configurations and reports frames/sec for each,
using the fused epilogue where the shapes allow it.

Usage: python tools/bench_matrix.py [--configs 3,0 5,0 1,0] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+", default=["3,0", "5,0", "1,0"],
                   help="lr_level,hr_level pairs")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from sharkshark_tpu.models import cast_params, srvgg
    from sharkshark_tpu.upscale import (
        HR_LEVELS,
        LR_LEVELS,
        UpscaleSpec,
        enable_persistent_cache,
        upscale_multi,
    )

    enable_persistent_cache()
    cfg = srvgg.GENERAL_X4V3
    params = cast_params(
        srvgg.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16
    )
    checksum = jax.jit(lambda o: jnp.sum(o, dtype=jnp.int32))

    results = []
    for pair in args.configs:
        lr_level, hr_level = (int(v) for v in pair.split(","))
        lr = LR_LEVELS[lr_level]
        hr = HR_LEVELS[hr_level]
        spec = UpscaleSpec(
            lr_shape=lr, output_shape=hr, compute_dtype=jnp.bfloat16
        )
        from fractions import Fraction
        from math import gcd

        fused = None
        if 4 * lr[0] * hr[1] == 4 * lr[1] * hr[0] and 4 * lr[0] >= hr[0]:
            f = Fraction(4 * lr[0], hr[0])
            period = 4 * f.denominator // gcd(f.numerator, 4 * f.denominator)
            if hr[0] % period == 0 and hr[1] % period == 0:
                fused = f"{f.numerator}/{f.denominator}"
                num, den = f.numerator, f.denominator
        apply_fn = (
            (lambda p, x, n=num, d=den: srvgg.apply_down_rational(p, x, n, d, cfg=cfg))
            if fused
            else (lambda p, x: srvgg.apply(p, x, cfg=cfg))
        )
        fn = jax.jit(
            lambda p, f, a=apply_fn, s=spec: upscale_multi(a, p, f, s)
        )
        frames = jnp.zeros((args.batch, *lr, 3), jnp.uint8)
        float(checksum(fn(params, frames)))  # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(params, frames)
        float(checksum(out))
        dt = time.perf_counter() - t0
        fps = args.iters * args.batch / dt
        row = {
            "lr_level": lr_level, "hr_level": hr_level,
            "lr": f"{lr[0]}x{lr[1]}", "out": f"{hr[0]}x{hr[1]}",
            "fused_epilogue": fused, "fps": round(fps, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"matrix": results}))


if __name__ == "__main__":
    main()
