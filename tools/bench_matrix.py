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


def _bench_egvsr(iters: int):
    """EGVSR infer_step ladder (the reference's egvsr_test.py shapes)."""
    import time

    import jax
    import jax.numpy as jnp

    from sharkshark_tpu.models import cast_params, egvsr

    # PRODUCTION shape (nb=10, BD flow upsample — reference
    # egvsr_upscaler.py:26), matching the envelope in egvsr_test.py:9-11
    cfg = egvsr.PRODUCTION
    params = cast_params(egvsr.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    rows = []
    for h, w in [(540, 960), (630, 1120), (720, 1280)]:
        lr = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3), dtype=jnp.bfloat16)
        state = egvsr.init_recurrent_state(1, h, w, cfg, jnp.bfloat16)
        fn = jax.jit(lambda p, st, x: egvsr.infer_step(p, st, x, cfg=cfg))
        out, st = fn(params, state, lr)
        float(checksum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out, st = fn(params, state, lr)
        float(checksum(out))
        ms = (time.perf_counter() - t0) / iters * 1e3
        row = {"model": "egvsr", "lr": f"{h}x{w}", "out": f"{h*4}x{w*4}",
               "ms_per_frame": round(ms, 1), "fps": round(1000 / ms, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def _egvsr_params(weights: str | None):
    import jax
    import jax.numpy as jnp

    from sharkshark_tpu.models import cast_params, egvsr

    if weights:
        from sharkshark_tpu.models.torch_import import load_state_dict

        sd = load_state_dict(weights)
        cfg = egvsr.config_from_torch(sd)
        p = egvsr.from_torch(sd, cfg)
    else:
        cfg = egvsr.PRODUCTION
        p = egvsr.init_params(jax.random.PRNGKey(0), cfg)
    return cast_params(p, jnp.bfloat16), cfg


def _bench_cuts(iters: int, cut_every: int = 24, weights: str | None = None):
    """Mixed-content EGVSR at 720p (VERDICT r2 item 5): a stream of two
    panning scenes switching every `cut_every` frames, run with the
    scene-cut skip-warp fallback on vs off, plus the forced FULL-window
    warp cost so the worst-case no-skip mix is derivable even when the
    local FNet's flows happen to stay smooth.  Reports sustained fps and
    per-frame p99."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from sharkshark_tpu.models import cast_params, egvsr

    h, w = 720, 1280
    params, cfg = _egvsr_params(weights)
    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    # two panning scenes from two fixed textures: smooth motion inside a
    # scene, a full-content switch at each cut. Textures are low-pass
    # filtered so a 2-px pan leaves a small frame diff (raw noise
    # decorrelates at any shift and would trip the cut detector on
    # EVERY frame)
    import cv2

    rng = np.random.default_rng(7)
    tex = []
    for _ in range(2):
        t = rng.random((h + 64, w + 64, 3)).astype(np.float32)
        tex.append(cv2.GaussianBlur(t, (0, 0), 12) * 4.0 % 1.0)
    n_frames = max(2 * cut_every, 48)
    frames = []
    for i in range(n_frames):
        scene = (i // cut_every) % 2
        off = (i % cut_every) * 2
        frames.append(tex[scene][off : off + h, off : off + w])
    frames = [jnp.asarray(f, jnp.bfloat16) for f in frames]
    jax.block_until_ready(frames)

    rows = []
    for thr in (0.12, None):
        fn = jax.jit(
            lambda p, st, x, t=thr: egvsr.infer_step(
                p, st, x, cfg=cfg, cut_threshold=t
            )
        )
        state = egvsr.init_recurrent_state(1, h, w, cfg, jnp.bfloat16)
        # compile both cond branches: a smooth frame and a cut frame
        out, st = fn(params, state, frames[0][None])
        out, st = fn(params, st, frames[cut_every][None])
        float(checksum(out))
        # sustained pass
        st = egvsr.init_recurrent_state(1, h, w, cfg, jnp.bfloat16)
        t0 = time.perf_counter()
        for f in frames:
            out, st = fn(params, st, f[None])
        float(checksum(out))
        sustained = (time.perf_counter() - t0) / n_frames * 1e3
        # per-frame pass (hard barrier per frame for the distribution)
        st = egvsr.init_recurrent_state(1, h, w, cfg, jnp.bfloat16)
        per = []
        for f in frames:
            t1 = time.perf_counter()
            out, st = fn(params, st, f[None])
            float(checksum(out))
            per.append((time.perf_counter() - t1) * 1e3)
        row = {
            "model": "egvsr-cuts", "lr": f"{h}x{w}",
            "cut_every": cut_every, "cut_skip": thr is not None,
            "ms_per_frame": round(sustained, 1),
            "fps": round(1000 / sustained, 2),
            "ms_p99_barrier": round(float(np.percentile(per, 99)), 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # forced FULL-window warp (rough flow): the +cost a no-skip pipeline
    # pays on each cut frame when flow goes rough
    from sharkshark_tpu.ops.warp import backward_warp_fast

    hr = jax.random.uniform(jax.random.PRNGKey(3), (1, 4 * h, 4 * w, 3),
                            dtype=jnp.bfloat16)
    rough = (jax.random.uniform(jax.random.PRNGKey(4), (1, 4 * h, 4 * w, 2),
                                dtype=jnp.float32) - 0.5) * 180.0
    smooth = jnp.zeros((1, 4 * h, 4 * w, 2), jnp.float32) + 3.0
    wf = jax.jit(lambda x, f: backward_warp_fast(x, f))
    for name, flow in [("fast", smooth), ("full", rough)]:
        float(checksum(wf(hr, flow)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = wf(hr, flow)
        float(checksum(out))
        ms = (time.perf_counter() - t0) / iters * 1e3
        row = {"model": f"egvsr-warp-{name}", "lr": f"{h}x{w}",
               "ms_per_frame": round(ms, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def _bench_denoise(iters: int, batch: int):
    """Production denoise path: chunked BSVD + SRVGG + postproc, 720p."""
    import time

    import jax
    import jax.numpy as jnp

    from sharkshark_tpu.models import bsvd, cast_params, srvgg
    from sharkshark_tpu.upscale import (
        UpscaleSpec,
        init_denoise_state,
        upscale_batch_denoise,
    )

    cfg = srvgg.GENERAL_X4V3
    params = {
        "sr": cast_params(srvgg.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16),
        "denoise": cast_params(bsvd.init_params(jax.random.PRNGKey(1)), jnp.bfloat16),
    }
    spec = UpscaleSpec(lr_shape=(720, 1280), output_shape=(1440, 2560),
                       compute_dtype=jnp.bfloat16)
    checksum = jax.jit(lambda o: jnp.sum(o, dtype=jnp.int32))
    state = init_denoise_state(1, spec)
    fn = jax.jit(
        lambda p, s, f: upscale_batch_denoise(
            lambda q, x: srvgg.apply_down2(q, x, cfg=cfg), p, s, f, spec
        ),
        donate_argnums=(1,),
    )
    frames = jnp.zeros((batch, 720, 1280, 3), jnp.uint8)
    out, state = fn(params, state, frames)
    float(checksum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out, state = fn(params, state, frames)
    float(checksum(out))
    dt = time.perf_counter() - t0
    fps = iters * batch / dt
    row = {"model": "realesrgan+bsvd", "lr": "720x1280", "out": "1440x2560",
           "fps": round(fps, 2)}
    print(json.dumps(row), flush=True)
    return [row]


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+", default=["3,0", "5,0", "1,0"],
                   help="lr_level,hr_level pairs")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--suites", nargs="+", default=["sr"],
                   choices=["sr", "egvsr", "denoise", "cuts"],
                   help="which benchmark families to run")
    p.add_argument("--egvsr-weights", default=None,
                   help=".pth for the egvsr/cuts suites (e.g. "
                        "weights/minted/egvsr-derived-x4.pth) — a trained "
                        "FNet emits real rough flow at cuts")
    args = p.parse_args(argv)

    extra = []
    if "egvsr" in args.suites:
        extra += _bench_egvsr(args.iters)
    if "cuts" in args.suites:
        extra += _bench_cuts(args.iters, weights=args.egvsr_weights)
    if "denoise" in args.suites:
        extra += _bench_denoise(args.iters, args.batch)
    if "sr" not in args.suites:
        print(json.dumps({"matrix": extra}))
        return

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

    print(json.dumps({"matrix": results + extra}))


if __name__ == "__main__":
    main()
