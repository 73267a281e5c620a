#!/usr/bin/env python
"""Breakdown of the 720p denoise path on the real chip.

Times, separately:
  full      — upscale_batch_denoise (BSVD chunk + SR + post)
  bsvd      — bsvd.chunk_step alone
  bsvd_raw  — the same conv sequence with the temporal-shift/fifo/mask
              machinery stripped (pure conv stack at identical shapes):
              the compute lower bound for the current formulation
  sr_post   — the SR + post stage alone (denoise output faked)

Usage: python tools/profile_denoise.py [--batch 4] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, args, checksum, iters):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(checksum(leaves[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
    float(checksum(leaves[0]))
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sharkshark_tpu.models import bsvd, cast_params, srvgg
    from sharkshark_tpu.ops import conv2d, relu6
    from sharkshark_tpu.upscale import (
        UpscaleSpec,
        init_denoise_state,
        upscale_batch_denoise,
    )
    from sharkshark_tpu.upscale.steps import _denoise_postproc, to_float, resize

    T = args.batch
    cfg = srvgg.GENERAL_X4V3
    params = {
        "sr": cast_params(srvgg.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16),
        "denoise": cast_params(bsvd.init_params(jax.random.PRNGKey(1)), jnp.bfloat16),
    }
    spec = UpscaleSpec(lr_shape=(720, 1280), output_shape=(1440, 2560),
                       compute_dtype=jnp.bfloat16)
    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    frames = jnp.zeros((T, 720, 1280, 3), jnp.uint8)

    # --- full path
    state = init_denoise_state(1, spec)
    full = jax.jit(
        lambda p, s, f: upscale_batch_denoise(
            lambda q, x: srvgg.apply_down2(q, x, cfg=cfg), p, s, f, spec
        )
    )
    ms = bench(full, (params, state, frames), checksum, args.iters)
    print(json.dumps({"part": "full", "ms_per_frame": round(ms / T, 2),
                      "ms_per_chunk": round(ms, 1)}), flush=True)

    # --- bsvd chunk only
    x4 = jnp.zeros((T, 1, 720, 1280, 4), jnp.bfloat16)
    state = init_denoise_state(1, spec)
    bs = jax.jit(lambda p, s, x: bsvd.chunk_step(p, s, x))
    ms = bench(bs, (params["denoise"], state, x4), checksum, args.iters)
    print(json.dumps({"part": "bsvd", "ms_per_frame": round(ms / T, 2),
                      "ms_per_chunk": round(ms, 1)}), flush=True)

    # --- warm chunk with the carry threaded through iterations, with and
    # without buffer donation of the state arg (ROADMAP lever b: donated
    # state lets XLA alias the skip-FIFO buffers in place instead of
    # rewriting them into fresh outputs each step)
    def bench_threaded(fn, p, state, x, iters):
        out, state = fn(p, state, x)
        float(checksum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out, state = fn(p, state, x)
        float(checksum(out))
        return (time.perf_counter() - t0) / iters * 1e3

    for name, donate in (("bsvd_warm", ()), ("bsvd_warm_donated", (1,))):
        state = init_denoise_state(1, spec)
        fn = jax.jit(
            lambda p, s, x: bsvd.chunk_step(p, s, x, warm=True),
            donate_argnums=donate,
        )
        ms = bench_threaded(fn, params["denoise"], state, x4, args.iters)
        print(json.dumps({"part": name, "ms_per_frame": round(ms / T, 2),
                          "ms_per_chunk": round(ms, 1)}), flush=True)

    for name, donate in (("full_warm", ()), ("full_warm_donated", (1,))):
        state = init_denoise_state(1, spec)
        fn = jax.jit(
            lambda p, s, f: upscale_batch_denoise(
                lambda q, x: srvgg.apply_down2(q, x, cfg=cfg), p, s, f, spec,
                warm=True,
            ),
            donate_argnums=donate,
        )
        ms = bench_threaded(fn, params, state, frames, args.iters)
        print(json.dumps({"part": name, "ms_per_frame": round(ms / T, 2),
                          "ms_per_chunk": round(ms, 1)}), flush=True)

    # --- raw conv stack at the same shapes (both DenBlocks, no machinery)
    def denblock_raw(p, x):
        act = "relu6"
        tn = x.shape[0] * x.shape[1]

        def cv(pp, y, stride=1, act_on=True):
            t_, n_, h_, w_, c_ = y.shape
            z = conv2d(y.reshape(t_ * n_, h_, w_, c_), **pp, stride=stride, padding=1)
            if act_on:
                z = relu6(z)
            return z.reshape(t_, n_, *z.shape[1:])

        x0 = cv(p["inc1"], cv(p["inc0"], x))
        x1 = cv(p["down0"], x0, stride=2)
        x1 = cv(p["down0_mem"]["c2"], cv(p["down0_mem"]["c1"], x1))
        x2 = cv(p["down1"], x1, stride=2)
        x2 = cv(p["down1_mem"]["c2"], cv(p["down1_mem"]["c1"], x2))
        u2 = cv(p["up2_mem"]["c2"], cv(p["up2_mem"]["c1"], x2))
        u2 = cv(p["up2"], u2, act_on=False)
        t_, n_, h_, w_, c_ = u2.shape
        from sharkshark_tpu.ops import pixel_shuffle
        u2 = pixel_shuffle(u2.reshape(t_ * n_, h_, w_, c_), 2).reshape(t_, n_, h_ * 2, w_ * 2, -1)
        u1 = cv(p["up1_mem"]["c2"], cv(p["up1_mem"]["c1"], u2 + x1))
        u1 = cv(p["up1"], u1, act_on=False)
        t_, n_, h_, w_, c_ = u1.shape
        u1 = pixel_shuffle(u1.reshape(t_ * n_, h_, w_, c_), 2).reshape(t_, n_, h_ * 2, w_ * 2, -1)
        y = cv(p["outc1"], cv(p["outc0"], u1 + x0), act_on=False)
        return y

    def bsvd_raw(p, x):
        mid = denblock_raw(p["temp1"], x)
        return denblock_raw(p["temp2"], mid)

    raw = jax.jit(bsvd_raw)
    ms = bench(raw, (params["denoise"], x4), checksum, args.iters)
    print(json.dumps({"part": "bsvd_raw_convs", "ms_per_frame": round(ms / T, 2),
                      "ms_per_chunk": round(ms, 1)}), flush=True)

    # --- sr + post only
    def sr_post(p, f):
        img = to_float(f)
        lr = resize(img, spec.lr_shape, "area")
        den = lr  # pretend BSVD output
        return _denoise_postproc(
            lambda q, x: srvgg.apply_down2(q, x, cfg=cfg), p, den, lr, lr, spec
        )

    sp = jax.jit(sr_post)
    ms = bench(sp, (params, frames), checksum, args.iters)
    print(json.dumps({"part": "sr_post", "ms_per_frame": round(ms / T, 2),
                      "ms_per_chunk": round(ms, 1)}), flush=True)
