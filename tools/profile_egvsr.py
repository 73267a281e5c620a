#!/usr/bin/env python
"""EGVSR infer_step component breakdown at 720p on the real chip.

Parts: fnet (flow), flow resize, warp (banded kernel), space_to_depth,
srnet (conv_in + 16 res blocks + folded conv_out + shuffle), and the
full step.  Identifies where the 154 ms (round 1) goes vs the
reference's 45 ms TRT envelope (reference egvsr_test.py:9-11).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sharkshark_tpu.models import cast_params, egvsr
from sharkshark_tpu.ops import resize, space_to_depth
from sharkshark_tpu.ops.warp import backward_warp_fast

checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))


def bench(label, fn, *args, iters=20):
    out = fn(*args)
    float(checksum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(checksum(jax.tree_util.tree_leaves(out)[0]))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"part": label, "ms": round(ms, 2)}), flush=True)
    return ms


if __name__ == "__main__":
    H, W = (int(v) for v in (sys.argv[1:3] or (720, 1280)))
    # production shape: nb=10 + BD bicubic flow upsample
    # (reference egvsr_upscaler.py:26)
    cfg = egvsr.PRODUCTION
    params = cast_params(egvsr.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    s = cfg.scale
    key = jax.random.PRNGKey(1)
    lr = jax.random.uniform(key, (1, H, W, 3), dtype=jnp.bfloat16)
    lr_prev = jax.random.uniform(key, (1, H, W, 3), dtype=jnp.bfloat16)
    hr_prev = jax.random.uniform(key, (1, H * s, W * s, 3), dtype=jnp.bfloat16)
    flow = jax.random.uniform(key, (1, H, W, 2), dtype=jnp.bfloat16) * 4
    hr_flow = jax.random.uniform(key, (1, H * s, W * s, 2), dtype=jnp.bfloat16) * 8
    hr_tran = jax.random.uniform(key, (1, H, W, s * s * 3), dtype=jnp.bfloat16)

    bench("fnet", jax.jit(lambda p, a, b: egvsr.fnet_apply(p, a, b)),
          params["fnet"], lr, lr_prev)
    bench("flow_resize", jax.jit(
        lambda f: jnp.asarray(4.0, f.dtype) * resize(f, (H * s, W * s), "bilinear")), flow)
    bench("warp_banded", jax.jit(lambda x, f: backward_warp_fast(x, f)),
          hr_prev, hr_flow)
    bench("space_to_depth", jax.jit(lambda x: space_to_depth(x, s)), hr_prev)
    bench("srnet", jax.jit(lambda p, a, b: egvsr.srnet_apply(p, a, b)),
          params["srnet"], lr, hr_tran)
    bench("full_infer_step", jax.jit(
        lambda p, st, x: egvsr.infer_step(p, st, x, cfg=cfg)),
        params, egvsr.init_recurrent_state(1, H, W, cfg, jnp.bfloat16), lr)

    # micro-batch path: fnet batched at T, warp+srnet recurrence scanned
    T = 4
    chunk = jax.random.uniform(key, (T, 1, H, W, 3), dtype=jnp.bfloat16)
    ms = bench(f"full_infer_chunk_T{T}", jax.jit(
        lambda p, st, x: egvsr.infer_chunk(p, st, x, cfg=cfg)),
        params, egvsr.init_recurrent_state(1, H, W, cfg, jnp.bfloat16), chunk)
    print(json.dumps({"part": f"infer_chunk_T{T}_per_frame", "ms": round(ms / T, 2)}),
          flush=True)
