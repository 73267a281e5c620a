#!/usr/bin/env python
"""Per-shape conv throughput probe on the real chip.

Times a chain of L identical 3x3 convs (bias+relu6) at each (H, W, Cin,
Cout) the BSVD U-Net uses at 720p, batch 4, and reports achieved
TFLOP/s.  Identifies which levels fall off the MXU ceiling.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sharkshark_tpu.ops import conv2d, relu6

L = 8
N = 4
checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))


def probe(h, w, ci, co, stride=1, label=""):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, h, w, ci), jnp.bfloat16)
    w1 = jax.random.normal(key, (3, 3, ci, co), jnp.bfloat16) * 0.05
    wl = jax.random.normal(key, (3, 3, co, co), jnp.bfloat16) * 0.05
    b = jnp.zeros((co,), jnp.bfloat16)

    def chain(x, w1, wl, b):
        y = relu6(conv2d(x, w1, b, stride=stride, padding=1))
        for _ in range(L - 1):
            y = relu6(conv2d(y, wl, b, padding=1))
        return y

    fn = jax.jit(chain)
    y = fn(x, w1, wl, b)
    float(checksum(y))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x, w1, wl, b)
    float(checksum(y))
    dt = (time.perf_counter() - t0) / iters
    oh, ow = h // stride, w // stride
    flops = N * oh * ow * 9 * 2 * (ci * co + (L - 1) * co * co)
    print(json.dumps({
        "label": label, "shape": f"{h}x{w}", "ci": ci, "co": co,
        "ms_per_conv": round(dt / L * 1e3, 3),
        "tflops": round(flops / dt / 1e12, 1),
    }), flush=True)


if __name__ == "__main__":
    probe(720, 1280, 4, 30, label="inc0-like (full res, tiny C)")
    probe(720, 1280, 32, 32, label="outc/full-res C=32")
    probe(360, 640, 64, 64, label="level0 mem C=64")
    probe(180, 320, 128, 128, label="level1 mem C=128")
    probe(180, 320, 128, 256, label="up2 conv 128->256")
    probe(720, 1280, 64, 64, label="720p C=64 (SRVGG body ref)")
