#!/usr/bin/env python
"""A/B probe: lane-folded vs plain lowering for the ROADMAP straggler
paths (BSVD per-frame stream_step, FSRCNN, ESPCN) on the real chip.

Each row times the WHOLE jitted path (isolated-op probes are
layout-tainted through this tunnel — verify skill, round-3 note) with a
checksum barrier per rep.  Flip SHARKSHARK_LANEFOLD per-process is not
needed: both lowerings are built in one process by toggling the env var
BEFORE tracing each variant (lanefold_enabled reads it at trace time).

Usage: python tools/probe_lanefold_stragglers.py [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, reps):
    checksum = jax.jit(lambda t: jnp.sum(jnp.asarray(t[0] if isinstance(t, tuple) else t, jnp.float32)))
    out = fn(*args)
    float(checksum(out))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(checksum(out))
    return (time.perf_counter() - t0) / reps * 1e3


def ab(name, build, reps, extra_env=()):
    """build(folded: bool) -> (jitted_fn, args).  extra_env lists extra
    env vars toggled '1'/'0' alongside SHARKSHARK_LANEFOLD — paths whose
    fold is gated behind an opt-in (e.g. ESPCN's
    SHARKSHARK_LANEFOLD_ESPCN) would otherwise measure plain-vs-plain."""
    rows = {}
    for folded in (False, True):
        os.environ["SHARKSHARK_LANEFOLD"] = "1" if folded else "0"
        for var in extra_env:
            os.environ[var] = "1" if folded else "0"
        fn, args = build()
        rows["folded" if folded else "plain"] = round(bench(fn, args, reps), 2)
    r = rows["plain"] / rows["folded"]
    print(json.dumps({"path": name, **rows, "speedup": round(r, 2)}), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from sharkshark_tpu.models import bsvd, fsrcnn, variants

    key = jax.random.PRNGKey(0)

    # BSVD per-frame stream_step, 720p N=1 (the reference's per-frame
    # TRT regime; reference model.py:526-580)
    p = jax.device_put(bsvd.init_params(key))
    st = bsvd.init_stream_state(1, 720, 1280)
    x = jax.device_put(jnp.zeros((1, 720, 1280, 4), jnp.float32))

    def build_bsvd():
        fn = jax.jit(lambda pp, ss, xx: bsvd.stream_step(pp, ss, xx)[0])
        return fn, (p, st, x)

    ab("bsvd.stream_step@720p", build_bsvd, args.reps)

    # FSRCNN x4, RGB-rides-batch at 360p (image-service regime)
    pf = jax.device_put(fsrcnn.init_params(key))
    xf = jax.device_put(jnp.zeros((3, 360, 640, 1), jnp.float32))

    def build_fsrcnn():
        fn = jax.jit(lambda pp, xx: fsrcnn.apply(pp, xx))
        return fn, (pf, xf)

    ab("fsrcnn@360p_x4", build_fsrcnn, args.reps)

    # ESPCN x4 at 360p
    pe = jax.device_put(variants.espcn_init(key))
    xe = jax.device_put(jnp.zeros((1, 360, 640, 1), jnp.float32))

    def build_espcn():
        fn = jax.jit(lambda pp, xx: variants.espcn_apply(pp, xx))
        return fn, (pe, xe)

    ab("espcn@360p_x4", build_espcn, args.reps,
       extra_env=("SHARKSHARK_LANEFOLD_ESPCN",))


if __name__ == "__main__":
    main()
