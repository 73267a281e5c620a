#!/usr/bin/env python
"""AOT model export (the jax.export analogue of the reference's ONNX path,
src/upscale/model/egvsr/torch2onnx.py:74-170).

Serializes a jitted model step to a portable StableHLO artifact that can
be reloaded and executed without the Python model code, plus a speed test
of the exported function.

Usage:
  python tools/export_model.py --model srvgg --out saves/export/srvgg.bin \
      --shape 1,720,1280,3
  python tools/export_model.py --model egvsr --speed-test
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp


def build(model: str, shape, weights: str | None):
    n, h, w, c = shape
    if model == "srvgg":
        from sharkshark_tpu.models import srvgg, torch_import

        cfg = srvgg.GENERAL_X4V3
        if weights:
            params = srvgg.from_torch(torch_import.load_state_dict(weights), cfg)
        else:
            params = srvgg.init_params(jax.random.PRNGKey(0), cfg)
        fn = lambda x: srvgg.apply(params, x, cfg=cfg)  # noqa: E731
        example = jnp.zeros((n, h, w, c), jnp.float32)
    elif model == "fsrcnn":
        from sharkshark_tpu.models import fsrcnn, torch_import

        if weights:
            params = fsrcnn.from_torch(torch_import.load_state_dict(weights))
        else:
            params = fsrcnn.init_params(jax.random.PRNGKey(0))
        fn = lambda x: fsrcnn.apply(params, x)  # noqa: E731
        example = jnp.zeros((n, h, w, 1), jnp.float32)
    elif model == "egvsr":
        from sharkshark_tpu.models import egvsr, torch_import

        if weights:
            params = egvsr.from_torch(torch_import.load_state_dict(weights))
        else:
            params = egvsr.init_params(jax.random.PRNGKey(0))
        state = egvsr.init_recurrent_state(n, h, w)

        def fn(x):
            hr, _ = egvsr.infer_step(params, state, x)
            return hr

        example = jnp.zeros((n, h, w, c), jnp.float32)
    else:
        raise ValueError(model)
    return fn, example


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="srvgg", choices=["srvgg", "fsrcnn", "egvsr"])
    p.add_argument("--weights", default=None)
    p.add_argument("--shape", default="1,360,640,3")
    p.add_argument("--out", default=None)
    p.add_argument("--speed-test", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    shape = tuple(int(s) for s in args.shape.split(","))
    fn, example = build(args.model, shape, args.weights)

    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(example)
    print(f"exported {args.model}: in {exported.in_avals} -> out {exported.out_avals}")

    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "wb") as f:
            f.write(exported.serialize())
        print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")
        # round-trip check
        with open(args.out, "rb") as f:
            reloaded = jexport.deserialize(f.read())
        out = reloaded.call(example)
        print(f"reload ok: output {jax.tree.leaves(out)[0].shape}")

    if args.speed_test:
        jitted = jax.jit(fn)
        checksum = jax.jit(lambda o: jnp.sum(o))
        float(checksum(jitted(example)))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = jitted(example)
        float(checksum(out))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"speed: {dt * 1000:.2f} ms/iter ({1 / dt:.1f} fps) @ {shape}")


if __name__ == "__main__":
    main()
