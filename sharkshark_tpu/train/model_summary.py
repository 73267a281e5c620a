"""FLOPs / parameter profiling.

Reference counts FLOPs with per-module forward hooks
(metrics/model_summary.py:15-63); on TPU the compiler already knows: we
lower the jitted function and read XLA's cost analysis, which covers
fusion-level reality rather than per-layer arithmetic.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np

__all__ = ["count_params", "profile_model", "benchmark_fps"]


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params) if hasattr(p, "shape"))


def profile_model(fn: Callable, *example_args) -> dict:
    """Returns {'flops', 'bytes_accessed', 'params'} for fn(*example_args)."""
    lowered = jax.jit(fn).lower(*example_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1)),
        "bytes_accessed": float(cost.get("bytes accessed", -1)),
    }


def benchmark_fps(fn: Callable, *example_args, iters: int = 10) -> float:
    """Wall-clock fps of a compiled step with a hard device barrier."""
    import time

    import jax.numpy as jnp

    jitted = jax.jit(fn)
    checksum = jax.jit(lambda o: jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    float(checksum(jitted(*example_args)))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = jitted(*example_args)
    float(checksum(out))
    return iters / (time.perf_counter() - t0)
