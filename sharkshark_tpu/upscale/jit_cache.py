"""Compiled-executable caching, the XLA replacement for TensorRT engines.

The reference caches serialized TRT engines on disk keyed by
(model, version, N, C, W, H) — e.g. `saves/models/realesrcnn_v0_4x3x1280x720.pts`
(realesrgan/factory.py:214-227, fsrcnn/factory.py:55-68). On TPU the
equivalents are:

1. in-process: one jitted executable per static shape (ShapeCache), and
2. across processes: JAX's persistent compilation cache on disk
   (enable_persistent_cache), so a restarted service skips the 20-40 s
   XLA compile exactly like the reference skips the TRT build.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax

__all__ = ["ShapeCache", "enable_persistent_cache", "default_cache_dir"]


def default_cache_dir() -> str:
    return os.environ.get(
        "SHARKSHARK_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sharkshark_tpu", "xla"),
    )


def enable_persistent_cache(path: str | None = None) -> str:
    """Turn on JAX's on-disk compilation cache (idempotent)."""
    path = path or default_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


class ShapeCache:
    """Per-input-signature jitted executable cache.

    `fn` must be jittable with everything but the array arguments closed
    over.  Calling the cache with arrays reuses the executable compiled
    for that (shape, dtype) signature — the in-memory analogue of the
    reference's per-shape `.pts` files.
    """

    def __init__(self, fn: Callable, *, donate_argnums: tuple[int, ...] = ()):
        self._jitted = jax.jit(fn, donate_argnums=donate_argnums)
        self._seen: set[tuple] = set()

    @staticmethod
    def _sig(args: tuple) -> tuple:
        def leaf_sig(x: Any):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return (tuple(x.shape), str(x.dtype))
            return ("static", repr(x))

        return tuple(
            leaf_sig(leaf) for leaf in jax.tree.leaves(args)
        )

    def __call__(self, *args):
        self._seen.add(self._sig(args))
        return self._jitted(*args)

    @property
    def num_signatures(self) -> int:
        return len(self._seen)
