from __future__ import annotations

import jax
import jax.numpy as jnp

from . import bsvd, egvsr, fsrcnn, rrdbnet, srvgg, torch_import, variants

__all__ = [
    "bsvd", "egvsr", "fsrcnn", "rrdbnet", "srvgg", "torch_import",
    "variants", "cast_params",
]


def cast_params(params, dtype):
    """Cast all floating-point leaves of a param pytree to `dtype`
    (bf16 inference policy; integer/aux leaves pass through)."""

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(cast, params)
