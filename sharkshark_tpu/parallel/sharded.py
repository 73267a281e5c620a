"""Sharded (multi-chip) versions of the production steps.

Replaces the reference's single-GPU TRT engines + device-id plumbing with
pjit over an ICI mesh. Params are replicated (they're a few MB of conv
weights — tiny next to the activations); frames are sharded batch-over-
"data" and width-over-"spatial". XLA SPMD inserts the conv halo
exchanges and the psums for the color-match statistics on its own, which
is exactly the "annotate shardings, let the compiler place collectives"
recipe — no hand-written NCCL analogue.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
from jax.sharding import Mesh

from ..upscale.steps import UpscaleSpec, upscale_multi
from .mesh import batch_sharding, replicated

__all__ = ["make_sharded_upscale", "make_sharded_train_step"]


def make_sharded_upscale(
    sr_apply: Callable[[Any, jax.Array], jax.Array],
    spec: UpscaleSpec,
    mesh: Mesh,
) -> Callable[[Any, jax.Array], jax.Array]:
    """jit-compiled `fn(params, frames_u8) -> out_u8` with frames sharded
    (batch over "data", W over "spatial") and params replicated.  Batch
    must divide by mesh.shape['data'] (see mesh.pad_batch)."""
    fs = batch_sharding(mesh)
    ps = replicated(mesh)

    def fn(params, frames):
        return upscale_multi(sr_apply, params, frames, spec)

    return jax.jit(fn, in_shardings=(ps, fs), out_shardings=fs)


def make_sharded_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """Shard a train/vsr.make_train_step function over the mesh: batch of
    (N, T, H, W, C) clips over "data", W over "spatial"; TrainState
    (params + Adam moments) replicated. Gradient psums across chips are
    inserted by XLA from these shardings alone."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(mesh, P("data", None, None, "spatial", None))
    rep = replicated(mesh)

    return jax.jit(
        train_step,
        in_shardings=(rep, data_sh, data_sh),
        out_shardings=(rep, rep),
    )
