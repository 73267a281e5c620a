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

from typing import Any, Callable

import jax
from jax.sharding import Mesh

from ..upscale.steps import UpscaleSpec, upscale_multi
from .mesh import batch_sharding, replicated

__all__ = [
    "make_sharded_upscale",
    "make_sharded_train_step",
    "make_sharded_denoise",
    "make_sharded_denoise_flush",
    "make_sharded_egvsr_step",
    "width_sharding",
]


def _emitted_sharding(mesh: Mesh, spec: UpscaleSpec, *, batch: bool):
    """Sharding for the step's EMITTED uint8 frames.

    rgb24 output is rank-4 NHWC (W at axis 2); planar yuv420p
    (ops.color.to_yuv420) is rank-3 (N, H*3//2, W) with W as the LAST
    axis — the same data/width split applies, on a different axis index.
    `batch=True` is the micro-batch factories' (data-axis) layout;
    `batch=False` is the single-stream width-over-everything layout."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    w_axes = axes if len(axes) > 1 else axes[0]
    if spec.pix_fmt == "yuv420p":
        specs = (
            P("data", None, "spatial") if batch else P(None, None, w_axes)
        )
    else:
        specs = (
            P("data", None, "spatial", None)
            if batch
            else P(None, None, w_axes, None)
        )
    return NamedSharding(mesh, specs)


def make_sharded_upscale(
    sr_apply: Callable[[Any, jax.Array], jax.Array],
    spec: UpscaleSpec,
    mesh: Mesh,
) -> Callable[[Any, jax.Array], jax.Array]:
    """jit-compiled `fn(params, frames_u8) -> out_u8` with frames sharded
    (batch over "data", W over "spatial") and params replicated.  Batch
    must divide by mesh.shape['data'] (see mesh.pad_batch).  yuv420p
    output emits with W (the planar last axis) on "spatial"."""
    fs = batch_sharding(mesh)
    ps = replicated(mesh)
    out = _emitted_sharding(mesh, spec, batch=True)

    def fn(params, frames):
        return upscale_multi(sr_apply, params, frames, spec)

    return jax.jit(fn, in_shardings=(ps, fs), out_shardings=out)


def width_sharding(mesh: Mesh):
    """Per-leaf W sharding for image-like pytrees: the width axis (always
    ndim-2 in our NHWC / T,N,H,W,C layouts) is split over every mesh
    axis; leaves with fewer than 3 dims (scalars like the BSVD frame
    counter) stay replicated.  Used for the single-stream paths that
    have no batch to split — the TPU analogue of scaling one frame's
    latency over chips (SURVEY §2.2 tensor/op parallelism row)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def leaf(x):
        nd = getattr(x, "ndim", 0)
        if nd < 3:
            return NamedSharding(mesh, P())
        spec = [None] * nd
        spec[nd - 2] = axes if len(axes) > 1 else axes[0]
        return NamedSharding(mesh, P(*spec))

    return leaf


def make_sharded_denoise(
    sr_apply: Callable[[Any, jax.Array], jax.Array],
    spec: UpscaleSpec,
    mesh: Mesh,
    cfg=None,
    warm: bool = False,
    sr_sub_batch: int | None = None,
) -> Callable:
    """Sharded denoise micro-batch step: `fn(params, state, frames_u8) ->
    (out_u8, new_state)` with every image-like tensor split on W across
    all mesh devices and params replicated.

    The BSVD chunk axis T is *temporal* (shift convs couple adjacent
    frames), so the micro-batch cannot ride a data axis; width is the
    scalable dimension.  XLA SPMD inserts the conv halo exchanges and
    keeps the color-match statistics psums on ICI. State enters and
    leaves with the same shardings, so a live service keeps the state
    resident and sharded across calls."""
    from ..models import bsvd as _bsvd
    from ..upscale.steps import upscale_batch_denoise

    cfg = cfg or _bsvd.BSVD_32
    ws = width_sharding(mesh)
    rep = replicated(mesh)
    out_fs = _emitted_sharding(mesh, spec, batch=False)

    def fn(params, state, frames):
        return upscale_batch_denoise(
            sr_apply, params, state, frames, spec, cfg, warm=warm,
            sr_sub_batch=sr_sub_batch,
        )

    compiled = {}

    def call(params, state, frames):
        key = frames.shape
        if key not in compiled:
            st_specs = jax.tree_util.tree_map(ws, state)
            compiled[key] = jax.jit(
                fn,
                in_shardings=(rep, st_specs, ws(frames)),
                out_shardings=(out_fs, st_specs),
            )
        return compiled[key](params, state, frames)

    return call


def make_sharded_denoise_flush(
    sr_apply: Callable[[Any, jax.Array], jax.Array],
    spec: UpscaleSpec,
    mesh: Mesh,
    cfg=None,
) -> Callable:
    """Sharded EOF flush of the BSVD lookahead: `fn(params, state,
    lr_tail_u8, t_end) -> (out_u8, new_state)` with the same width
    shardings as make_sharded_denoise, so a mesh-backed live service can
    drain its (sharded, device-resident) state at end-of-stream without
    falling back to a single-device executable."""
    from ..models import bsvd as _bsvd
    from ..upscale.steps import flush_batch_denoise

    cfg = cfg or _bsvd.BSVD_32
    ws = width_sharding(mesh)
    rep = replicated(mesh)
    out_fs = _emitted_sharding(mesh, spec, batch=False)
    compiled = {}

    def call(params, state, lr_tail, t_end):
        key = lr_tail.shape
        if key not in compiled:
            st_specs = jax.tree_util.tree_map(ws, state)
            compiled[key] = jax.jit(
                lambda p, s, f, te: flush_batch_denoise(
                    sr_apply, p, s, f, te, spec, cfg
                ),
                in_shardings=(rep, st_specs, ws(lr_tail), rep),
                out_shardings=(out_fs, st_specs),
            )
        return compiled[key](params, state, lr_tail, t_end)

    return call


def make_sharded_egvsr_step(
    spec: UpscaleSpec,
    mesh: Mesh,
    cfg=None,
    cut_threshold: float | None = None,
) -> Callable:
    """Sharded frame-recurrent EGVSR step: `fn(params, state, frame_u8) ->
    (out_u8, new_state)`, W split across all devices (the single-frame
    latency-scaling case — a recurrent stream has no batch to split).

    Uses the exact gather warp (fast_warp=False): XLA partitions the
    gather itself; the banded Pallas kernel stays a single-device code
    path."""
    from ..models import egvsr as _egvsr

    cfg = cfg or _egvsr.DEFAULT
    ws = width_sharding(mesh)
    rep = replicated(mesh)
    out_fs = _emitted_sharding(mesh, spec, batch=False)
    compiled = {}

    def call(params, state, frame):
        key = frame.shape
        if key not in compiled:
            st_specs = jax.tree_util.tree_map(ws, state)
            compiled[key] = jax.jit(
                lambda p, s, f: _sharded_egvsr_body(
                    p, s, f, spec, cfg, cut_threshold
                ),
                in_shardings=(rep, st_specs, ws(frame)),
                out_shardings=(out_fs, st_specs),
            )
        return compiled[key](params, state, frame)

    return call


def _sharded_egvsr_body(params, state, frame, spec: UpscaleSpec, cfg,
                        cut_threshold):
    from ..models import egvsr as _egvsr
    from ..ops import resize, to_float
    from ..upscale.steps import _emit
    import jax.numpy as jnp

    img = to_float(frame)
    h, w = img.shape[-3], img.shape[-2]
    lr = img
    if spec.lr_hr_resize and (h > spec.lr_shape[0] or w > spec.lr_shape[1]):
        lr = resize(img, spec.lr_shape, "area")
    # cfg must be the checkpoint's (a BD-trained production net needs the
    # TecoGAN bicubic flow upsample, not the class-default bilinear)
    hr, new_state = _egvsr.infer_step(
        params, state, lr.astype(spec.compute_dtype), cfg=cfg,
        fast_warp=False, cut_threshold=cut_threshold,
    )
    hr = jnp.clip(hr.astype(jnp.float32), 0.0, 1.0)
    if spec.output_shape is not None and hr.shape[-3:-1] != tuple(spec.output_shape):
        hr = resize(hr, spec.output_shape, "bicubic")
    return _emit(hr, spec), new_state


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
