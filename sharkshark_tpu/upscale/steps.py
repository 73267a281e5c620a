"""The production upscale compute steps, as pure jittable functions.

TPU rewrites of FsrcnnUpscalerService.upscale_multi / upscale_single
(reference src/upscale/fsrcnn_upscaler.py:168-326).  Where the reference
splits the path into TensorRT engine + ad-hoc torch post ops, here the
whole uint8→uint8 frame transform is ONE traced function so XLA fuses the
dequant, resizes, color matching and quant into the conv epilogues:

    uint8 NHWC -> /255 -> area-resize to lr_shape -> SR model (bf16 MXU)
      -> global channel mean/std match -> blur-pyramid local color match
      -> clamp -> bicubic resize to output_shape -> *255 uint8 NHWC

The denoise path threads BSVD streaming state (an explicit pytree) through
each call instead of the reference's hidden nn.Module buffers
(model_volatile.py:140-154).

Everything here is shape-static: jit once per (batch, H, W) like the
reference's per-shape `.pts` engine files (realesrgan/factory.py:214-227);
see jit_cache.ShapeCache.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..models import bsvd
from ..ops import (
    global_color_match,
    local_color_match,
    resize,
    sharpen,
    to_float,
    to_uint8,
    to_yuv420,
)


def _emit(hr: jnp.ndarray, spec: "UpscaleSpec") -> jnp.ndarray:
    """Final uint8 emission in the spec's output pixel format."""
    if spec.pix_fmt == "yuv420p":
        return to_yuv420(hr)
    return to_uint8(hr)

__all__ = [
    "UpscaleSpec",
    "upscale_multi",
    "upscale_single_denoise",
    "init_denoise_state",
    "egvsr_upscale_step",
]


class UpscaleSpec(NamedTuple):
    """Static configuration of one upscale step (hashable -> usable as a
    jit static argument)."""

    lr_shape: tuple[int, int] = (720, 1280)      # lr_level table, levels.py
    output_shape: tuple[int, int] | None = (1440, 2560)
    scale: int = 4
    lr_hr_resize: bool = True                     # fsrcnn_upscaler.py:173,223
    denoise_rate: float = 1.0
    denoise_opacity: float = 0.8                  # fsrcnn_upscaler.py:273
    compute_dtype: Any = jnp.bfloat16             # reference: fp16 TRT + amp
    pix_fmt: str = "rgb24"                        # 'yuv420p': device-side
    # colorspace conversion + 2x2 chroma subsample — half the D2H bytes
    # and no host swscale stage (ops.to_yuv420)


def _resize_to_output(hr: jnp.ndarray, spec: UpscaleSpec) -> jnp.ndarray:
    """Final resize to output_shape.  The reference picks bicubic when
    `output_shape[0] >= tensor.shape[0]` — but shape[0] there is the
    batch/channel dim (fsrcnn_upscaler.py:224,317), so in practice the
    branch is always bicubic; we keep that effective behavior."""
    if spec.output_shape is None:
        return hr
    if hr.shape[-3:-1] == tuple(spec.output_shape):
        return hr
    return resize(hr, spec.output_shape, "bicubic")


def upscale_multi(
    sr_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    sr_params: Any,
    frames: jnp.ndarray,
    spec: UpscaleSpec,
) -> jnp.ndarray:
    """Batched production path (reference upscale_multi, :168-233).

    frames: (N, H, W, 3) uint8  ->  (N, OH, OW, 3) uint8.
    `sr_apply(params, x)` maps (N, h, w, 3) [0,1] -> (N, h*s, w*s, 3).
    """
    img = to_float(frames)
    lr = img
    h, w = img.shape[-3], img.shape[-2]
    if spec.lr_hr_resize and (h > spec.lr_shape[0] or w > spec.lr_shape[1]):
        lr = resize(img, spec.lr_shape, "area")
    lr_before = lr

    # the HR tensor stays in compute_dtype through the post chain — the
    # color-match statistics are still reduced in f32 inside the ops, but
    # the 4x-resolution activations move through HBM at half width (the
    # reference runs this whole stretch in fp16 amp, :169-233)
    hr = sr_apply(sr_params, lr.astype(spec.compute_dtype))

    hr = global_color_match(hr, lr_before)
    hr = local_color_match(hr, lr_before)
    hr = jnp.clip(hr, 0.0, 1.0)

    if spec.lr_hr_resize:
        hr = _resize_to_output(hr, spec)
    return _emit(hr, spec)


def _ceil4(v: int) -> int:
    return -(-v // 4) * 4


def init_denoise_state(
    n: int,
    spec: UpscaleSpec,
    cfg: bsvd.BSVDConfig = bsvd.BSVD_32,
    dtype=None,
) -> dict:
    """Fresh BSVD streaming state for the single-frame denoise path.
    Replaces the reference's registered in-module buffers
    (model_volatile.py:140-154). State lives in the step's compute dtype
    so the whole denoiser runs bf16 on the MXU by default. Dims are
    rounded up to multiples of 4 (two stride-2 stages); the steps pad and
    crop accordingly, covering the odd ladder entries like 630x1120."""
    h, w = _ceil4(spec.lr_shape[0]), _ceil4(spec.lr_shape[1])
    return bsvd.init_stream_state(n, h, w, cfg, dtype or spec.compute_dtype)


def _bsvd_pad(x: jnp.ndarray, spec: UpscaleSpec) -> jnp.ndarray:
    h, w = spec.lr_shape
    ph, pw = _ceil4(h) - h, _ceil4(w) - w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x


def _bsvd_crop(y: jnp.ndarray, spec: UpscaleSpec) -> jnp.ndarray:
    h, w = spec.lr_shape
    return y[:, :h, :w, :]


def upscale_single_denoise(
    sr_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    params: dict,
    state: dict,
    frame: jnp.ndarray,
    spec: UpscaleSpec,
    cfg: bsvd.BSVDConfig = bsvd.BSVD_32,
) -> tuple[jnp.ndarray, dict]:
    """Denoise-enabled per-frame path (reference upscale_single, :235-326).

    frame: (N, H, W, 3) uint8;  params: {"sr": ..., "denoise": ...};
    state: BSVD stream state from init_denoise_state.
    Returns (out uint8 (N, OH, OW, 3), new_state).

    Mirrors the reference's effective dataflow: a constant noise map of
    0.1*denoise_rate is the 4th input channel (0.05 on the very first
    frame, :262,269), only the *current* frame is fed to BSVD (:277 slices
    [:,1:2]), output is sharpened (strength 2e-5), clamped, and blended at
    0.8 opacity with the pre-denoise frame (:279-281). The SR stage then
    runs on the denoised frame with an HR sharpen (7e-5, :298-299). The
    single path does global color match only — no local match (:302-313).

    Temporal note: the blended BSVD output is SHIFT_NUM (16) frames behind
    the current frame. This matches the reference's production denoiser —
    the volatile BSVD carries its shift buffers across calls with reset
    disabled (model_volatile.py:149-154,193-195), so its per-call output
    has the same pipeline delay.

    lr_shape must be even in both dims; odd heights in the ladder (630)
    are padded to the next /4 multiple for BSVD and cropped back.
    """
    img = to_float(frame)
    lr = resize(img, spec.lr_shape, "area")
    lr_before = lr
    n, h, w, _ = lr.shape

    first = state["t"] == 0
    state_dtype = state["temp1"]["skip1"].dtype
    lr_p = _bsvd_pad(lr, spec)
    noise_val = jnp.where(first, 0.05, 0.1 * spec.denoise_rate)
    noise = jnp.full(lr_p.shape[:3] + (1,), 1.0, state_dtype) * noise_val.astype(state_dtype)
    x4 = jnp.concatenate([lr_p.astype(state_dtype), noise], axis=-1)

    den, new_state = bsvd.stream_step(params["denoise"], state, x4, cfg=cfg)
    den = _bsvd_crop(den, spec)
    # post chain runs in compute_dtype end-to-end, like upscale_multi and
    # the reference's fp16 amp region (:169-233) — the f32 promotion here
    # cost ~0.7 ms/frame of full-res HBM passes (round-5 profile)
    den = jnp.clip(sharpen(den.astype(spec.compute_dtype), 0.00002), 0.0, 1.0)
    lr = den * spec.denoise_opacity + (1.0 - spec.denoise_opacity) * lr

    hr = sr_apply(params["sr"], lr.astype(spec.compute_dtype))
    hr = jnp.clip(sharpen(hr, 0.00007), 0.0, 1.0)

    hr = global_color_match(hr, lr_before)
    hr = jnp.clip(hr, 0.0, 1.0)
    hr = _resize_to_output(hr, spec)
    return _emit(hr, spec), new_state


def upscale_batch_denoise(
    sr_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    params: dict,
    state: dict,
    frames: jnp.ndarray,
    spec: UpscaleSpec,
    cfg: bsvd.BSVDConfig = bsvd.BSVD_32,
    warm: bool = False,
    sr_sub_batch: int | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Micro-batched denoise path: the whole micro-batch runs through
    BSVD in ONE layer-major chunk_step (every conv batched (T*N) on the
    MXU, state traffic paid once per chunk — models/bsvd.py chunked
    path), and the SR stage and color matching run as one batched call,
    recovering the MXU efficiency the reference's per-frame loop gives
    up (fsrcnn_upscaler.py:156-160 loops upscale_single per frame).

    frames: (T, H, W, 3) uint8 -> ((T, OH, OW, 3) uint8, new_state).
    The state pytree is the same as the single path's, but chunked and
    per-frame streaming evolve their skip buffers differently — a
    service must not switch paths on one live state.

    sr_sub_batch: run the SR+post tail in sub-batches of this size
    inside the same jit.  BSVD's chunk machinery amortizes with T
    (28.8 ms/frame at T=8 vs 36.3 at T=4 on v5e) while the SR stage's
    720p activations regress past batch 4 (HBM pressure), so T=8 BSVD +
    two SR sub-batches of 4 beats both uniform configurations.
    """
    img = to_float(frames)
    lr = resize(img, spec.lr_shape, "area")
    lr_before = lr
    t, h, w, _ = lr.shape
    state_dtype = state["temp1"]["skip1"].dtype

    lr_p = _bsvd_pad(lr, spec)

    idx = state["t"] + jnp.arange(t, dtype=jnp.int32)
    noise_vals = jnp.where(idx == 0, 0.05, 0.1 * spec.denoise_rate)
    noise = jnp.broadcast_to(
        noise_vals[:, None, None, None, None].astype(state_dtype),
        (t, 1) + lr_p.shape[1:3] + (1,),
    )
    x4 = jnp.concatenate([lr_p[:, None].astype(state_dtype), noise], axis=-1)
    den, new_state = bsvd.chunk_step(params["denoise"], state, x4, cfg=cfg, warm=warm)
    den = den[:, 0]
    if sr_sub_batch and t > sr_sub_batch and t % sr_sub_batch == 0:
        out = jnp.concatenate(
            [
                _denoise_postproc(
                    sr_apply,
                    params,
                    den[i : i + sr_sub_batch],
                    lr[i : i + sr_sub_batch],
                    lr_before[i : i + sr_sub_batch],
                    spec,
                )
                for i in range(0, t, sr_sub_batch)
            ],
            axis=0,
        )
    else:
        out = _denoise_postproc(sr_apply, params, den, lr, lr_before, spec)
    return out, new_state


def _denoise_postproc(sr_apply, params, den, lr, lr_before, spec: UpscaleSpec):
    """Shared tail of the denoise paths: sharpen+blend the denoised frames
    against the pre-denoise LR, SR, HR sharpen, global color match,
    output resize, uint8 (reference upscale_single :279-326)."""
    den = _bsvd_crop(den, spec)
    # compute_dtype post chain (see upscale_single_denoise note)
    den = jnp.clip(sharpen(den.astype(spec.compute_dtype), 0.00002), 0.0, 1.0)
    lr = den * spec.denoise_opacity + (1.0 - spec.denoise_opacity) * lr

    hr = sr_apply(params["sr"], lr.astype(spec.compute_dtype))
    hr = jnp.clip(sharpen(hr, 0.00007), 0.0, 1.0)
    hr = global_color_match(hr, lr_before)
    hr = jnp.clip(hr, 0.0, 1.0)
    hr = _resize_to_output(hr, spec)
    return _emit(hr, spec)


def flush_batch_denoise(
    sr_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    params: dict,
    state: dict,
    lr_tail: jnp.ndarray,
    t_end: jnp.ndarray,
    spec: UpscaleSpec,
    cfg: bsvd.BSVDConfig = bsvd.BSVD_32,
) -> tuple[jnp.ndarray, dict]:
    """Drain part of the SHIFT_NUM in-flight frames at end-of-stream.

    BSVD has 16 frames of inherent lookahead, so when the source ends the
    last 16 frames are still inside the network (the reference's
    production streaming simply drops them).  Each call feeds one chunk
    of T zero frames with the flush window t_end = total real frames fed
    (the protocol's None-feeds) and post-processes the drained outputs
    against their own pre-denoise frames — callers chain SHIFT_NUM/T of
    these so the flush reuses the live micro-batch executable size
    instead of compiling (and OOMing on) one 16-frame pass.

    lr_tail: (T, H, W, 3) uint8 — the raw input frames this chunk
    drains, oldest first (zero-filled at positions that are pre-valid
    garbage or beyond the clip; the caller discards those outputs).
    t_end: scalar int32 — real frames fed over the whole stream.
    Returns ((T, OH, OW, 3) uint8, new_state).
    """
    img = to_float(lr_tail)
    lr = resize(img, spec.lr_shape, "area")
    lr_before = lr
    state_dtype = state["temp1"]["skip1"].dtype

    lr_p = _bsvd_pad(lr, spec)
    zeros = jnp.zeros(
        (lr_tail.shape[0], 1) + lr_p.shape[1:3] + (4,), state_dtype
    )
    den, new_state = bsvd.chunk_step(
        params["denoise"], state, zeros, cfg=cfg, t_end=t_end
    )
    out = _denoise_postproc(sr_apply, params, den[:, 0], lr, lr_before, spec)
    return out, new_state


def egvsr_upscale_step(
    params: dict,
    state: tuple,
    frame: jnp.ndarray,
    spec: UpscaleSpec,
    cut_threshold: float | None = None,
    cfg=None,
) -> tuple[jnp.ndarray, tuple]:
    """Frame-recurrent EGVSR path (reference egvsr_upscaler.py:145-212):
    area-resize to lr_shape, FRNet step with (lr_prev, hr_prev) carry,
    clamp, resize to output_shape, uint8.  cut_threshold: scene-cut
    skip-warp fallback (egvsr.frnet_step)."""
    from ..models import egvsr

    img = to_float(frame)
    lr = img
    h, w = img.shape[-3], img.shape[-2]
    if spec.lr_hr_resize and (h > spec.lr_shape[0] or w > spec.lr_shape[1]):
        lr = resize(img, spec.lr_shape, "area")
    hr, new_state = egvsr.infer_step(
        params, state, lr.astype(spec.compute_dtype),
        cfg=egvsr.DEFAULT if cfg is None else cfg,
        cut_threshold=cut_threshold,
    )
    hr = jnp.clip(hr.astype(jnp.float32), 0.0, 1.0)
    hr = _resize_to_output(hr, spec)
    return _emit(hr, spec), new_state


def egvsr_upscale_chunk(
    params: dict,
    state: tuple,
    frames: jnp.ndarray,
    spec: UpscaleSpec,
    cut_threshold: float | None = None,
    cfg=None,
) -> tuple[jnp.ndarray, tuple]:
    """Micro-batch EGVSR path: frames (T, H, W, 3) uint8 — the whole
    micro-batch in one executable.  Pre/post (to_float, area resize,
    clamp, output resize, emit) run batched over T, and the flow net runs
    ONCE at batch T (egvsr.infer_chunk); only the warp + SRNet recurrence
    scans.  Measured NEUTRAL vs the per-frame step at 720p/T=4 on this
    chip (fnet is bandwidth-bound at N=1 already — see
    EgvsrUpscalerService.proc_init); kept for parity of the batched API
    and for hardware where the N=1 width loss is real."""
    from ..models import egvsr

    img = to_float(frames)
    lr = img
    h, w = img.shape[-3], img.shape[-2]
    if spec.lr_hr_resize and (h > spec.lr_shape[0] or w > spec.lr_shape[1]):
        lr = resize(img, spec.lr_shape, "area")
    hr, new_state = egvsr.infer_chunk(
        params, state, lr.astype(spec.compute_dtype)[:, None],
        cfg=egvsr.DEFAULT if cfg is None else cfg,
        cut_threshold=cut_threshold,
    )
    hr = jnp.clip(hr[:, 0].astype(jnp.float32), 0.0, 1.0)
    hr = _resize_to_output(hr, spec)
    return _emit(hr, spec), new_state
