"""Upscaler stage services: the device-compute stage of the live pipeline.

Rebuild of reference src/upscale/upscaler_base.py (BaseUpscalerService /
UpscalerQueueEntry) and src/upscale/fsrcnn_upscaler.py:86-326 /
egvsr_upscaler.py:145-212 on the thread-stage runtime:

- EsrganUpscalerService — the production path (the reference's
  'FsrcnnUpscalerService', which actually runs RealESRGAN-SRVGG): batched
  upscale_multi, or per-frame upscale_single_denoise with BSVD stream
  state when denoising is on.
- EgvsrUpscalerService — frame-recurrent EGVSR with (lr_prev, hr_prev).

TPU specifics replacing the TRT factory plumbing:
- params live in HBM once (bf16), steps are ShapeCache-jitted per input
  signature (the .pts-engine analogue),
- tail micro-batches are padded to batch_size and sliced after, keeping
  one compiled executable per service (SURVEY §7 hard parts),
- JAX async dispatch overlaps the device step with the host-side queue
  work; np.asarray at the exit edge is the only sync point.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import bsvd, egvsr, fsrcnn, srvgg, torch_import
from ..runtime import BaseService, Profiler
from ..utils import get_logger
from .jit_cache import ShapeCache, enable_persistent_cache
from .levels import LR_LEVELS
from .steps import (
    UpscaleSpec,
    egvsr_upscale_chunk,
    egvsr_upscale_step,
    flush_batch_denoise,
    init_denoise_state,
    upscale_batch_denoise,
    upscale_multi,
    upscale_single_denoise,
)

__all__ = ["UpscalerQueueEntry", "BaseUpscalerService", "EsrganUpscalerService", "EgvsrUpscalerService"]

log = get_logger("upscale.service")


@dataclass
class UpscalerQueueEntry:
    frames: Any = None
    audio_segment: Any = None
    step: int = 0
    elapsed: float = 0.0
    last_modified: float = 0.0
    profiler: Profiler = field(default_factory=Profiler)
    captured_at: float = 0.0  # wall-clock when source frames were captured


class BaseUpscalerService(BaseService):
    """Per-job timing + entry repack around the `upscale_dispatch()` hook
    (reference upscaler_base.py:26-63), plus the D2H/compute overlap the
    reference gets from CUDA async copies (pipeline.py:91-93):

    Jobs are *dispatched* to the device (async — XLA queues the step and
    the device→host copy) and parked in an in-flight ring; the host fetch
    of batch k happens only after batch k+1 has been dispatched, so the
    outbound DMA streams while the MXU computes the next batch.  On a
    host whose D2H link is the bottleneck this is the difference between
    serialized (1/(t_compute+t_copy)) and pipelined (1/max(...)) fps.
    When the job queue idles the ring drains immediately (proc_idle), so
    request/response callers (image backend) see no added latency."""

    lr_shape: tuple[int, int] = (720, 1280)
    output_shape: tuple[int, int] | None = (1440, 2560)
    inflight_depth: int = 2  # batches dispatched ahead of the host fetch
    # >1: merge same-shape queued jobs into ONE device dispatch (the
    # request/response analogue of the live pipeline's micro-batching —
    # reference pipeline.py:80-106 batches the stream; an open image
    # service gets the same MXU utilization by batching concurrent
    # requests).  Zero added latency: only jobs already in the queue are
    # taken.  Stateless (non-temporal) paths only.
    coalesce_max: int = 1

    def __init__(self, **kw) -> None:
        super().__init__(**kw)
        from collections import deque

        self._inflight: deque = deque()
        # cumulative wall seconds blocked in the host fetch (device wait +
        # transfer wait): over a LINK-BOUND window (device step much
        # faster than the link, the regime of this dev host),
        # delta(fetch_busy_s)/delta(wall) ~ 1.0 means the pipeline kept
        # the device->host link saturated — tools/bench_e2e.py reads this
        # for its link_busy_fraction metric, which unlike a probe-based
        # ceiling is immune to link-rate drift.  In a compute-bound
        # regime the same number reflects device-compute wait instead.
        self.fetch_busy_s: float = 0.0

    def _coalesce(self, job: UpscalerQueueEntry) -> list[UpscalerQueueEntry]:
        """Pull additional already-queued same-shape jobs (up to
        coalesce_max total frames) to ride one device dispatch.  An
        incompatible job or a control sentinel is stashed back for the
        worker loop, preserving order."""
        import queue as _q

        jobs = [job]
        total = len(job.frames)
        shape = np.asarray(job.frames).shape[1:]
        while total < self.coalesce_max:
            try:
                nxt = self.job_queue.get_nowait()
            except _q.Empty:
                break
            if (
                not isinstance(nxt, UpscalerQueueEntry)
                or nxt.frames is None
                or np.asarray(nxt.frames).shape[1:] != shape
                or total + len(nxt.frames) > self.coalesce_max
            ):
                self._stash.append(nxt)
                break
            jobs.append(nxt)
            total += len(nxt.frames)
        return jobs

    def proc_job_recieved(self, job: UpscalerQueueEntry):
        self.profiler = job.profiler
        self._last_step = job.step
        jobs = (
            self._coalesce(job)
            if self.coalesce_max > 1 and job.frames is not None
            else [job]
        )
        for j in jobs:
            j.profiler.end("recoder.output")
            # 'upscaler.upscale' = host dispatch cost; the device/transfer
            # wait surfaces as 'upscaler.fetch' at fetch time (under the
            # in-flight ring, dispatch-to-fetch wall time includes ring
            # residency — NOT device time — so the regions are split)
            j.profiler.start("upscaler.upscale")
        t_disp = time.time()
        if len(jobs) == 1:
            dev, n = self.upscale_dispatch(job.frames)
            group = [(job, 0, n)]
        else:
            frames = np.concatenate([np.asarray(j.frames) for j in jobs], axis=0)
            dev, _ = self.upscale_dispatch(frames)
            group, start = [], 0
            for j in jobs:
                k = len(j.frames)
                group.append((j, start, k))
                start += k
        for j, _, _ in group:
            j.profiler.end("upscaler.upscale")
        self._inflight.append((group, dev, t_disp))
        if len(self._inflight) < max(1, self.inflight_depth):
            return None
        return self._fetch_oldest()

    def _fetch_oldest(self) -> list[UpscalerQueueEntry]:
        group, dev, t = self._inflight.popleft()
        out = []
        elapsed = time.time() - t
        for job, start, n in group:
            job.profiler.start("upscaler.fetch")
            t_fetch = time.perf_counter()
            # first sub-job blocks on the whole merged transfer; siblings
            # hit the jax array's cached host copy
            frames_up = self._fetch(dev, n, start)
            self.fetch_busy_s += time.perf_counter() - t_fetch
            job.profiler.end("upscaler.fetch")
            job.profiler.start("upscaler.output")
            out.append(
                UpscalerQueueEntry(
                    frames=frames_up,
                    audio_segment=job.audio_segment,
                    step=job.step,
                    elapsed=elapsed,
                    last_modified=time.time(),
                    profiler=job.profiler,
                    captured_at=job.captured_at,
                )
            )
        return out

    def proc_idle(self):
        if self._inflight:
            yield from self._fetch_oldest()

    def proc_eof(self):
        while self._inflight:
            yield from self._fetch_oldest()

    @staticmethod
    def _host_async(dev) -> None:
        """Queue the device→host copy now (it starts the moment the
        producing computation finishes); the later np.asarray just waits."""
        try:
            dev.copy_to_host_async()
        except (AttributeError, NotImplementedError):  # pragma: no cover
            pass

    @staticmethod
    def _fetch(dev, n: int, start: int = 0) -> np.ndarray:
        if isinstance(dev, (list, tuple)):
            full = np.concatenate([np.asarray(d) for d in dev], axis=0)
            return full[start : start + n]
        return np.asarray(dev)[start : start + n]

    def upscale_dispatch(self, frames):  # pragma: no cover - abstract
        """Dispatch the device step for `frames`; return (device_out,
        n_real) WITHOUT blocking on the device→host transfer."""
        raise NotImplementedError

    def upscale(self, frames) -> np.ndarray:
        """Synchronous convenience wrapper (tests, image backend direct
        calls): dispatch + fetch in one step."""
        dev, n = self.upscale_dispatch(frames)
        return self._fetch(dev, n)


def _load_srvgg_params(
    cfg: srvgg.SRVGGConfig,
    weights: str | None,
    weights_wdn: str | None,
    denoise_rate: float,
) -> dict:
    """Load realesr-general-x4v3 weights with DNI denoise-strength blending
    (reference realesrgan/factory.py:140-157); random init if absent."""
    if weights is None:
        log.warning("no SRVGG weights given; using random init")
        return srvgg.init_params(jax.random.PRNGKey(0), cfg)
    # load_state_dict already unwraps params/params_ema containers
    sd = torch_import.load_state_dict(weights)
    if weights_wdn is not None and denoise_rate < 1.0:
        sd_wdn = torch_import.load_state_dict(weights_wdn)
        sd = torch_import.dni_blend(sd, sd_wdn, denoise_rate)
    return srvgg.from_torch(sd, cfg)


class EsrganUpscalerService(BaseUpscalerService):
    """Production upscaler (reference FsrcnnUpscalerService,
    fsrcnn_upscaler.py:86-326)."""

    def __init__(
        self,
        lr_level: int = 3,
        on_queue=None,
        denoising: bool = True,
        denoise_rate: float = 1.0,
        upscaler_model: str = "realesrgan",
        batch_size: int = 1,
        lr_hr_resize: bool = True,
        output_shape: tuple[int, int] | None = (1440, 2560),
        weights: str | None = None,
        weights_wdn: str | None = None,
        denoise_weights: str | None = None,
        compute_dtype=jnp.bfloat16,
        srvgg_cfg: srvgg.SRVGGConfig = srvgg.GENERAL_X4V3,
        bsvd_cfg: bsvd.BSVDConfig = bsvd.BSVD_32,
        fast_epilogue: bool = True,
        device: int | None = None,
        pix_fmt: str = "rgb24",
        mesh=None,
        coalesce_max: int = 1,
    ) -> None:
        super().__init__(name="EsrganUpscaler")
        # request coalescing is stateless-SR only: the denoise path is
        # temporally coupled (chunk T is semantic, not just batch)
        self.coalesce_max = 1 if denoising else max(1, coalesce_max)
        self.pix_fmt = pix_fmt
        # multi-chip product path (VERDICT r3 item 4): a jax.sharding.Mesh
        # (parallel.make_mesh) routes every device step through the
        # sharded factories — batch over "data" + W over "spatial" for the
        # SR path, W over all axes for the temporally-coupled denoise
        # chunk. Mutually exclusive with single-chip `device=` pinning.
        assert mesh is None or device is None, "mesh and device are exclusive"
        self.mesh = mesh
        self.lr_shape = LR_LEVELS[lr_level]
        self.scale = 4
        self.output_shape = output_shape
        self.on_queue = on_queue
        self.denoising = denoising
        self.denoise_rate = denoise_rate
        self.upscaler_model = upscaler_model
        self.single_mode = denoising  # denoise path is per-frame recurrent
        self.batch_size = batch_size
        self.lr_hr_resize = lr_hr_resize
        self.weights = weights
        self.weights_wdn = weights_wdn
        self.denoise_weights = denoise_weights
        self.compute_dtype = compute_dtype
        self.srvgg_cfg = srvgg_cfg
        self.bsvd_cfg = bsvd_cfg
        self.fast_epilogue = fast_epilogue
        # chip pinning parity with the reference's per-service device ids
        # (pipeline.py:20,41); None = JAX default device
        self.device = device

    def _place(self, tree):
        if self.device is None:
            return tree
        return jax.device_put(tree, jax.devices()[self.device])

    def proc_init(self) -> None:
        # idempotent so callers can pre-warm (build + jit-compile) on the
        # main thread BEFORE the paced source starts — in-run compilation
        # otherwise stalls a live pipeline for minutes and drops frames
        # (tools/bench_e2e.py warmup; the reference pays the same cost as
        # TRT engine builds before its pipeline starts). Keyed on a flag
        # set as the LAST init statement so a partial init is retried,
        # not silently skipped (ADVICE r2).
        if getattr(self, "_initialized", False):
            return
        enable_persistent_cache()
        spec = UpscaleSpec(
            lr_shape=self.lr_shape,
            output_shape=self.output_shape,
            lr_hr_resize=self.lr_hr_resize,
            denoise_rate=self.denoise_rate,
            compute_dtype=self.compute_dtype,
            pix_fmt=self.pix_fmt,
        )
        self.spec = spec
        cfg = self.srvgg_cfg

        if self.upscaler_model == "realesrgan":
            sr_params = _load_srvgg_params(
                cfg, self.weights, self.weights_wdn, self.denoise_rate
            )

            # fast epilogue: when the output is 4/d of the processing
            # resolution for d in {2,3,4} (720p->1440p, 1080p->1440p,
            # denoise-only modes), fuse the 4x pixel-shuffle with the
            # bicubic downscale at LR resolution (ops/fused_epilogue.py).
            # d=3/4 are exact; d=2 reorders color matching to the output
            # resolution (quality-equivalent), ~2x end-to-end throughput.
            ratio = None
            if self.fast_epilogue and cfg.upscale == 4 and self.output_shape:
                from fractions import Fraction
                from math import gcd

                oh, ow = self.output_shape
                lh, lw = self.lr_shape
                if 4 * lh * ow == 4 * lw * oh and 4 * lh >= oh:
                    f = Fraction(4 * lh, oh)
                    num, den = f.numerator, f.denominator
                    period = 4 * den // gcd(num, 4 * den)
                    if oh % period == 0 and ow % period == 0:
                        ratio = (num, den)
            if ratio:
                log.info(
                    "fast epilogue active (fused ps4 + bicubic %d/%d)", *ratio
                )

                def sr_apply(p, x, r=ratio):
                    return srvgg.apply_down_rational(p, x, r[0], r[1], cfg=cfg)

            else:

                def sr_apply(p, x):
                    return srvgg.apply(p, x, cfg=cfg)

        elif self.upscaler_model == "fsrcnn":
            if self.weights is not None:
                sr_params = fsrcnn.from_torch(
                    torch_import.load_state_dict(self.weights)
                )
            else:
                sr_params = fsrcnn.init_params(jax.random.PRNGKey(0))

            def sr_apply(p, x):
                n, h, w, c = x.shape
                y = fsrcnn.apply(
                    p, x.transpose(0, 3, 1, 2).reshape(n * c, h, w, 1), factor=4
                )
                s = 4
                return (
                    y.reshape(n, c, h * s, w * s, 1)[..., 0].transpose(0, 2, 3, 1)
                )

        else:
            # any model zoo entry runs live by name (--model <zoo name>):
            # RRDBNet / SRVGG archs, DNI blending, weight auto-resolution
            from ..models.zoo import ZOO, build_sr_model

            if self.upscaler_model not in ZOO:
                raise ValueError(self.upscaler_model)
            try:
                sr_apply, sr_params, self.scale = build_sr_model(
                    self.upscaler_model,
                    model_path=self.weights,
                    denoise_strength=self.denoise_rate,
                )
            except FileNotFoundError as ex:
                log.warning("%s; using random init", ex)
                sr_apply, sr_params, self.scale = build_sr_model(
                    self.upscaler_model, random_init=True
                )

        self._sr_apply = sr_apply
        sr_params = self._place(sr_params)
        self._sr_params = sr_params

        if self.denoising:
            if self.denoise_weights is not None:
                den = bsvd.from_torch(
                    torch_import.load_state_dict(self.denoise_weights),
                    self.bsvd_cfg,
                )
            else:
                log.warning("no BSVD weights given; using random init")
                den = bsvd.init_params(jax.random.PRNGKey(1), self.bsvd_cfg)
            # reuse the already-placed SR params (one device copy)
            self._params = {"sr": sr_params, "denoise": self._place(den)}
            self._den_state = self._place(init_denoise_state(1, spec, self.bsvd_cfg))
            # BSVD scans frames sequentially inside the jit; SR + color
            # matching run batched over the micro-batch (steps.py).
            # Past micro-batch 4 the SR stage regresses (720p batch-8
            # activations pressure HBM) while BSVD keeps amortizing, so
            # larger batches split the SR tail into sub-batches of 4 —
            # exact, measured 76.8 -> 69.5 ms/frame at T=8 (BASELINE.md)
            sr_sub = 4 if self.batch_size > 4 else None
            if self.mesh is not None:
                # W-sharded denoise chunk over the mesh (the BSVD chunk
                # axis is temporal, so width is the scalable dim); state
                # enters/leaves sharded and stays device-resident
                from ..parallel import (
                    make_sharded_denoise,
                    make_sharded_denoise_flush,
                )

                self._batch_denoise_step = make_sharded_denoise(
                    sr_apply, spec, self.mesh, self.bsvd_cfg, warm=False,
                    sr_sub_batch=sr_sub,
                )
                self._batch_denoise_step_warm = make_sharded_denoise(
                    sr_apply, spec, self.mesh, self.bsvd_cfg, warm=True,
                    sr_sub_batch=sr_sub,
                )
                self._flush_step = make_sharded_denoise_flush(
                    sr_apply, spec, self.mesh, self.bsvd_cfg
                )
            else:
                self._batch_denoise_step = ShapeCache(
                    donate_argnums=(1,),
                    fn=lambda p, s, f: upscale_batch_denoise(
                        sr_apply, p, s, f, spec, self.bsvd_cfg,
                        sr_sub_batch=sr_sub,
                    )
                )
                # steady-state executable: once SHIFT_NUM real frames are
                # in, every warm-up window mask is a provable identity and
                # a mask-free graph is compiled (bsvd.chunk_step warm=True)
                self._batch_denoise_step_warm = ShapeCache(
                    donate_argnums=(1,),
                    fn=lambda p, s, f: upscale_batch_denoise(
                        sr_apply, p, s, f, spec, self.bsvd_cfg, warm=True,
                        sr_sub_batch=sr_sub,
                    )
                )
                self._flush_step = ShapeCache(
                    donate_argnums=(1,),
                    fn=lambda p, s, f, te: flush_batch_denoise(
                        sr_apply, p, s, f, te, spec, self.bsvd_cfg
                    )
                )
            # last SHIFT_NUM raw frames: the flush references them for
            # the blend / color match of the drained outputs
            self._tail_frames: list = []
            self._tail_real: list = []
            self._frames_seen = 0
            self._last_step = 0
        if self.mesh is not None:
            # batch over "data" + W over "spatial" (parallel/sharded.py);
            # upscale_dispatch pads tail batches to batch_size, which must
            # therefore split evenly over the data axis
            from ..parallel import make_sharded_upscale

            d = self.mesh.shape.get("data", 1)
            assert self.batch_size % d == 0, (
                f"batch_size {self.batch_size} must divide by the mesh "
                f"data axis ({d}) — pass --batch-size {d * max(1, self.batch_size // d)}"
            )
            self._multi_step = make_sharded_upscale(sr_apply, spec, self.mesh)
        else:
            self._multi_step = ShapeCache(
                lambda p, f: upscale_multi(sr_apply, p, f, spec)
            )
        log.info(
            "model loaded (%s, denoise=%s, mesh=%s)",
            self.upscaler_model,
            self.denoising,
            dict(self.mesh.shape) if self.mesh is not None else None,
        )
        self._initialized = True

    def proc_eof(self):
        """Drain the BSVD lookahead at end-of-stream: the last SHIFT_NUM
        frames are still inside the network when the source ends (the
        reference's production streaming drops them — a real-EOF
        improvement, ROADMAP 'streaming BSVD flush semantics')."""
        # first deliver whatever is still in the in-flight device ring —
        # ring entries precede the drained lookahead in stream order
        yield from super().proc_eof()
        if not self.denoising or not getattr(self, "_frames_seen", 0):
            return
        k = min(self._frames_seen, bsvd.SHIFT_NUM)
        tail = np.stack(self._tail_frames[-k:])
        if k < bsvd.SHIFT_NUM:
            pad = np.zeros((bsvd.SHIFT_NUM - k,) + tail.shape[1:], tail.dtype)
            tail = np.concatenate([pad, tail], axis=0)
        # drain in live-micro-batch-sized chunks: one flush executable of
        # the same activation footprint as the live step (a single
        # 16-frame flush pass OOMs at 720p)
        bs = max(1, min(self.batch_size, bsvd.SHIFT_NUM))
        total = -(-bsvd.SHIFT_NUM // bs) * bs
        if total > bsvd.SHIFT_NUM:
            tail = np.concatenate(
                [tail, np.zeros((total - bsvd.SHIFT_NUM,) + tail.shape[1:], tail.dtype)]
            )
        if self._frames_seen >= bsvd.SHIFT_NUM:
            # warm chunk_steps keep the skip1/skip2 FIFOs in RING order
            # (in-place T-frame writes); the flush executables pop in
            # FIFO order — normalize once at the transition
            self._den_state = bsvd.ring_to_fifo_state(
                self._den_state, self.bsvd_cfg
            )
        t_end = jnp.asarray(self._frames_seen, jnp.int32)
        outs = []
        for i in range(0, total, bs):
            out, self._den_state = self._flush_step(
                self._params, self._den_state, jnp.asarray(tail[i : i + bs]), t_end
            )
            outs.append(np.asarray(out))
        drained = np.concatenate(outs)[: bsvd.SHIFT_NUM][bsvd.SHIFT_NUM - k :]
        mask = np.asarray(self._tail_real[-k:], bool)
        prof = Profiler()
        prof.start("recoder.output")
        prof.start("upscaler.upscale")
        yield UpscalerQueueEntry(
            frames=drained[mask],
            audio_segment=None,
            step=self._last_step + 1,
            elapsed=0.0,
            last_modified=time.time(),
            profiler=prof,
        )

    def upscale_dispatch(self, frames):
        """frames: (N, H, W, 3) uint8 -> (device array, N). Async: the
        device step and its D2H copy are queued; nothing blocks here."""
        frames = np.asarray(frames)
        assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
        if self.single_mode:
            n = len(frames)
            if n < self.batch_size:
                pad = np.repeat(frames[-1:], self.batch_size - n, axis=0)
                frames = np.concatenate([frames, pad], axis=0)
                # note: padded frames advance the BSVD stream state; for a
                # live stream the repeated tail frame is benign warm-state
            step = (
                self._batch_denoise_step_warm
                if self._frames_seen >= bsvd.SHIFT_NUM
                else self._batch_denoise_step
            )
            out, self._den_state = step(
                self._params, self._den_state, jnp.asarray(frames)
            )
            self._frames_seen += len(frames)
            # Emission semantics at partial batches: output slot j blends
            # input j's SR with the SHIFT_NUM-delayed denoised content
            # (reference parity — upscale_single_denoise 'Temporal
            # note'), so _fetch's [:n] slice emits exactly the n real
            # input slots; pad slots are dropped and their (delayed)
            # denoise content skips a slot. Slot counts are preserved
            # (N real inputs -> N live emissions + SHIFT_NUM drained).
            # remember the fed frames (pads included — they advance the
            # BSVD timeline) so proc_eof can drain and post-process the
            # in-flight tail; pads are flagged and dropped at emission
            real = [True] * n + [False] * (len(frames) - n)
            self._tail_frames = (self._tail_frames + list(frames))[-bsvd.SHIFT_NUM:]
            self._tail_real = (self._tail_real + real)[-bsvd.SHIFT_NUM:]
            self._host_async(out)
            return out, n

        n = len(frames)
        # stable executable shapes: tail micro-batches pad up to
        # batch_size; coalesced request batches (n > batch_size) pad to
        # the next power-of-two bucket so the per-shape executable count
        # stays O(log coalesce_max) instead of one per concurrency level
        target = self.batch_size
        while target < n:
            target *= 2
        if n < target:
            pad = np.repeat(frames[-1:], target - n, axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        out = self._multi_step(self._sr_params, jnp.asarray(frames))
        self._host_async(out)
        return out, n


class EgvsrUpscalerService(BaseUpscalerService):
    """Frame-recurrent EGVSR service (reference egvsr_upscaler.py:145-212)."""

    def __init__(
        self,
        lr_level: int = 0,
        on_queue=None,
        output_shape: tuple[int, int] | None = (1440, 2560),
        weights: str | None = None,
        compute_dtype=jnp.bfloat16,
        cfg: egvsr.EGVSRConfig | None = None,
        pix_fmt: str = "rgb24",
        cut_threshold: float | None = 0.12,
        mesh=None,
    ) -> None:
        super().__init__(name="EgvsrUpscaler")
        self.pix_fmt = pix_fmt
        # multi-chip: W-shard the single recurrent stream over the mesh
        # (parallel.make_sharded_egvsr_step — a frame-recurrent stream has
        # no batch to split, so width is the latency-scaling axis)
        self.mesh = mesh
        self.lr_shape = LR_LEVELS[lr_level]
        self.output_shape = output_shape
        self.on_queue = on_queue
        self.weights = weights
        self.compute_dtype = compute_dtype
        self.cfg = cfg
        # live default ON: at a scene cut FNet's flow is garbage and the
        # banded warp would take its FULL window (+50 ms); skipping the
        # flow+warp branch equals the zero-flow warp FRVSR degenerates to
        # anyway (egvsr.frnet_step docstring)
        self.cut_threshold = cut_threshold

    def proc_init(self) -> None:
        # idempotent (same guard as EsrganUpscalerService): callers
        # pre-warm with proc_init() on the main thread before start(),
        # and a re-run on the worker thread would reset the recurrence
        # state and rebuild the ShapeCache lambdas — new jit identities
        # recompiling the 720p step in-run
        if getattr(self, "_initialized", False):
            return
        enable_persistent_cache()
        if self.weights is not None:
            sd = torch_import.load_state_dict(self.weights)
            if self.cfg is None:
                # shape-match the checkpoint (nb/nf/degradation inferred —
                # the reference's production EGVSR_iter420000.pth is
                # nb=10/BD while the FRNet class default is nb=16/BI)
                self.cfg = egvsr.config_from_torch(sd)
                log.info("EGVSR config from checkpoint: %s", (self.cfg,))
            self._params = egvsr.from_torch(sd, self.cfg)
        else:
            if self.cfg is None:
                self.cfg = egvsr.PRODUCTION
            log.warning("no EGVSR weights given; using random init")
            self._params = egvsr.init_params(jax.random.PRNGKey(0), self.cfg)
        spec = UpscaleSpec(
            lr_shape=self.lr_shape,
            output_shape=self.output_shape,
            compute_dtype=self.compute_dtype,
            pix_fmt=self.pix_fmt,
        )
        self.spec = spec
        h, w = self.lr_shape
        # carry dtype must match what the step stores (compute_dtype), or
        # the second frame's new signature forces a full recompile
        self._state = egvsr.init_recurrent_state(
            1, h, w, self.cfg, dtype=self.compute_dtype
        )
        if self.mesh is not None:
            from ..parallel import make_sharded_egvsr_step

            self._step = make_sharded_egvsr_step(
                spec, self.mesh, self.cfg, cut_threshold=self.cut_threshold
            )
        else:
            self._step = ShapeCache(
                lambda p, s, f: egvsr_upscale_step(
                    p, s, f, spec, cut_threshold=self.cut_threshold, cfg=self.cfg
                )
            )
        # micro-batch executable: flow for all T co-resident frames in ONE
        # batched fnet call (egvsr.infer_chunk).  Measured NEUTRAL on this
        # chip (110.8 vs 109.1 ms/frame at 720p/T=4, tools/profile_egvsr.py):
        # the fnet at 720p is bandwidth-bound, so batching does not recover
        # its N=1 width loss (fnet N=4 18.1 ms/frame vs N=1 16.4) — and each
        # distinct tail-batch size would compile its own multi-minute 720p
        # executable.  Default OFF; SHARKSHARK_EGVSR_CHUNK=1 enables.
        import os

        self._use_chunk = (
            os.environ.get("SHARKSHARK_EGVSR_CHUNK", "0") == "1"
            and self.mesh is None  # chunk executable is single-device
        )
        self._chunk_step = ShapeCache(
            lambda p, s, f: egvsr_upscale_chunk(
                p, s, f, spec, cut_threshold=self.cut_threshold, cfg=self.cfg
            )
        )
        self._initialized = True

    def upscale_dispatch(self, frames):
        frames = np.asarray(frames)
        if self._use_chunk and len(frames) > 1:
            out, self._state = self._chunk_step(
                self._params, self._state, jnp.asarray(frames)
            )
            self._host_async(out)
            return out, len(frames)
        outs = []
        for i in range(len(frames)):
            out, self._state = self._step(
                self._params, self._state, jnp.asarray(frames[i : i + 1])
            )
            self._host_async(out)
            outs.append(out)
        return outs, len(frames)
