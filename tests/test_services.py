"""Upscaler service contracts: EGVSR recurrence across calls, the denoise
single-frame mode, and tail micro-batch padding."""

import jax.numpy as jnp
import numpy as np

from sharkshark_tpu.models import bsvd, egvsr, srvgg
from sharkshark_tpu.upscale.service import (
    EgvsrUpscalerService,
    EsrganUpscalerService,
)

TINY_SRVGG = srvgg.SRVGGConfig(num_feat=16, num_conv=2)
TINY_BSVD = bsvd.BSVDConfig(chns=(8, 16, 24))
TINY_EGVSR = egvsr.EGVSRConfig(nf=16, nb=1)


def test_egvsr_service_carries_recurrent_state():
    svc = EgvsrUpscalerService(
        lr_level=0, output_shape=(72, 128),
        compute_dtype=jnp.float32, cfg=TINY_EGVSR,
    )
    svc.lr_shape = (36, 64)
    svc.proc_init()
    frames = np.random.RandomState(0).randint(0, 256, (2, 36, 64, 3), np.uint8)
    out1 = svc.upscale(frames)
    assert out1.shape == (2, 72, 128, 3) and out1.dtype == np.uint8
    # same input, but hr_prev/lr_prev advanced -> different output
    out2 = svc.upscale(frames)
    assert not np.array_equal(out1, out2)


def test_esrgan_service_denoise_single_mode():
    svc = EsrganUpscalerService(
        lr_level=0,
        denoising=True,
        batch_size=2,
        output_shape=(72, 128),
        compute_dtype=jnp.float32,
        srvgg_cfg=TINY_SRVGG,
        bsvd_cfg=TINY_BSVD,
        fast_epilogue=False,
    )
    svc.lr_shape = (36, 64)
    svc.proc_init()
    frames = np.random.RandomState(1).randint(0, 256, (3, 36, 64, 3), np.uint8)
    out = svc.upscale(frames)
    assert out.shape == (3, 72, 128, 3)
    # BSVD stream state advanced by 3 frames
    assert int(svc._den_state["t"]) == 3


def test_esrgan_service_pads_tail_batch():
    svc = EsrganUpscalerService(
        lr_level=0, denoising=False, batch_size=4,
        output_shape=(72, 128), compute_dtype=jnp.float32,
        srvgg_cfg=TINY_SRVGG,
    )
    svc.lr_shape = (36, 64)
    svc.proc_init()
    out_full = svc.upscale(
        np.zeros((4, 36, 64, 3), np.uint8)
    )
    out_tail = svc.upscale(np.zeros((2, 36, 64, 3), np.uint8))
    assert out_tail.shape == (2, 72, 128, 3)
    # one executable signature for both (padded tail reuses the batch-4 jit)
    assert svc._multi_step.num_signatures == 1
    assert out_full.shape == (4, 72, 128, 3)


def test_zoo_model_name_runs_in_service():
    """Any zoo entry name works as upscaler_model (ROADMAP: CLI wired to
    the zoo registry); offline weight resolution falls back to random
    init with a warning instead of dying."""
    import numpy as np

    from sharkshark_tpu.upscale.service import EsrganUpscalerService

    svc = EsrganUpscalerService(
        lr_level=0,
        denoising=False,
        upscaler_model="realesr-animevideov3",
        output_shape=(72, 128),
    )
    svc.proc_init()
    out = svc.upscale(np.zeros((1, 36, 64, 3), np.uint8))
    assert out.shape == (1, 72, 128, 3) and out.dtype == np.uint8


import pytest


@pytest.mark.parametrize("batch_size", [2, 3])
def test_denoise_flush_drains_lookahead_at_eof(batch_size):
    """BSVD holds SHIFT_NUM frames of lookahead; proc_eof must emit them
    (ROADMAP 'streaming BSVD flush semantics').  The drained frames must
    equal what an infinite stream would eventually have emitted for the
    same inputs: output j of a live stream is input frame j-16, so after
    feeding K frames + flush, total outputs == K valid frames."""
    import numpy as np

    from sharkshark_tpu.models import bsvd as bsvd_mod
    from sharkshark_tpu.upscale.service import EsrganUpscalerService
    from tests.test_upscale_steps import TINY_BSVD

    svc = EsrganUpscalerService(
        lr_level=0,
        denoising=True,
        batch_size=batch_size,
        output_shape=(48, 80),
        bsvd_cfg=TINY_BSVD,
        compute_dtype=np.float32,
    )
    svc.lr_shape = (24, 40)
    svc.proc_init()

    rng = np.random.default_rng(5)
    k = 5
    outs = []
    for i in range(0, k, batch_size):
        frames = rng.integers(
            0, 255, (min(batch_size, k - i), 24, 40, 3), dtype=np.uint8
        )
        outs.append(svc.upscale(frames))

    flushed = list(svc.proc_eof())
    assert len(flushed) == 1
    tail = flushed[0].frames
    # stream shorter than the lookahead: every input frame drains at EOF
    assert tail.shape == (k, 48, 80, 3) and tail.dtype == np.uint8
    # frames_seen includes padded tail micro-batches
    assert svc._frames_seen == -(-k // batch_size) * batch_size

    # non-denoise service has nothing in flight
    svc2 = EsrganUpscalerService(lr_level=0, denoising=False, output_shape=(48, 80))
    svc2.proc_init()
    assert list(svc2.proc_eof()) == []


def test_denoise_service_warm_switch_matches_cold():
    """After SHIFT_NUM frames the service switches to the mask-free warm
    executable (upscale/service.py); the emitted frames must be identical
    to a service forced to stay on the cold executable."""
    from sharkshark_tpu.models import bsvd as bsvd_mod

    def make():
        svc = EsrganUpscalerService(
            lr_level=0,
            denoising=True,
            batch_size=4,
            output_shape=(72, 128),
            compute_dtype=jnp.float32,
            srvgg_cfg=TINY_SRVGG,
            bsvd_cfg=TINY_BSVD,
            fast_epilogue=False,
        )
        svc.lr_shape = (36, 64)
        svc.proc_init()
        return svc

    warm_svc = make()
    cold_svc = make()
    # force the cold service to never take the warm path
    cold_svc._batch_denoise_step_warm = cold_svc._batch_denoise_step

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (6 * 4, 36, 64, 3), np.uint8)
    for i in range(6):  # crosses SHIFT_NUM=16 at chunk 4
        batch = frames[i * 4 : (i + 1) * 4]
        a = warm_svc.upscale(batch)
        b = cold_svc.upscale(batch)
        np.testing.assert_array_equal(a, b)
    assert warm_svc._frames_seen > bsvd_mod.SHIFT_NUM


@pytest.mark.parametrize("out_shape", [(72, 128), (90, 160), (108, 192), (144, 256)])
def test_hr_ladder_output_shapes(out_shape):
    """All hr-ladder ratios of the 4x model output (2, 8/5, 4/3, 1 — the
    720p->1440/1800/2160p analogues at test scale) produce the exact
    output shape, with or without a fused-epilogue ratio."""
    svc = EsrganUpscalerService(
        lr_level=0,
        denoising=False,
        batch_size=2,
        output_shape=out_shape,
        compute_dtype=jnp.float32,
        srvgg_cfg=TINY_SRVGG,
        fast_epilogue=True,
    )
    svc.lr_shape = (36, 64)
    svc.proc_init()
    frames = np.random.RandomState(3).randint(0, 256, (2, 36, 64, 3), np.uint8)
    out = svc.upscale(frames)
    assert out.shape == (2, *out_shape, 3), out.shape


def test_egvsr_service_chunk_gate_matches_per_frame(monkeypatch):
    """SHARKSHARK_EGVSR_CHUNK=1 routes micro-batches through the one-
    executable chunk step (batched fnet + scanned recurrence); outputs
    and carried state must match the default per-frame dispatch.
    (Measured neutral on the dev chip — the gate exists for parity and
    for hardware where N=1 fnet width loss is real.)"""

    def make(chunk: bool):
        monkeypatch.setenv("SHARKSHARK_EGVSR_CHUNK", "1" if chunk else "0")
        svc = EgvsrUpscalerService(
            lr_level=0, output_shape=(72, 128),
            compute_dtype=jnp.float32, cfg=TINY_EGVSR,
        )
        svc.lr_shape = (36, 64)
        svc.proc_init()
        return svc

    frames = np.random.RandomState(9).randint(0, 256, (3, 36, 64, 3), np.uint8)
    a = make(False)
    b = make(True)
    assert b._use_chunk and not a._use_chunk
    for _ in range(2):
        out_a = a.upscale(frames)
        out_b = b.upscale(frames)
        np.testing.assert_allclose(
            out_a.astype(np.int16), out_b.astype(np.int16), atol=1
        )


def test_request_coalescing_merges_same_shape_jobs():
    """coalesce_max > 1 merges already-queued same-shape jobs into one
    device dispatch and delivers one result entry per job, in order
    (image-backend batching, VERDICT r4 item 6)."""
    import time

    from sharkshark_tpu.runtime import EOF
    from sharkshark_tpu.upscale.service import (
        BaseUpscalerService,
        UpscalerQueueEntry,
    )

    dispatches = []

    class Stub(BaseUpscalerService):
        coalesce_max = 8

        def upscale_dispatch(self, frames):
            frames = np.asarray(frames)
            dispatches.append(len(frames))
            return frames.astype(np.float32) * 2.0, len(frames)

    svc = Stub(name="stub")
    results = []
    svc.on_queue = results.append
    rng = np.random.RandomState(7)
    same = [rng.randint(0, 255, (1, 8, 8, 3), np.uint8) for _ in range(5)]
    other = rng.randint(0, 255, (1, 4, 4, 3), np.uint8)
    for i, f in enumerate(same[:4]):
        svc.push_job(UpscalerQueueEntry(frames=f, step=i))
    svc.push_job(UpscalerQueueEntry(frames=other, step=4))  # blocks merge
    svc.push_job(UpscalerQueueEntry(frames=same[4], step=5))
    svc.push_eof()
    svc.start()
    assert svc.wait_eof(timeout=10)
    svc.join()

    assert [r.step for r in results if isinstance(r, UpscalerQueueEntry)] == [
        0, 1, 2, 3, 4, 5,
    ]
    assert isinstance(results[-1], EOF)
    # jobs 0-3 merged into one dispatch; the 4x4 job broke the run
    assert dispatches == [4, 1, 1]
    for r, f in zip(results[:4], same[:4]):
        np.testing.assert_array_equal(np.asarray(r.frames), f.astype(np.float32) * 2)
    np.testing.assert_array_equal(np.asarray(results[4].frames), other.astype(np.float32) * 2)
    np.testing.assert_array_equal(np.asarray(results[5].frames), same[4].astype(np.float32) * 2)
