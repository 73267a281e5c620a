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
