"""Torch-parity tests for ops/resize.py — every interpolate mode used by
the reference pipeline, at the actual ladder shapes (scaled down)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sharkshark_tpu.ops import resize_nchw


def _torch_resize(x_nchw: np.ndarray, size, mode):
    t = torch.from_numpy(x_nchw)
    if mode == "nearest":
        out = F.interpolate(t, size=size, mode="nearest")
    elif mode == "area":
        out = F.interpolate(t, size=size, mode="area")
    else:
        out = F.interpolate(t, size=size, mode=mode, align_corners=False)
    return out.numpy()


CASES = [
    # (in_h, in_w, out_h, out_w, mode)  — shrunk versions of pipeline shapes
    (72, 128, 36, 64, "area"),      # 720p -> 360p pre-resize (integer)
    (108, 192, 63, 112, "area"),    # 1080p -> 630p (non-integer)
    (90, 160, 72, 128, "area"),     # downscale, non-integer
    (36, 64, 144, 256, "bicubic"),  # hr upscale to output_shape
    (18, 32, 144, 256, "bilinear"), # local color match diff upsample
    (9, 16, 36, 64, "nearest"),     # SRVGG residual base x4
    (33, 57, 47, 91, "bilinear"),   # awkward odd sizes
    (33, 57, 47, 91, "bicubic"),
    (47, 91, 33, 57, "area"),
]


@pytest.mark.parametrize("in_h,in_w,out_h,out_w,mode", CASES)
def test_resize_matches_torch(in_h, in_w, out_h, out_w, mode):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, in_h, in_w)).astype(np.float32)
    want = _torch_resize(x, (out_h, out_w), mode)
    got = np.asarray(resize_nchw(jnp.asarray(x), (out_h, out_w), mode))
    # f32 op-ordering differs from torch's direct tap evaluation; 5e-5 is
    # far below quantization scale (1/255) while still locking semantics.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_resize_identity_passthrough():
    x = np.random.default_rng(1).standard_normal((1, 3, 16, 16)).astype(np.float32)
    got = np.asarray(resize_nchw(jnp.asarray(x), (16, 16), "bilinear"))
    np.testing.assert_array_equal(got, x)


def test_resize_uint8_roundtrip_dtype():
    x = np.random.default_rng(2).integers(0, 255, (1, 8, 8, 3), dtype=np.uint8)
    from sharkshark_tpu.ops import resize

    out = resize(jnp.asarray(x), (16, 16), "nearest")
    assert out.dtype == jnp.uint8
