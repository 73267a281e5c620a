"""Device-side yuv420p emission: BT.601 limited matrix vs OpenCV,
2x2-average chroma (the swscale default) vs a numpy reference."""

import cv2
import numpy as np

import jax.numpy as jnp

from sharkshark_tpu.ops import to_yuv420

RNG = np.random.default_rng(21)


def _ref_yuv420(rgb_u8: np.ndarray) -> np.ndarray:
    h, w, _ = rgb_u8.shape
    rgb = rgb_u8.astype(np.float64) / 255.0
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 16 + 65.481 * r + 128.553 * g + 24.966 * b
    m = rgb.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
    u = 128 - 37.797 * m[..., 0] - 74.203 * m[..., 1] + 112.0 * m[..., 2]
    v = 128 + 112.0 * m[..., 0] - 93.786 * m[..., 1] - 18.214 * m[..., 2]

    def q(p):
        return np.clip(np.round(p), 0, 255).astype(np.uint8)

    return np.concatenate(
        [q(y), q(u).reshape(h // 4, w), q(v).reshape(h // 4, w)], axis=0
    )


def test_yuv420_matches_numpy_reference():
    h, w = 48, 64
    rgb = RNG.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
    got = np.asarray(to_yuv420(jnp.asarray(rgb, jnp.float32) / 255.0))
    assert got.shape == (2, h * 3 // 2, w) and got.dtype == np.uint8
    for i in range(2):
        want = _ref_yuv420(rgb[i])
        diff = np.abs(got[i].astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, diff.max()  # f32-vs-f64 rounding at .5


def test_yuv420_matrix_matches_cv2_on_flat_colors():
    """Constant-color frames remove the subsampling-position difference
    (cv2 takes the top-left sample; swscale and we average), leaving a
    pure matrix comparison against OpenCV's I420."""
    for col in [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255),
                (30, 180, 90)]:
        c = np.zeros((1, 16, 16, 3), np.uint8)
        c[:] = col
        got = np.asarray(to_yuv420(jnp.asarray(c, jnp.float32) / 255.0))[0]
        want = cv2.cvtColor(c[0], cv2.COLOR_RGB2YUV_I420)
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, (col, diff.max())


def test_to_yuv420_grey_midpoint():
    grey = np.full((1, 16, 16, 3), 0.5, np.float32)
    out = np.asarray(to_yuv420(jnp.asarray(grey)))
    y, u, v = out[0, :16], out[0, 16:20], out[0, 20:]
    assert abs(int(y.mean()) - 126) <= 1   # 16 + 219*0.5
    assert abs(int(u.mean()) - 128) <= 1 and abs(int(v.mean()) - 128) <= 1


def test_upscale_multi_yuv420_output():
    """pix_fmt='yuv420p' emits planar (N, OH*3/2, OW) consistent with
    converting the rgb24 output (double-quantization tolerance)."""
    import jax

    from sharkshark_tpu.models import srvgg
    from sharkshark_tpu.upscale import UpscaleSpec, upscale_multi

    cfg = srvgg.SRVGGConfig(num_feat=16, num_conv=2)
    params = srvgg.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(
        RNG.integers(0, 256, (2, 16, 24, 3), dtype=np.uint8)
    )
    apply = lambda p, x: srvgg.apply(p, x, cfg=cfg)  # noqa: E731
    spec_rgb = UpscaleSpec(lr_shape=(16, 24), output_shape=(32, 48),
                           compute_dtype=jnp.float32)
    spec_yuv = spec_rgb._replace(pix_fmt="yuv420p")

    rgb = np.asarray(upscale_multi(apply, params, frames, spec_rgb))
    yuv = np.asarray(upscale_multi(apply, params, frames, spec_yuv))
    assert yuv.shape == (2, 48, 48) and yuv.dtype == np.uint8

    want = np.asarray(to_yuv420(jnp.asarray(rgb, jnp.float32) / 255.0))
    diff = np.abs(yuv.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 2, diff.max()


def test_streamer_sink_yuv420_roundtrip(tmp_path):
    """Streamer in yuv420p mode writes H*3/2*W bytes per frame through the
    encode sink (fake ffmpeg copies raw stdin to the dest file)."""
    import os
    import sys

    from sharkshark_tpu.stream.ffmpeg_io import RawStreamSink

    fake = tmp_path / "ffmpeg"
    fake.write_text(
        "#!/bin/sh\nexec %s %s \"$@\"\n"
        % (sys.executable, os.path.join(os.path.dirname(__file__), "fake_ffmpeg.py"))
    )
    fake.chmod(0o755)
    dest = str(tmp_path / "out.raw")
    h, w = 32, 48
    sink = RawStreamSink(dest, w, h, 4, enable_audio=False,
                         binary=str(fake), pix_fmt="yuv420p")
    frames = RNG.integers(0, 256, (3, h * 3 // 2, w), dtype=np.uint8)
    for f in frames:
        sink.send_video_frame(f)
    sink.close()
    data = open(dest, "rb").read()
    assert data == frames.tobytes()
