"""Torch-parity tests for conv/transposed-conv/activations/shuffles/warp."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sharkshark_tpu.ops import (
    conv2d,
    conv_transpose2d,
    depthwise_conv2d,
    prelu,
    leaky_relu,
    relu6,
    pixel_shuffle,
    space_to_depth,
    backward_warp,
    blur,
    sharpen,
    global_color_match,
    local_color_match,
)

RNG = np.random.default_rng(42)


def nchw(x_nhwc):
    return np.moveaxis(x_nhwc, -1, 1)


def nhwc(x_nchw):
    return np.moveaxis(x_nchw, 1, -1)


def test_conv2d_matches_torch():
    x = RNG.standard_normal((2, 9, 11, 5)).astype(np.float32)
    w_oihw = RNG.standard_normal((7, 5, 3, 3)).astype(np.float32)
    b = RNG.standard_normal((7,)).astype(np.float32)
    want = F.conv2d(torch.from_numpy(nchw(x)), torch.from_numpy(w_oihw),
                    torch.from_numpy(b), padding=1).numpy()
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    got = nchw(np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b), padding=1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_stride2():
    x = RNG.standard_normal((1, 10, 12, 4)).astype(np.float32)
    w_oihw = RNG.standard_normal((8, 4, 3, 3)).astype(np.float32)
    want = F.conv2d(torch.from_numpy(nchw(x)), torch.from_numpy(w_oihw),
                    stride=2, padding=1).numpy()
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    got = nchw(np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w_hwio), stride=2, padding=1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,k,pad,outpad", [(2, 9, 4, 1), (4, 9, 4, 3), (2, 3, 1, 1)])
def test_conv_transpose2d_matches_torch(stride, k, pad, outpad):
    x = RNG.standard_normal((1, 7, 9, 6)).astype(np.float32)
    w_iohw = RNG.standard_normal((6, 3, k, k)).astype(np.float32)  # torch: (in, out, kh, kw)
    b = RNG.standard_normal((3,)).astype(np.float32)
    want = F.conv_transpose2d(
        torch.from_numpy(nchw(x)), torch.from_numpy(w_iohw), torch.from_numpy(b),
        stride=stride, padding=pad, output_padding=outpad,
    ).numpy()
    # import transform: (in, out, kh, kw) -> flip spatial -> HWIO
    w_hwio = np.transpose(w_iohw[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()
    got = nchw(np.asarray(conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
        stride=stride, padding=pad, output_padding=outpad,
    )))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_activations_match_torch():
    x = RNG.standard_normal((2, 5, 5, 8)).astype(np.float32)
    a = RNG.standard_normal((8,)).astype(np.float32)
    want = F.prelu(torch.from_numpy(nchw(x)), torch.from_numpy(a)).numpy()
    got = nchw(np.asarray(prelu(jnp.asarray(x), jnp.asarray(a))))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    want = F.leaky_relu(torch.from_numpy(x), 0.1).numpy()
    np.testing.assert_allclose(np.asarray(leaky_relu(jnp.asarray(x), 0.1)), want, rtol=1e-6)

    want = F.relu6(torch.from_numpy(x * 4)).numpy()
    np.testing.assert_allclose(np.asarray(relu6(jnp.asarray(x * 4))), want, rtol=1e-6)


def test_pixel_shuffle_matches_torch():
    x = RNG.standard_normal((2, 3, 4, 48)).astype(np.float32)
    want = F.pixel_shuffle(torch.from_numpy(nchw(x)), 4).numpy()
    got = nchw(np.asarray(pixel_shuffle(jnp.asarray(x), 4)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_space_to_depth_matches_reference_order():
    # reference net_utils.py:36-47 channel order: (dy*r + dx)*c + c_in
    x = RNG.standard_normal((1, 8, 8, 3)).astype(np.float32)
    t = torch.from_numpy(nchw(x))
    n, c, h, w = t.shape
    r = 4
    tr = t.reshape(n, c, h // r, r, w // r, r).permute(0, 3, 5, 1, 2, 4)
    want = tr.reshape(n, r * r * c, h // r, w // r).numpy()
    got = nchw(np.asarray(space_to_depth(jnp.asarray(x), r)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_backward_warp_matches_grid_sample():
    x = RNG.standard_normal((2, 12, 16, 3)).astype(np.float32)
    flow = (RNG.standard_normal((2, 12, 16, 2)) * 3).astype(np.float32)

    tx = torch.from_numpy(nchw(x))
    tflow = torch.from_numpy(nchw(flow))
    n, c, h, w = tx.shape
    iu = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(n, -1, h, -1)
    iv = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(n, -1, -1, w)
    grid = torch.cat([iu, iv], 1)
    nflow = torch.cat([
        tflow[:, 0:1] / ((w - 1.0) / 2.0),
        tflow[:, 1:2] / ((h - 1.0) / 2.0)], dim=1)
    grid = (grid + nflow).permute(0, 2, 3, 1)
    want = F.grid_sample(tx, grid, mode="bilinear", padding_mode="border",
                         align_corners=True).numpy()

    got = nchw(np.asarray(backward_warp(jnp.asarray(x), jnp.asarray(flow))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _torch_gaussian(channels, ksize, sigma):
    coords = torch.arange(ksize, dtype=torch.float64)
    mean = (ksize - 1) / 2.0
    g = torch.exp(-((coords - mean) ** 2) / (2 * sigma**2)) / np.sqrt(2 * np.pi * sigma**2)
    k = torch.outer(g, g)
    k = (k / k.sum()).float()
    return k.view(1, 1, ksize, ksize).repeat(channels, 1, 1, 1)


def test_blur_matches_torch_reflect_depthwise():
    x = RNG.standard_normal((1, 10, 12, 3)).astype(np.float32)
    k = _torch_gaussian(3, 17, 8.0)
    t = torch.from_numpy(nchw(x))
    t = F.pad(t, (8, 8, 8, 8), mode="reflect")
    want = F.conv2d(t, k, groups=3).numpy()
    got = nchw(np.asarray(blur(jnp.asarray(x), 17, 8.0)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_global_color_match():
    hr = RNG.standard_normal((2, 16, 16, 3)).astype(np.float32) * 0.3 + 0.5
    lr = RNG.standard_normal((2, 8, 8, 3)).astype(np.float32) * 0.2 + 0.4
    out = np.asarray(global_color_match(jnp.asarray(hr), jnp.asarray(lr)))
    # matched stats: per-channel mean/std of out == lr's (unbiased std)
    for c in range(3):
        for n in range(2):
            np.testing.assert_allclose(out[n, :, :, c].mean(), lr[n, :, :, c].mean(), atol=1e-4)
            np.testing.assert_allclose(out[n, :, :, c].std(ddof=1), lr[n, :, :, c].std(ddof=1), atol=1e-3)


def test_local_color_match_small_input_is_identity():
    hr = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    lr = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    out = np.asarray(local_color_match(jnp.asarray(hr), jnp.asarray(lr)))
    np.testing.assert_array_equal(out, hr)


def test_sharpen_near_identity_at_tiny_strength():
    x = RNG.standard_normal((1, 8, 8, 1)).astype(np.float32)
    out = np.asarray(sharpen(jnp.asarray(x), 0.00002))
    np.testing.assert_allclose(out, x, atol=1e-3)


def test_pixel_shuffle_mxu_bit_identical():
    import jax
    import jax.numpy as jnp

    from sharkshark_tpu.ops import pixel_shuffle, pixel_shuffle_mxu

    for r, c in [(2, 8), (4, 48), (4, 64)]:
        x = jax.random.uniform(jax.random.PRNGKey(r * c), (1, 12, 16, c), dtype=jnp.float32)
        a = pixel_shuffle(x, r)
        b = pixel_shuffle_mxu(x, r)
        assert a.shape == b.shape
        assert bool(jnp.all(a == b))


def test_pixel_shuffle_folded_dil_matches_reshape():
    """The lhs-dilated folded PixelShuffle == fold(pixel_shuffle(unfold))
    exactly (one-hot relayout, HIGHEST precision at f32)."""
    from sharkshark_tpu.ops import pixel_shuffle, pixel_shuffle_folded_dil
    from sharkshark_tpu.ops.lanefold import fold_lanes, unfold_lanes

    rng = np.random.default_rng(0)
    for r, f, co, h, wp in ((4, 2, 3, 8, 8), (2, 2, 4, 6, 10), (4, 1, 2, 4, 16)):
        zf = jnp.asarray(
            rng.standard_normal((1, h, wp, f * co * r * r), dtype=np.float32)
        )
        got = unfold_lanes(pixel_shuffle_folded_dil(zf, r, f), f * r)
        ref = pixel_shuffle(unfold_lanes(zf, f), r)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_space_to_depth_mxu_wide_view():
    """The 4-column-group one-hot s2d (W % 4r == 0) is bit-identical to
    the reshape form."""
    from sharkshark_tpu.ops import space_to_depth, space_to_depth_mxu

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 64, 3), dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(space_to_depth_mxu(x, 4)), np.asarray(space_to_depth(x, 4))
    )
    # non-multiple-of-4r width exercises the k=1 fallback
    x2 = jnp.asarray(rng.standard_normal((1, 8, 24, 3), dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(space_to_depth_mxu(x2, 4)), np.asarray(space_to_depth(x2, 4))
    )
