"""Fused ps4+bicubic-down2 epilogue vs the explicit two-step reference
(interior exact; documented <=1px border deviation)."""

import jax
import jax.numpy as jnp
import numpy as np

from sharkshark_tpu.models import srvgg
from sharkshark_tpu.ops import pixel_shuffle, resize
from sharkshark_tpu.ops.fused_epilogue import (
    nearest4_bicubic_down2,
    ps4_bicubic_down2,
)

TINY = srvgg.SRVGGConfig(num_feat=16, num_conv=2)


def test_ps4_down2_matches_explicit():
    y = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 20, 48))
    fused = ps4_bicubic_down2(y)
    explicit = resize(pixel_shuffle(y, 4), (24, 40), "bicubic")
    assert fused.shape == explicit.shape == (2, 24, 40, 3)
    # interior exact (border: edge-replicate vs clamped-index bicubic)
    np.testing.assert_allclose(
        np.asarray(fused[:, 2:-2, 2:-2]),
        np.asarray(explicit[:, 2:-2, 2:-2]),
        atol=1e-5,
    )


def test_nearest4_down2_matches_explicit():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 14, 3))
    fused = nearest4_bicubic_down2(x)
    explicit = resize(resize(x, (40, 56), "nearest"), (20, 28), "bicubic")
    np.testing.assert_allclose(
        np.asarray(fused[:, 2:-2, 2:-2]),
        np.asarray(explicit[:, 2:-2, 2:-2]),
        atol=1e-5,
    )


def test_srvgg_apply_down2_matches_two_step():
    params = srvgg.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 24, 3))
    fused = srvgg.apply_down2(params, x, cfg=TINY)
    two_step = resize(srvgg.apply(params, x, cfg=TINY), (32, 48), "bicubic")
    assert fused.shape == (1, 32, 48, 3)
    np.testing.assert_allclose(
        np.asarray(fused[:, 2:-2, 2:-2]),
        np.asarray(two_step[:, 2:-2, 2:-2]),
        atol=2e-5,
    )


def test_ps4_down3_exact():
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 9, 12, 48))
    from sharkshark_tpu.ops.fused_epilogue import ps4_bicubic_down3

    explicit = resize(pixel_shuffle(y, 4), (12, 16), "bicubic")
    np.testing.assert_allclose(
        np.asarray(ps4_bicubic_down3(y)), np.asarray(explicit), atol=1e-6
    )


def test_ps4_down4_exact():
    y = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 10, 48))
    from sharkshark_tpu.ops.fused_epilogue import ps4_bicubic_down4

    explicit = resize(pixel_shuffle(y, 4), (6, 10), "bicubic")
    np.testing.assert_allclose(
        np.asarray(ps4_bicubic_down4(y)), np.asarray(explicit), atol=1e-5
    )


def test_srvgg_apply_down3_matches_two_step():
    params = srvgg.init_params(jax.random.PRNGKey(5), TINY)
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 12, 18, 3))
    fused = srvgg.apply_down(params, x, 3, cfg=TINY)
    two_step = resize(srvgg.apply(params, x, cfg=TINY), (16, 24), "bicubic")
    assert fused.shape == (1, 16, 24, 3)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(two_step), atol=1e-5
    )


def test_srvgg_apply_down4_matches_two_step():
    params = srvgg.init_params(jax.random.PRNGKey(7), TINY)
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 8, 12, 3))
    fused = srvgg.apply_down(params, x, 4, cfg=TINY)
    two_step = resize(srvgg.apply(params, x, cfg=TINY), (8, 12), "bicubic")
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(two_step), atol=1e-5
    )


def test_rational_fused_epilogue_exact_interior():
    """Generic rational downscale composed with ps4 — exact interiors for
    the whole ladder's ratios."""
    from sharkshark_tpu.ops.fused_epilogue import (
        nearest4_bicubic_down_rational,
        ps4_bicubic_down_rational,
    )

    for num, den, (h, w) in [(3, 2, (9, 12)), (5, 2, (10, 15)), (7, 4, (14, 21))]:
        y = jax.random.normal(jax.random.PRNGKey(num * 10 + den), (1, h, w, 48))
        oh, ow = 4 * h * den // num, 4 * w * den // num
        ref = resize(pixel_shuffle(y, 4), (oh, ow), "bicubic")
        got = ps4_bicubic_down_rational(y, num, den)
        m = max(2, oh // 8)
        np.testing.assert_allclose(
            np.asarray(got[:, m:-m, m:-m]),
            np.asarray(ref[:, m:-m, m:-m]),
            atol=1e-5, err_msg=f"{num}/{den}",
        )
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3))
        refn = resize(resize(x, (4 * h, 4 * w), "nearest"), (oh, ow), "bicubic")
        gotn = nearest4_bicubic_down_rational(x, num, den)
        np.testing.assert_allclose(
            np.asarray(gotn[:, m:-m, m:-m]),
            np.asarray(refn[:, m:-m, m:-m]),
            atol=1e-5, err_msg=f"nearest {num}/{den}",
        )


def test_srvgg_apply_down_rational():
    params = srvgg.init_params(jax.random.PRNGKey(9), TINY)
    x = jax.random.uniform(jax.random.PRNGKey(10), (1, 9, 12, 3))
    fused = srvgg.apply_down_rational(params, x, 3, 2, cfg=TINY)  # 4x then /1.5
    two_step = resize(srvgg.apply(params, x, cfg=TINY), (24, 32), "bicubic")
    assert fused.shape == (1, 24, 32, 3)
    np.testing.assert_allclose(
        np.asarray(fused[:, 3:-3, 3:-3]),
        np.asarray(two_step[:, 3:-3, 3:-3]),
        atol=2e-5,
    )
