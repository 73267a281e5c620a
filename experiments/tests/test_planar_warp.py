"""Planar-warp conv_in fold exactness (negative-result experiment; see
experiments/planar_warp.py for the measured outcome)."""

import numpy as np

from experiments.planar_warp import srnet_apply_planar_warp
from sharkshark_tpu.models import egvsr
from sharkshark_tpu.models.egvsr import srnet_apply
from sharkshark_tpu.ops import space_to_depth


def test_planar_warp_conv_in_fold_matches_s2d():
    """conv_in over [lr | s2d(hr)] == split conv + strided big-kernel conv
    on planar hr (exact weight rearrangement, any scale)."""
    import jax

    cfg = egvsr.EGVSRConfig(nb=2, nf=16)
    params = egvsr.init_params(jax.random.PRNGKey(0), cfg)["srnet"]
    s = cfg.scale
    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 24, 3))
    hr = jax.random.uniform(jax.random.PRNGKey(2), (1, 16 * s, 24 * s, 3))

    want = srnet_apply({"conv_in": params["conv_in"], "blocks": params["blocks"],
                        "conv_out": params["conv_out"]}, lr, space_to_depth(hr, s))
    got = srnet_apply_planar_warp(
        {"conv_in": params["conv_in"], "blocks": params["blocks"],
         "conv_out": params["conv_out"]}, lr, hr.transpose(0, 3, 1, 2), s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
