"""FSRCNN super-resolution core (single-channel), TPU-functional.

Capability parity with reference src/upscale/model/fsrcnn/model.py:6-72
(feature extraction 5x5 -> shrink 1x1 -> 4x map 3x3 -> expand 1x1 -> 9x9
transposed-conv upscale, PReLU throughout).  Checked-in T91 weights
(fsrcnn_x{2,4}-T91.pth) import bit-for-bit via `from_torch`.

RGB inputs are handled the way the reference service does it — channels
ride the batch dim (reference fsrcnn_upscaler.py:293-297).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv2d, conv_transpose2d, prelu
from .torch_import import conv_from_torch, conv_transpose_from_torch, prelu_from_torch

D, S, M = 56, 12, 4  # feature dim, shrink dim, mapping depth


def init_params(key: jax.Array, factor: int = 4) -> dict:
    """Random init mirroring the reference's scheme (normal with
    std=sqrt(2/(out_ch*k*k)) for convs, std=0.001 for the deconv)."""
    keys = jax.random.split(key, 8 + M)

    def conv(k, kh, kw, i, o, std=None):
        std = std if std is not None else math.sqrt(2.0 / (o * kh * kw))
        return {
            "w": jax.random.normal(k, (kh, kw, i, o), jnp.float32) * std,
            "b": jnp.zeros((o,), jnp.float32),
        }

    params = {
        "feat": conv(keys[0], 5, 5, 1, D),
        "feat_act": {"alpha": jnp.full((D,), 0.25, jnp.float32)},
        "shrink": conv(keys[1], 1, 1, D, S),
        "shrink_act": {"alpha": jnp.full((S,), 0.25, jnp.float32)},
        "map": [conv(keys[2 + i], 3, 3, S, S) for i in range(M)],
        "map_act": [{"alpha": jnp.full((S,), 0.25, jnp.float32)} for _ in range(M)],
        "expand": conv(keys[6], 1, 1, S, D),
        "expand_act": {"alpha": jnp.full((D,), 0.25, jnp.float32)},
        "deconv": conv(keys[7], 9, 9, D, 1, std=0.001),
    }
    return params


def _map_stack(params: dict, y: jnp.ndarray) -> jnp.ndarray:
    """The M=4 3x3 S=12 mapping convs.  S=12 wastes >90% of the MXU's
    128 lanes under the plain lowering; with f=8 W-folding (ops/lanefold)
    the whole stack runs at 96 in/out lanes, entering/leaving folded
    space once (free reshapes).  PReLU is per-original-channel, so the
    folded activation tiles alpha across the f sub-pixels (exact).
    ROADMAP 'not yet routed' straggler, round 4."""
    from ..ops.lanefold import conv3x3_folded, fold_lanes, lanefold_enabled, unfold_lanes

    f = 8
    if not lanefold_enabled(y.shape[-2], f):
        for conv_p, act_p in zip(params["map"], params["map_act"]):
            y = prelu(conv2d(y, **conv_p, padding=1), act_p["alpha"])
        return y
    yf = fold_lanes(y, f)
    for conv_p, act_p in zip(params["map"], params["map_act"]):
        yf = prelu(
            conv3x3_folded(yf, conv_p["w"], conv_p.get("b"), f),
            jnp.tile(act_p["alpha"], f),
        )
    return unfold_lanes(yf, f)


def apply(params: dict, x: jnp.ndarray, *, factor: int = 4) -> jnp.ndarray:
    """x: (N, H, W, 1) in [0, 1] -> (N, H*f, W*f, 1).

    `factor` is static (the upscale ratio is baked into the compiled
    executable, like the reference's per-shape TensorRT engines)."""
    f = factor
    y = prelu(conv2d(x, **params["feat"], padding=2), params["feat_act"]["alpha"])
    y = prelu(conv2d(y, **params["shrink"]), params["shrink_act"]["alpha"])
    y = _map_stack(params, y)
    y = prelu(conv2d(y, **params["expand"]), params["expand_act"]["alpha"])
    y = conv_transpose2d(
        y, **params["deconv"], stride=f, padding=4, output_padding=f - 1
    )
    return y


def from_torch(sd: dict[str, np.ndarray]) -> dict:
    """Map the reference checkpoint's module names into our pytree."""
    return {
        "feat": conv_from_torch(sd, "feature_extraction.0."),
        "feat_act": prelu_from_torch(sd, "feature_extraction.1."),
        "shrink": conv_from_torch(sd, "shrink.0."),
        "shrink_act": prelu_from_torch(sd, "shrink.1."),
        "map": [conv_from_torch(sd, f"map.{2 * i}.") for i in range(M)],
        "map_act": [prelu_from_torch(sd, f"map.{2 * i + 1}.") for i in range(M)],
        "expand": conv_from_torch(sd, "expand.0."),
        "expand_act": prelu_from_torch(sd, "expand.1."),
        "deconv": conv_transpose_from_torch(sd, "deconv."),
    }
