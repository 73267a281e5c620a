"""VGG19 feature extractor for the perceptual (feature) loss.

Rebuild of reference models/networks/vgg_nets.py VGGFeatureExtractor (used
by VSRGANModel.set_criterion, vsrgan_model.py:98-103): runs torchvision's
VGG19 `.features` stack on ImageNet-normalized input and returns the
activations at the requested layer indices (default [8, 17, 26, 35] =
relu2_2 / relu3_4 / relu4_4 / relu5_4).

Weights import from a torchvision vgg19 state dict (.pth path) — nothing
can be downloaded on the TPU image, so construction is path-gated; pass
the extractor into make_gan_train_step(feature_extractor=...) when
available.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.torch_import import load_state_dict
from ..ops import conv2d

__all__ = ["VGG19_LAYERS", "VGGFeatureExtractor"]

# torchvision vgg19.features: conv indices and channel plan
# (M = maxpool position)
VGG19_LAYERS = [
    (0, 64), (2, 64), "M",
    (5, 128), (7, 128), "M",
    (10, 256), (12, 256), (14, 256), (16, 256), "M",
    (19, 512), (21, 512), (23, 512), (25, 512), "M",
    (28, 512), (30, 512), (32, 512), (34, 512), "M",
]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class VGGFeatureExtractor:
    def __init__(self, weights_path, feature_layers=(8, 17, 26, 35)):
        sd = (
            weights_path
            if isinstance(weights_path, dict)
            else load_state_dict(weights_path)
        )
        self.feature_layers = set(feature_layers)
        self.max_layer = max(feature_layers)
        self.convs: dict[int, tuple[jnp.ndarray, jnp.ndarray]] = {}
        for entry in VGG19_LAYERS:
            if entry == "M":
                continue
            i, _ = entry
            w = sd[f"features.{i}.weight"].transpose(2, 3, 1, 0)  # OIHW->HWIO
            b = sd[f"features.{i}.bias"]
            self.convs[i] = (jnp.asarray(w), jnp.asarray(b))

    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: (N, H, W, 3) in [0, 1] -> list of feature maps at
        self.feature_layers (ImageNet normalization applied here, like
        the reference's register_buffer mean/std)."""
        y = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        feats = []
        idx = 0  # torchvision sequential index
        for entry in VGG19_LAYERS:
            if idx > self.max_layer:
                break
            if entry == "M":
                y = _maxpool2(y)
                if idx in self.feature_layers:
                    feats.append(y)
                idx += 1
                continue
            i, _ = entry
            y = conv2d(y, *self.convs[i], padding=1)
            if idx in self.feature_layers:
                feats.append(y)
            idx += 1
            y = jnp.maximum(y, 0)  # ReLU
            if idx in self.feature_layers:
                feats.append(y)
            idx += 1
        return feats
