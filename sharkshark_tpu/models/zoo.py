"""SR model zoo registry: names -> architecture config + weight source.

Parity with the reference's RealESRGAN factory model table
(src/upscale/model/realesrgan/factory.py:112-157): each entry names the
network, its config, the official release URL for the weights, and the
DNI pairing for denoise-strength interpolation. `build_sr_model` returns
a ready (apply_fn, params, scale) triple; weights come from an explicit
path, the local weight dir, or (when the host has egress) the release URL.
"""

from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple

import jax

from ..utils import get_logger
from . import rrdbnet, srvgg, torch_import

__all__ = ["ZOO", "ZooEntry", "fetch_weights", "build_sr_model"]

log = get_logger("models.zoo")

WEIGHT_DIR = os.environ.get("SHARKSHARK_WEIGHT_DIR", "./weights")


class ZooEntry(NamedTuple):
    arch: str                      # 'rrdb' | 'srvgg'
    cfg: Any
    scale: int
    urls: tuple[str, ...]
    dni_partner: str | None = None  # weights blended by denoise strength


ZOO: dict[str, ZooEntry] = {
    "RealESRGAN_x4plus": ZooEntry(
        "rrdb", rrdbnet.X4PLUS, 4,
        ("https://github.com/xinntao/Real-ESRGAN/releases/download/v0.1.0/RealESRGAN_x4plus.pth",),
    ),
    "RealESRNet_x4plus": ZooEntry(
        "rrdb", rrdbnet.X4PLUS, 4,
        ("https://github.com/xinntao/Real-ESRGAN/releases/download/v0.1.1/RealESRNet_x4plus.pth",),
    ),
    "RealESRGAN_x4plus_anime_6B": ZooEntry(
        "rrdb", rrdbnet.X4PLUS_ANIME_6B, 4,
        ("https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.2.4/RealESRGAN_x4plus_anime_6B.pth",),
    ),
    "RealESRGAN_x2plus": ZooEntry(
        "rrdb", rrdbnet.X2PLUS, 2,
        ("https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.1/RealESRGAN_x2plus.pth",),
    ),
    "realesr-animevideov3": ZooEntry(
        "srvgg", srvgg.ANIMEVIDEO_V3, 4,
        ("https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.5.0/realesr-animevideov3.pth",),
    ),
    "realesr-general-x4v3": ZooEntry(
        "srvgg", srvgg.GENERAL_X4V3, 4,
        (
            "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.5.0/realesr-general-wdn-x4v3.pth",
            "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.5.0/realesr-general-x4v3.pth",
        ),
        dni_partner="realesr-general-wdn-x4v3",
    ),
}


def fetch_weights(
    name: str, weight_dir: str = WEIGHT_DIR, need_partner: bool = True
) -> list[str]:
    """Resolve (and download if possible) the .pth files for a zoo entry.
    Returns local paths; raises with the URLs when offline and absent.
    need_partner=False skips the DNI partner checkpoint (listed first in
    the urls tuple) — denoise_strength >= 1 never reads it, and failing
    offline on an unused ~65 MB download would be gratuitous."""
    entry = ZOO[name]
    urls = entry.urls
    if not need_partner and entry.dni_partner and len(urls) > 1:
        urls = urls[-1:]
    paths = []
    for url in urls:
        fname = os.path.basename(url)
        path = os.path.join(weight_dir, fname)
        if not os.path.isfile(path):
            os.makedirs(weight_dir, exist_ok=True)
            try:
                import requests

                log.info("downloading %s", url)
                r = requests.get(url, timeout=120)
                r.raise_for_status()
                with open(path, "wb") as f:
                    f.write(r.content)
            except Exception as ex:
                raise FileNotFoundError(
                    f"weights for {name!r} not found at {path} and download "
                    f"failed ({ex}); fetch manually from {url}"
                ) from ex
        paths.append(path)
    return paths


def build_sr_model(
    name: str,
    model_path: str | None = None,
    denoise_strength: float = 1.0,
    weight_dir: str = WEIGHT_DIR,
    random_init: bool = False,
) -> tuple[Callable, Any, int]:
    """Returns (apply_fn(params, x), params, scale) for a zoo model.

    denoise_strength < 1 blends the wdn DNI partner like the reference
    (factory.py:152-157)."""
    entry = ZOO[name]
    if random_init:
        if entry.arch == "srvgg":
            params = srvgg.init_params(jax.random.PRNGKey(0), entry.cfg)
        else:
            params = rrdbnet.init_params(jax.random.PRNGKey(0), entry.cfg)
    else:
        if model_path is not None:
            paths = [model_path]
        else:
            paths = fetch_weights(
                name, weight_dir, need_partner=denoise_strength < 1.0
            )
        # load_state_dict already unwraps params/params_ema containers
        sd = torch_import.load_state_dict(paths[-1])
        if entry.dni_partner and denoise_strength < 1.0 and len(paths) > 1:
            sd_wdn = torch_import.load_state_dict(paths[0])
            sd = torch_import.dni_blend(sd, sd_wdn, denoise_strength)
        if entry.arch == "srvgg":
            params = srvgg.from_torch(sd, entry.cfg)
        else:
            params = rrdbnet.from_torch(sd, entry.cfg)

    if entry.arch == "srvgg":
        fn = lambda p, x: srvgg.apply(p, x, cfg=entry.cfg)  # noqa: E731
    else:
        fn = lambda p, x: rrdbnet.apply(p, x, cfg=entry.cfg)  # noqa: E731
    return fn, params, entry.scale
