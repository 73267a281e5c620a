"""Tiled upscaling for large spatial extents.

Capability parity with RealESRGANer's tile/tile_pad processing
(reference src/upscale/model/realesrgan/factory.py:94-96,159-169, which
delegates to realesrgan.RealESRGANer): the image is split into
overlapping tiles, each tile is upscaled independently, and the centers
are stitched back.

TPU-first design: instead of the reference's sequential per-tile loop,
tiles become a *batch* dimension — one big (N*Ty*Tx, t+2p, t+2p, C)
model call that keeps the MXU full, and which can additionally be
sharded over a device mesh axis for spatial scaling (parallel/).
All slicing is static-shape (H, W known at trace time).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

__all__ = ["tile_upscale"]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def tile_upscale(
    sr_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    sr_params: Any,
    img: jnp.ndarray,
    *,
    scale: int = 4,
    tile: int = 256,
    tile_pad: int = 10,
) -> jnp.ndarray:
    """img: (N, H, W, C) [0,1] -> (N, H*scale, W*scale, C).

    Each tile sees `tile_pad` pixels of context on every side (reflect
    padding at image borders), matching RealESRGANer's halo semantics.
    """
    n, h, w, c = img.shape
    # An image that fits in one tile needs no tiling. This IS the
    # reference behavior, not a shortcut deviation: RealESRGANer's
    # tile_process clamps every halo inside the image
    # (input_start_x_pad = max(x - pad, 0), input_end_x_pad =
    # min(x + pad, w)), so a single tile covering the whole image sees
    # exactly the unpadded image. It also sidesteps the reflect pad
    # (tile-round remainder + halo) exceeding the image size, which
    # jnp.pad(mode='reflect') rejects. Where we DO deviate (documented
    # in docs/PARITY.md): multi-tile inputs get reflect/edge context at
    # image borders instead of RealESRGANer's clamped (truncated) halos
    # — strictly more context, same stitched interior.
    if h <= tile and w <= tile:
        return sr_apply(sr_params, img)
    hp, wp = _ceil_to(h, tile), _ceil_to(w, tile)
    ty, tx = hp // tile, wp // tile
    if ty == 1 and tx == 1 and tile_pad == 0:
        return sr_apply(sr_params, img)

    pad = tile_pad
    pad_cfg = ((0, 0), (pad, hp - h + pad), (pad, wp - w + pad), (0, 0))
    if max(pad, hp - h + pad) >= h or max(pad, wp - w + pad) >= w:
        # reflect pad must be < the dim size; fall back to edge padding
        # for the (rare) dims between tile/2 and tile
        x = jnp.pad(img, pad_cfg, mode="edge")
    else:
        x = jnp.pad(img, pad_cfg, mode="reflect")

    t_in = tile + 2 * pad
    rows = [
        x[:, iy * tile : iy * tile + t_in, ix * tile : ix * tile + t_in, :]
        for iy in range(ty)
        for ix in range(tx)
    ]
    batch = jnp.concatenate(rows, axis=0)  # (N*ty*tx, t_in, t_in, C)

    out = sr_apply(sr_params, batch)  # (N*ty*tx, t_in*s, t_in*s, C)
    s = scale
    core = out[:, pad * s : (pad + tile) * s, pad * s : (pad + tile) * s, :]

    # (ty*tx, N, t*s, t*s, C) -> (N, ty, t*s, tx, t*s, C) -> full image
    core = core.reshape(ty, tx, n, tile * s, tile * s, c)
    core = core.transpose(2, 0, 3, 1, 4, 5).reshape(n, hp * s, wp * s, c)
    return core[:, : h * s, : w * s, :]
