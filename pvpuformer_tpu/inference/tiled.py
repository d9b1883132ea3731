"""Tiled ("Crops") inference for very large images.

Re-derivation of the reference Crops transform
(`isegm/inference/transforms/crops.py:11-97`): the image splits into
overlapping fixed-size tiles, clicks are remapped into each tile's frame,
the model runs on every tile (one batched forward — the reference loops),
and logits blend back under a smooth weight window.
"""
from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.registry import forward_for


def _tile_origins(size: int, crop: int, min_overlap: float) -> List[int]:
    if size <= crop:
        return [0]
    n = max(2, math.ceil((size - crop * min_overlap) /
                         (crop * (1 - min_overlap))))
    step = (size - crop) / (n - 1)
    return [int(round(i * step)) for i in range(n)]


def _blend_window(crop_h: int, crop_w: int) -> np.ndarray:
    wy = np.minimum(np.arange(crop_h) + 1, np.arange(crop_h)[::-1] + 1)
    wx = np.minimum(np.arange(crop_w) + 1, np.arange(crop_w)[::-1] + 1)
    w = np.minimum.outer(wy, wx).astype(np.float32)
    return w / w.max()


def tiled_forward(params, model_cfg, image: jnp.ndarray, points: jnp.ndarray,
                  crop_size: Tuple[int, int] = (448, 448),
                  min_overlap: float = 0.2) -> jnp.ndarray:
    """image: (1, H, W, C); points: (1, 2N, 3) full-frame clicks.
    Returns (1, H, W, 1) logits blended across tiles."""
    _, h, w, c = image.shape
    ch, cw = crop_size
    ys = _tile_origins(h, ch, min_overlap)
    xs = _tile_origins(w, cw, min_overlap)

    tiles = []
    tile_pts = []
    for y0 in ys:
        for x0 in xs:
            tiles.append(jax.lax.dynamic_slice(
                image, (0, y0, x0, 0), (1, ch, cw, c))[0])
            py = points[..., 0] - y0
            px = points[..., 1] - x0
            inside = (points[..., 2] >= 0) & (py >= 0) & (py < ch) & \
                (px >= 0) & (px < cw)
            tile_pts.append(jnp.stack(
                [jnp.where(inside, py, -1.0), jnp.where(inside, px, -1.0),
                 jnp.where(inside, points[..., 2], -1.0)], axis=-1)[0])

    batch = jnp.stack(tiles)                       # (T, ch, cw, C)
    pts = jnp.stack(tile_pts)                      # (T, 2N, 3)
    fwd = forward_for(model_cfg)
    logits = fwd(params, model_cfg, batch, pts)["instances"]  # (T, ch, cw, 1)

    window = jnp.asarray(_blend_window(ch, cw))[None, :, :, None]
    acc = jnp.zeros((1, h, w, 1), jnp.float32)
    den = jnp.full((1, h, w, 1), 1e-6, jnp.float32)
    i = 0
    for y0 in ys:
        for x0 in xs:
            contrib = (logits[i:i + 1].astype(jnp.float32) * window)
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (0, y0, x0, 0),
                                           (1, ch, cw, 1)) + contrib,
                (0, y0, x0, 0))
            den = jax.lax.dynamic_update_slice(
                den, jax.lax.dynamic_slice(den, (0, y0, x0, 0),
                                           (1, ch, cw, 1)) + window,
                (0, y0, x0, 0))
            i += 1
    return acc / den
