"""Visualization helpers — qualitative panels for eval dumps and the demo.

Numpy re-implementations of `isegm/utils/vis.py`:
  * draw_probmap (vis.py:61): jet colormap of a probability map;
  * draw_with_blend_and_clicks (vis.py:119): alpha-blend the mask color over
    the image + green/red click disks;
  * draw_with_blend_and_prompts (vis.py:246): same + box outlines / scribble
    polylines;
  * visualize_mask / per-instance palette.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache()
def _palette(n: int = 256) -> np.ndarray:
    """VOC-style color palette (deterministic per-instance colors)."""
    pal = np.zeros((n, 3), np.uint8)
    for i in range(n):
        c, j = i, 0
        while c:
            pal[i, 0] |= ((c >> 0) & 1) << (7 - j)
            pal[i, 1] |= ((c >> 1) & 1) << (7 - j)
            pal[i, 2] |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
            j += 1
    return pal


def visualize_mask(mask: np.ndarray) -> np.ndarray:
    """Instance-id mask -> RGB via the palette."""
    return _palette()[np.clip(mask, 0, 255).astype(np.int32)]


def draw_probmap(probs: np.ndarray) -> np.ndarray:
    """vis.py:61: probability map -> jet-colored uint8 image."""
    x = np.clip(probs, 0.0, 1.0)
    # piecewise jet
    r = np.clip(1.5 - np.abs(4.0 * x - 3.0), 0, 1)
    g = np.clip(1.5 - np.abs(4.0 * x - 2.0), 0, 1)
    b = np.clip(1.5 - np.abs(4.0 * x - 1.0), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def _disk(h: int, w: int, cy: float, cx: float, radius: int) -> np.ndarray:
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= radius ** 2


def draw_with_blend_and_clicks(image: np.ndarray, mask=None, alpha: float = 0.6,
                               clicks_list=None, pos_color=(0, 255, 0),
                               neg_color=(255, 0, 0),
                               radius: int = 4) -> np.ndarray:
    """vis.py:119: blend mask color over image + click disks.

    clicks_list: either reference-style objects with .is_positive/.coords or
    an (2N, 3) array of (y, x, order) with the first half positive."""
    result = image.astype(np.float32).copy()
    h, w = result.shape[:2]
    if mask is not None:
        mask = np.asarray(mask)
        colors = visualize_mask(mask.astype(np.int32)).astype(np.float32)
        on = mask > 0
        result[on] = (1 - alpha) * result[on] + alpha * colors[on]

    if clicks_list is not None:
        entries = []
        arr = np.asarray(clicks_list) if not (
            len(clicks_list) and hasattr(clicks_list[0], "coords")) else None
        if arr is not None and arr.ndim == 2 and arr.shape[1] == 3:
            n = arr.shape[0] // 2
            for i, (y, x, order) in enumerate(arr):
                if order >= 0:
                    entries.append((i < n, y, x))
        else:
            for c in clicks_list:
                entries.append((c.is_positive, *c.coords))
        for is_pos, y, x in entries:
            if y < 0 or x < 0:
                continue
            d = _disk(h, w, float(y), float(x), radius)
            result[d] = pos_color if is_pos else neg_color
    return np.clip(result, 0, 255).astype(np.uint8)


def draw_box(image: np.ndarray, box, color=(255, 255, 255),
             thickness: int = 3) -> np.ndarray:
    """Box outline; box = (x_center, y_center, width, height)."""
    out = image.copy()
    h, w = out.shape[:2]
    xc, yc, bw, bh = [int(v) for v in box[:4]]
    x0, x1 = xc - bw // 2, xc + bw // 2
    y0, y1 = yc - bh // 2, yc + bh // 2
    t = thickness // 2
    yy, xx = np.mgrid[:h, :w]
    outer = (xx >= x0 - t) & (xx <= x1 + t) & (yy >= y0 - t) & (yy <= y1 + t)
    inner = (xx >= x0 + t + 1) & (xx <= x1 - t - 1) & \
        (yy >= y0 + t + 1) & (yy <= y1 - t - 1)
    out[outer & ~inner] = color
    return out


def draw_scribble(image: np.ndarray, samples, color=(255, 255, 0),
                  thickness: int = 3) -> np.ndarray:
    """Polyline from dense (col, row) samples."""
    out = image.copy()
    h, w = out.shape[:2]
    cols = np.clip(np.asarray(samples)[:, 0].astype(int), 0, w - 1)
    rows = np.clip(np.asarray(samples)[:, 1].astype(int), 0, h - 1)
    stroke = np.zeros((h, w), bool)
    stroke[rows, cols] = True
    t = max(thickness // 2, 1)
    pad = np.pad(stroke, t)
    acc = np.zeros((h, w), bool)
    for dy in range(-t, t + 1):
        for dx in range(-t, t + 1):
            acc |= pad[t + dy:t + dy + h, t + dx:t + dx + w]
    out[acc] = color
    return out


def draw_with_blend_and_prompts(image: np.ndarray, mask=None, alpha=0.6,
                                clicks_list=None, boxes=None, scribbles=None,
                                radius: int = 4) -> np.ndarray:
    """vis.py:246: clicks + box outlines + scribble strokes."""
    out = draw_with_blend_and_clicks(image, mask=mask, alpha=alpha,
                                     clicks_list=clicks_list, radius=radius)
    if boxes is not None:
        for box in np.atleast_2d(np.asarray(boxes)):
            if np.any(box[:4]):
                out = draw_box(out, box)
    if scribbles is not None:
        scr = np.asarray(scribbles)
        if scr.ndim == 3:
            scr = scr[0]
        if np.any(scr):
            out = draw_scribble(out, scr)
    return out
