"""Bilinear / bicubic resizing with torch-parity semantics.

XLA's `jax.image.resize` has no `align_corners` mode, but the reference's
numerics depend on it everywhere (model upsample align_corners=True
`is_vpu_model.py:431-436`, head multi-scale resize align_corners=False
`swin_transformer.py:730-735`, zoom-in crop/paste align_corners=True
`zoom_in.py:101-102,186-187`). We provide:

  * static-shape resize as two small dense matrices applied with einsum
    (separable -> rides the MXU, fuses with neighbors);
  * dynamic-ROI crop-resize and paste-back as gather-based sampling with
    traced scalar ROI bounds — this is what makes the zoom-in transform
    jittable with fixed shapes (the ROI is data-dependent, the shapes are not);
  * a host-side numpy bicubic matching torch's `mode='bicubic',
    align_corners=False` for MAE pos-embed interpolation (pos_embed.py:75-128).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# static-shape bilinear as matrices
# ---------------------------------------------------------------------------

def resize_axis_matrices(src: int, dst: int, align_corners: bool) -> np.ndarray:
    """Dense (dst, src) interpolation matrix for one axis (numpy, host-side)."""
    m = np.zeros((dst, src), dtype=np.float32)
    if src == 1:
        m[:, 0] = 1.0
        return m
    if dst == 1:
        # torch: single output samples src position 0 (align_corners=True)
        # or (0.5*scale - 0.5) clamped (align_corners=False) -> both land at 0
        m[0, 0] = 1.0
        return m
    for i in range(dst):
        if align_corners:
            x = i * (src - 1) / (dst - 1)
        else:
            x = (i + 0.5) * src / dst - 0.5
        x = min(max(x, 0.0), src - 1)
        x0 = int(np.floor(x))
        x1 = min(x0 + 1, src - 1)
        w1 = x - x0
        m[i, x0] += 1.0 - w1
        m[i, x1] += w1
    return m


def bilinear_matrix(src_hw: Tuple[int, int], dst_hw: Tuple[int, int],
                    align_corners: bool):
    mh = jnp.asarray(resize_axis_matrices(src_hw[0], dst_hw[0], align_corners))
    mw = jnp.asarray(resize_axis_matrices(src_hw[1], dst_hw[1], align_corners))
    return mh, mw


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "align_corners"))
def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """NHWC bilinear resize with torch `F.interpolate` semantics.

    bf16 inputs interpolate in bf16 (f32 MXU accumulation via
    preferred_element_type): the output is bf16 anyway, and the f32
    round-trip would MATERIALIZE f32 intermediates — at the P²CL training
    shapes (8,112,112,48)->(8,448,448,48) that is ~600 MB of extra HBM
    traffic per direction per step (trace-measured, round 3). Interp-weight
    rounding to bf16 sits below the output's own bf16 quantization. f32/f64
    inputs (all parity/oracle paths) keep exact f32 math.
    """
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    ct = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    mh, mw = bilinear_matrix((h, w), (out_h, out_w), align_corners)
    y = jnp.einsum("Oh,bhwc->bOwc", mh.astype(ct), x.astype(ct),
                   preferred_element_type=jnp.float32).astype(ct)
    y = jnp.einsum("Pw,bhwc->bhPc", mw.astype(ct), y,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# dynamic-ROI crop / paste (gather-based, jittable with traced scalars)
# ---------------------------------------------------------------------------

def _axis_sample(length_src: int, n_out: int, lo, hi):
    """Sample positions for align_corners=True resize of the dynamic span
    [lo, hi] (inclusive) to n_out points: x_i = lo + i*(hi-lo)/(n_out-1)."""
    i = jnp.arange(n_out, dtype=jnp.float32)
    span = (hi - lo).astype(jnp.float32)
    x = lo.astype(jnp.float32) + i * span / float(n_out - 1)
    x = jnp.clip(x, 0.0, float(length_src - 1))
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, length_src - 1)
    w1 = x - x0.astype(jnp.float32)
    return x0, x1, w1


def roi_crop_resize(img: jnp.ndarray, roi, out_h: int, out_w: int) -> jnp.ndarray:
    """Crop img (B, H, W, C) to roi=(rmin, rmax, cmin, cmax) (traced int
    scalars, inclusive) and resize to (out_h, out_w) with align_corners=True.

    Matches `get_roi_image_nd` (zoom_in.py:171-189): slice then
    F.interpolate(..., align_corners=True).
    """
    rmin, rmax, cmin, cmax = roi
    b, h, w, c = img.shape
    y0, y1, wy = _axis_sample(h, out_h, rmin, rmax)
    x0, x1, wx = _axis_sample(w, out_w, cmin, cmax)

    f = img.astype(jnp.float32)
    rows0 = jnp.take(f, y0, axis=1)
    rows1 = jnp.take(f, y1, axis=1)
    rows = rows0 * (1.0 - wy)[None, :, None, None] + rows1 * wy[None, :, None, None]
    cols0 = jnp.take(rows, x0, axis=2)
    cols1 = jnp.take(rows, x1, axis=2)
    out = cols0 * (1.0 - wx)[None, None, :, None] + cols1 * wx[None, None, :, None]
    return out.astype(img.dtype)


def roi_paste_back(probs: jnp.ndarray, roi, canvas_h: int, canvas_w: int) -> jnp.ndarray:
    """Inverse of the zoom-in: resize probs (B, h, w, C) to the ROI span with
    align_corners=True and paste into a zero canvas (zoom_in.py:94-112).

    Implemented as a direct gather: canvas pixel (r, c) inside the ROI samples
    probs at ((r - rmin) * (h-1) / (rh-1), ...) — identical to interpolate +
    paste, with no dynamic shapes.
    """
    rmin, rmax, cmin, cmax = roi
    b, h, w, c = probs.shape
    f = probs.astype(jnp.float32)

    r = jnp.arange(canvas_h, dtype=jnp.float32)
    ccol = jnp.arange(canvas_w, dtype=jnp.float32)
    rh = (rmax - rmin).astype(jnp.float32)          # span - 1
    rw = (cmax - cmin).astype(jnp.float32)

    sy = (r - rmin.astype(jnp.float32)) * (h - 1) / jnp.maximum(rh, 1.0)
    sx = (ccol - cmin.astype(jnp.float32)) * (w - 1) / jnp.maximum(rw, 1.0)
    # degenerate 1-pixel spans sample row/col 0
    sy = jnp.where(rh < 1.0, 0.0, sy)
    sx = jnp.where(rw < 1.0, 0.0, sx)

    inside = ((r >= rmin) & (r <= rmax))[:, None] & ((ccol >= cmin) & (ccol <= cmax))[None, :]

    syc = jnp.clip(sy, 0.0, h - 1)
    sxc = jnp.clip(sx, 0.0, w - 1)
    y0 = jnp.floor(syc).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wy = syc - y0.astype(jnp.float32)
    x0 = jnp.floor(sxc).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wx = sxc - x0.astype(jnp.float32)

    rows0 = jnp.take(f, y0, axis=1)
    rows1 = jnp.take(f, y1, axis=1)
    rows = rows0 * (1.0 - wy)[None, :, None, None] + rows1 * wy[None, :, None, None]
    cols0 = jnp.take(rows, x0, axis=2)
    cols1 = jnp.take(rows, x1, axis=2)
    out = cols0 * (1.0 - wx)[None, None, :, None] + cols1 * wx[None, None, :, None]
    out = jnp.where(inside[None, :, :, None], out, 0.0)
    return out.astype(probs.dtype)


# ---------------------------------------------------------------------------
# host-side bicubic (checkpoint ingest)
# ---------------------------------------------------------------------------

def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax <= 1.0, ((a + 2) * ax - (a + 3)) * ax * ax + 1,
        np.where(ax < 2.0, (((ax - 5) * ax + 8) * ax - 4) * a, 0.0))


def _bicubic_axis_matrix(src: int, dst: int) -> np.ndarray:
    """torch bicubic align_corners=False axis matrix (clamped taps)."""
    m = np.zeros((dst, src), dtype=np.float64)
    for i in range(dst):
        x = (i + 0.5) * src / dst - 0.5
        x0 = int(np.floor(x))
        t = x - x0
        taps = np.array([x0 - 1, x0, x0 + 1, x0 + 2])
        wts = _cubic_kernel(np.array([t + 1, t, 1 - t, 2 - t]))
        for tap, wt in zip(taps, wts):
            m[i, int(np.clip(tap, 0, src - 1))] += wt
    return m.astype(np.float32)


def bicubic_resize_numpy(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(..., H, W) numpy bicubic matching torch F.interpolate bicubic,
    align_corners=False. Used for MAE pos-embed interpolation at checkpoint
    ingest (pos_embed.py:75-128)."""
    h, w = x.shape[-2], x.shape[-1]
    mh = _bicubic_axis_matrix(h, out_h)
    mw = _bicubic_axis_matrix(w, out_w)
    y = np.einsum("Oh,...hw->...Ow", mh, x.astype(np.float64))
    y = np.einsum("Pw,...hw->...hP", mw, y)
    return y.astype(np.float32)
