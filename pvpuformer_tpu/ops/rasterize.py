"""On-device prompt rasterization into the coordinate-feature channels.

The reference draws box outlines / scribble polylines per-sample on the host
with cv2 (`isegm/model/is_model.py:97-146`) — a D2H/H2D round trip inside the
model forward. Here both are closed-form masks:
  * box outline: thickness-3 rectangle border == within the rectangle dilated
    by 1px and outside the rectangle eroded by 2px (cv2.rectangle thickness 3
    centers the stroke on the path);
  * scribble: the curve arrives as 1000 dense samples
    (trainer.py:725,1192-1243); a thickness-3 polyline over dense samples is
    the union of 3x3 neighborhoods of the samples — a scatter of 1s followed
    by a 3x3 max-pool dilation.

Drawn pixels OR into the existing disk channel (is_model.py:108-120 converts
through uint8*255 and back, which is exactly a logical OR with the 0/1 disks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def box_outline_mask(h: int, w: int, box) -> jnp.ndarray:
    """box = (x_center, y_center, width, height) traced scalars -> (h, w) 0/1.

    Matches cv2.rectangle((x0, y0), (x1, y1), thickness=3) with
    x0 = xc - w//2 etc. (is_model.py:107-109).
    """
    xc, yc, bw, bh = [v.astype(jnp.int32) for v in box]
    x0, x1 = xc - bw // 2, xc + bw // 2
    y0, y1 = yc - bh // 2, yc + bh // 2
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    # cv2's thickness-3 stroke is 5 px wide on axis-aligned lines (its
    # thick-line half-width rounds outward to 2) with round caps clipping
    # the outer corners to a radius-2 disk — both measured directly against
    # cv2.rectangle (test_reference_direct VPU box test is pixel-exact)
    ex = jnp.maximum(0, jnp.maximum(x0 - xx, xx - x1))
    ey = jnp.maximum(0, jnp.maximum(y0 - yy, yy - y1))
    outer = (ex * ex + ey * ey) <= 4
    inner = (xx >= x0 + 3) & (xx <= x1 - 3) & (yy >= y0 + 3) & (yy <= y1 - 3)
    return (outer & ~inner).astype(jnp.float32)


def polyline_mask(h: int, w: int, samples: jnp.ndarray) -> jnp.ndarray:
    """samples: (S, 2) of (col, row) dense curve samples -> (h, w) 0/1 mask
    of a thickness-3 cv2 stroke. cv2's thickness-3 lines are 5 px wide with
    round caps/joins (half-width rounds outward to 2, same measurement as
    box_outline_mask), so a dense-sample curve's stroke is the dilation of
    the scattered samples by a radius-2 disk."""
    cols = jnp.clip(samples[:, 0].astype(jnp.int32), 0, w - 1)
    rows = jnp.clip(samples[:, 1].astype(jnp.int32), 0, h - 1)
    base = jnp.zeros((h, w), jnp.bool_).at[rows, cols].set(True, mode="drop")
    # dilation by the radius-2 disk as an OR of its 13 static shifts: a C=1
    # 5x5 conv is degenerate on the TPU conv unit (trace: 1.4 ms + a 1.1 ms
    # layout copy per train round at b8 448^2); the shifted-slice max fuses
    # into one elementwise kernel. Bit-identical to conv > 0.
    pad = jnp.pad(base, 2)
    acc = base
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            if dy * dy + dx * dx <= 4 and (dy, dx) != (0, 0):
                acc = acc | pad[2 + dy: 2 + dy + h, 2 + dx: 2 + dx + w]
    return acc.astype(jnp.float32)


def draw_box_into_coords(coords: jnp.ndarray, boxes: jnp.ndarray,
                         num_points: int) -> jnp.ndarray:
    """coords: (B, H, W, 2) pos/neg disk channels; boxes: (B, 5) with the
    last entry the slot index (< num_points -> positive channel).
    Matches ISModel.draw_box (is_model.py:97-121)."""
    b, h, w, _ = coords.shape

    def one(coord, box):
        # cast the 0/1 mask to the coord dtype (exact): maximum() would
        # otherwise promote the coord channels to f32, and that f32 leaks
        # through the coord patch-embed `x + additional` into EVERY ViT
        # block — the whole bf16 train step silently ran f32 (found by the
        # round-3 train trace; inference prompt_type=0 never hits this).
        mask = box_outline_mask(h, w, (box[0], box[1], box[2], box[3]))
        ch = (box[4] >= num_points).astype(jnp.int32)   # 0 = pos, 1 = neg
        sel = jax.nn.one_hot(ch, 2, dtype=coord.dtype)  # (2,)
        drawn = jnp.maximum(coord, mask[:, :, None].astype(coord.dtype))
        return coord * (1 - sel) + drawn * sel

    return jax.vmap(one)(coords, boxes.astype(jnp.float32))


def draw_scribble_into_coords(coords: jnp.ndarray,
                              scribbles: jnp.ndarray) -> jnp.ndarray:
    """scribbles: (B, S, 2) (col, row) samples; drawn into the positive
    channel (is_model.py:123-146 always writes channel 0)."""
    b, h, w, _ = coords.shape

    def one(coord, s):
        # same dtype discipline as draw_box_into_coords: 0/1 mask, exact cast
        mask = polyline_mask(h, w, s)
        pos = jnp.maximum(coord[:, :, 0], mask.astype(coord.dtype))
        return jnp.stack([pos, coord[:, :, 1]], axis=-1)

    return jax.vmap(one)(coords, scribbles.astype(jnp.float32))
