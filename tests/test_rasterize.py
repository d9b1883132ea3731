"""On-device prompt rasterization vs cv2 oracles (the reference draws these
with cv2 on the host, is_model.py:97-146). Pixel-exact, including cv2's
5-px-wide thickness-3 strokes and radius-2 round caps — the original 3-px
band was a real parity bug caught by the full-model box direct test."""
import cv2
import numpy as np
import jax.numpy as jnp

from pvpuformer_tpu.ops.rasterize import (box_outline_mask,
                                          draw_box_into_coords,
                                          polyline_mask)


def _cv2_box(h, w, xc, yc, bw, bh):
    img = np.zeros((h, w), np.uint8)
    x0, x1 = xc - bw // 2, xc + bw // 2
    y0, y1 = yc - bh // 2, yc + bh // 2
    cv2.rectangle(img, (x0, y0), (x1, y1), 255, 3)
    return (img > 0).astype(np.float32)


def test_box_outline_matches_cv2_exactly():
    cases = [(100, 112, 80, 60), (20, 20, 30, 18), (90, 120, 15, 64)]
    for yc_xc in cases:
        xc, yc, bw, bh = yc_xc[1], yc_xc[0], yc_xc[2], yc_xc[3]
        ref = _cv2_box(128, 160, xc, yc, bw, bh)
        ours = np.asarray(box_outline_mask(
            128, 160, tuple(jnp.asarray(v, jnp.float32)
                            for v in (xc, yc, bw, bh))))
        np.testing.assert_array_equal(ours, ref, err_msg=str(yc_xc))


def test_polyline_matches_cv2_exactly():
    for seed in range(3):
        r = np.random.default_rng(seed)
        t = np.linspace(0, 1, 1000)
        xs = 15 + 90 * t + 5 * np.sin(t * 7 + seed)
        ys = 20 + 50 * t * r.uniform(0.5, 1.0) + 20 * np.sin(t * 4)
        img = np.zeros((96, 128), np.uint8)
        curve = np.column_stack((xs.astype(np.int32), ys.astype(np.int32)))
        ref = (cv2.polylines(img, [curve], False, 255, 3) > 0).astype(np.float32)
        ours = np.asarray(polyline_mask(
            96, 128, jnp.asarray(np.column_stack((xs, ys)), jnp.float32)))
        np.testing.assert_array_equal(ours, ref, err_msg=f"seed {seed}")


def test_draw_box_channel_select_and_or():
    coords = np.zeros((2, 64, 64, 2), np.float32)
    coords[0, 10:14, 10:14, 0] = 1.0          # existing disk must survive
    boxes = np.array([[32, 30, 20, 16, 1],     # slot 1 < n=4 -> pos channel
                      [32, 30, 20, 16, 6]],    # slot 6 >= 4 -> neg channel
                     np.float32)
    out = np.asarray(draw_box_into_coords(jnp.asarray(coords),
                                          jnp.asarray(boxes), 4))
    ref = _cv2_box(64, 64, 32, 30, 20, 16)
    np.testing.assert_array_equal(out[0, :, :, 0],
                                  np.maximum(ref, coords[0, :, :, 0]))
    assert out[0, :, :, 1].sum() == 0
    np.testing.assert_array_equal(out[1, :, :, 1], ref)
    assert out[1, :, :, 0].sum() == 0
