"""Visualization helpers vs their cv2 oracles (isegm/utils/vis.py formulas).

The package implements vis in numpy/PIL; these tests pin the pixel-level
behavior against the cv2 calls the reference uses.
"""
from __future__ import annotations

import numpy as np
import pytest

from pvpuformer_tpu.utils.vis import (annotate_iou_noc, draw_heatmap,
                                      draw_with_error, error_map, eval_panel,
                                      get_boundaries, visualize_instances)

cv2 = pytest.importorskip("cv2")


def _rand_instances(seed, h=40, w=56, n_obj=3):
    r = np.random.default_rng(seed)
    imask = np.zeros((h, w), np.int32)
    for k in range(1, n_obj + 1):
        cy, cx = r.integers(5, h - 5), r.integers(5, w - 5)
        ry, rx = r.integers(3, 9), r.integers(3, 9)
        yy, xx = np.mgrid[:h, :w]
        imask[((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1] = k
    return imask


def _ref_boundaries(imask, width=1):
    """vis.py:103-116 verbatim (cv2 erode with the 3x3 MORPH_ELLIPSE)."""
    boundaries = np.zeros(imask.shape[:2], bool)
    for obj_id in np.unique(imask):
        if obj_id == 0:
            continue
        obj = imask == obj_id
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        inner = cv2.erode(obj.astype(np.uint8), kernel,
                          iterations=width).astype(bool)
        boundaries |= obj ^ (inner & obj)
    return boundaries


@pytest.mark.parametrize("width", [1, 2])
@pytest.mark.parametrize("seed", [0, 3])
def test_get_boundaries_matches_cv2(seed, width):
    imask = _rand_instances(seed)
    np.testing.assert_array_equal(get_boundaries(imask, width),
                                  _ref_boundaries(imask, width))


def test_get_boundaries_touches_border():
    """cv2.erode treats out-of-image neighbours as foreground (BORDER
    replicate of the constant max) — an object hugging the border keeps its
    border pixels out of the boundary set only where the in-image
    neighbourhood survives; pin against cv2 directly."""
    imask = np.zeros((9, 9), np.int32)
    imask[:4, :5] = 1
    np.testing.assert_array_equal(get_boundaries(imask), _ref_boundaries(imask))


def test_visualize_instances_palette_and_boundary():
    imask = _rand_instances(1)
    out = visualize_instances(imask, bg_color=255,
                              boundaries_color=(0, 0, 0))
    assert out.dtype == np.uint8 and out.shape == (*imask.shape, 3)
    assert np.all(out[imask == 0] == 255)           # bg_color
    b = get_boundaries(imask)
    # boundary pixels pulled strongly toward black (alpha 0.8)
    assert out[b].mean() < out[(imask > 0) & ~b].mean()


def test_error_map_pixels():
    gt = np.array([[1, 1, 0], [0, 0, 0]], np.int32)
    pred = np.array([[1, 0, 1], [0, 0, 0]], bool)
    em = error_map(gt, pred)
    assert tuple(em[0, 1]) == (255, 0, 0)     # FN red
    assert tuple(em[0, 2]) == (0, 0, 255)     # FP blue
    assert tuple(em[0, 0]) == (0, 0, 0)       # correct fg -> black
    assert tuple(em[1, 0]) == (0, 0, 0)       # correct bg -> black


def test_draw_with_error_prompt_overlays():
    gt = np.zeros((32, 32), np.int32)
    gt[8:24, 8:24] = 1
    pred = np.zeros((32, 32), bool)
    box = np.array([16, 16, 10, 10, 0])
    out = draw_with_error(gt, pred, boxes=box, prompt_type=1)
    assert (out == (192, 0, 0)).all(axis=-1).any()      # box stroke color
    scr = np.stack([np.linspace(9, 22, 50), np.full(50, 16.0)], axis=1)
    out2 = draw_with_error(gt, pred, scribbles=scr, prompt_type=2)
    assert (out2 == (192, 0, 0)).all(axis=-1).any()


def test_draw_heatmap_blend():
    img = np.full((8, 8, 3), 10, np.uint8)
    mask = np.zeros((8, 8), np.int32)
    mask[2, 2] = 1
    out = draw_heatmap(img, mask)
    assert out.dtype == np.uint8
    assert out[2, 2, 0] > out[0, 0, 0]        # hot spot brighter in red


def test_annotate_and_eval_panel_shapes():
    r = np.random.default_rng(0)
    image = (r.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
    gt = _rand_instances(2, 48, 64, 1).clip(0, 1)
    probs = r.uniform(size=(48, 64)).astype(np.float32)
    stamped = annotate_iou_noc(np.zeros((48, 64, 3), np.uint8), 0.5, 3)
    assert stamped.any(), "text stamp rendered no pixels"
    clicks = np.array([[10.0, 12.0, 0.0], [-1, -1, -1]], np.float32)
    panel = eval_panel(image, gt, probs, iou=0.42, click_indx=1,
                       clicks_list=clicks,
                       boxes=np.array([30, 20, 12, 10, 0]), prompt_type=1)
    assert panel.shape == (2 * 48, 3 * 64, 3) and panel.dtype == np.uint8


def test_draw_probmap_matches_cv2_hot():
    """draw_probmap now renders COLORMAP_HOT (vis.py:61); cv2 builds the
    LUT by interpolating a 64-entry base table, our ramp is the
    piecewise-linear fit — bound the difference tightly."""
    from pvpuformer_tpu.utils.vis import draw_probmap

    probs = np.linspace(0, 1, 256, dtype=np.float32).reshape(16, 16)
    got = draw_probmap(probs).astype(np.int32)
    want = cv2.applyColorMap((probs * 255).astype(np.uint8),
                             cv2.COLORMAP_HOT)[..., ::-1].astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 9, diff.max()
    assert diff.mean() < 2.0, diff.mean()
    # endpoints exact: black and white
    np.testing.assert_array_equal(got[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(got[-1, -1], [255, 255, 255])


@pytest.mark.parametrize("order,marker", [
    (0, cv2.MARKER_CROSS), (1, cv2.MARKER_DIAMOND), (2, cv2.MARKER_STAR),
    (3, cv2.MARKER_TRIANGLE_UP), (4, cv2.MARKER_SQUARE),
    (7, cv2.MARKER_SQUARE)])
def test_draw_points_order_markers_match_cv2(order, marker):
    """vis.py:65-86: click-order markers, pixel-exact vs cv2.drawMarker
    (markerSize=4, thickness=1)."""
    from pvpuformer_tpu.utils.vis import draw_points

    img = np.zeros((21, 21, 3), np.uint8)
    got = draw_points(img, [(10.0, 12.0, float(order))], (0, 255, 0))

    want = np.zeros((21, 21, 3), np.uint8)
    cv2.drawMarker(want, (12, 10), (0, 255, 0), marker, 4, 1)
    np.testing.assert_array_equal(got, want)


def test_draw_points_disks_and_skips():
    """2-element points draw disks (vis.py:80-82); negative rows skipped."""
    from pvpuformer_tpu.utils.vis import draw_points

    img = np.zeros((30, 30, 3), np.uint8)
    got = draw_points(img, [(15.0, 15.0), (-1.0, -1.0)], (255, 0, 0),
                      radius=3)
    want = np.zeros((30, 30, 3), np.uint8)
    cv2.circle(want, (15, 15), 3, (255, 0, 0), -1)
    np.testing.assert_array_equal(got, want)


def test_blend_and_clicks_order_markers_mode():
    """order_markers=True renders markers from the (2N, 3) array form (the
    trainer dump path, reference trainer.py:584-585); default stays disks."""
    from pvpuformer_tpu.utils.vis import draw_with_blend_and_clicks

    img = np.full((32, 32, 3), 80, np.uint8)
    pts = np.full((4, 3), -1.0, np.float32)
    pts[0] = (10, 10, 0)   # positive, first click -> cross
    pts[2] = (20, 20, 1)   # negative, second click -> diamond
    out = draw_with_blend_and_clicks(img, clicks_list=pts, order_markers=True)

    want = np.full((32, 32, 3), 80, np.uint8)
    cv2.drawMarker(want, (10, 10), (0, 255, 0), cv2.MARKER_CROSS, 4, 1)
    cv2.drawMarker(want, (20, 20), (255, 0, 0), cv2.MARKER_DIAMOND, 4, 1)
    np.testing.assert_array_equal(out, want)

    disks = draw_with_blend_and_clicks(img, clicks_list=pts)
    assert (disks == (0, 255, 0)).all(axis=-1).sum() > 20  # radius-4 disk
