"""Oracle tests: on-device kernels vs trusted host reimplementations
(cv2 exact EDT, torch interpolate, numpy reference-formula loops)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pvpuformer_tpu.ops import (disk_maps, dist_maps, ppue_click, ppue_box,
                                PPuEConfig, squared_edt, next_click_from_error,
                                bilinear_resize, roi_crop_resize, roi_paste_back,
                                bicubic_resize_numpy)
import oracles


def rng(seed=0):
    return np.random.default_rng(seed)


# --------------------------------------------------------------------- disks

@pytest.mark.parametrize("use_disks", [True, False])
def test_dist_maps_matches_reference_math(use_disks):
    r = rng(1)
    b, n = 3, 5
    pts = r.uniform(-2, 64, size=(b, 2 * n, 3)).astype(np.float32)
    pts[:, :, 2] = r.integers(-1, 4, size=(b, 2 * n))
    # some fully-invalid points
    pts[0, 1, :2] = (-1, -1)
    pts[1, n:, :2] = (-1, -1)

    ours = np.asarray(dist_maps(jnp.asarray(pts), 48, 56, use_disks=use_disks))
    ref = oracles.disk_maps_oracle(pts, 48, 56, use_disks=use_disks)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


# ---------------------------------------------------------------------- PPuE

def test_ppue_click_matches_reference_loops():
    r = rng(2)
    cfg = PPuEConfig(input_h=64, input_w=64)
    b, n = 2, 6
    pts = r.uniform(0, 64, size=(b, 2 * n, 3)).astype(np.float32)
    pts[:, :, 2] = r.integers(0, 5, size=(b, 2 * n))
    pts[0, 3] = (-1, -1, -1)
    pts[1, n + 2] = (-1, -1, -1)
    # edge clicks
    pts[0, 0, :2] = (0, 0)
    pts[0, 1, :2] = (63, 63)
    pts[1, 0, :2] = (2, 60)

    ours = np.asarray(ppue_click(jnp.asarray(pts), cfg, num_max_points=8))
    ref = oracles.ppue_click_oracle(pts, 64, 64, num_max_points=8)
    assert ours.shape == (b, 16, 64 + 64 + 3)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ppue_box_matches_reference_loops():
    r = rng(3)
    cfg = PPuEConfig(input_h=64, input_w=64)
    b, n = 3, 4
    pts = r.uniform(0, 64, size=(b, 2 * n, 3)).astype(np.float32)
    pts[:, :, 2] = 1
    boxes = np.stack([
        [30, 30, 20, 16, 0],      # normal box, positive slot
        [10, 50, 40, 30, n + 1],  # negative slot
        [0, 0, 0, 0, 0],          # null box
    ]).astype(np.float32)

    ours = np.asarray(ppue_box(jnp.asarray(pts), jnp.asarray(boxes), cfg))
    ref = oracles.ppue_click_oracle(pts, 64, 64)
    for bi in range(b):
        v0, v1 = oracles.box_vector_oracle(boxes[bi, :4], 64, 64)
        lbl = np.zeros(3, np.float32)
        lbl[0 if boxes[bi, 4] < n else 1] = 1.0
        ref[bi, int(boxes[bi, 4])] = np.concatenate([v0, v1, lbl])
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ppue_box_tiny_box_is_zero_profile():
    cfg = PPuEConfig(input_h=64, input_w=64)
    pts = np.full((1, 8, 3), -1, np.float32)
    boxes = np.array([[20, 20, 5, 5, 2]], np.float32)   # sigma = (5//2*2-1-1)//2//3 = 0
    ours = np.asarray(ppue_box(jnp.asarray(pts), jnp.asarray(boxes), cfg))
    assert np.all(ours[0, 2, :-3] == 0)
    assert ours[0, 2, -3] == 1.0   # still labeled positive


# ----------------------------------------------------------------------- EDT

def _cv2_edt(mask):
    import cv2
    m = np.pad(mask.astype(np.uint8), 1)
    d = cv2.distanceTransform(m, cv2.DIST_L2, 0)[1:-1, 1:-1]
    return d


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_squared_edt_matches_cv2_exact(seed):
    r = rng(seed)
    mask = r.random((37, 53)) > 0.4
    ours = np.asarray(squared_edt(jnp.asarray(mask)))
    ref = _cv2_edt(mask)
    np.testing.assert_allclose(np.sqrt(ours), ref, atol=1e-3)


def test_squared_edt_border_and_blob():
    mask = np.zeros((20, 30), bool)
    mask[5:15, 10:25] = True
    ours = np.asarray(squared_edt(jnp.asarray(mask)))
    ref = _cv2_edt(mask)
    np.testing.assert_allclose(np.sqrt(ours), ref, atol=1e-3)
    # all-true mask: distances come from the virtual border
    mask = np.ones((8, 9), bool)
    ours = np.asarray(squared_edt(jnp.asarray(mask)))
    ref = _cv2_edt(mask)
    np.testing.assert_allclose(np.sqrt(ours), ref, atol=1e-3)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_squared_edt_dense_rows_bit_identical(seed):
    """rows="dense" (_col_dist2_dense min-plus pass 1, the batched-eval
    form) must be BIT-identical to the scan form — both exact integer
    distances in f32 — including all-true (border-only) and empty masks,
    and must match cv2's exact transform."""
    r = rng(seed)
    for mask in (r.random((37, 53)) > 0.4,
                 np.ones((8, 9), bool),
                 np.zeros((8, 9), bool),
                 np.pad(np.ones((30, 1), bool), ((0, 0), (10, 12)))):
        a = np.asarray(squared_edt(jnp.asarray(mask), rows="scan"))
        b = np.asarray(squared_edt(jnp.asarray(mask), rows="dense"))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_allclose(np.sqrt(b), _cv2_edt(mask), atol=1e-3)
        c = np.asarray(squared_edt(jnp.asarray(mask), rows="dense",
                                   chunk=None))
        np.testing.assert_array_equal(b, c)


def test_next_click_matches_clicker_semantics():
    """Replicates Clicker._get_next_click (clicker.py:29-56) on random masks."""
    r = rng(7)
    for _ in range(5):
        gt = r.random((40, 50)) > 0.5
        pred = r.random((40, 50)) > 0.5
        not_clicked = np.ones((40, 50), bool)
        not_clicked[r.integers(0, 40, 5), r.integers(0, 50, 5)] = False

        fn = np.logical_and(gt, ~pred)
        fp = np.logical_and(~gt, pred)
        fn_dt = _cv2_edt(fn) * not_clicked
        fp_dt = _cv2_edt(fp) * not_clicked
        is_pos_ref = fn_dt.max() > fp_dt.max()
        dt = fn_dt if is_pos_ref else fp_dt
        ys, xs = np.where(dt == dt.max())
        y_ref, x_ref = ys[0], xs[0]

        is_pos, y, x, _ = next_click_from_error(
            jnp.asarray(fn), jnp.asarray(fp), jnp.asarray(not_clicked))
        assert bool(is_pos) == bool(is_pos_ref)
        assert (int(y), int(x)) == (int(y_ref), int(x_ref))


# -------------------------------------------------------------------- resize

@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shapes", [((7, 9), (14, 18)), ((28, 28), (112, 112)),
                                    ((13, 5), (7, 11))])
def test_bilinear_resize_matches_torch(align, shapes):
    import torch
    import torch.nn.functional as F
    (h, w), (oh, ow) = shapes
    r = rng(4)
    x = r.standard_normal((2, h, w, 3)).astype(np.float32)
    ours = np.asarray(bilinear_resize(jnp.asarray(x), oh, ow, align_corners=align))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(oh, ow),
                        mode="bilinear", align_corners=align)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_roi_crop_resize_matches_torch_slice_interp():
    import torch
    import torch.nn.functional as F
    r = rng(5)
    x = r.standard_normal((1, 60, 80, 4)).astype(np.float32)
    rmin, rmax, cmin, cmax = 10, 39, 5, 64
    ours = np.asarray(roi_crop_resize(
        jnp.asarray(x),
        (jnp.int32(rmin), jnp.int32(rmax), jnp.int32(cmin), jnp.int32(cmax)),
        48, 48))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))[:, :, rmin:rmax + 1, cmin:cmax + 1]
    ref = F.interpolate(t, size=(48, 48), mode="bilinear", align_corners=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_roi_paste_back_matches_torch_interp_paste():
    import torch
    import torch.nn.functional as F
    r = rng(6)
    probs = r.random((1, 32, 32, 1)).astype(np.float32)
    rmin, rmax, cmin, cmax = 7, 50, 3, 58
    ours = np.asarray(roi_paste_back(
        jnp.asarray(probs),
        (jnp.int32(rmin), jnp.int32(rmax), jnp.int32(cmin), jnp.int32(cmax)),
        70, 90))
    t = torch.from_numpy(probs.transpose(0, 3, 1, 2))
    ref_roi = F.interpolate(t, size=(rmax - rmin + 1, cmax - cmin + 1),
                            mode="bilinear", align_corners=True).numpy()
    ref = np.zeros((1, 1, 70, 90), np.float32)
    ref[:, :, rmin:rmax + 1, cmin:cmax + 1] = ref_roi
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-4)


def test_bicubic_matches_torch():
    import torch
    import torch.nn.functional as F
    r = rng(8)
    x = r.standard_normal((2, 14, 14)).astype(np.float32)
    ours = bicubic_resize_numpy(x, 28, 28)
    ref = F.interpolate(torch.from_numpy(x)[None], size=(28, 28), mode="bicubic",
                        align_corners=False)[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pallas_edt_matches_xla():
    """ops/edt_pallas.minplus_rows path == the XLA min-plus path exactly
    (interpret mode on CPU; re-verified on TPU by scripts/profile runs)."""
    r = rng(11)
    for shape in [(37, 53), (64, 64), (16, 200)]:
        m = r.uniform(size=shape) > 0.6
        a = np.asarray(squared_edt(jnp.asarray(m), impl="xla"))
        b = np.asarray(squared_edt(jnp.asarray(m), impl="pallas"))
        np.testing.assert_array_equal(a, b)
