"""Data layer tests: augmentations, point sampler contract, scribble
synthesis, loader sharding, end-to-end record shapes."""
import numpy as np
import pytest

from pvpuformer_tpu.data import (MultiPointSampler, SyntheticTrainDataset,
                                 Loader, transforms as T)
from pvpuformer_tpu.data.scribbles import (bezier_multi, cal_scribble_single,
                                           batch_scribbles)


def rng(seed=0):
    return np.random.default_rng(seed)


# --------------------------------------------------------------- transforms

def test_pad_and_crop_shapes():
    r = rng(0)
    img = r.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    masks = (r.uniform(size=(2, 40, 60)) > 0.7).astype(np.int32)
    aug = T.Compose([T.PadIfNeeded(64, 64), T.RandomCrop(64, 64)])
    out_img, out_masks = aug(r, img, masks)
    assert out_img.shape == (64, 64, 3)
    assert out_masks.shape == (2, 64, 64)


def test_hflip_consistent():
    r = rng(1)
    img = r.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    masks = np.zeros((1, 8, 8), np.int32)
    masks[0, 2, 1] = 1
    out_img, out_masks = T.HorizontalFlip(p=1.0)(r, img, masks)
    assert out_masks[0, 2, 6] == 1
    np.testing.assert_array_equal(out_img, img[:, ::-1])


def test_resize_preserves_mask_ids():
    r = rng(2)
    img = r.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    masks = np.zeros((1, 32, 32), np.int32)
    masks[0, 8:24, 8:24] = 3
    _, out_masks = T.UniformRandomResize((1.3, 1.3))(r, img, masks)
    assert set(np.unique(out_masks)) <= {0, 3}
    assert out_masks.shape[1] == round(32 * 1.3)


def test_brightness_contrast_formula():
    img = np.full((4, 4, 3), 100, np.uint8)

    class FixedRng:
        def uniform(self, a=0.0, b=1.0):
            if (a, b) == (0.0, 1.0):
                return 0.0                  # always apply
            return b                        # max of the limit range
    out, _ = T.RandomBrightnessContrast((-0.25, 0.25), (-0.15, 0.4), p=1.0)(
        FixedRng(), img, np.zeros((1, 4, 4), np.int32))
    np.testing.assert_array_equal(out, np.clip(100 * 1.4 + 0.25 * 255, 0, 255)
                                  .astype(np.uint8))


# ------------------------------------------------------------ point sampler

def test_point_sampler_contract():
    n = 6
    sampler = MultiPointSampler(n, prob_gamma=0.8, merge_objects_prob=0.15,
                                max_num_merged_objects=2)
    yy, xx = np.mgrid[:64, :64]
    m1 = ((yy - 20) ** 2 + (xx - 20) ** 2 < 100).astype(np.int32)
    m2 = ((yy - 45) ** 2 + (xx - 45) ** 2 < 64).astype(np.int32)
    for seed in range(20):
        pts, target = sampler.sample(rng(seed), [m1, m2])
        assert pts.shape == (2 * n, 3)
        assert target.shape == (64, 64)
        assert target.sum() > 0
        # at least one positive click, inside the target
        assert pts[0, 2] >= 0
        for i in range(n):
            y, x, o = pts[i]
            if o >= 0:
                assert target[int(y), int(x)] == 1
        # negatives outside the target
        for i in range(n, 2 * n):
            y, x, o = pts[i]
            if o >= 0:
                assert target[int(y), int(x)] == 0


def test_point_sampler_merge_objects():
    sampler = MultiPointSampler(4, prob_gamma=0.8, merge_objects_prob=1.0,
                                max_num_merged_objects=2)
    m1 = np.zeros((32, 32), np.int32)
    m1[:8, :8] = 1
    m2 = np.zeros((32, 32), np.int32)
    m2[20:, 20:] = 1
    _, target = sampler.sample(rng(0), [m1, m2])
    assert target.sum() == m1.sum() + m2.sum()


# ------------------------------------------------------------------ scribbles

def test_point_sampler_matches_ritm_distributions():
    """Statistical validation against the RITM lineage's documented
    sampling distributions (the reference acknowledges RITM, README.md:128;
    `isegm/data/` itself was never published):

      * P(#pos = k) ∝ gamma^(k-1) for k in [1, N] and
        P(#neg = k) ∝ gamma^k for k in [0, N] (RITM generate_probs);
      * objects merge with probability merge_objects_prob, merged count
        uniform in [2, max_num_merged_objects];
      * each negative click picks a strategy from the configured
        (bg, other, border) mix.

    Chi-square-style bounds at 20k draws with a fixed seed.
    """
    gamma, n = 0.6, 6
    s = MultiPointSampler(n, prob_gamma=gamma, merge_objects_prob=0.3,
                          max_num_merged_objects=3,
                          negative_bg_prob=0.2, negative_other_prob=0.3,
                          negative_border_prob=0.5,
                          positive_erode_prob=0.0)
    h, w = 64, 96
    yy, xx = np.mgrid[:h, :w]
    # target far from 'other' so border/other/bg pools are disjoint
    target = (np.abs(yy - 20) <= 8) & (np.abs(xx - 24) <= 8)
    other = (np.abs(yy - 44) <= 6) & (np.abs(xx - 72) <= 6)
    masks = [target.astype(np.int32), other.astype(np.int32)]

    rng = np.random.default_rng(7)
    trials = 20000
    pos_counts = np.zeros(n + 1)
    neg_counts = np.zeros(n + 1)
    merged = 0
    strat_counts = np.zeros(3)        # bg / other / border
    from pvpuformer_tpu.data.points_sampler import _dilate
    import math as _m
    band = _dilate(target, max(1, int(0.1 * _m.sqrt(target.sum())))) & ~target

    both = target.sum() + other.sum()
    for _ in range(trials):
        pts, tgt = s.sample(rng, masks)
        kp = int((pts[:n, 2] >= 0).sum())
        kn = int((pts[n:, 2] >= 0).sum())
        pos_counts[kp] += 1
        neg_counts[kn] += 1
        if tgt.sum() == both:                  # objects merged (disjoint)
            merged += 1
            continue
        if not np.array_equal(tgt > 0.5, target):
            continue                           # sampler picked the other
        for y, x, o in pts[n:]:                # blob as target: pools shift
            if o < 0:
                continue
            iy, ix = int(y), int(x)
            if band[iy, ix]:
                strat_counts[2] += 1
            elif other[iy, ix]:
                strat_counts[1] += 1
            else:
                strat_counts[0] += 1

    # P(k) ∝ gamma^k
    expect_pos = gamma ** np.arange(n, dtype=np.float64)
    expect_pos /= expect_pos.sum()
    got_pos = pos_counts[1:] / pos_counts[1:].sum()
    np.testing.assert_allclose(got_pos, expect_pos, atol=0.02)
    expect_neg = gamma ** np.arange(n + 1, dtype=np.float64)
    expect_neg /= expect_neg.sum()
    got_neg = neg_counts / neg_counts.sum()
    np.testing.assert_allclose(got_neg, expect_neg, atol=0.02)

    # merge rate (2 objects -> merging always sums both)
    assert abs(merged / trials - 0.3) < 0.02

    # negative-strategy mix: border band is disjoint from other and bg by
    # construction, so location identifies the strategy (bg fallback only
    # when a pool is empty — never here)
    mix = strat_counts / strat_counts.sum()
    np.testing.assert_allclose(mix, [0.2, 0.3, 0.5], atol=0.03)


def test_bezier_multi_endpoints_and_linearity():
    ctrl = np.array([[0.0, 0.0], [10.0, 10.0]])
    out = bezier_multi(ctrl, 11)
    np.testing.assert_allclose(out[0], [0, 0], atol=1e-9)
    np.testing.assert_allclose(out[-1], [10, 10], atol=1e-9)
    np.testing.assert_allclose(out[5], [5, 5], atol=1e-9)


def test_scribble_inside_bbox():
    gt = np.zeros((64, 64), np.float32)
    gt[10:40, 15:50] = 1.0
    for seed in range(5):
        scr, rect = cal_scribble_single(rng(seed), gt)
        assert scr.shape == (1000, 2)
        # (x, y) = (col, row); clipped to the mask bbox
        assert scr[:, 1].min() >= 10 and scr[:, 1].max() <= 39
        assert scr[:, 0].min() >= 15 and scr[:, 0].max() <= 49
        # rect = (col_c, row_c, col_extent, row_extent)
        assert rect[2] == 49 - 15 and rect[3] == 39 - 10
        assert rect[0] == (15 + 49) // 2 and rect[1] == (10 + 39) // 2


def test_scribble_empty_mask():
    scr, rect = cal_scribble_single(rng(0), np.zeros((32, 32), np.float32))
    assert not scr.any() and not rect.any()


def test_batch_scribbles_shapes():
    gt = np.zeros((3, 48, 48), np.float32)
    gt[:, 10:30, 10:30] = 1.0
    scr, rects = batch_scribbles(rng(0), gt, num_samples=200)
    assert scr.shape == (3, 200, 2) and rects.shape == (3, 4)


# ------------------------------------------------------------------- dataset

def test_synthetic_dataset_records():
    ds = SyntheticTrainDataset(n_samples=4, hw=(64, 64),
                               augmentator=T.train_augmentator((64, 64)),
                               epoch_len=8)
    assert len(ds) == 8
    rec = ds[0]
    assert rec["image"].shape == (64, 64, 3)
    assert rec["image"].dtype == np.float32 and rec["image"].max() <= 1.0
    assert rec["instances"].shape == (64, 64, 1)
    assert rec["points"].shape == (12, 3)
    assert rec["scribbles"].shape == (1000, 2)
    assert rec["scribble_rects"].shape == (4,)
    # determinism per (seed, index)
    rec2 = ds[0]
    np.testing.assert_array_equal(rec["points"], rec2["points"])


def test_loader_sharding_covers_batch():
    ds = SyntheticTrainDataset(n_samples=16, hw=(48, 48), epoch_len=16)
    l0 = Loader(ds, batch_size=8, shuffle=True, seed=3, num_workers=2,
                process_index=0, process_count=2)
    l1 = Loader(ds, batch_size=8, shuffle=True, seed=3, num_workers=2,
                process_index=1, process_count=2)
    b0 = next(iter(l0))
    b1 = next(iter(l1))
    assert b0["image"].shape[0] == 4 and b1["image"].shape[0] == 4
    # different shards
    assert not np.allclose(b0["image"], b1["image"])
    assert len(l0) == 2


def test_cocolvis_disk_format(tmp_path):
    """End-to-end record assembly from the on-disk CocoLvis layout
    (hannotation.pickle + masks/<id>.pickle + images/<id>.jpg)."""
    import pickle
    from PIL import Image
    from pvpuformer_tpu.data import CocoLvisDataset, MultiPointSampler

    root = tmp_path / "cocolvis"
    (root / "train" / "images").mkdir(parents=True)
    (root / "train" / "masks").mkdir(parents=True)
    r = np.random.default_rng(0)
    anno = {}
    for iid in ("a", "b"):
        img = (r.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "train" / "images" / f"{iid}.jpg")
        layer = np.zeros((48, 64), np.int32)
        layer[8:24, 8:24] = 1
        layer[30:44, 30:60] = 2
        with open(root / "train" / "masks" / f"{iid}.pickle", "wb") as f:
            pickle.dump(layer[:, :, None], f)
        anno[iid] = {"num_instance_masks": 2,
                     "objs_mapping": [(0, 1), (0, 2)]}
    with open(root / "train" / "hannotation.pickle", "wb") as f:
        pickle.dump(anno, f)

    ds = CocoLvisDataset(root, split="train",
                         points_sampler=MultiPointSampler(4, prob_gamma=0.8),
                         epoch_len=4, min_object_area=10)
    assert ds.get_samples_number() == 2
    raw = ds.get_raw_sample(0)
    assert len(raw.masks) == 2 and raw.masks[0].sum() == 16 * 16
    rec = ds[0]
    assert rec["image"].shape == (48, 64, 3)
    assert rec["points"].shape == (8, 3)
    assert rec["instances"].sum() > 0


def test_sbd_disk_format(tmp_path):
    from scipy.io import savemat
    from PIL import Image
    from pvpuformer_tpu.data import SBDTrainDataset, MultiPointSampler

    root = tmp_path / "sbd"
    (root / "img").mkdir(parents=True)
    (root / "inst").mkdir(parents=True)
    r = np.random.default_rng(0)
    inst = np.zeros((32, 32), np.uint8)
    inst[4:12, 4:12] = 1
    inst[20:30, 20:30] = 2
    Image.fromarray((r.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)).save(
        root / "img" / "x.jpg")
    # GTinst mat structure: GTinst.Segmentation
    savemat(root / "inst" / "x.mat",
            {"GTinst": np.array([[(inst,)]],
                                dtype=[("Segmentation", object)])})
    (root / "train.txt").write_text("x\n")
    ds = SBDTrainDataset(root, split="train",
                         points_sampler=MultiPointSampler(4, prob_gamma=0.8))
    raw = ds.get_raw_sample(0)
    assert len(raw.masks) == 2


def test_eval_dataset_formats(tmp_path):
    """On-disk fixtures in each real dataset layout parse via get_dataset."""
    from PIL import Image
    from scipy.io import savemat
    from pvpuformer_tpu.inference.datasets import get_dataset

    r = np.random.default_rng(3)

    def img(p, h=80, w=100):
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(r.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(p)

    def mask(p, ignore=None, h=80, w=100):
        p.parent.mkdir(parents=True, exist_ok=True)
        m = np.zeros((h, w), np.uint8)
        m[20:60, 30:70] = 255
        if ignore is not None:
            m[20:22, 30:70] = ignore
        Image.fromarray(m).save(p)

    g = tmp_path / "GrabCut"
    img(g / "data_GT" / "pic1.bmp")
    mask(g / "boundary_GT" / "pic1.bmp", ignore=128)
    b = tmp_path / "Berkeley"
    img(b / "images" / "im1.jpg")
    mask(b / "masks" / "im1.png")
    d = tmp_path / "DAVIS"
    img(d / "img" / "f0.jpg")
    mask(d / "gt" / "f0.png")
    v = tmp_path / "VOC2012"
    img(v / "JPEGImages" / "2007_000001.jpg")
    so = np.zeros((80, 100), np.uint8)
    so[20:40, 30:70] = 1
    so[45:60, 30:70] = 2
    so[40:42, 30:70] = 255
    (v / "SegmentationObject").mkdir(parents=True)
    Image.fromarray(so).save(v / "SegmentationObject" / "2007_000001.png")
    (v / "ImageSets" / "Segmentation").mkdir(parents=True)
    (v / "ImageSets" / "Segmentation" / "val.txt").write_text("2007_000001\n")
    s = tmp_path / "SBD"
    img(s / "img" / "x1.jpg")
    inst = np.zeros((80, 100), np.uint8)
    inst[20:60, 30:70] = 1
    (s / "inst").mkdir(parents=True)
    savemat(str(s / "inst" / "x1.mat"),
            {"GTinst": np.array([[(inst,)]], dtype=[("Segmentation", "O")])})
    (s / "val.txt").write_text("x1\n")

    expect = {"GrabCut": (g, 1), "Berkeley": (b, 1), "DAVIS": (d, 1),
              "PascalVOC": (v, 2), "SBD": (s, 1)}
    for name, (root, n_objs) in expect.items():
        ds = get_dataset(name, root)
        assert len(ds) == 1, name
        sample = ds.get_sample(0)
        assert sample.image.shape == (80, 100, 3), name
        assert len(sample.objects_ids) == n_objs, name
        for oid in sample.objects_ids:
            gt = sample.gt_mask(oid)
            assert gt.shape == (80, 100) and gt.sum() > 0, (name, oid)
    # GrabCut ignore band maps to -1 in the raw mask
    raw = get_dataset("GrabCut", g).get_sample(0).masks[0]
    assert (raw == -1).any()


def test_extra_eval_dataset_formats(tmp_path):
    """BraTS/ssTEM/OAIZIB/HARD/ADE20K/SBD_Train layouts (inference/utils.py:
    56-73 dispatch names) parse via get_dataset."""
    from PIL import Image
    from scipy.io import savemat
    from pvpuformer_tpu.inference.datasets import get_dataset

    r = np.random.default_rng(7)

    def img(p, h=60, w=90):
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(r.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(p)

    def mask(p, vals=((slice(10, 40), slice(20, 60), 255),), h=60, w=90):
        p.parent.mkdir(parents=True, exist_ok=True)
        m = np.zeros((h, w), np.uint8)
        for sy, sx, v in vals:
            m[sy, sx] = v
        Image.fromarray(m).save(p)

    for name, idir, mdir in [("BraTS", "images", "masks"),
                             ("ssTEM", "raw", "mitochondria"),
                             ("HARD", "images", "masks")]:
        root = tmp_path / name
        img(root / idir / "s0.png")
        mask(root / mdir / "s0.png")
        ds = get_dataset(name, root)
        assert len(ds) == 1
        sample = ds.get_sample(0)
        assert sample.image.shape == (60, 90, 3)
        assert sample.gt_mask(sample.objects_ids[0]).sum() > 0, name

    o = tmp_path / "OAIZIB"
    img(o / "images" / "k0.png")
    mask(o / "masks" / "k0.png", vals=((slice(5, 20), slice(10, 40), 1),
                                       (slice(30, 50), slice(50, 80), 3)))
    sample = get_dataset("OAIZIB", o).get_sample(0)
    assert sorted(sample.objects_ids) == [1, 3]
    assert sample.gt_mask(3).sum() == 20 * 30

    a = tmp_path / "ADE"
    img(a / "images" / "validation" / "ADE_val_1.jpg")
    ann = np.zeros((60, 90, 3), np.uint8)
    ann[10:30, 10:40] = (12, 1, 0)   # class 12, instance 1
    ann[35:55, 50:80] = (12, 2, 0)   # class 12, instance 2
    ann[5:9, 60:85] = (7, 1, 0)      # class 7, instance 1 — instance ids
    (a / "annotations_instance" / "validation").mkdir(parents=True)  # are
    Image.fromarray(ann).save(                           # per-class in ADE
        a / "annotations_instance" / "validation" / "ADE_val_1.png")
    sample = get_dataset("ADE20K", a).get_sample(0)
    # keyed by (class, instance) = class*1000 + instance: same instance
    # number under different classes stays two separate objects
    assert sorted(sample.objects_ids) == [7001, 12001, 12002]
    assert sample.gt_mask(12001).sum() == 20 * 30
    assert sample.gt_mask(7001).sum() == 4 * 25

    s = tmp_path / "SBDT"
    img(s / "img" / "t1.jpg")
    inst = np.zeros((60, 90), np.uint8)
    inst[10:30, 10:40] = 1
    (s / "inst").mkdir(parents=True)
    savemat(str(s / "inst" / "t1.mat"),
            {"GTinst": np.array([[(inst,)]], dtype=[("Segmentation", "O")])})
    (s / "train.txt").write_text("t1\n")
    assert len(get_dataset("SBD_Train", s)) == 1
