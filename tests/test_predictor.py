"""End-to-end interactive loop tests on a tiny model + synthetic data:
click placement parity, zoom-in ROI behavior, NoC machinery, undo."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pvpuformer_tpu.inference.predictor import (PredictorConfig, Predictor,
                                                init_session, click_step)
from pvpuformer_tpu.inference.evaluation import (evaluate_dataset,
                                                 compute_noc_metric,
                                                 mean_iou_per_click,
                                                 get_results_table, get_iou)
from pvpuformer_tpu.inference.datasets import SyntheticDataset
from pvpuformer_tpu.models.vpu import init_vpu
from test_models import tiny_cfg


@pytest.fixture(scope="module")
def predictor():
    cfg = PredictorConfig(model=tiny_cfg(), target_size=(64, 64),
                          canvas_bucket=32)
    params = init_vpu(jax.random.PRNGKey(0), cfg.model)
    return Predictor(params, cfg)


def test_first_click_lands_at_gt_edt_center(predictor):
    """With an empty prediction, the first click must be the exact-EDT center
    of the gt object (clicker semantics)."""
    import cv2
    ds = SyntheticDataset(1, hw=(60, 90))
    s = ds.get_sample(0)
    gt = s.gt_mask(0)
    predictor.set_input(s.image, gt)
    predictor.next_click()
    clicks = predictor.clicks
    n = predictor.cfg.model.num_max_points
    assert clicks[0, 2] == 0          # first positive slot used
    assert np.all(clicks[1:, 2] == -1)

    dt = cv2.distanceTransform(np.pad(gt.astype(np.uint8), 1), cv2.DIST_L2, 0)[1:-1, 1:-1]
    ys, xs = np.where(dt == dt.max())
    assert (int(clicks[0, 0]), int(clicks[0, 1])) == (int(ys[0]), int(xs[0]))


def test_click_polarity_tracks_error_masks(predictor):
    """Force a huge false-positive prediction; the next click must be negative."""
    ds = SyntheticDataset(2, hw=(60, 90))
    s = ds.get_sample(1)
    gt = s.gt_mask(0)
    predictor.set_input(s.image, gt)
    st = predictor.state
    # fake previous prediction: everything predicted positive
    fake = jnp.ones_like(st.prev_probs) * 0.9
    # keep padding at zero like a real paste-back would
    h, w = gt.shape
    mask = np.zeros(fake.shape, np.float32)
    mask[0, :h, :w, 0] = 1
    predictor.state = st._replace(prev_probs=fake * jnp.asarray(mask))
    predictor.next_click()
    clicks = predictor.clicks
    n = predictor.cfg.model.num_max_points
    assert np.all(clicks[:n, 2] == -1)       # no positive click
    assert clicks[n, 2] >= 0                 # negative slot used
    y, x = int(clicks[n, 0]), int(clicks[n, 1])
    assert gt[y, x] == 0                     # clicked inside the FP region


def test_session_loop_runs_and_fills_slots(predictor):
    ds = SyntheticDataset(1, hw=(60, 90))
    s = ds.get_sample(0)
    predictor.set_input(s.image, s.gt_mask(0))
    ious = [predictor.next_click() for _ in range(5)]
    assert len(ious) == 5
    assert all(0.0 <= v <= 1.0 for v in ious)
    assert int(predictor.state.click_count) == 5
    # undo restores state
    predictor.undo_click()
    assert int(predictor.state.click_count) == 4
    # probs confined to the valid extent
    assert predictor.probs.shape == (60, 90)


def test_roi_starts_full_image_then_tracks_object(predictor):
    ds = SyntheticDataset(1, hw=(60, 90))
    s = ds.get_sample(0)
    predictor.set_input(s.image, s.gt_mask(0))
    predictor.next_click()
    roi = np.asarray(predictor.state.roi)
    # first click: empty prev mask -> full (valid) image ROI
    np.testing.assert_array_equal(roi, [0, 59, 0, 89])


def test_evaluate_dataset_and_noc_machinery(predictor):
    ds = SyntheticDataset(2, hw=(60, 90))
    all_ious, elapsed = evaluate_dataset(ds, predictor, max_iou_thr=2.0,
                                         max_clicks=3)
    assert len(all_ious) == 2
    assert all(len(a) == 3 for a in all_ious)

    # NoC computation matches a hand-rolled oracle
    curves = [np.array([0.5, 0.86, 0.97]), np.array([0.91, 0.95, 0.99])]
    noc, std, over = compute_noc_metric(curves, [0.85, 0.9], max_clicks=3)
    assert noc[0] == (2 + 1) / 2      # first curve reaches .85 at click 2
    assert noc[1] == (3 + 1) / 2
    assert over == [0, 1]

    miou = mean_iou_per_click(curves, max_clicks=4)
    assert miou.shape == (4,)
    assert np.isclose(miou[3], (0.97 + 0.99) / 2)

    header, row = get_results_table([1.0, 2.0, 3.0, 4.0], [0, 1, 2, 3],
                                    "NoBRS", "Synthetic", 0.01, elapsed)
    assert "NoC@90%" in header and "NoBRS" in row


def test_fixed_shapes_across_images(predictor):
    """Different image sizes in the same bucket reuse one compiled step."""
    ds = SyntheticDataset(1, hw=(60, 90))
    predictor.set_input(ds.get_sample(0).image, ds.get_sample(0).gt_mask(0))
    shape1 = predictor.state.image.shape
    ds2 = SyntheticDataset(1, hw=(50, 70), seed=3)
    predictor.set_input(ds2.get_sample(0).image, ds2.get_sample(0).gt_mask(0))
    shape2 = predictor.state.image.shape
    assert shape1 == (1, 64, 96, 3)
    assert shape2 == (1, 64, 96, 3)   # same bucket -> same compiled program


def test_prompt_mode_box_and_scribble():
    """Eval-time box/scribble prompt synthesis (get_vqu_prediction's
    as_multi_prompts path, base.py:166-177) runs fused and finite."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
    from pvpuformer_tpu.models.vpu import init_vpu
    import jax
    from test_models import tiny_cfg

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    r = np.random.default_rng(0)
    image = (r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    gt = np.zeros((64, 64), np.float32)
    gt[16:48, 20:52] = 1.0

    for mode in (1, 2):
        cfg = PredictorConfig(model=mcfg, target_size=(64, 64),
                              min_crop_size=32, prompt_mode=mode)
        pred = Predictor(params, cfg)
        pred.set_input(image, gt)
        iou = pred.next_click()
        assert np.isfinite(iou) and 0.0 <= iou <= 1.0
        iou2 = pred.next_click()
        assert np.isfinite(iou2)


def test_limit_longest_side():
    import dataclasses
    import numpy as np
    import jax
    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
    from pvpuformer_tpu.models.vpu import init_vpu
    from test_models import tiny_cfg

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32,
                          limit_longest_side=96)
    pred = Predictor(params, cfg)
    r = np.random.default_rng(0)
    image = (r.uniform(size=(100, 160, 3)) * 255).astype(np.uint8)
    gt = np.zeros((100, 160), np.float32)
    gt[30:70, 40:120] = 1.0
    pred.set_input(image, gt)
    # longest side capped at 96 -> image resized to (60, 96)
    assert int(pred.state.img_h) == 60 and int(pred.state.img_w) == 96
    iou = pred.next_click()
    assert np.isfinite(iou)
    assert pred.probs.shape == (60, 96)


def test_tiled_forward_blends():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.inference.tiled import tiled_forward
    from pvpuformer_tpu.models.vpu import init_vpu, vpu_forward
    from test_models import tiny_cfg

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    r = np.random.default_rng(0)
    img = jnp.asarray(r.uniform(size=(1, 96, 128, 4)).astype(np.float32))
    pts = jnp.full((1, 12, 3), -1.0).at[0, 0].set(jnp.asarray([50.0, 60.0, 0]))
    out = tiled_forward(params, mcfg, img, pts, crop_size=(64, 64),
                        min_overlap=0.25)
    assert out.shape == (1, 96, 128, 1)
    assert np.isfinite(np.asarray(out)).all()

    # a tile-sized image equals the plain forward
    img2 = img[:, :64, :64]
    t = np.asarray(tiled_forward(params, mcfg, img2, pts,
                                 crop_size=(64, 64)))
    d = np.asarray(vpu_forward(params, mcfg, img2, pts,
                               prompt_type=0)["instances"])
    np.testing.assert_allclose(t, d, atol=1e-4)


def test_sam_compat_gating():
    from pvpuformer_tpu.inference.sam_compat import (sam_available,
                                                     SamCompatPredictor)
    import pytest as _pytest
    if not sam_available():
        with _pytest.raises(ImportError):
            SamCompatPredictor()


def test_golden_click_trajectory():
    """Golden-file regression of the fused click loop (SURVEY §4 item 2):
    fixed weights + image -> the 5-click trajectory (coords, orders, IoUs)
    must not drift. Regenerate tests/golden_click_loop.json deliberately if
    semantics change (document why in the commit)."""
    import json
    from pathlib import Path
    import numpy as np
    import jax
    from pvpuformer_tpu.models.vpu import init_vpu
    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
    from test_models import tiny_cfg

    golden = json.load(open(Path(__file__).parent / "golden_click_loop.json"))
    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32)
    pred = Predictor(params, cfg)
    r = np.random.default_rng(7)
    image = (r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    gt = np.zeros((64, 64), np.float32)
    gt[14:50, 18:46] = 1.0
    pred.set_input(image, gt)
    ious = [pred.next_click() for _ in range(5)]
    np.testing.assert_allclose(ious, golden["ious"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred.clicks),
                               np.asarray(golden["clicks"]), atol=1e-4)


def test_skip_clicks_delays_zoom_in():
    """skip_clicks=K keeps the full-image ROI until click K+1
    (zoom_in.py:33-38; cvpr mode uses -1 = zoom from the first click)."""
    import numpy as np
    import jax
    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
    from pvpuformer_tpu.models.vpu import init_vpu
    from test_models import tiny_cfg

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    r = np.random.default_rng(0)
    image = (r.uniform(size=(96, 96, 3)) * 255).astype(np.uint8)
    gt = np.zeros((96, 96), np.float32)
    gt[30:60, 30:60] = 1.0

    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=16,
                          zoom_prob_thresh=0.0, skip_clicks=2)
    pred = Predictor(params, cfg)
    pred.set_input(image, gt)
    pred.next_click()
    roi1 = np.asarray(pred.state.roi)
    # clicks 1..2: ROI must span the full image
    assert roi1[0] == 0 and roi1[2] == 0
    assert roi1[1] == 95 and roi1[3] == 95
    pred.next_click()
    pred.next_click()          # click 3 > skip_clicks -> zoom may engage
    assert int(pred.state.click_count) == 3


def test_cfr_cascade_forward():
    """CFR-ICL cascade (base.py:59-72): cascade_step re-feeds the prediction;
    adaptive mode stops early on <20 changed pixels."""
    import numpy as np
    import jax
    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
    from pvpuformer_tpu.models.vpu import init_vpu
    from test_models import tiny_cfg

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    r = np.random.default_rng(0)
    image = (r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    gt = np.zeros((64, 64), np.float32)
    gt[16:48, 20:52] = 1.0

    base = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32)
    for cfg in (base.__class__(**{**base.__dict__, "cascade_step": 3,
                                  "cascade_clicks": 2}),
                base.__class__(**{**base.__dict__, "cascade_step": 3,
                                  "cascade_adaptive": True,
                                  "cascade_clicks": 2})):
        pred = Predictor(params, cfg)
        pred.set_input(image, gt)
        i1 = pred.next_click()
        i2 = pred.next_click()
        i3 = pred.next_click()   # beyond cascade_clicks -> single forward
        assert np.isfinite([i1, i2, i3]).all()


def test_net_clicks_limit_truncates_net_input():
    """net_clicks_limit=K feeds only the first K clicks to the network
    (base.py:200-205): K = total clicks is a no-op (bit-equal probs);
    K=1 diverges from unlimited after the second click while the click
    sequence itself (driven by the full state) stays intact."""
    mcfg = tiny_cfg()
    params = init_vpu(jax.random.PRNGKey(0), mcfg)
    ds = SyntheticDataset(1, hw=(60, 90))
    s = ds.get_sample(0)

    def run(limit, n_clicks=3):
        cfg = PredictorConfig(model=mcfg, target_size=(64, 64),
                              canvas_bucket=32, net_clicks_limit=limit)
        p = Predictor(params, cfg)
        p.set_input(s.image, s.gt_mask(0))
        probs = []
        for _ in range(n_clicks):
            p.next_click()
            probs.append(p.probs.copy())
        return np.asarray(p.state.points[0]), probs

    pts_none, probs_none = run(None)
    pts_all, probs_all = run(3)
    np.testing.assert_array_equal(pts_none, pts_all)
    for a, b in zip(probs_none, probs_all):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pts_one, probs_one = run(1)
    # click 1 identical; later rounds see a truncated net input
    np.testing.assert_array_equal(np.asarray(probs_none[0]),
                                  np.asarray(probs_one[0]))
    assert np.any(np.asarray(probs_none[-1]) != np.asarray(probs_one[-1]))
    # the session still accumulated 3 clicks (state is not truncated)
    assert np.sum(pts_one[:, 2] >= 0) == 3


def test_golden_prompt_protocols():
    """Golden-file regression of the box/scribble prompt protocols
    (VERDICT r3 #6): the bit-exact certification vs the reference's own
    eval loop lives in the slow test_reference_direct protocol tests; this
    fast pin catches a drift without torch or /root/reference mounted.

    Pins, per (prompt_mode, as_multi_prompts) variant: 4-click IoU curves,
    per-click mean probabilities (prompt-path-sensitive where thresholded
    IoU saturates on random weights), and the click tensors — plus
    fixed-input outputs of the synthesis primitives themselves
    (synth_boxes / _append_error_click / _rewrite_points_* /
    synth_scribbles). Regenerate DELIBERATELY with
    scripts/regen_goldens.py --only prompt and explain in the commit."""
    import json
    from pathlib import Path
    import numpy as np
    from scripts.regen_goldens import _session_golden, _synth_golden
    from test_models import tiny_cfg

    golden = json.load(open(Path(__file__).parent /
                            "golden_prompt_loop.json"))

    sessions = _session_golden(
        tiny_cfg, [("mode1_multi", 1, True), ("mode1_points", 1, False),
                   ("mode2_multi", 2, True), ("mode2_points", 2, False)])
    for name, want in golden["sessions"].items():
        got = sessions[name]
        np.testing.assert_allclose(got["ious"], want["ious"], atol=1e-4,
                                   err_msg=f"{name}: IoU curve")
        np.testing.assert_allclose(got["prob_means"], want["prob_means"],
                                   atol=1e-4, err_msg=f"{name}: prob means")
        np.testing.assert_allclose(got["clicks"], want["clicks"], atol=1e-4,
                                   err_msg=f"{name}: click tensor")

    synth = _synth_golden()
    for key, want in golden["synth"].items():
        atol = 2e-3 if key == "scribble_curve" else 1e-4
        np.testing.assert_allclose(np.asarray(synth[key], np.float64),
                                   np.asarray(want, np.float64), atol=atol,
                                   err_msg=f"synth: {key}")
