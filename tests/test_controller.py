"""Interactive controller (demo state machine) + user-click step."""
import numpy as np
import jax

from pvpuformer_tpu.inference.controller import InteractiveController
from pvpuformer_tpu.inference.predictor import PredictorConfig
from pvpuformer_tpu.models.vpu import init_vpu

from test_models import tiny_cfg


def make_controller():
    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32)
    c = InteractiveController(params, cfg)
    r = np.random.default_rng(0)
    c.set_image((r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8))
    return c


def test_click_undo_and_finish_object():
    c = make_controller()
    c.add_click(30, 20, True)
    assert len(c.clicks_list) == 1
    p1 = c.current_object_prob
    assert p1.shape == (64, 64) and np.isfinite(p1).all()

    c.add_click(50, 40, False)
    assert len(c.clicks_list) == 2
    c.undo_click()
    assert len(c.clicks_list) == 1
    np.testing.assert_allclose(c.current_object_prob, p1)

    c.finish_object()
    assert c.object_count == 1
    assert len(c.clicks_list) == 0
    assert set(np.unique(c.result_mask)) <= {0, 1}

    # second object gets id 2
    c.add_click(10, 10, True)
    rm = c.result_mask
    assert rm.max() <= 2


def test_init_mask_injection():
    c = make_controller()
    mask = np.zeros((64, 64), np.float32)
    mask[8:24, 8:24] = 1.0
    c.set_mask(mask)
    np.testing.assert_allclose(c.current_object_prob, mask)
    c.add_click(16, 16, True)            # click with init mask as prev
    assert np.isfinite(c.current_object_prob).all()


def test_visualization_panel():
    c = make_controller()
    c.add_click(30, 20, True)
    panel = c.get_visualization()
    assert panel.shape == (64, 64, 3) and panel.dtype == np.uint8


def test_controller_brs_mode_switch():
    """The GUI's BRS-mode selector (app.py:95-130): switching predictors
    mid-session keeps the image and finished objects, resets the
    in-progress clicks; user clicks run through the BRS predictor."""
    from pvpuformer_tpu.inference.brs import FeatureBRSPredictor
    c = make_controller()
    c.add_click(30, 20, True)
    c.finish_object()
    c.add_click(10, 12, True)
    c.set_brs_mode("f-BRS-C")
    assert isinstance(c.predictor, FeatureBRSPredictor)
    assert c.object_count == 1 and len(c.clicks_list) == 0
    c.predictor.max_iters = 2            # keep the test fast
    c.add_click(40, 44, True)
    assert len(c.clicks_list) == 1
    assert np.isfinite(c.current_object_prob).all()
    c.undo_click()
    assert len(c.clicks_list) == 0
    # switching back to NoBRS works too
    c.set_brs_mode("NoBRS")
    c.add_click(40, 44, False)
    assert np.isfinite(c.current_object_prob).all()


def test_view_transform():
    """Zoomable-canvas math (demo.ViewTransform, canvas.py:49-324
    equivalent): fit-to-view, cursor-centric zoom, pan clamping, widget ->
    image inversion, render shapes."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from demo import ViewTransform

    t = ViewTransform((100, 200), (400, 300))   # image 200x100, view 400x300
    assert abs(t.scale - 2.0) < 1e-9            # fit: min(400/200, 300/100)
    # widget center maps inside the image
    pt = t.to_image(100, 100)
    assert pt == (50.0, 50.0)
    # zoom about a cursor point keeps that image point under the cursor
    before = t.to_image(120, 80)
    t.zoom(2.0, 120, 80)
    after = t.to_image(120, 80)
    assert np.allclose(before, after, atol=1e-6)
    assert t.zoom_level == 2.0
    # pan moves the view; clamped to image bounds
    t.pan(-10000, -10000)
    vis_w = t.vw / t.scale
    assert t.ox == max(0.0, t.iw - vis_w)
    # zoom-out is clamped at fit
    t.zoom(0.01, 0, 0)
    assert t.zoom_level == t.min_zoom
    assert t.to_image(-5, 10) is None           # left of the image
    # outside the view -> None once fully zoomed out at the corner
    t2 = ViewTransform((100, 100), (200, 300))
    assert t2.to_image(199, 299) is None        # below the letterboxed image
    # render returns a uint8 panel of the visible size
    panel = np.zeros((100, 200, 3), np.uint8)
    out = t.render(panel)
    assert out.ndim == 3 and out.shape[2] == 3
    assert out.shape[0] <= t.vh + 2 and out.shape[1] <= t.vw + 2


def test_validate_bounded_policy():
    """demo_widgets.validate_bounded — the pure core of the reference's
    BoundedNumericalEntry validation (interactive_demo/wrappers.py:30-55):
    in-bounds values coerce and accept; out-of-bounds / unparsable reject
    (caller reverts); 'INF' accepted only with allow_inf."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from demo_widgets import validate_bounded

    assert validate_bounded("5", int, 1, 96) == (True, 5)
    assert validate_bounded("0", int, 1, 96) == (False, None)
    assert validate_bounded("97", int, 1, 96) == (False, None)
    assert validate_bounded("abc", int, 1, 96) == (False, None)
    assert validate_bounded("2.5", int, 1, 96) == (False, None)
    assert validate_bounded("0.3", float, 0.0, 1.0) == (True, 0.3)
    assert validate_bounded("INF", int, 1, 96, allow_inf=True) == (True, "INF")
    assert validate_bounded("INF", int, 1, 96) == (False, None)
    # unbounded sides
    assert validate_bounded("-4", int) == (True, -4)


def test_controller_net_clicks_limit_switch():
    """set_net_clicks_limit rebuilds the predictor with the new truncation
    and resets the in-progress object; a no-op value keeps the predictor."""
    c = make_controller()
    c.add_click(20, 20, True)
    assert len(c.clicks_list) == 1
    pred0 = c.predictor
    c.set_net_clicks_limit(None)              # no-op: already None
    assert c.predictor is pred0
    c.set_net_clicks_limit(1)
    assert c.predictor is not pred0
    assert c.cfg.net_clicks_limit == 1
    assert len(c.clicks_list) == 0            # in-progress object reset
    c.add_click(20, 20, True)
    c.add_click(40, 40, False)                # session accepts > limit clicks
    assert len(c.clicks_list) == 2
    assert np.isfinite(c.current_object_prob).all()
