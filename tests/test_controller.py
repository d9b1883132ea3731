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
