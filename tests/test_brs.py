"""BRS predictors: click-consistency loss, f-BRS and RGB-BRS sessions."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pvpuformer_tpu.inference.brs import (brs_mask_loss, click_maps,
                                          get_predictor, FeatureBRSPredictor,
                                          InputBRSPredictor)
from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
from pvpuformer_tpu.models.vpu import init_vpu

from test_models import tiny_cfg


def test_brs_mask_loss_values():
    res = jnp.asarray([[0.9, 0.2], [0.6, 0.1]])
    pos = jnp.asarray([[1.0, 0.0], [0.0, 0.0]])
    neg = jnp.asarray([[0.0, 1.0], [0.0, 0.0]])
    loss, fp, fn = brs_mask_loss(res, pos, neg)
    np.testing.assert_allclose(float(loss),
                               (0.1 ** 2) / (1 + 1e-5) + (0.2 ** 2) / (1 + 1e-5),
                               rtol=1e-5)
    np.testing.assert_allclose(float(fp), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(fn), 0.2, rtol=1e-5)


def test_click_maps_stamps():
    pts = np.full((1, 4, 3), -1.0, np.float32)
    pts[0, 0] = (5, 6, 0)      # positive
    pts[0, 2] = (10, 3, 1)     # negative
    pos, neg = click_maps(jnp.asarray(pts), 16, 16)
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos[0, 5, 6] == 1 and pos[0, 4, 5] == 1 and pos[0, 7, 6] == 0
    assert neg[0, 10, 3] == 1 and pos.sum() == 9 and neg.sum() == 9


def _session(mode):
    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32)
    pred = get_predictor(params, cfg, mode, max_iters=3)
    r = np.random.default_rng(0)
    image = (r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    gt = np.zeros((64, 64), np.float32)
    gt[16:48, 20:52] = 1.0
    pred.set_input(image, gt)
    return pred, gt


def test_feature_brs_session():
    pred, gt = _session("f-BRS-A")
    assert isinstance(pred, FeatureBRSPredictor)
    i1 = pred.next_click()
    i2 = pred.next_click()
    assert np.isfinite([i1, i2]).all()
    # optimized scale/bias vector was produced
    assert pred.opt_data is not None and pred.opt_data.shape == (128,)
    pred.undo_click()
    assert int(pred.state.click_count) == 1


def test_input_brs_session():
    pred, gt = _session("RGB-BRS")
    assert isinstance(pred, InputBRSPredictor)
    iou = pred.next_click()
    assert np.isfinite(iou)


def test_factory_nobrs():
    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64))
    assert isinstance(get_predictor(params, cfg, "NoBRS"), Predictor)


@pytest.mark.parametrize("mode,ins", [("f-BRS-B", "neck"),
                                      ("f-BRS-C", "head")])
def test_feature_brs_insertion_variants(mode, ins):
    import pytest as _p
    pred, gt = _session(mode)
    assert pred.insertion == ins
    iou = pred.next_click()
    assert np.isfinite(iou)
    if ins == "neck":
        assert pred.opt_data.shape == (2 * (16 + 32 + 48 + 64),)
    else:
        assert pred.opt_data.shape == (2 * 32,)
