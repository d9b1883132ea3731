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


def test_distmap_brs_session():
    pred, gt = _session("DistMap-BRS")
    assert isinstance(pred, InputBRSPredictor)
    assert pred.optimize_target == "dmaps"
    iou = pred.next_click()
    assert np.isfinite(iou)


def _zoo_session(mcfg, mode, **kw):
    from pvpuformer_tpu.models import registry
    params = registry.init_for(mcfg)(jax.random.key(0), mcfg)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32)
    pred = get_predictor(params, cfg, mode, max_iters=3, **kw)
    r = np.random.default_rng(0)
    image = (r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    gt = np.zeros((64, 64), np.float32)
    gt[16:48, 20:52] = 1.0
    pred.set_input(image, gt)
    return pred


@pytest.mark.parametrize("mode,ins,opt_ch", [
    ("f-BRS-A", "A", 8 + 16 + 32 + 64),     # sum of branch widths (w=8)
    ("f-BRS-C", "C", 2 * 16),               # 2 * ocr_width
])
def test_hrnet_feature_brs(mode, ins, opt_ch):
    """HRNetFeatureBRSPredictor insertion remap (__init__.py:64-66,
    brs.py:156-160 channel counts)."""
    from pvpuformer_tpu.models.zoo.hrnet import HRNetISConfig
    from pvpuformer_tpu.inference.brs import ZooFeatureBRSPredictor
    mcfg = HRNetISConfig(width=8, small=True, ocr_width=16)
    pred = _zoo_session(mcfg, mode)
    assert isinstance(pred, ZooFeatureBRSPredictor)
    assert pred.insertion == ins
    iou = pred.next_click()
    assert np.isfinite(iou)
    assert pred.opt_data.shape == (2 * opt_ch,)


@pytest.mark.slow
@pytest.mark.parametrize("mode,ins", [
    ("f-BRS-A", "after_c4"), ("f-BRS-B", "after_aspp"),
    ("f-BRS-C", "after_deeplab")])
def test_deeplab_feature_brs(mode, ins):
    """DeepLab insertion map (__init__.py:53-57)."""
    from pvpuformer_tpu.models.zoo.deeplab import DeeplabISConfig
    mcfg = DeeplabISConfig(backbone="resnet34", ch=32)
    pred = _zoo_session(mcfg, mode)
    assert pred.insertion == ins
    iou = pred.next_click()
    assert np.isfinite(iou)


@pytest.mark.slow
def test_zoo_input_brs_modes():
    """RGB-BRS and DistMap-BRS run on zoo models via the generic registry
    forward (reference InputBRSPredictor works on any ISModel)."""
    from pvpuformer_tpu.models.zoo.hrnet import HRNetISConfig
    mcfg = HRNetISConfig(width=8, small=True, ocr_width=16)
    for mode in ("RGB-BRS", "DistMap-BRS"):
        pred = _zoo_session(mcfg, mode)
        assert np.isfinite(pred.next_click())


def test_factory_rejects_unmapped_zoo_fbrs():
    from pvpuformer_tpu.models.zoo.segformer import SegformerISConfig
    mcfg = SegformerISConfig(embed_dims=(16, 32, 48, 64), depths=(1, 1, 1, 1),
                             num_heads=(1, 2, 3, 4), head_channels=32)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64))
    with pytest.raises(ValueError, match="no insertion map"):
        get_predictor({}, cfg, "f-BRS-A")
