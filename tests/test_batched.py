"""Batched multi-instance eval == sequential eval, object by object."""
import numpy as np
import jax

from pvpuformer_tpu.inference.batched import BatchedEvaluator
from pvpuformer_tpu.inference.datasets import SyntheticDataset
from pvpuformer_tpu.inference.evaluation import evaluate_dataset
from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
from pvpuformer_tpu.models.vpu import init_vpu

from test_models import tiny_cfg


def test_batched_matches_sequential():
    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32)
    ds = SyntheticDataset(n_samples=3, hw=(64, 64))

    seq_curves, _ = evaluate_dataset(ds, Predictor(params, cfg),
                                     max_iou_thr=0.95, max_clicks=3)
    bat = BatchedEvaluator(params, cfg, batch_size=2)   # pads the last chunk
    bat_curves, elapsed, stats = bat.evaluate(ds, max_clicks=3,
                                              max_iou_thr=0.95)
    assert len(bat_curves) == len(seq_curves) == 3
    for a, b in zip(seq_curves, bat_curves):
        np.testing.assert_allclose(a, b, atol=2e-5)
    assert stats["objects_per_sec"] > 0


def test_batched_mesh_sharded_matches_single_device():
    """Sessions sharded over the 8-virtual-device data mesh produce the
    same IoU curves as the single-device batched path."""
    from pvpuformer_tpu.parallel.mesh import make_mesh

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32)
    ds = SyntheticDataset(n_samples=5, hw=(64, 64))

    single = BatchedEvaluator(params, cfg, batch_size=4)
    ref_curves, _, _ = single.evaluate(ds, max_clicks=3, max_iou_thr=0.95)

    mesh = make_mesh(4)                       # 4-way data parallel
    sharded = BatchedEvaluator(params, cfg, batch_size=4, mesh=mesh)
    got_curves, _, stats = sharded.evaluate(ds, max_clicks=3,
                                            max_iou_thr=0.95)
    assert len(got_curves) == len(ref_curves) == 5
    for a, b in zip(ref_curves, got_curves):
        np.testing.assert_allclose(a, b, atol=2e-5)
    assert stats["clicks_per_sec"] > 0


def test_resolve_batched_cfg_shipped_selection():
    """The shipped batched-mode resolution (resolve_batched_cfg): dense-rows
    unchunked EDT always; the fused-attention pin only engages on TPU (so on
    the CPU test backend the config must keep attn_impl='auto', which
    block_forward resolves to the dense path — CPU tests never hit Pallas
    interpret mode via the batched path)."""
    from pvpuformer_tpu.inference.batched import resolve_batched_cfg

    mcfg = tiny_cfg()
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32)
    for int8 in (False, True):
        out = resolve_batched_cfg(cfg, batch_size=16, int8=int8)
        assert out.edt_chunk is None and out.edt_rows == "dense"
        assert out.model.backbone.attn_impl == "auto", (
            int8, out.model.backbone.attn_impl)
