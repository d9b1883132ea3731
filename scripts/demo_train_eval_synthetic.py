#!/usr/bin/env python3
"""End-to-end validation demo: train the tiny VPU on synthetic data, then
NoC-evaluate trained vs random weights through the fused interactive loop.

Measured on a v5e (2026-08-16): AdaptiveIoU 0.09 -> 0.79 over 40 epochs;
NoC@50 10.0 (random, never reaches 50% IoU) -> 1.17 (trained); final
per-object IoUs 0.05-0.11 -> 0.47-0.81. Runs in ~10 min on one chip.
"""
import sys; sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from pvpuformer_tpu.data import SyntheticTrainDataset, Loader, MultiPointSampler
from pvpuformer_tpu.engine.optimizer import make_optimizer
from pvpuformer_tpu.engine.train_step import TrainConfig
from pvpuformer_tpu.engine.trainer import Trainer
from pvpuformer_tpu.models.vpu import VPUConfig, init_vpu
from pvpuformer_tpu.models.vit import ViTConfig
from pvpuformer_tpu.models.fpn import NeckConfig
from pvpuformer_tpu.models.two_way import TwoWayConfig
from pvpuformer_tpu.models.seg_head import HeadConfig
from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
from pvpuformer_tpu.inference.datasets import SyntheticDataset
from pvpuformer_tpu.inference.evaluation import evaluate_dataset, compute_noc_metric

CROP = (64, 64)
mcfg = VPUConfig(
    backbone=ViTConfig(img_size=CROP, patch_size=(16,16), embed_dim=64, depth=4, num_heads=2),
    neck=NeckConfig(in_dim=64, out_dims=(16,32,48,64), img_size=CROP, hide_dim=64,
                    two_way=TwoWayConfig(depth=3, embedding_dim=64, num_heads=4, mlp_dim=64)),
    head=HeadConfig(in_channels=(16,32,48,64), channels=32, d_model=64),
    num_max_points=6)
params0 = init_vpu(jax.random.key(0), mcfg)
sampler = MultiPointSampler(6, prob_gamma=0.8)
ds = SyntheticTrainDataset(n_samples=64, hw=CROP, points_sampler=sampler, epoch_len=64)
loader = Loader(ds, batch_size=16, num_workers=2)
cfg = TrainConfig(model=mcfg)
tx = make_optimizer(params0, "adam", lr=3e-4)
tr = Trainer(params0, cfg, tx, loader, log_every=1000)
for ep in range(40):
    means = tr.training(ep)
    if ep % 8 == 7:
        print(f"epoch {ep}: loss {means['loss']:.3f} iou {means['AdaptiveIoU']:.3f}", flush=True)
trained = jax.device_get(tr.params)

# evaluate NoC: trained vs random, same synthetic distribution (64x64 ellipses)
eval_ds = SyntheticDataset(n_samples=6, hw=(64, 64), seed=123)
pcfg = PredictorConfig(model=mcfg, target_size=CROP, min_crop_size=32)
for name, p, int8 in (("random", params0, False), ("trained", trained, False),
                      ("trained+int8", trained, True)):
    pred = Predictor(p, pcfg, int8=int8)
    ious, _ = evaluate_dataset(eval_ds, pred, max_iou_thr=0.80, max_clicks=10)
    noc, _, over = compute_noc_metric(ious, [0.5, 0.8], max_clicks=10)
    final = [round(float(a[-1]), 3) for a in ious]
    print(f"{name}: NoC@50 {noc[0]:.2f} NoC@80 {noc[1]:.2f} >=10@80 {over[1]} final IoUs {final}", flush=True)
