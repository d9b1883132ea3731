"""Tiny synthetic smoke recipe: runs the full training stack (data pipeline,
iterloss rounds, checkpointing) in minutes on CPU or a single chip.

    python train.py models/iSegNet/vpu_tiny_synthetic.py --debug
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pvpuformer_tpu.data import (Loader, MultiPointSampler,
                                 SyntheticTrainDataset, transforms as T)
from pvpuformer_tpu.engine.metrics import AdaptiveIoU
from pvpuformer_tpu.engine.optimizer import make_optimizer
from pvpuformer_tpu.engine.train_step import TrainConfig
from pvpuformer_tpu.engine.trainer import Trainer
from pvpuformer_tpu.models.fpn import NeckConfig
from pvpuformer_tpu.models.seg_head import HeadConfig
from pvpuformer_tpu.models.two_way import TwoWayConfig
from pvpuformer_tpu.models.vit import ViTConfig
from pvpuformer_tpu.models.vpu import VPUConfig, init_vpu

MODEL_NAME = "vpu_tiny_synthetic"
CROP = (64, 64)


def init_model(cfg):
    mcfg = VPUConfig(
        backbone=ViTConfig(img_size=CROP, patch_size=(16, 16), embed_dim=64,
                           depth=4, num_heads=2),
        neck=NeckConfig(in_dim=64, out_dims=(16, 32, 48, 64), img_size=CROP,
                        hide_dim=64,
                        two_way=TwoWayConfig(depth=3, embedding_dim=64,
                                             num_heads=4, mlp_dim=64)),
        head=HeadConfig(in_channels=(16, 32, 48, 64), channels=32, d_model=64),
        num_max_points=6,
    )
    return init_vpu(jax.random.key(0), mcfg), mcfg


def main(cfg):
    params, mcfg = init_model(cfg)
    batch_size = cfg.batch_size if cfg.get("batch_size", -1) > 0 else 8
    epochs = cfg.epochs if cfg.get("epochs", -1) > 0 else 2

    sampler = MultiPointSampler(6, prob_gamma=0.8, merge_objects_prob=0.15,
                                max_num_merged_objects=2)
    trainset = SyntheticTrainDataset(n_samples=32, hw=CROP,
                                     points_sampler=sampler,
                                     augmentator=T.train_augmentator(CROP),
                                     epoch_len=32)
    loader = Loader(trainset, batch_size,
                    num_workers=cfg.get("workers", 2),
                    process_index=jax.process_index(),
                    process_count=jax.process_count())

    tcfg = TrainConfig(model=mcfg, max_num_next_clicks=3)
    tx = make_optimizer(params, "adam", lr=1e-3,
                        milestones=(1,), gamma=0.5,
                        steps_per_epoch=len(loader))
    if cfg.get("accumulate_grad", 1) > 1:
        from pvpuformer_tpu.engine.optimizer import with_grad_accumulation
        tx = with_grad_accumulation(tx, cfg.accumulate_grad)
    trainer = Trainer(params, tcfg, tx, loader,
                      checkpoint_dir=cfg.CHECKPOINTS_PATH,
                      checkpoint_interval=1, metrics=[AdaptiveIoU()])
    trainer.run(num_epochs=1 if cfg.get("debug") else epochs)
