"""VPU ViT-L/448 on CocoLvis — the BASELINE config-4 model at training time.

The reference publishes only the ViT-B recipe
(`models/iSegNet/vpu_base448_cocolvis.py:1-181`); its backbone zoo ships the
ViT-L constructor (`isegm/model/modeling/models_vit.py:311-314`) with no
training script. This recipe follows the SimpleClick lineage for large
backbones (the acknowledged ancestry, reference `README.md:128`): same
losses/sampler/schedule as the base recipe, layer-wise lr decay ON by
default (BEiT 0.75^depth over 24 blocks), and FSDP parameter sharding as the
suggested `--param-mode` on small meshes.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from pvpuformer_tpu.data import (CocoLvisDataset, Loader, MultiPointSampler,
                                 transforms as T)
from pvpuformer_tpu.engine.metrics import AdaptiveIoU
from pvpuformer_tpu.engine.optimizer import make_optimizer
from pvpuformer_tpu.engine.train_step import TrainConfig
from pvpuformer_tpu.engine.trainer import Trainer
from pvpuformer_tpu.models.vpu import init_vpu, vpu_large_config
from pvpuformer_tpu.parallel import make_mesh
from pvpuformer_tpu.utils.torch_ingest import load_mae_pretrained

MODEL_NAME = "vpu_large448_cocolvis"

CROP_SIZE = (448, 448)
NUM_MAX_POINTS = 24
EPOCH_LEN = 30000
VAL_EPOCH_LEN = 2000
NUM_EPOCHS = 230
MILESTONES = (190, 210)
BASE_LR = 5e-5


def init_model(cfg):
    dtype = jnp.bfloat16 if cfg.get("dtype", "bfloat16") == "bfloat16" \
        else jnp.float32
    mcfg = vpu_large_config(crop=CROP_SIZE,
                            upsample=cfg.get("upsample", "x1"), dtype=dtype)
    params = init_vpu(jax.random.key(0), mcfg)
    mae = cfg.get("IMAGENET_PRETRAINED_MODELS", {}).get("MAE_LARGE")
    if mae and Path(mae).exists():
        params["backbone"] = load_mae_pretrained(mae, mcfg.backbone)
    return params, mcfg


def main(cfg):
    params, mcfg = init_model(cfg)

    batch_size = cfg.batch_size if cfg.get("batch_size", -1) > 0 else 32
    epochs = cfg.epochs if cfg.get("epochs", -1) > 0 else NUM_EPOCHS

    points_sampler = MultiPointSampler(NUM_MAX_POINTS, prob_gamma=0.80,
                                       merge_objects_prob=0.15,
                                       max_num_merged_objects=2)
    trainset = CocoLvisDataset(
        cfg.LVIS_v1_PATH, split="train",
        augmentator=T.train_augmentator(CROP_SIZE),
        min_object_area=1000, keep_background_prob=0.05,
        points_sampler=points_sampler, epoch_len=EPOCH_LEN, stuff_prob=0.30)
    valset = CocoLvisDataset(
        cfg.LVIS_v1_PATH, split="val",
        augmentator=T.val_augmentator(CROP_SIZE),
        min_object_area=1000, points_sampler=points_sampler,
        epoch_len=VAL_EPOCH_LEN)

    train_loader = Loader(trainset, batch_size,
                          num_workers=cfg.get("workers", 4),
                          process_index=jax.process_index(),
                          process_count=jax.process_count())
    val_loader = Loader(valset, batch_size, shuffle=False,
                        num_workers=cfg.get("workers", 4),
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    tcfg = TrainConfig(model=mcfg, max_num_next_clicks=3,
                       iterloss_weights=(1.0, 2.0, 3.0),
                       instance_loss_weight=1.0, instance_aux_loss_weight=1.0,
                       instance_aux3_loss_weight=2.0,
                       use_random_clicks=True, as_allmask=False)
    tx = make_optimizer(params, "adam", lr=BASE_LR, betas=(0.9, 0.999),
                        eps=1e-8, milestones=MILESTONES, gamma=0.1,
                        steps_per_epoch=len(train_loader),
                        layerwise_decay=cfg.get("layerwise_decay", True))
    if cfg.get("accumulate_grad", 1) > 1:
        from pvpuformer_tpu.engine.optimizer import with_grad_accumulation
        tx = with_grad_accumulation(tx, cfg.accumulate_grad)

    mesh = make_mesh(model_parallel=cfg.get("model_parallel", 1))
    trainer = Trainer(params, tcfg, tx, train_loader, val_loader,
                      checkpoint_dir=cfg.CHECKPOINTS_PATH,
                      checkpoint_interval=[(0, 5), (190, 1)],
                      metrics=[AdaptiveIoU()], mesh=mesh,
                      param_mode=cfg.get("param_mode", "fsdp"),
                      tb_dir=str(cfg.LOGS_PATH))
    if cfg.get("weights"):
        trainer.resume(cfg.weights)
    trainer.run(num_epochs=epochs if not cfg.get("debug") else 1,
                validation=False)
