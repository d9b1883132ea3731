import sys; sys.path.insert(0, "/root/repo")
import logging, numpy as np, jax, jax.numpy as jnp
logging.basicConfig(level=logging.INFO)
from pvpuformer_tpu.data import SyntheticTrainDataset, Loader, MultiPointSampler, transforms as T
from pvpuformer_tpu.engine.optimizer import make_optimizer
from pvpuformer_tpu.engine.train_step import TrainConfig
from pvpuformer_tpu.engine.trainer import Trainer
from pvpuformer_tpu.models.vpu import VPUConfig, init_vpu
from pvpuformer_tpu.models.vit import ViTConfig
from pvpuformer_tpu.models.fpn import NeckConfig
from pvpuformer_tpu.models.two_way import TwoWayConfig
from pvpuformer_tpu.models.seg_head import HeadConfig

CROP = (64, 64)
mcfg = VPUConfig(
    backbone=ViTConfig(img_size=CROP, patch_size=(16,16), embed_dim=64, depth=4, num_heads=2),
    neck=NeckConfig(in_dim=64, out_dims=(16,32,48,64), img_size=CROP, hide_dim=64,
                    two_way=TwoWayConfig(depth=3, embedding_dim=64, num_heads=4, mlp_dim=64)),
    head=HeadConfig(in_channels=(16,32,48,64), channels=32, d_model=64),
    num_max_points=6)
params = init_vpu(jax.random.key(0), mcfg)
sampler = MultiPointSampler(6, prob_gamma=0.8)
ds = SyntheticTrainDataset(n_samples=64, hw=CROP, points_sampler=sampler, epoch_len=64)
loader = Loader(ds, batch_size=16, num_workers=2)
cfg = TrainConfig(model=mcfg)
tx = make_optimizer(params, "adam", lr=3e-4)
tr = Trainer(params, cfg, tx, loader, log_every=4)
for ep in range(8):
    means = tr.training(ep)
    print(f"EPOCH {ep}: loss {means['loss']:.4f} AdaptiveIoU {means['AdaptiveIoU']:.4f}", flush=True)
