"""PlainVit / SimpleClick model — the VPU model minus prompts and DMA.

Re-derivation of `PlainVitModel` (reference `isegm/model/is_plainvit_model.py:
59-95`): the same MAE ViT backbone + coord patch-embed, a SimpleFPN *without*
the two-way transformer (is_plainvit_model.py:9-57 — identical conv branches
to the VPU neck, all fed from the raw backbone map), and the SegFormer head
without the P2CL branch. Clicks enter only through the disk maps.

This is the legacy zoo's flagship (SimpleClick); its neck/head params reuse
the fpn.py branch initializers so torch-ingested SimpleClick weights map
one-to-one.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import nn
from ..ops.distmaps import dist_maps
from ..ops.resize import bilinear_resize
from .fpn import NeckConfig, _down4, _down8, _down16, _down32
from .seg_head import HeadConfig, head_forward, init_head
from .vit import ViTConfig, init_vit, vit_backbone_forward
from .vpu import IMAGENET_MEAN, IMAGENET_STD


@dataclasses.dataclass(frozen=True)
class PlainVitConfig:
    backbone: ViTConfig = ViTConfig()
    neck: NeckConfig = NeckConfig()
    head: HeadConfig = dataclasses.field(
        default_factory=lambda: HeadConfig(ed_loss=False))
    num_max_points: int = 24
    norm_radius: float = 5.0
    use_disks: bool = True
    with_prev_mask: bool = True
    random_split: bool = False
    dtype: Any = jnp.float32

    @property
    def crop_size(self) -> Tuple[int, int]:
        return self.backbone.img_size

    def replace(self, **kw) -> "PlainVitConfig":
        return dataclasses.replace(self, **kw)


def init_plainvit(key, cfg: PlainVitConfig) -> Dict[str, Any]:
    from .fpn import init_neck
    k1, k2, k3, k4 = jax.random.split(key, 4)
    coord_ch = 3 if cfg.with_prev_mask else 2
    neck = init_neck(k3, cfg.neck)
    # plain SimpleFPN has no prompt FFN / two-way transformer
    neck.pop("ffn", None)
    neck.pop("att", None)
    return {
        "backbone": init_vit(k1, cfg.backbone),
        "patch_embed_coords": nn.init_patch_embed(
            k2, cfg.backbone.patch_size, coord_ch, cfg.backbone.embed_dim,
            init="torch"),
        "neck": neck,
        "head": init_head(k4, cfg.head),
    }


def plainvit_forward(params, cfg: PlainVitConfig, image: jnp.ndarray,
                     points: jnp.ndarray,
                     shuffle_key: Optional[jax.Array] = None,
                     coord_bias=None,
                     **_) -> Dict[str, jnp.ndarray]:
    """image (B, H, W, 3|4), points (B, 2N, 3) -> {'instances': logits}."""
    dt = cfg.dtype
    image = image.astype(dt)
    prev_mask = None
    if cfg.with_prev_mask:
        prev_mask = image[..., 3:4]
        image = image[..., :3]
    mean = jnp.asarray(IMAGENET_MEAN, image.dtype)
    std = jnp.asarray(IMAGENET_STD, image.dtype)
    rgb = (image - mean) / std

    h, w = rgb.shape[1], rgb.shape[2]
    disks = dist_maps(points, h, w, norm_radius=cfg.norm_radius,
                      use_disks=cfg.use_disks).astype(dt)
    if coord_bias is not None:                 # DistMap-BRS (brs.py:272-276)
        disks = disks + coord_bias.astype(dt)
    coords = jnp.concatenate([prev_mask, disks], axis=-1) \
        if prev_mask is not None else disks

    add = nn.patch_embed(params["patch_embed_coords"], coords,
                         cfg.backbone.patch_size)
    tokens = vit_backbone_forward(params["backbone"], cfg.backbone, rgb,
                                  additional=add, shuffle_key=shuffle_key)

    b, n, c = tokens.shape
    gh, gw = cfg.backbone.grid_size
    fmap = tokens.reshape(b, gh, gw, c)
    ms = [_down4(params["neck"]["down4"], fmap),
          _down8(params["neck"]["down8"], fmap),
          _down16(params["neck"]["down16"], fmap),
          _down32(params["neck"]["down32"], fmap)]
    seg, _ = head_forward(params["head"], cfg.head, ms, q_out=None)
    return {"instances": bilinear_resize(seg, h, w, align_corners=True),
            "instances_aux": None}
