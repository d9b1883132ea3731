"""The VPU model: ViT backbone + PPuE prompts + DMA neck + SegFormer head.

Re-derivation of `VitMultiGaussianVector_ed_Model`
(reference `isegm/model/is_vpu_model.py:140-449` over `is_model.py:9-146`),
as a pure function of (params, inputs) with everything on device:

forward(image(B,H,W,4), points(B,2N,3), [boxes/scribbles], prompt_type):
  1. split prev-mask channel, ImageNet-normalize RGB (is_model.py:59-66);
  2. coord features = [prev_mask, pos-disk, neg-disk] with optional on-device
     box/scribble rasterization (replaces host cv2, is_model.py:78-146);
  3. patch-embed image + coord features, add, + pos_embed, ViT blocks with
     window patchify (is_vpu_model.py:383-391);
  4. PPuE prompt vectors by type (is_vpu_model.py:396-403) — fused on device;
  5. DMA neck -> multi-scale features + q_out; head -> seg logits + P2CL maps;
  6. bilinear align_corners=True upsample to input size (is_vpu_model.py:431-436).

Returns {"instances": (B, H, W, 1) logits, "instances_aux": (B, H, W, 2N)
P2CL probability maps (already in [0, 1])}.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import nn
from ..ops.distmaps import dist_maps
from ..ops.ppue import PPuEConfig, ppue_box, ppue_click, ppue_scribble
from ..ops.rasterize import draw_box_into_coords, draw_scribble_into_coords
from ..ops.resize import bilinear_resize
from .vit import ViTConfig, init_vit, vit_backbone_forward
from .two_way import TwoWayConfig
from .fpn import NeckConfig, init_neck, neck_forward
from .seg_head import HeadConfig, init_head, head_forward

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class VPUConfig:
    backbone: ViTConfig = ViTConfig()
    neck: NeckConfig = NeckConfig()
    head: HeadConfig = HeadConfig()
    # caption co-training (reference trainer.py:321,393-395 scaffold; the
    # CLIP text embedding enters as an extra DMA query — fpn.neck_forward)
    text: Optional[Any] = None           # zoo.clip_text.ClipTextConfig
    num_max_points: int = 24
    norm_radius: float = 5.0
    use_disks: bool = True
    with_prev_mask: bool = True
    with_aux_output: bool = True
    random_split: bool = False
    dtype: Any = jnp.float32          # activation/compute dtype (bf16 on TPU)

    @property
    def crop_size(self) -> Tuple[int, int]:
        return self.backbone.img_size

    @property
    def ppue(self) -> PPuEConfig:
        # pinned to the TRAINED crop (neck.img_size), not the eval crop: the
        # neck FFN input dim is 2*train_crop+3 (is_vpu_model.py:95), so at a
        # larger eval crop (DAVIS 672, evaluate_vpumodel.py:187-204) the
        # reference keeps 448-length prompt vectors and its in-image check
        # drops clicks beyond them (ops.py:84-89) — we mirror that.
        return PPuEConfig(input_h=self.neck.img_size[0],
                          input_w=self.neck.img_size[1])

    def replace(self, **kw) -> "VPUConfig":
        return dataclasses.replace(self, **kw)


def vpu_base_config(crop: Tuple[int, int] = (448, 448), upsample: str = "x1",
                    dtype: Any = jnp.float32) -> VPUConfig:
    """The shipped training config (models/iSegNet/vpu_base448_cocolvis.py:11-61)."""
    channels = {"x1": 256, "x2": 128, "x4": 64}[upsample]
    return VPUConfig(
        backbone=ViTConfig(img_size=crop, patch_size=(16, 16), in_chans=3,
                           embed_dim=768, depth=12, num_heads=12),
        neck=NeckConfig(in_dim=768, out_dims=(128, 256, 512, 1024), img_size=crop),
        head=HeadConfig(in_channels=(128, 256, 512, 1024), channels=channels,
                        upsample=upsample),
        dtype=dtype,
    )


def vpu_large_config(crop: Tuple[int, int] = (448, 448), upsample: str = "x1",
                     dtype: Any = jnp.float32) -> VPUConfig:
    """ViT-L variant (models_vit.py:311-314 backbone; BASELINE config 4)."""
    channels = {"x1": 256, "x2": 128, "x4": 64}[upsample]
    return VPUConfig(
        backbone=ViTConfig(img_size=crop, patch_size=(16, 16), in_chans=3,
                           embed_dim=1024, depth=24, num_heads=16),
        neck=NeckConfig(in_dim=1024, out_dims=(128, 256, 512, 1024),
                        img_size=crop,
                        two_way=TwoWayConfig(embedding_dim=1024)),
        head=HeadConfig(in_channels=(128, 256, 512, 1024), channels=channels,
                        upsample=upsample, d_model=1024),
        dtype=dtype,
    )


def vpu_huge_config(crop: Tuple[int, int] = (448, 448), upsample: str = "x1",
                    dtype: Any = jnp.float32) -> VPUConfig:
    """ViT-H variant (models_vit.py:316-319, 14x14 patches; BASELINE cfg 5):
    448/14 = 32x32 token grid, 224-pixel windows = 16x16 tokens, 2x2 split."""
    channels = {"x1": 256, "x2": 128, "x4": 64}[upsample]
    return VPUConfig(
        backbone=ViTConfig(img_size=crop, patch_size=(14, 14), in_chans=3,
                           embed_dim=1280, depth=32, num_heads=16),
        neck=NeckConfig(in_dim=1280, out_dims=(128, 256, 512, 1024),
                        img_size=crop,
                        two_way=TwoWayConfig(embedding_dim=1280)),
        head=HeadConfig(in_channels=(128, 256, 512, 1024), channels=channels,
                        upsample=upsample, d_model=1280),
        dtype=dtype,
    )


def init_vpu(key, cfg: VPUConfig) -> Dict[str, Any]:
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    coord_ch = 3 if cfg.with_prev_mask else 2
    params: Dict[str, Any] = {
        "backbone": init_vit(k1, cfg.backbone),
        "patch_embed_coords": nn.init_patch_embed(
            k2, cfg.backbone.patch_size, coord_ch, cfg.backbone.embed_dim,
            init="torch"),
        "neck": init_neck(k3, cfg.neck),
        "head": init_head(k4, cfg.head),
        # present in the reference ctor for checkpoint parity; not used by the
        # VPU forward path (is_vpu_model.py:176-181,354-380)
        "pe_gaussian": jax.random.normal(k5, (2, cfg.backbone.embed_dim // 2)),
        "point_embeddings": nn.normal_init(k6, (4, cfg.backbone.embed_dim), std=1.0),
        "not_a_point_embed": nn.normal_init(k7, (1, cfg.backbone.embed_dim), std=1.0),
    }
    if cfg.with_aux_output:
        params["head_aux"] = nn.init_conv1x1(jax.random.fold_in(key, 99), 128, 1)
    if cfg.text is not None:
        from .zoo.clip_text import init_clip_text
        kt = jax.random.fold_in(key, 177)
        params["clip_text"] = init_clip_text(kt, cfg.text)
        params["caption_proj"] = nn.init_linear(
            jax.random.fold_in(kt, 1), cfg.text.embed_dim, cfg.neck.in_dim)
    return params


def caption_queries(params, cfg: VPUConfig, captions) -> Optional[jnp.ndarray]:
    """(B, context_length) int32 caption tokens -> (B, 1, neck_dim) extra
    DMA queries via the CLIP text encoder + a learned projection. Returns
    None when the model carries no text tower or captions is None."""
    if captions is None or cfg.text is None:
        return None
    from .zoo.clip_text import encode_text
    emb = encode_text(params["clip_text"], cfg.text, captions)
    return nn.linear(params["caption_proj"], emb.astype(cfg.dtype))[:, None]


def prepare_input(cfg: VPUConfig, image: jnp.ndarray):
    """(B, H, W, 3|4) -> normalized rgb, prev_mask (is_model.py:59-66)."""
    prev_mask = None
    if cfg.with_prev_mask:
        prev_mask = image[..., 3:4]
        image = image[..., :3]
    mean = jnp.asarray(IMAGENET_MEAN, image.dtype)
    std = jnp.asarray(IMAGENET_STD, image.dtype)
    return (image - mean) / std, prev_mask


def coord_features(cfg: VPUConfig, image: jnp.ndarray, prev_mask, points,
                   boxes=None, scribbles=None, prompt_type: int = 0,
                   coord_bias=None):
    """[prev_mask, pos, neg] channels (is_model.py:78-95). `coord_bias`
    (B,H,W,2) optionally perturbs the disk channels only — the
    DistMap-BRS optimization target (reference brs.py:272-276)."""
    h, w = image.shape[1], image.shape[2]
    disks = dist_maps(points, h, w, norm_radius=cfg.norm_radius,
                      use_disks=cfg.use_disks).astype(image.dtype)
    if coord_bias is not None:
        disks = disks + coord_bias.astype(image.dtype)
    if prompt_type == 1 and boxes is not None:
        disks = draw_box_into_coords(disks, boxes, points.shape[1] // 2)
    elif prompt_type == 2 and scribbles is not None:
        # scribbles = ((B, 1, S, 2), (B, 1, 4)) in the trainer layout
        disks = draw_scribble_into_coords(disks, scribbles[0][:, 0])
    if prev_mask is not None:
        return jnp.concatenate([prev_mask, disks], axis=-1)
    return disks


def vpu_backbone_embed(params, cfg: VPUConfig, rgb: jnp.ndarray,
                       coords: jnp.ndarray,
                       shuffle_key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Image + coord patch embeddings through the ViT (is_vpu_model.py:385-386)."""
    add = nn.patch_embed(params["patch_embed_coords"], coords,
                         cfg.backbone.patch_size)
    return vit_backbone_forward(params["backbone"], cfg.backbone, rgb,
                                additional=add, shuffle_key=shuffle_key)


def vpu_forward(params, cfg: VPUConfig, image: jnp.ndarray, points: jnp.ndarray,
                boxes: Optional[jnp.ndarray] = None,
                scribbles: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                prompt_type: int = 0,
                dropout_key: Optional[jax.Array] = None,
                shuffle_key: Optional[jax.Array] = None,
                coord_bias=None, captions=None,
                ppue_points: Optional[jnp.ndarray] = None
                ) -> Dict[str, jnp.ndarray]:
    """Full forward. `prompt_type` is a static Python int (0 click / 1 box /
    2 scribble), selecting the PPuE encoder at trace time.

    `ppue_points` optionally substitutes the click tensor fed to the PPuE
    encoders only, mirroring the reference's rebind of `points` to
    `prompts[0]` inside backbone_forward (is_vpu_model.py:397) while the
    disk channels keep the original clicks (is_model.py:79 computes
    dist_maps BEFORE the rebind). The inference prompt path uses it to
    append the extra error click of get_next_promts (trainer.py:735-764)."""
    dt = cfg.dtype
    image = image.astype(dt)
    rgb, prev_mask = prepare_input(cfg, image)
    coords = coord_features(cfg, rgb, prev_mask, points, boxes, scribbles,
                            prompt_type, coord_bias=coord_bias)

    tokens = vpu_backbone_embed(params, cfg, rgb, coords, shuffle_key)

    ppts = points if ppue_points is None else ppue_points
    if prompt_type == 0:
        pv = ppue_click(ppts, cfg.ppue, num_max_points=cfg.num_max_points)
    elif prompt_type == 1:
        pv = ppue_box(ppts, boxes, cfg.ppue, num_max_points=cfg.num_max_points)
    else:
        pv = ppue_scribble(ppts, scribbles[0][:, 0], scribbles[1][:, 0],
                           cfg.ppue, num_max_points=cfg.num_max_points)
    pv = pv.astype(dt)

    ms_feats, q_out = neck_forward(params["neck"], cfg.neck, tokens, pv,
                                   cfg.backbone.grid_size,
                                   extra_queries=caption_queries(
                                       params, cfg, captions))
    seg, pcl = head_forward(params["head"], cfg.head, ms_feats, q_out,
                            dropout_key=dropout_key)

    h, w = image.shape[1], image.shape[2]
    out = {"instances": bilinear_resize(seg, h, w, align_corners=True)}
    if cfg.with_aux_output and pcl is not None:
        out["instances_aux"] = bilinear_resize(pcl, h, w, align_corners=True)
    else:
        out["instances_aux"] = None
    return out


def vpu_forward_traced_type(params, cfg: VPUConfig, image: jnp.ndarray,
                            points: jnp.ndarray, boxes: jnp.ndarray,
                            scribbles: jnp.ndarray, scribble_rects: jnp.ndarray,
                            prompt_type: jnp.ndarray,
                            dropout_key: Optional[jax.Array] = None,
                            shuffle_key: Optional[jax.Array] = None,
                            captions: Optional[jnp.ndarray] = None
                            ) -> Dict[str, jnp.ndarray]:
    """Forward with a *traced* prompt type (the training round loop draws
    `as_prompt_type = randint(0, 1)` per round, trainer.py:367 — recompiling
    per combination would multiply XLA programs). The three prompt encodings
    and coord-feature variants are all cheap relative to the ViT trunk, so we
    compute each and select with `where`; the trunk is traced once.

    boxes: (B, 5); scribbles: (B, S, 2); scribble_rects: (B, 4);
    prompt_type: () int32 in {0 click, 1 box, 2 scribble}.
    """
    dt = cfg.dtype
    image = image.astype(dt)
    rgb, prev_mask = prepare_input(cfg, image)

    h, w = rgb.shape[1], rgb.shape[2]
    disks = dist_maps(points, h, w, norm_radius=cfg.norm_radius,
                      use_disks=cfg.use_disks).astype(rgb.dtype)
    n = points.shape[1] // 2
    disks_box = draw_box_into_coords(disks, boxes, n)
    disks_scr = draw_scribble_into_coords(disks, scribbles)
    is_box = (prompt_type == 1).astype(disks.dtype)
    is_scr = (prompt_type == 2).astype(disks.dtype)
    sel = disks * (1 - is_box - is_scr) + disks_box * is_box + disks_scr * is_scr
    coords = jnp.concatenate([prev_mask, sel], axis=-1) \
        if prev_mask is not None else sel

    tokens = vpu_backbone_embed(params, cfg, rgb, coords, shuffle_key)

    pv_click = ppue_click(points, cfg.ppue, num_max_points=cfg.num_max_points)
    pv_box = ppue_box(points, boxes, cfg.ppue, num_max_points=cfg.num_max_points)
    pv_scr = ppue_scribble(points, scribbles, scribble_rects, cfg.ppue,
                           num_max_points=cfg.num_max_points)
    fb = is_box.astype(pv_click.dtype)
    fs = is_scr.astype(pv_click.dtype)
    pv = (pv_click * (1 - fb - fs) + pv_box * fb + pv_scr * fs).astype(dt)

    ms_feats, q_out = neck_forward(params["neck"], cfg.neck, tokens, pv,
                                   cfg.backbone.grid_size,
                                   extra_queries=caption_queries(
                                       params, cfg, captions))
    seg, pcl = head_forward(params["head"], cfg.head, ms_feats, q_out,
                            dropout_key=dropout_key)

    out = {"instances": bilinear_resize(seg, h, w, align_corners=True)}
    if cfg.with_aux_output and pcl is not None:
        out["instances_aux"] = bilinear_resize(pcl, h, w, align_corners=True)
    else:
        out["instances_aux"] = None
    return out
