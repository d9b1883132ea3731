"""Swin transformer interactive-segmentation model (SwinformerModel).

Compact JAX re-derivation of `isegm/model/modeling/swin_transformer.py:1-654`
(wrapper at `is_swinformer_model.py:5-20`):

  * 4x4 patch embed; coord features enter through their own patch embed and
    add to the image tokens (coord-aware forward, swin_transformer.py:619-641
    — the same mechanism as the ViT models);
  * 4 stages of Swin blocks: window MSA with relative position bias,
    alternating shifted windows (cyclic roll + attention mask), patch
    merging (2x2 concat + linear) between stages;
  * head: the shared SegFormer-style multi-scale head (models/seg_head.py,
    the same SwinTransfomerSegHead the reference uses, without P2CL).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ... import nn
from ...ops.resize import bilinear_resize
from ..seg_head import HeadConfig, head_forward, init_head
from .common import is_inputs


@dataclasses.dataclass(frozen=True)
class SwinISConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)       # swin-T
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    head_channels: int = 128
    patch_norm: bool = False     # LN after image patch embed (reference
                                 # swin_transformer.py:439-456 default True;
                                 # off by default to keep old ckpts loading)
    num_max_points: int = 24
    norm_radius: float = 5.0
    use_disks: bool = True
    with_prev_mask: bool = True
    dtype: Any = jnp.float32

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2 ** i) for i in range(len(self.depths)))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _init_block(key, dim: int, heads: int, mlp_ratio: float, window: int):
    ks = jax.random.split(key, 4)
    return {
        "norm1": nn.init_layer_norm(dim),
        "qkv": nn.init_linear(ks[0], dim, dim * 3),
        "proj": nn.init_linear(ks[1], dim, dim),
        "rel_bias": nn.normal_init(ks[2],
                                   ((2 * window - 1) ** 2, heads), std=0.02),
        "norm2": nn.init_layer_norm(dim),
        "mlp": nn.init_mlp(ks[3], dim, int(dim * mlp_ratio)),
    }


def _rel_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + window - 1
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _window_attn(p, x: jnp.ndarray, hw: Tuple[int, int], heads: int,
                 window: int, shift: int) -> jnp.ndarray:
    """x: (B, H*W, C). Pads H/W up to window multiples internally."""
    b, n, c = x.shape
    h, w = hw
    xm = x.reshape(b, h, w, c)
    ph = (-h) % window
    pw = (-w) % window
    if ph or pw:
        xm = jnp.pad(xm, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    if shift:
        xm = jnp.roll(xm, (-shift, -shift), axis=(1, 2))

    nh, nw = hp // window, wp // window
    xw = xm.reshape(b, nh, window, nw, window, c)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw,
                                                window * window, c)

    qkv = nn.linear(p["qkv"], xw).reshape(xw.shape[0], -1, 3, heads,
                                          c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (c // heads) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    bias = p["rel_bias"][jnp.asarray(_rel_index(window))]
    logits = logits + bias.transpose(2, 0, 1)[None].astype(logits.dtype)

    if shift:
        # mask cross-window attention for rolled windows
        img_mask = np.zeros((1, hp, wp, 1), np.float32)
        cnt = 0
        for hs in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            for ws in (slice(0, -window), slice(-window, -shift),
                       slice(-shift, None)):
                img_mask[:, hs, ws, :] = cnt
                cnt += 1
        m = jnp.asarray(img_mask).reshape(1, nh, window, nw, window, 1)
        m = m.transpose(0, 1, 3, 2, 4, 5).reshape(nh * nw, window * window)
        attn_mask = (m[:, None, :] != m[:, :, None])
        attn_mask = jnp.where(attn_mask, -1e9, 0.0)
        logits = logits.reshape(b, nh * nw, heads, window * window,
                                window * window)
        logits = logits + attn_mask[None, :, None].astype(logits.dtype)
        logits = logits.reshape(b * nh * nw, heads, window * window,
                                window * window)

    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = nn.linear(p["proj"], out.reshape(xw.shape[0], -1, c))

    om = out.reshape(b, nh, nw, window, window, c)
    om = om.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if shift:
        om = jnp.roll(om, (shift, shift), axis=(1, 2))
    if ph or pw:
        om = om[:, :h, :w]
    return om.reshape(b, n, c)


def _block(p, x, hw, heads, window, shift, mlp_ratio):
    x = x + _window_attn(p, nn.layer_norm(p["norm1"], x, 1e-5), hw, heads,
                         window, shift)
    x = x + nn.mlp(p["mlp"], nn.layer_norm(p["norm2"], x, 1e-5))
    return x


def init_swin_is(key, cfg: SwinISConfig) -> Dict[str, Any]:
    coord_ch = 3 if cfg.with_prev_mask else 2
    ks = jax.random.split(key, 8)
    params: Dict[str, Any] = {
        "patch_embed": nn.init_patch_embed(ks[0], (4, 4), 3, cfg.embed_dim),
        "patch_embed_coords": nn.init_patch_embed(ks[1], (4, 4), coord_ch,
                                                  cfg.embed_dim,
                                                  init="torch"),
        "stages": [],
    }
    if cfg.patch_norm:
        params["patch_norm"] = nn.init_layer_norm(cfg.embed_dim)
    for i, depth in enumerate(cfg.depths):
        dim = cfg.stage_dims[i]
        kst = jax.random.fold_in(key, 10 + i)
        stage = {
            "blocks": [_init_block(jax.random.fold_in(kst, j), dim,
                                   cfg.num_heads[i], cfg.mlp_ratio,
                                   cfg.window)
                       for j in range(depth)],
            "norm": nn.init_layer_norm(dim),
        }
        if i < len(cfg.depths) - 1:
            stage["merge"] = {
                "norm": nn.init_layer_norm(4 * dim),
                "lin": nn.init_linear(jax.random.fold_in(kst, 99), 4 * dim,
                                      2 * dim, bias=False),
            }
        params["stages"].append(stage)
    params["head"] = init_head(
        ks[2], HeadConfig(in_channels=cfg.stage_dims,
                          channels=cfg.head_channels, ed_loss=False))
    return params


def swin_is_forward(params, cfg: SwinISConfig, image: jnp.ndarray,
                    points: jnp.ndarray, coord_bias=None,
                    **_) -> Dict[str, jnp.ndarray]:
    rgb, coords = is_inputs(image, points, cfg.norm_radius, cfg.use_disks,
                            cfg.with_prev_mask, cfg.dtype,
                            coord_bias=coord_bias)
    x = nn.patch_embed(params["patch_embed"], rgb, (4, 4))
    if "patch_norm" in params:
        x = nn.layer_norm(params["patch_norm"], x, 1e-5)
    x = x + nn.patch_embed(params["patch_embed_coords"], coords, (4, 4))

    h, w = rgb.shape[1] // 4, rgb.shape[2] // 4
    feats: List[jnp.ndarray] = []
    for i, stage in enumerate(params["stages"]):
        for j, blk in enumerate(stage["blocks"]):
            shift = 0 if j % 2 == 0 else cfg.window // 2
            x = _block(blk, x, (h, w), cfg.num_heads[i], cfg.window, shift,
                       cfg.mlp_ratio)
        y = nn.layer_norm(stage["norm"], x, 1e-5)
        feats.append(y.reshape(y.shape[0], h, w, -1))
        if "merge" in stage:
            b, n, c = x.shape
            xm = x.reshape(b, h, w, c)
            ph, pw = h % 2, w % 2
            if ph or pw:
                xm = jnp.pad(xm, ((0, 0), (0, ph), (0, pw), (0, 0)))
            x0 = xm[:, 0::2, 0::2]
            x1 = xm[:, 1::2, 0::2]
            x2 = xm[:, 0::2, 1::2]
            x3 = xm[:, 1::2, 1::2]
            xm = jnp.concatenate([x0, x1, x2, x3], axis=-1)
            h, w = xm.shape[1], xm.shape[2]
            xm = nn.layer_norm(stage["merge"]["norm"],
                               xm.reshape(b, h * w, 4 * c), 1e-5)
            x = nn.linear(stage["merge"]["lin"], xm)

    seg, _ = head_forward(params["head"],
                          HeadConfig(in_channels=cfg.stage_dims,
                                     channels=cfg.head_channels,
                                     ed_loss=False), feats, q_out=None)
    hh, ww = image.shape[1], image.shape[2]
    return {"instances": bilinear_resize(seg, hh, ww, align_corners=True),
            "instances_aux": None}
