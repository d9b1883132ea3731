"""Swin-UNet segmentation model.

Compact JAX re-derivation of `isegm/model/modeling/swin_unet.py:8-750`
(SwinTransformerSys — present in the reference for medical-segmentation
experiments, unused by the VPU path): a symmetric U-shaped Swin encoder/
decoder — encoder stages with patch merging (reused from zoo/swin.py
machinery), a mirrored decoder with patch *expanding* (linear 2x up +
pixel shuffle), skip connections concatenated + linear-reduced at each
scale, and a final 4x expand + 1x1 cls head.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.resize import bilinear_resize
from .common import is_inputs
from .swin import _init_block, _block


@dataclasses.dataclass(frozen=True)
class SwinUNetISConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
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


def _init_expand(key, dim: int, factor: int = 2):
    """Patch expanding: linear dim -> (factor^2 * dim/factor), pixel shuffle."""
    out = (factor * factor) * (dim // factor) if factor == 2 else \
        (factor * factor) * dim
    return {"lin": nn.init_linear(key, dim, out, bias=False),
            "norm": nn.init_layer_norm(out // (factor * factor))}


def _expand(p, x: jnp.ndarray, h: int, w: int, factor: int = 2):
    b, n, d = x.shape
    y = nn.linear(p["lin"], x)
    c = y.shape[-1] // (factor * factor)
    y = y.reshape(b, h, w, factor, factor, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * factor, w * factor, c)
    y = nn.layer_norm(p["norm"], y.reshape(b, -1, c), 1e-5)
    return y, h * factor, w * factor


def init_swin_unet_is(key, cfg: SwinUNetISConfig) -> Dict[str, Any]:
    coord_ch = 3 if cfg.with_prev_mask else 2
    ks = jax.random.split(key, 10)
    dims = cfg.stage_dims
    nstage = len(cfg.depths)
    params: Dict[str, Any] = {
        "patch_embed": nn.init_patch_embed(ks[0], (4, 4), 3 + coord_ch,
                                           cfg.embed_dim),
        "enc": [], "dec": [], "skips": [],
    }
    for i in range(nstage):
        kst = jax.random.fold_in(key, 10 + i)
        enc = {"blocks": [_init_block(jax.random.fold_in(kst, j), dims[i],
                                      cfg.num_heads[i], cfg.mlp_ratio,
                                      cfg.window)
                          for j in range(cfg.depths[i])]}
        if i < nstage - 1:
            enc["merge"] = {
                "norm": nn.init_layer_norm(4 * dims[i]),
                "lin": nn.init_linear(jax.random.fold_in(kst, 99),
                                      4 * dims[i], 2 * dims[i], bias=False)}
        params["enc"].append(enc)
    for i in range(nstage - 1):                  # decoder, deepest first
        di = dims[nstage - 1 - i]
        kst = jax.random.fold_in(key, 50 + i)
        params["dec"].append({
            "expand": _init_expand(jax.random.fold_in(kst, 0), di),
            "reduce": nn.init_linear(jax.random.fold_in(kst, 1), di,
                                     di // 2, bias=False),
            "blocks": [_init_block(jax.random.fold_in(kst, 2 + j), di // 2,
                                   cfg.num_heads[nstage - 2 - i],
                                   cfg.mlp_ratio, cfg.window)
                       for j in range(cfg.depths[nstage - 2 - i])],
        })
    params["final_expand"] = _init_expand(ks[2], dims[0], factor=4)
    params["cls"] = nn.init_conv1x1(ks[3], dims[0], 1)
    params["norm"] = nn.init_layer_norm(dims[0])
    return params


def swin_unet_is_forward(params, cfg: SwinUNetISConfig, image: jnp.ndarray,
                         points: jnp.ndarray, coord_bias=None,
                         **_) -> Dict[str, jnp.ndarray]:
    rgb, coords = is_inputs(image, points, cfg.norm_radius, cfg.use_disks,
                            cfg.with_prev_mask, cfg.dtype,
                            coord_bias=coord_bias)
    x = nn.patch_embed(params["patch_embed"],
                       jnp.concatenate([rgb, coords], axis=-1), (4, 4))
    h, w = rgb.shape[1] // 4, rgb.shape[2] // 4
    b = x.shape[0]

    skips: List[Tuple[jnp.ndarray, int, int]] = []
    for i, enc in enumerate(params["enc"]):
        for j, blk in enumerate(enc["blocks"]):
            shift = 0 if j % 2 == 0 else cfg.window // 2
            x = _block(blk, x, (h, w), cfg.num_heads[i], cfg.window, shift,
                       cfg.mlp_ratio)
        skips.append((x, h, w))
        if "merge" in enc:
            c = x.shape[-1]
            xm = x.reshape(b, h, w, c)
            x0, x1 = xm[:, 0::2, 0::2], xm[:, 1::2, 0::2]
            x2, x3 = xm[:, 0::2, 1::2], xm[:, 1::2, 1::2]
            xm = jnp.concatenate([x0, x1, x2, x3], axis=-1)
            h, w = xm.shape[1], xm.shape[2]
            xm = nn.layer_norm(enc["merge"]["norm"],
                               xm.reshape(b, h * w, 4 * c), 1e-5)
            x = nn.linear(enc["merge"]["lin"], xm)

    nstage = len(cfg.depths)
    for i, dec in enumerate(params["dec"]):
        x, h, w = _expand(dec["expand"], x, h, w)
        skip, sh, sw = skips[nstage - 2 - i]
        x = jnp.concatenate([x, skip], axis=-1)
        x = nn.linear(dec["reduce"], x)
        for j, blk in enumerate(dec["blocks"]):
            shift = 0 if j % 2 == 0 else cfg.window // 2
            x = _block(blk, x, (h, w), cfg.num_heads[nstage - 2 - i],
                       cfg.window, shift, cfg.mlp_ratio)

    x = nn.layer_norm(params["norm"], x, 1e-5)
    x, h, w = _expand(params["final_expand"], x, h, w, factor=4)
    seg = nn.conv1x1(params["cls"], x.reshape(b, h, w, -1))
    hh, ww = image.shape[1], image.shape[2]
    return {"instances": bilinear_resize(seg, hh, ww, align_corners=True),
            "instances_aux": None}
