"""SegFormer (MixVisionTransformer) interactive-segmentation model.

Compact JAX re-derivation of the reference's mmseg-style SegFormer
(`isegm/model/modeling/segformer.py:17-478`, wrapper at
`is_segformer_model.py:9-28`):

  * 4 stages of OverlapPatchEmbed (conv k7s4 then k3s2) + transformer blocks
    with spatial-reduction ("efficient") attention and Mix-FFN (fc1 ->
    3x3 depthwise conv -> GELU -> fc2), LayerNorm throughout;
  * coord features enter as EXTRA INPUT CHANNELS of the stage-1 patch embed
    (the reference's "v3" path duplicates the stage-1 projection weights to
    double in_chans and concatenates, segformer.py:399-404; its
    additional_features argument is accepted but unused, 407-420);
  * SegformerHead: per-stage linear -> resize to 1/4 -> concat -> fused conv
    -> cls.

Presets follow the mit-b0..b5 table (embed dims / depths / heads / sr).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.resize import bilinear_resize
from .common import init_conv_bn, conv_bn_relu, is_inputs

MIT_PRESETS = {
    "b0": dict(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "b1": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "b2": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3)),
    "b3": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3)),
    "b4": dict(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3)),
    "b5": dict(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3)),
}


@dataclasses.dataclass(frozen=True)
class SegformerISConfig:
    embed_dims: Tuple[int, ...] = (32, 64, 160, 256)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratio: float = 4.0
    head_channels: int = 256
    num_max_points: int = 24
    norm_radius: float = 5.0
    use_disks: bool = True
    with_prev_mask: bool = True
    use_leaky_relu: bool = True
    dtype: Any = jnp.float32

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _init_dwconv(key, ch: int) -> Dict[str, Any]:
    # depthwise 3x3 (segformer MixFFN dwconv)
    w = nn.kaiming_uniform(key, (3, 3, 1, ch), fan_in=9)
    return {"w": w, "b": jnp.zeros((ch,))}


def _dwconv(p, x: jnp.ndarray) -> jnp.ndarray:
    y = nn.conv_nhwc(
        x, p["w"].astype(x.dtype), (1, 1), "SAME",
        x.shape[-1], (1, 1)).astype(x.dtype)
    return y + p["b"].astype(x.dtype)


def _init_block(key, dim: int, heads: int, mlp_ratio: float, sr: int):
    ks = jax.random.split(key, 8)
    hidden = int(dim * mlp_ratio)
    p = {
        "norm1": nn.init_layer_norm(dim),
        "q": nn.init_linear(ks[0], dim, dim),
        "kv": nn.init_linear(ks[1], dim, dim * 2),
        "proj": nn.init_linear(ks[2], dim, dim),
        "norm2": nn.init_layer_norm(dim),
        "fc1": nn.init_linear(ks[3], dim, hidden),
        "dw": _init_dwconv(ks[4], hidden),
        "fc2": nn.init_linear(ks[5], hidden, dim),
    }
    if sr > 1:
        p["sr"] = nn.init_conv(ks[6], sr, sr, dim, dim)
        p["sr_norm"] = nn.init_layer_norm(dim)
    return p


def _block(p, x: jnp.ndarray, hw: Tuple[int, int], heads: int,
           sr: int) -> jnp.ndarray:
    b, n, d = x.shape
    h, w = hw
    res = x
    x = nn.layer_norm(p["norm1"], x, 1e-6)
    q = nn.linear(p["q"], x).reshape(b, n, heads, d // heads)
    kv_in = x
    if sr > 1:
        m = x.reshape(b, h, w, d)
        m = nn.conv2d(p["sr"], m, stride=sr, padding="VALID")
        kv_in = nn.layer_norm(p["sr_norm"],
                              m.reshape(b, -1, d), 1e-6)
    kv = nn.linear(p["kv"], kv_in).reshape(b, -1, 2, heads, d // heads)
    att = nn.sdpa(q, kv[:, :, 0], kv[:, :, 1]).reshape(b, n, d)
    x = res + nn.linear(p["proj"], att)

    res = x
    y = nn.layer_norm(p["norm2"], x, 1e-6)
    y = nn.linear(p["fc1"], y)
    y = _dwconv(p["dw"], y.reshape(b, h, w, -1)).reshape(b, n, -1)
    y = nn.linear(p["fc2"], nn.gelu(y))
    return res + y


def init_segformer_is(key, cfg: SegformerISConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 20)
    coord_ch = 3 if cfg.with_prev_mask else 2
    params: Dict[str, Any] = {"stages": []}
    in_ch = 3 + coord_ch            # coords concatenated into stage-1 input
    patch = [(7, 4), (3, 2), (3, 2), (3, 2)]
    for i, dim in enumerate(cfg.embed_dims):
        kstage = jax.random.fold_in(key, 100 + i)
        kb = jax.random.split(kstage, cfg.depths[i] + 2)
        kpatch, knorm = kb[-2], kb[-1]
        kH, s = patch[i]
        stage = {
            "patch": nn.init_conv(kpatch, kH, kH, in_ch, dim),
            "patch_norm": nn.init_layer_norm(dim),
            "blocks": [_init_block(kb[j], dim, cfg.num_heads[i],
                                   cfg.mlp_ratio, cfg.sr_ratios[i])
                       for j in range(cfg.depths[i])],
            "norm": nn.init_layer_norm(dim),
        }
        params["stages"].append(stage)
        in_ch = dim
    # head
    hc = cfg.head_channels
    params["head"] = {
        "linears": [nn.init_linear(jax.random.fold_in(key, 200 + i), dim, hc)
                    for i, dim in enumerate(cfg.embed_dims)],
        "fuse": init_conv_bn(ks[2], 1, 1, hc * 4, hc),
        "cls": nn.init_conv1x1(ks[3], hc, 1),
    }
    return params


def _stage_patch(stage, x: jnp.ndarray, k: int, s: int) -> jnp.ndarray:
    y = nn.conv2d(stage["patch"], x, stride=s)
    b, h, w, d = y.shape
    return nn.layer_norm(stage["patch_norm"], y.reshape(b, h * w, d),
                         1e-6), (h, w)


def segformer_backbone(params, cfg: SegformerISConfig,
                       x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (B, H, W, 3 + coord_ch) — image ++ coord channels."""
    feats = []
    patch = [(7, 4), (3, 2), (3, 2), (3, 2)]
    for i, stage in enumerate(params["stages"]):
        k, s = patch[i]
        tokens, (h, w) = _stage_patch(stage, x, k, s)
        for blk in stage["blocks"]:
            tokens = _block(blk, tokens, (h, w), cfg.num_heads[i],
                            cfg.sr_ratios[i])
        tokens = nn.layer_norm(stage["norm"], tokens, 1e-6)
        x = tokens.reshape(tokens.shape[0], h, w, -1)
        feats.append(x)
    return feats


def segformer_is_forward(params, cfg: SegformerISConfig, image: jnp.ndarray,
                         points: jnp.ndarray, coord_bias=None,
                         **_) -> Dict[str, jnp.ndarray]:
    rgb, coords = is_inputs(image, points, cfg.norm_radius, cfg.use_disks,
                            cfg.with_prev_mask, cfg.dtype,
                            coord_bias=coord_bias)
    feats = segformer_backbone(params, cfg,
                               jnp.concatenate([rgb, coords], axis=-1))

    th, tw = feats[0].shape[1], feats[0].shape[2]
    outs = []
    for f, lin in zip(feats, params["head"]["linears"]):
        b, h, w, d = f.shape
        y = nn.linear(lin, f.reshape(b, h * w, d)).reshape(b, h, w, -1)
        outs.append(bilinear_resize(y, th, tw, align_corners=False))
    fused = conv_bn_relu(params["head"]["fuse"],
                         jnp.concatenate(outs, axis=-1))
    seg = nn.conv1x1(params["head"]["cls"], fused)
    hh, ww = image.shape[1], image.shape[2]
    return {"instances": bilinear_resize(seg, hh, ww, align_corners=True),
            "instances_aux": None}
