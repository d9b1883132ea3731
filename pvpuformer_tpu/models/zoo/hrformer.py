"""HRFormer interactive-segmentation model.

Compact JAX re-derivation of the reference's HRFormer stack
(`isegm/model/modeling/hrformer.py` + `hrformer_helper/hrt/**`, ~3.4k LoC;
wrapper at `is_hrformer_model.py:11-30`): the HRNet multi-branch topology
(stem, transitions, cross-resolution fusion — reused from zoo/hrnet.py) with
transformer basic units instead of conv blocks. Each unit is the HRT local-
window MSA (relative position bias, no shift) followed by the HRT FFN
(fc -> 3x3 depthwise conv -> GELU -> fc). The reference's interlaced sparse
attention (ISA) alternates local and interlaced token groupings; here odd
units use a grid-interlaced window gather — same receptive-field effect,
expressed as reshapes (documented simplification of isa_attention.py).
OCR head shared with HRNet.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ... import nn
from ...ops.resize import bilinear_resize
from .common import (conv_bn_relu, init_conv_bn, init_maps_transform,
                     maps_transform, is_inputs)
from .hrnet import (_init_transition, _transition, _init_ocr, _ocr,
                    _init_bottleneck, _bottleneck)
from .swin import _rel_index


@dataclasses.dataclass(frozen=True)
class HRFormerISConfig:
    width: int = 32                      # HRT-S: 32; HRT-B: 78
    num_heads: Tuple[int, ...] = (1, 2, 4, 8)
    num_units: Tuple[int, int, int] = (1, 2, 2)   # modules per stage 2/3/4
    blocks_per_unit: int = 2
    window: int = 7
    mlp_ratio: float = 4.0
    ocr_width: int = 64
    num_max_points: int = 24
    norm_radius: float = 5.0
    use_disks: bool = True
    with_prev_mask: bool = True
    use_leaky_relu: bool = True
    dtype: Any = jnp.float32

    @property
    def branch_widths(self) -> Tuple[int, ...]:
        w = self.width
        return (w, 2 * w, 4 * w, 8 * w)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _init_unit(key, dim: int, heads: int, mlp_ratio: float, window: int):
    ks = jax.random.split(key, 5)
    return {
        "norm1": nn.init_layer_norm(dim),
        "qkv": nn.init_linear(ks[0], dim, dim * 3),
        "proj": nn.init_linear(ks[1], dim, dim),
        "rel_bias": nn.normal_init(ks[2], ((2 * window - 1) ** 2, heads),
                                   std=0.02),
        "norm2": nn.init_layer_norm(dim),
        "fc1": nn.init_linear(ks[3], dim, int(dim * mlp_ratio)),
        "dw": {"w": nn.kaiming_uniform(ks[4],
                                       (3, 3, 1, int(dim * mlp_ratio)),
                                       fan_in=9),
               "b": jnp.zeros((int(dim * mlp_ratio),))},
        "fc2": nn.init_linear(jax.random.fold_in(key, 9),
                              int(dim * mlp_ratio), dim),
    }


def _window_partition(x: jnp.ndarray, window: int, interlace: bool):
    """(B, H, W, C) -> (B*nw, window*window, C). Interlaced mode groups
    tokens on a strided grid (ISA long-range grouping)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % window, (-w) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    nh, nw = hp // window, wp // window
    if interlace:
        xw = x.reshape(b, window, nh, window, nw, c)
        xw = xw.transpose(0, 2, 4, 1, 3, 5)
    else:
        xw = x.reshape(b, nh, window, nw, window, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(b * nh * nw, window * window, c), (hp, wp, nh, nw,
                                                         ph, pw)


def _window_merge(xw: jnp.ndarray, shape, window: int, interlace: bool,
                  b: int, c: int):
    hp, wp, nh, nw, ph, pw = shape
    if interlace:
        x = xw.reshape(b, nh, nw, window, window, c)
        x = x.transpose(0, 3, 1, 4, 2, 5)
    else:
        x = xw.reshape(b, nh, nw, window, window, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, c)
    if ph or pw:
        x = x[:, :hp - ph, :wp - pw]
    return x


def _unit(p, x: jnp.ndarray, heads: int, window: int,
          interlace: bool) -> jnp.ndarray:
    b, h, w, c = x.shape
    res = x
    tokens = nn.layer_norm(p["norm1"], x.reshape(b, h * w, c)).reshape(
        b, h, w, c)
    xw, shape = _window_partition(tokens, window, interlace)
    qkv = nn.linear(p["qkv"], xw).reshape(xw.shape[0], -1, 3, heads,
                                          c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (c // heads) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    bias = p["rel_bias"][jnp.asarray(_rel_index(window))]
    logits = logits + bias.transpose(2, 0, 1)[None].astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = nn.linear(p["proj"], out.reshape(xw.shape[0], -1, c))
    x = res + _window_merge(out, shape, window, interlace, b, c)

    res = x
    t = nn.layer_norm(p["norm2"], x.reshape(b, h * w, c))
    t = nn.linear(p["fc1"], t).reshape(b, h, w, -1)
    t = jax.lax.conv_general_dilated(
        t, p["dw"]["w"].astype(t.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=t.shape[-1],
        preferred_element_type=jnp.float32).astype(t.dtype) + \
        p["dw"]["b"].astype(t.dtype)
    t = nn.linear(p["fc2"], nn.gelu(t.reshape(b, h * w, -1)))
    return res + t.reshape(b, h, w, c)


def _init_hr_module(key, widths, cfg: HRFormerISConfig):
    nb = len(widths)
    p: Dict[str, Any] = {"branches": [], "fuse": []}
    for bi in range(nb):
        kb = jax.random.fold_in(key, bi)
        p["branches"].append([
            _init_unit(jax.random.fold_in(kb, j), widths[bi],
                       cfg.num_heads[bi], cfg.mlp_ratio, cfg.window)
            for j in range(cfg.blocks_per_unit)])
    from .hrnet import _init_module as _hr_init
    p["fuse"] = _hr_init(jax.random.fold_in(key, 777), widths, 1)["fuse"]
    return p


def _hr_module(p, xs: List[jnp.ndarray], cfg: HRFormerISConfig):
    from .hrnet import conv_bn_relu as cbr
    nb = len(xs)
    ys = []
    for bi in range(nb):
        y = xs[bi]
        for j, unit in enumerate(p["branches"][bi]):
            y = _unit(unit, y, cfg.num_heads[bi], cfg.window,
                      interlace=(j % 2 == 1))
        ys.append(y)
    outs = []
    for i in range(nb):
        acc = None
        for j in range(nb):
            f = p["fuse"][i][j]
            if j > i:
                v = cbr(f["up"], ys[j], relu=False)
                v = bilinear_resize(v, ys[i].shape[1], ys[i].shape[2],
                                    align_corners=True)
            elif j < i:
                v = ys[j]
                for step, c in enumerate(f["downs"]):
                    last = step == len(f["downs"]) - 1
                    v = cbr(c, v, stride=2, relu=not last)
            else:
                v = ys[j]
            acc = v if acc is None else acc + v
        outs.append(jax.nn.relu(acc))
    return outs


def init_hrformer_is(key, cfg: HRFormerISConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 12)
    coord_ch = 3 if cfg.with_prev_mask else 2
    w = cfg.branch_widths
    return {
        "maps_transform": init_maps_transform(ks[0], coord_ch),
        "stem1": init_conv_bn(ks[1], 3, 3, 3, 64),
        "stem2": init_conv_bn(ks[2], 3, 3, 64, 64),
        "layer1": [_init_bottleneck(jax.random.fold_in(ks[3], j),
                                    64 if j == 0 else 256, 64)
                   for j in range(2)],
        "tr1": _init_transition(ks[4], (256,), w[:2]),
        "stage2": [_init_hr_module(jax.random.fold_in(ks[5], m), w[:2], cfg)
                   for m in range(cfg.num_units[0])],
        "tr2": _init_transition(ks[6], w[:2], w[:3]),
        "stage3": [_init_hr_module(jax.random.fold_in(ks[7], m), w[:3], cfg)
                   for m in range(cfg.num_units[1])],
        "tr3": _init_transition(ks[8], w[:3], w),
        "stage4": [_init_hr_module(jax.random.fold_in(ks[9], m), w, cfg)
                   for m in range(cfg.num_units[2])],
        "ocr": _init_ocr(ks[10], sum(w), cfg.ocr_width),
    }


def hrformer_is_forward(params, cfg: HRFormerISConfig, image: jnp.ndarray,
                        points: jnp.ndarray, coord_bias=None,
                        **_) -> Dict[str, jnp.ndarray]:
    rgb, coords = is_inputs(image, points, cfg.norm_radius, cfg.use_disks,
                            cfg.with_prev_mask, cfg.dtype,
                            coord_bias=coord_bias)
    extra = maps_transform(params["maps_transform"], coords,
                           leaky=cfg.use_leaky_relu)
    x = conv_bn_relu(params["stem1"], rgb, stride=2)
    x = x + extra
    x = conv_bn_relu(params["stem2"], x, stride=2)
    for blk in params["layer1"]:
        x = _bottleneck(blk, x)

    xs = _transition(params["tr1"], [x])
    for m in params["stage2"]:
        xs = _hr_module(m, xs, cfg)
    xs = _transition(params["tr2"], xs)
    for m in params["stage3"]:
        xs = _hr_module(m, xs, cfg)
    xs = _transition(params["tr3"], xs)
    for m in params["stage4"]:
        xs = _hr_module(m, xs, cfg)

    th, tw = xs[0].shape[1], xs[0].shape[2]
    feats = jnp.concatenate(
        [xs[0]] + [bilinear_resize(v, th, tw, align_corners=True)
                   for v in xs[1:]], axis=-1)
    logits, aux = _ocr(params["ocr"], feats)
    hh, ww = image.shape[1], image.shape[2]
    return {"instances": bilinear_resize(logits, hh, ww, align_corners=True),
            "instances_aux": bilinear_resize(aux, hh, ww,
                                             align_corners=True)}
