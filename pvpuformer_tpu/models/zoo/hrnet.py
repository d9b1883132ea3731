"""HRNet-W + OCR interactive-segmentation model (RITM's flagship backbone).

Compact JAX re-derivation of `isegm/model/modeling/hrnet_ocr.py:13-430` +
`ocr.py:7-141`, wrapper at `is_hrnet_model.py:9-26`:

  * stem: two stride-2 3x3 conv+BN+ReLU; RITM coord features
    (maps_transform, 64ch stride-2) are ADDED after the first stem conv
    (hrnet_ocr.py:391-396);
  * layer1: 4 bottleneck blocks at stride 4 (64 -> 256);
  * stages 2/3/4: 2/3/4 parallel branches at strides 4/8/16/32 with widths
    W/2W/4W/8W, each module = `blocks_per_module` basic blocks per branch +
    full cross-resolution fusion (upsample = 1x1 conv + bilinear; downsample
    = chained stride-2 3x3 convs);
  * OCR head (ocr.py): aux FCN head -> soft object regions; SpatialGather
    pools per-region features; ObjectAttentionBlock (query pixels against
    region keys) -> context, concat + 1x1 fuse -> final 1-channel cls.

Norms are frozen-BN (zoo/common.py); RITM HRNetModel weights ingest via
utils/torch_ingest.convert_hrnet_checkpoint (name-map tested).
Widths: hrnetv2_w18_small / w18 / w32 / w48 via `width` and `small`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.resize import bilinear_resize
from .common import (conv_bn_relu, init_conv_bn,
                     init_maps_transform, maps_transform, is_inputs)


@dataclasses.dataclass(frozen=True)
class HRNetISConfig:
    width: int = 18
    small: bool = True
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

    @property
    def num_modules(self) -> Tuple[int, int, int]:
        return (1, 3, 2) if self.small else (1, 4, 3)

    @property
    def blocks_per_module(self) -> int:
        # hrnet_ocr.py:170: num_blocks = 2 if small else 4 (layer1 + branches)
        return 2 if self.small else 4

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ----------------------------------------------------------------- blocks

def _init_basic(key, cin: int, cout: int, stride: int = 1):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"c1": init_conv_bn(k1, 3, 3, cin, cout),
         "c2": init_conv_bn(k2, 3, 3, cout, cout)}
    if stride != 1 or cin != cout:
        p["down"] = init_conv_bn(k3, 1, 1, cin, cout)
    assert stride == 1, "HR-module basic blocks are always stride 1"
    return p


def _basic(p, x):
    res = x
    y = conv_bn_relu(p["c1"], x)
    y = conv_bn_relu(p["c2"], y, relu=False)
    if "down" in p:
        res = conv_bn_relu(p["down"], x, relu=False)
    return jax.nn.relu(res + y)


def _init_bottleneck(key, cin: int, planes: int, stride: int = 1):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cout = planes * 4
    p = {"c1": init_conv_bn(k1, 1, 1, cin, planes),
         "c2": init_conv_bn(k2, 3, 3, planes, planes),
         "c3": init_conv_bn(k3, 1, 1, planes, cout)}
    if stride != 1 or cin != cout:
        p["down"] = init_conv_bn(k4, 1, 1, cin, cout)
    assert stride == 1, "layer1 bottlenecks are stride 1 (hrnet_ocr.py)"
    return p


def _bottleneck(p, x):
    res = x
    y = conv_bn_relu(p["c1"], x)
    y = conv_bn_relu(p["c2"], y)
    y = conv_bn_relu(p["c3"], y, relu=False)
    if "down" in p:
        res = conv_bn_relu(p["down"], x, relu=False)
    return jax.nn.relu(res + y)


# ------------------------------------------------------------------ stages

def _init_module(key, widths: Tuple[int, ...], blocks: int):
    """One HR module: `blocks` basic blocks per branch + full fusion."""
    nb = len(widths)
    p: Dict[str, Any] = {"branches": [], "fuse": []}
    for bi in range(nb):
        kb = jax.random.fold_in(key, bi)
        p["branches"].append([
            _init_basic(jax.random.fold_in(kb, j), widths[bi], widths[bi])
            for j in range(blocks)])
    for i in range(nb):            # output branch i
        row = []
        for j in range(nb):        # input branch j
            kf = jax.random.fold_in(key, 100 + i * 10 + j)
            if j > i:              # upsample: 1x1 conv then bilinear
                row.append({"up": init_conv_bn(kf, 1, 1, widths[j], widths[i])})
            elif j < i:            # downsample chain of stride-2 3x3
                chain = []
                cin = widths[j]
                for step in range(i - j):
                    cout = widths[i] if step == i - j - 1 else cin
                    chain.append(init_conv_bn(
                        jax.random.fold_in(kf, step), 3, 3, cin, cout))
                    cin = cout
                row.append({"downs": chain})
            else:
                row.append({})
        p["fuse"].append(row)
    return p


def _module(p, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    nb = len(xs)
    ys = []
    for bi in range(nb):
        y = xs[bi]
        for blk in p["branches"][bi]:
            y = _basic(blk, y)
        ys.append(y)
    outs = []
    for i in range(nb):
        acc = None
        for j in range(nb):
            f = p["fuse"][i][j]
            if j > i:
                v = conv_bn_relu(f["up"], ys[j], relu=False)
                v = bilinear_resize(v, ys[i].shape[1], ys[i].shape[2],
                                    align_corners=True)
            elif j < i:
                v = ys[j]
                for step, c in enumerate(f["downs"]):
                    last = step == len(f["downs"]) - 1
                    v = conv_bn_relu(c, v, stride=2, relu=not last)
            else:
                v = ys[j]
            acc = v if acc is None else acc + v
        outs.append(jax.nn.relu(acc))
    return outs


def _init_transition(key, prev: Tuple[int, ...], new: Tuple[int, ...]):
    """Branch-count transition: adapt existing + create new via stride-2."""
    p = []
    for i, w in enumerate(new):
        kf = jax.random.fold_in(key, i)
        if i < len(prev):
            p.append(init_conv_bn(kf, 3, 3, prev[i], w)
                     if prev[i] != w else {})
        else:
            p.append({"new": init_conv_bn(kf, 3, 3, prev[-1], w)})
    return p


def _transition(p, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    outs = []
    for i, t in enumerate(p):
        if "new" in t:
            outs.append(conv_bn_relu(t["new"], xs[-1], stride=2))
        elif t:
            outs.append(conv_bn_relu(t, xs[i]))
        else:
            outs.append(xs[i])
    return outs


# --------------------------------------------------------------------- OCR

def _init_ocr(key, in_ch: int, ocr_w: int):
    ks = jax.random.split(key, 8)
    mid = 2 * ocr_w
    return {
        "aux": {"c1": init_conv_bn(ks[0], 1, 1, in_ch, in_ch),
                "cls": nn.init_conv1x1(ks[1], in_ch, 1)},
        "conv3x3": init_conv_bn(ks[2], 3, 3, in_ch, mid),
        # ObjectAttentionBlock (ocr.py:66-141) pixel/region projections
        "f_pixel": [init_conv_bn(ks[3], 1, 1, mid, ocr_w),
                    init_conv_bn(jax.random.fold_in(ks[3], 1), 1, 1, ocr_w, ocr_w)],
        "f_object": [init_conv_bn(ks[4], 1, 1, mid, ocr_w),
                     init_conv_bn(jax.random.fold_in(ks[4], 1), 1, 1, ocr_w, ocr_w)],
        "f_down": init_conv_bn(ks[5], 1, 1, mid, ocr_w),
        "f_up": init_conv_bn(ks[6], 1, 1, ocr_w, mid),
        "bottleneck": init_conv_bn(ks[7], 1, 1, 2 * mid, mid),
        "cls": nn.init_conv1x1(jax.random.fold_in(key, 77), mid, 1),
    }


def _ocr_pre_cls(p, feats: jnp.ndarray):
    """feats: (B, H, W, C) concat of upsampled branches.
    Returns (pre-cls OCR features (B, H, W, 2*ocr_w), aux logits) —
    split out so feature-BRS insertion 'C' (brs.py:194-195) can scale the
    pre-cls features and re-run only the cls conv."""
    aux = conv_bn_relu(p["aux"]["c1"], feats)
    aux_logits = nn.conv1x1(p["aux"]["cls"], aux)          # (B, H, W, K=1)

    x = conv_bn_relu(p["conv3x3"], feats)                  # (B, H, W, mid)
    b, h, w, c = x.shape

    # SpatialGather (ocr.py:26-46): region features = prob-weighted pooling.
    # With num_classes=1 the softmax over a single class map is uniform, so
    # we follow the math (softmax over pixels per class).
    probs = jax.nn.softmax(
        aux_logits.reshape(b, h * w, -1).astype(jnp.float32), axis=1)
    pix = x.reshape(b, h * w, c).astype(jnp.float32)
    regions = jnp.einsum("bnk,bnc->bkc", probs, pix,
                         preferred_element_type=jnp.float32).astype(x.dtype)

    # ObjectAttention: query pixels vs region keys
    q = x
    for cbr in p["f_pixel"]:
        q = conv_bn_relu(cbr, q)
    k = regions[:, None]                                   # (B, 1, K, mid)
    for cbr in p["f_object"]:
        k = conv_bn_relu(cbr, k)
    v = conv_bn_relu(p["f_down"], regions[:, None])
    d = q.shape[-1]
    sim = jnp.einsum("bhwc,bzkc->bhwk", q, k,
                     preferred_element_type=jnp.float32) * (d ** -0.5)
    att = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhwk,bzkc->bhwc", att, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    ctx = conv_bn_relu(p["f_up"], ctx)

    y = conv_bn_relu(p["bottleneck"], jnp.concatenate([ctx, x], axis=-1))
    return y, aux_logits


def _ocr(p, feats: jnp.ndarray):
    """(final logits, aux logits) at stride 4."""
    y, aux_logits = _ocr_pre_cls(p, feats)
    return nn.conv1x1(p["cls"], y), aux_logits


# ------------------------------------------------------------------- model

def init_hrnet_is(key, cfg: HRNetISConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 12)
    coord_ch = 3 if cfg.with_prev_mask else 2
    w = cfg.branch_widths
    params: Dict[str, Any] = {
        "maps_transform": init_maps_transform(ks[0], coord_ch),
        "stem1": init_conv_bn(ks[1], 3, 3, 3, 64),
        "stem2": init_conv_bn(ks[2], 3, 3, 64, 64),
        "layer1": [_init_bottleneck(jax.random.fold_in(ks[3], j),
                                    64 if j == 0 else 256, 64)
                   for j in range(cfg.blocks_per_module)],
        "tr1": _init_transition(ks[4], (256,), w[:2]),
        "stage2": [_init_module(jax.random.fold_in(ks[5], m), w[:2],
                                cfg.blocks_per_module)
                   for m in range(cfg.num_modules[0])],
        "tr2": _init_transition(ks[6], w[:2], w[:3]),
        "stage3": [_init_module(jax.random.fold_in(ks[7], m), w[:3],
                                cfg.blocks_per_module)
                   for m in range(cfg.num_modules[1])],
        "tr3": _init_transition(ks[8], w[:3], w),
        "stage4": [_init_module(jax.random.fold_in(ks[9], m), w,
                                cfg.blocks_per_module)
                   for m in range(cfg.num_modules[2])],
        "ocr": _init_ocr(ks[10], sum(w), cfg.ocr_width),
    }
    return params


def hrnet_feats(params, cfg: HRNetISConfig, image: jnp.ndarray,
                points: jnp.ndarray, coord_bias=None) -> jnp.ndarray:
    """Trunk: stem -> stages -> stride-4 concat of all branches
    (hrnet_ocr.py `compute_hrnet_feats`, brs.py:231 insertion point).
    `coord_bias` optionally perturbs the disk coord channels
    (DistMap-BRS, reference brs.py:272-276)."""
    rgb, coords = is_inputs(image, points, cfg.norm_radius, cfg.use_disks,
                            cfg.with_prev_mask, cfg.dtype,
                            coord_bias=coord_bias)
    extra = maps_transform(params["maps_transform"], coords,
                           leaky=cfg.use_leaky_relu)

    x = conv_bn_relu(params["stem1"], rgb, stride=2)
    x = x + extra                                # hrnet_ocr.py:391-396
    x = conv_bn_relu(params["stem2"], x, stride=2)
    for blk in params["layer1"]:
        x = _bottleneck(blk, x)

    xs = _transition(params["tr1"], [x])
    for m in params["stage2"]:
        xs = _module(m, xs)
    xs = _transition(params["tr2"], xs)
    for m in params["stage3"]:
        xs = _module(m, xs)
    xs = _transition(params["tr3"], xs)
    for m in params["stage4"]:
        xs = _module(m, xs)

    th, tw = xs[0].shape[1], xs[0].shape[2]
    return jnp.concatenate(
        [xs[0]] + [bilinear_resize(v, th, tw, align_corners=True)
                   for v in xs[1:]], axis=-1)


def hrnet_is_forward(params, cfg: HRNetISConfig, image: jnp.ndarray,
                     points: jnp.ndarray, coord_bias=None,
                     **_) -> Dict[str, jnp.ndarray]:
    feats = hrnet_feats(params, cfg, image, points, coord_bias)
    logits, aux = _ocr(params["ocr"], feats)

    hh, ww = image.shape[1], image.shape[2]
    return {"instances": bilinear_resize(logits, hh, ww, align_corners=True),
            "instances_aux": bilinear_resize(aux, hh, ww,
                                             align_corners=True)}
