"""HRFormer (HRT) interactive-segmentation model — faithful re-derivation.

Re-derives the reference's full HRT stack numerics-exactly (direct parity
tests in tests/test_reference_direct.py):

  * backbone `HighResolutionTransformer`
    (`hrformer_helper/hrt/hrt_backbone.py:306-605`): conv stem, 2-bottleneck
    layer1, HRNet-style transitions, and transformer stages whose modules are
    `GeneralTransformerBlock`s (`modules/transformer_block.py:52-108`):
    LayerNorm(eps 1e-6) -> ISA window attention -> residual -> LayerNorm ->
    MlpDWBN FFN -> residual;
  * ISA attention (`modules/multihead_isa_attention.py`,
    `multihead_isa_pool_attention.py`): the feature map is CENTER-padded to a
    window multiple (PadBlock.pad_if_needed:373-382), grouped into contiguous
    local windows (LocalPermuteModule.permute:402-413 — "(qh ph)" makes the
    intra-window offset the fast index, so each group is one local window),
    then multi-head attention with Swin-layout relative position bias
    (MHA_:27-52, bias added at :293-314) and separate q/k/v/out projections
    (multihead_attention.py:42-45), q pre-scaled by head_dim**-0.5 (:204-207);
  * MlpDWBN FFN (`modules/ffn_block.py:106-179`): conv1x1 -> BN -> GELU ->
    depthwise3x3 -> BN -> GELU -> conv1x1 -> BN -> GELU (all convs biased);
  * fusion (`hrt_backbone.py:184-303`): upsample = conv1x1(no bias)+BN then
    NEAREST 2^k upsample (then bilinear align_corners resize to the exact
    target, identity for exact multiples — forward:290-298); downsample =
    chains of [depthwise3x3 s2 + BN + pointwise1x1 + BN (+ReLU unless final
    chain step)] (:210-269); sum + ReLU;
  * OCR head `HRT_B_OCR_V3` (`modeling/hrformer.py:55-139`): 7x7 GROUPED conv
    (groups=gcd(in, hidden)) + BN + ReLU to `hidden`; aux head = same grouped
    conv stack + 1x1 cls; SpatialGather (softmax over pixels,
    `spatial_ocr_block.py:50-84`); SpatialOCR distri head (f_pixel/f_object =
    2x[1x1+BN+ReLU], f_down, f_up, key_channels=hidden//2 scaling, concat +
    1x1+BN+ReLU, `spatial_ocr_block.py:150-380`); 1x1 cls.

Coord features: the shipped `HRFormerModel` wrapper (`is_hrformer_model.py:
11-40`) is broken as shipped — `backbone_forward` drops `coord_features`, so
clicks never reach the net. Its evident intent is channel-concat: the model
is built with in_ch=6 and `init_weight` duplicates the pretrained conv1
weights along the input-channel axis (`is_hrformer_model.py:36-38`). We
implement that intent: stem conv1 takes cat(rgb, [prev_mask, pos, neg])
(documented deviation, PARITY.md).

All BN is eval-mode (frozen_bn); configs: hrt_small (w=32, heads 1/2/4/8),
hrt_base (w=78, heads 2/4/8/16), window 7 (13/15 for the win13/win15
variants), stage modules (1, 4, 2), 2 blocks per branch per module
(`hrt/hrt_config.py`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ... import nn
from ...ops.resize import bilinear_resize
from .common import (conv_bn_relu, frozen_bn, init_conv_bn, init_frozen_bn,
                     is_inputs)
from .hrnet import (_init_transition, _transition, _init_bottleneck,
                    _bottleneck)
from .swin import _rel_index


@dataclasses.dataclass(frozen=True)
class HRFormerISConfig:
    width: int = 78                      # hrt_base: 78; hrt_small: 32
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)   # hrt_small: (1, 2, 4, 8)
    num_units: Tuple[int, int, int] = (1, 4, 2)  # modules per stage 2/3/4
    blocks_per_unit: int = 2
    window: int = 7                      # 13 / 15 for the win variants
    mlp_ratio: float = 4.0
    ocr_width: int = 512                 # OCR hidden dim (hrformer.py:63)
    num_max_points: int = 24
    norm_radius: float = 5.0
    use_disks: bool = True
    with_prev_mask: bool = True
    use_leaky_relu: bool = True          # unused (no maps_transform); kept
    dtype: Any = jnp.float32             # for config compatibility

    @property
    def branch_widths(self) -> Tuple[int, ...]:
        w = self.width
        return (w, 2 * w, 4 * w, 8 * w)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def hrformer_small_config(**kw) -> HRFormerISConfig:
    return HRFormerISConfig(width=32, num_heads=(1, 2, 4, 8), **kw)


# ------------------------------------------------------------- ISA attention

def _init_attn(key, dim: int, heads: int, window: int):
    ks = jax.random.split(key, 4)
    return {"q": nn.init_linear(ks[0], dim, dim),
            "k": nn.init_linear(ks[1], dim, dim),
            "v": nn.init_linear(ks[2], dim, dim),
            "out": nn.init_linear(ks[3], dim, dim),
            "rpe": nn.normal_init(jax.random.fold_in(key, 9),
                                  ((2 * window - 1) ** 2, heads), std=0.02)}


def _center_pad(x: jnp.ndarray, window: int):
    """PadBlock.pad_if_needed: center-pad H/W to window multiples."""
    b, h, w, c = x.shape
    ph = -h % window
    pw = -w % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                        (pw // 2, pw - pw // 2), (0, 0)))
    return x, (ph, pw)


def _isa_attention(p, x: jnp.ndarray, heads: int, window: int) -> jnp.ndarray:
    """x: (B, H, W, C) -> (B, H, W, C). Local-window MHA with RPE."""
    b, h, w, c = x.shape
    xp, (ph, pw) = _center_pad(x, window)
    hp, wp = h + ph, w + pw
    nh, nw = hp // window, wp // window
    # contiguous local windows: (qh ph)(qw pw) grouping
    xw = xp.reshape(b, nh, window, nw, window, c)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw,
                                                window * window, c)

    hd = c // heads
    scale = float(hd) ** -0.5
    q = nn.linear(p["q"], xw) * scale
    k = nn.linear(p["k"], xw)
    v = nn.linear(p["v"], xw)
    n = window * window
    q = q.reshape(-1, n, heads, hd)
    k = k.reshape(-1, n, heads, hd)
    v = v.reshape(-1, n, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    bias = p["rpe"][jnp.asarray(_rel_index(window))]     # (n, n, heads)
    logits = logits + bias.transpose(2, 0, 1)[None].astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = nn.linear(p["out"], out.reshape(-1, n, c))

    out = out.reshape(b, nh, nw, window, window, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if ph or pw:
        out = out[:, ph // 2: ph // 2 + h, pw // 2: pw // 2 + w, :]
    return out


# ------------------------------------------------------------------ FFN

def _init_mlp_dwbn(key, cin: int, hidden: int, cout: int):
    ks = jax.random.split(key, 3)
    return {"fc1": init_conv_bn(ks[0], 1, 1, cin, hidden, bias=True),
            "dw": {"conv": nn.init_conv(ks[1], 3, 3, hidden, hidden,
                                        bias=True, groups=hidden),
                   "bn": init_frozen_bn(hidden)},
            "fc2": init_conv_bn(ks[2], 1, 1, hidden, cout, bias=True)}


def _mlp_dwbn(p, x: jnp.ndarray) -> jnp.ndarray:
    """MlpDWBN (ffn_block.py:106-179): each stage is conv -> BN -> GELU."""
    y = nn.conv1x1(p["fc1"]["conv"], x)
    y = nn.gelu(frozen_bn(p["fc1"]["bn"], y))
    y = nn.conv2d(p["dw"]["conv"], y, groups=y.shape[-1])
    y = nn.gelu(frozen_bn(p["dw"]["bn"], y))
    y = nn.conv1x1(p["fc2"]["conv"], y)
    return nn.gelu(frozen_bn(p["fc2"]["bn"], y))


# ------------------------------------------------------------------ block

def _init_block(key, dim: int, heads: int, window: int, mlp_ratio: float):
    k1, k2 = jax.random.split(key)
    return {"norm1": nn.init_layer_norm(dim),
            "attn": _init_attn(k1, dim, heads, window),
            "norm2": nn.init_layer_norm(dim),
            "mlp": _init_mlp_dwbn(k2, dim, int(dim * mlp_ratio), dim)}


def _block(p, x: jnp.ndarray, heads: int, window: int) -> jnp.ndarray:
    """GeneralTransformerBlock (transformer_block.py:98-108)."""
    b, h, w, c = x.shape
    t = nn.layer_norm(p["norm1"], x.reshape(b, h * w, c)).reshape(b, h, w, c)
    x = x + _isa_attention(p["attn"], t, heads, window)
    t = nn.layer_norm(p["norm2"], x.reshape(b, h * w, c)).reshape(b, h, w, c)
    return x + _mlp_dwbn(p["mlp"], t)


# ------------------------------------------------------------------ fusion

def _init_fuse(key, widths: Tuple[int, ...]):
    """hrt_backbone.py:184-272 fuse layers (depthwise-separable downsample,
    1x1+nearest upsample)."""
    nb = len(widths)
    rows = []
    for i in range(nb):
        row = []
        for j in range(nb):
            kf = jax.random.fold_in(key, i * 10 + j)
            if j > i:
                row.append({"up": init_conv_bn(kf, 1, 1, widths[j],
                                               widths[i])})
            elif j < i:
                chain = []
                for step in range(i - j):
                    cout = widths[i] if step == i - j - 1 else widths[j]
                    ks = jax.random.split(jax.random.fold_in(kf, step))
                    chain.append({
                        "dw": {"conv": nn.init_conv(ks[0], 3, 3, widths[j],
                                                    widths[j], bias=False,
                                                    groups=widths[j]),
                               "bn": init_frozen_bn(widths[j])},
                        "pw": init_conv_bn(ks[1], 1, 1, widths[j], cout)})
                row.append({"downs": chain})
            else:
                row.append({})
        rows.append(row)
    return rows


def _fuse(p, ys: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """hrt_backbone.py:284-303: sum fused branches + ReLU."""
    nb = len(ys)
    outs = []
    for i in range(nb):
        acc = None
        for j in range(nb):
            f = p[i][j]
            if j > i:
                v = frozen_bn(f["up"]["bn"], nn.conv1x1(f["up"]["conv"],
                                                        ys[j]))
                fct = 2 ** (j - i)
                v = jnp.repeat(jnp.repeat(v, fct, axis=1), fct, axis=2)
                th, tw = ys[i].shape[1], ys[i].shape[2]
                if v.shape[1] != th or v.shape[2] != tw:
                    v = bilinear_resize(v, th, tw, align_corners=True)
            elif j < i:
                v = ys[j]
                last = len(f["downs"]) - 1
                for step, c in enumerate(f["downs"]):
                    v = frozen_bn(c["dw"]["bn"],
                                  nn.conv2d(c["dw"]["conv"], v, stride=2,
                                            groups=v.shape[-1]))
                    v = frozen_bn(c["pw"]["bn"], nn.conv1x1(c["pw"]["conv"],
                                                            v))
                    if step != last:
                        v = jax.nn.relu(v)
            else:
                v = ys[j]
            acc = v if acc is None else acc + v
        outs.append(jax.nn.relu(acc))
    return outs


def _init_hr_module(key, widths, cfg: HRFormerISConfig):
    nb = len(widths)
    p: Dict[str, Any] = {"branches": [], "fuse": None}
    for bi in range(nb):
        kb = jax.random.fold_in(key, bi)
        p["branches"].append([
            _init_block(jax.random.fold_in(kb, j), widths[bi],
                        cfg.num_heads[bi], cfg.window, cfg.mlp_ratio)
            for j in range(cfg.blocks_per_unit)])
    p["fuse"] = _init_fuse(jax.random.fold_in(key, 777), widths)
    return p


def _hr_module(p, xs: List[jnp.ndarray], cfg: HRFormerISConfig):
    ys = []
    for bi, x in enumerate(xs):
        for blk in p["branches"][bi]:
            x = _block(blk, x, cfg.num_heads[bi], cfg.window)
        ys.append(x)
    if len(ys) == 1:
        return ys
    return _fuse(p["fuse"], ys)


# ------------------------------------------------------------------ OCR head

def _init_grouped_bnrelu(key, cin: int, cout: int, k: int, groups: int):
    return {"conv": nn.init_conv(key, k, k, cin, cout, bias=True,
                                 groups=groups),
            "bn": init_frozen_bn(cout)}


def _init_hrt_ocr(key, in_ch: int, hidden: int, num_classes: int = 1):
    """HRT_B_OCR_V3 head (hrformer.py:62-110)."""
    g = math.gcd(in_ch, hidden)
    kc = hidden // 2
    ks = jax.random.split(key, 12)
    return {
        "conv3x3": _init_grouped_bnrelu(ks[0], in_ch, hidden, 7, g),
        "aux1": _init_grouped_bnrelu(ks[1], in_ch, hidden, 7, g),
        "aux_cls": nn.init_conv1x1(ks[2], hidden, num_classes),
        # SpatialOCR distri head (spatial_ocr_block.py:156-231)
        "f_pixel": [init_conv_bn(ks[3], 1, 1, hidden, kc, bias=True),
                    init_conv_bn(ks[4], 1, 1, kc, kc, bias=True)],
        "f_object": [init_conv_bn(ks[5], 1, 1, hidden, kc, bias=True),
                     init_conv_bn(ks[6], 1, 1, kc, kc, bias=True)],
        "f_down": init_conv_bn(ks[7], 1, 1, hidden, kc, bias=True),
        "f_up": init_conv_bn(ks[8], 1, 1, kc, hidden, bias=True),
        "bottleneck": init_conv_bn(ks[9], 1, 1, 2 * hidden, hidden,
                                   bias=True),
        "cls": nn.init_conv1x1(ks[10], hidden, num_classes),
    }


def _grouped_bnrelu(p, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    y = nn.conv2d(p["conv"], x, groups=groups)
    return jax.nn.relu(frozen_bn(p["bn"], y))


def _cbr1(p, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(frozen_bn(p["bn"], nn.conv1x1(p["conv"], x)))


def _hrt_ocr(p, feats: jnp.ndarray):
    """feats (B, H, W, in_ch) -> (cls logits, aux logits) at stride 4."""
    in_ch = feats.shape[-1]
    hidden = p["cls"]["w"].shape[-2]
    g = math.gcd(in_ch, hidden)

    aux = _grouped_bnrelu(p["aux1"], feats, g)
    aux_logits = nn.conv1x1(p["aux_cls"], aux)               # (B, H, W, K)

    x = _grouped_bnrelu(p["conv3x3"], feats, g)              # (B, H, W, hid)
    b, h, w, c = x.shape

    # SpatialGather (spatial_ocr_block.py:69-84): softmax over pixels
    probs = jax.nn.softmax(
        aux_logits.reshape(b, h * w, -1).astype(jnp.float32), axis=1)
    pix = x.reshape(b, h * w, c).astype(jnp.float32)
    regions = jnp.einsum("bnk,bnc->bkc", probs, pix,
                         preferred_element_type=jnp.float32).astype(x.dtype)

    # ObjectAttentionBlock2D (spatial_ocr_block.py:232-268)
    q = x
    for cbr in p["f_pixel"]:
        q = _cbr1(cbr, q)
    k = regions[:, None]                                     # (B, 1, K, hid)
    for cbr in p["f_object"]:
        k = _cbr1(cbr, k)
    v = _cbr1(p["f_down"], regions[:, None])
    kc = q.shape[-1]
    sim = jnp.einsum("bhwc,bzkc->bhwk", q, k,
                     preferred_element_type=jnp.float32) * (kc ** -0.5)
    att = jax.nn.softmax(sim.astype(jnp.float32), -1).astype(x.dtype)
    ctx = jnp.einsum("bhwk,bzkc->bhwc", att, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    ctx = _cbr1(p["f_up"], ctx)

    y = _cbr1(p["bottleneck"], jnp.concatenate([ctx, x], axis=-1))
    return nn.conv1x1(p["cls"], y), aux_logits


# ------------------------------------------------------------------- model

def init_hrformer_is(key, cfg: HRFormerISConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 12)
    coord_ch = 3 if cfg.with_prev_mask else 2
    w = cfg.branch_widths
    return {
        "stem1": init_conv_bn(ks[1], 3, 3, 3 + coord_ch, 64),
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
        "ocr": _init_hrt_ocr(ks[10], sum(w), cfg.ocr_width),
    }


def hrt_backbone_forward(params, cfg: HRFormerISConfig,
                         x: jnp.ndarray) -> List[jnp.ndarray]:
    """HighResolutionTransformer.forward (hrt_backbone.py:556-605):
    x (B, H, W, in_ch) -> 4 branch maps at strides 4/8/16/32."""
    x = conv_bn_relu(params["stem1"], x, stride=2)
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
    return xs


def hrformer_is_forward(params, cfg: HRFormerISConfig, image: jnp.ndarray,
                        points: jnp.ndarray, coord_bias=None,
                        **_) -> Dict[str, jnp.ndarray]:
    rgb, coords = is_inputs(image, points, cfg.norm_radius, cfg.use_disks,
                            cfg.with_prev_mask, cfg.dtype,
                            coord_bias=coord_bias)
    xs = hrt_backbone_forward(params, cfg,
                              jnp.concatenate([rgb, coords], axis=-1))

    th, tw = xs[0].shape[1], xs[0].shape[2]
    feats = jnp.concatenate(
        [xs[0]] + [bilinear_resize(v, th, tw, align_corners=True)
                   for v in xs[1:]], axis=-1)
    logits, aux = _hrt_ocr(params["ocr"], feats)
    hh, ww = image.shape[1], image.shape[2]
    return {"instances": bilinear_resize(logits, hh, ww, align_corners=True),
            "instances_aux": bilinear_resize(aux, hh, ww,
                                             align_corners=True)}
