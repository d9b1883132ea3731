"""DeepLabV3+ (ResNet-V1b) interactive-segmentation model — RITM family.

Exact re-derivation of `isegm/model/is_deeplab_model.py:10-27` over
`isegm/model/modeling/deeplab_v3.py:12-176` and the ResNetV1b backbone
(`resnetv1b.py:6-226`):

  * resnet50/101 = "v1s" deep stem (3x3 s2 -> 3x3 -> 3x3, stem_width 64,
    resnetv1b.py:121-130); resnet34 = plain 7x7 s2 stem (BasicBlockV1b);
  * RITM coord features (maps_transform, 64ch stride 2, is_model.py:28-36)
    are zero-padded up to the stem width and ADDED after the stem's final
    bn+relu, before maxpool (resnet.py:29-37);
  * dilated output-stride-8: layer3 stride 1 dilation 2, layer4 stride 1
    dilation 4; the FIRST block of a dilated layer runs at half its layer's
    dilation (resnetv1b.py:183-189); BasicBlockV1b's second conv always
    uses the layer dilation ("previous_dilation", resnetv1b.py:15-16);
  * ASPP at rates (12, 24, 36) + image pooling, projected to `ch`
    (deeplab_v3.py:42-46,115-147);
  * decoder `_DeepLabHead`: skip c1 -> 32ch, concat(aspp_up, skip), two
    SeparableConv2d(-> ch) + 1x1 (deeplab_v3.py:39-41,84-112);
  * SepConvHead: two SeparableConv2d (ch -> ch/2) + 1x1 -> 1 logit
    (basic_blocks.py:27-71).

Frozen-BN everywhere (zoo/common.py); bilinear resizes align_corners=True.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.resize import bilinear_resize
from .common import (conv_bn_relu, frozen_bn, init_conv_bn, init_frozen_bn,
                     init_maps_transform, maps_transform, is_inputs)

# layers per stage; block type; stem
RESNET_SPECS = {
    "resnet34": ((3, 4, 6, 3), "basic", "7x7"),
    "resnet50": ((3, 4, 6, 3), "bottleneck", "deep"),
    "resnet101": ((3, 4, 23, 3), "bottleneck", "deep"),
}

ASPP_RATES = (12, 24, 36)   # deeplab_v3.py:43


@dataclasses.dataclass(frozen=True)
class DeeplabISConfig:
    backbone: str = "resnet50"
    ch: int = 256                    # deeplab_ch (is_deeplab_model.py:12)
    num_max_points: int = 24
    norm_radius: float = 5.0
    use_disks: bool = True
    with_prev_mask: bool = True
    use_leaky_relu: bool = True
    dtype: Any = jnp.float32

    @property
    def expansion(self) -> int:
        return 1 if RESNET_SPECS[self.backbone][1] == "basic" else 4

    @property
    def stem_out(self) -> int:
        return 64 if RESNET_SPECS[self.backbone][2] == "7x7" else 128

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ----------------------------------------------------------------- blocks

def _dilated_conv_bn(p, x, dilation: int, relu: bool = True):
    """3x3 conv with torch padding=dilation (symmetric), stride 1."""
    w = p["conv"]["w"]
    y = nn.conv_nhwc(
        x, w.astype(x.dtype), (1, 1),
        ((dilation, dilation), (dilation, dilation)), 1,
        (dilation, dilation)).astype(x.dtype)
    y = frozen_bn(p["bn"], y)
    return jax.nn.relu(y) if relu else y


def _init_bottleneck(key, cin, planes, downsample: bool):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {"c1": init_conv_bn(k1, 1, 1, cin, planes),
         "c2": init_conv_bn(k2, 3, 3, planes, planes),
         "c3": init_conv_bn(k3, 1, 1, planes, planes * 4)}
    if downsample:
        p["down"] = init_conv_bn(k4, 1, 1, cin, planes * 4)
    return p


def _bottleneck(p, x, stride: int, dilation: int):
    """BottleneckV1b (resnetv1b.py:42-83): conv2 carries stride+dilation."""
    res = x
    y = conv_bn_relu(p["c1"], x)
    if dilation == 1:
        y = conv_bn_relu(p["c2"], y, stride=stride)
    else:
        y = _dilated_conv_bn(p["c2"], y, dilation)
    y = conv_bn_relu(p["c3"], y, relu=False)
    if "down" in p:
        res = conv_bn_relu(p["down"], x, stride=stride, relu=False)
    return jax.nn.relu(res + y)


def _init_basic(key, cin, planes, downsample: bool):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"c1": init_conv_bn(k1, 3, 3, cin, planes),
         "c2": init_conv_bn(k2, 3, 3, planes, planes)}
    if downsample:
        p["down"] = init_conv_bn(k3, 1, 1, cin, planes)
    return p


def _basic(p, x, stride: int, dilation: int, prev_dilation: int):
    """BasicBlockV1b (resnetv1b.py:6-39): conv1 uses `dilation`, conv2
    always uses the layer dilation (previous_dilation)."""
    res = x
    if dilation == 1:
        y = conv_bn_relu(p["c1"], x, stride=stride)
    else:
        y = _dilated_conv_bn(p["c1"], x, dilation)
    if prev_dilation == 1:
        y = conv_bn_relu(p["c2"], y, relu=False)
    else:
        y = _dilated_conv_bn(p["c2"], y, prev_dilation, relu=False)
    if "down" in p:
        res = conv_bn_relu(p["down"], x, stride=stride, relu=False)
    return jax.nn.relu(res + y)


def _init_layer(key, block, cin, planes, blocks, expansion, stride=1):
    """resnetv1b.py:154-165 `_make_layer`: block 0 gets a 1x1 downsample
    projection only when `stride != 1 or inplanes != planes*expansion`
    (identity residual otherwise — e.g. resnet34 layer1, 64ch/stride 1)."""
    out = planes * expansion
    need_down = stride != 1 or cin != out
    return [(_init_bottleneck if block == "bottleneck" else _init_basic)(
        jax.random.fold_in(key, j), cin if j == 0 else out, planes,
        downsample=(j == 0 and need_down)) for j in range(blocks)]


def _layer(ps, x, block: str, stride: int, dilation: int = 1):
    """resnetv1b.py:154-207: first block stride=`stride` and dilation
    dilation//2 (1 if dilation<=2); the rest stride 1, full dilation."""
    first_d = 1 if dilation in (1, 2) else dilation // 2
    for j, p in enumerate(ps):
        if block == "bottleneck":
            x = _bottleneck(p, x, stride if j == 0 else 1,
                            first_d if j == 0 else dilation)
        else:
            x = _basic(p, x, stride if j == 0 else 1,
                       first_d if j == 0 else dilation, dilation)
    return x


# ----------------------------------------------------------------- heads

def _init_sep(key, cin, cout):
    """SeparableConv2d (basic_blocks.py:57-71): dw 3x3 (no bias) -> pw 1x1
    (no bias) -> BN -> ReLU."""
    k1, k2 = jax.random.split(key)
    return {"dw": nn.init_conv(k1, 3, 3, 1, cin, bias=False),
            "pw": nn.init_conv(k2, 1, 1, cin, cout, bias=False),
            "bn": init_frozen_bn(cout)}


def _sep(p, x):
    y = nn.conv_nhwc(
        x, p["dw"]["w"].astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        x.shape[-1], (1, 1)).astype(x.dtype)
    y = nn.conv1x1(p["pw"], y)
    return jax.nn.relu(frozen_bn(p["bn"], y))


def init_deeplab_is(key, cfg: DeeplabISConfig) -> Dict[str, Any]:
    layers, block, stem = RESNET_SPECS[cfg.backbone]
    exp = cfg.expansion
    ch = cfg.ch
    coord_ch = 3 if cfg.with_prev_mask else 2
    aspp_in = 512 * exp
    skip_in = 64 * exp
    ks = jax.random.split(key, 24)

    params: Dict[str, Any] = {
        "maps_transform": init_maps_transform(ks[0], coord_ch),
        "layer1": _init_layer(ks[4], block, cfg.stem_out, 64, layers[0], exp,
                              stride=1),
        "layer2": _init_layer(ks[5], block, 64 * exp, 128, layers[1], exp,
                              stride=2),
        "layer3": _init_layer(ks[6], block, 128 * exp, 256, layers[2], exp,
                              stride=1),
        "layer4": _init_layer(ks[7], block, 256 * exp, 512, layers[3], exp,
                              stride=1),
        "aspp": {
            "b0": init_conv_bn(ks[8], 1, 1, aspp_in, ch),
            "b1": init_conv_bn(ks[9], 3, 3, aspp_in, ch),
            "b2": init_conv_bn(ks[10], 3, 3, aspp_in, ch),
            "b3": init_conv_bn(ks[11], 3, 3, aspp_in, ch),
            "pool": init_conv_bn(ks[12], 1, 1, aspp_in, ch),
            "project": init_conv_bn(ks[13], 1, 1, ch * 5, ch),
        },
        "skip": init_conv_bn(ks[14], 1, 1, skip_in, 32),
        "dhead": {"sep1": _init_sep(ks[15], ch + 32, ch),
                  "sep2": _init_sep(ks[16], ch, ch),
                  "cls": nn.init_conv1x1(ks[17], ch, ch)},
        "head": {"sep1": _init_sep(ks[18], ch, ch // 2),
                 "sep2": _init_sep(ks[19], ch // 2, ch // 2),
                 "cls": nn.init_conv1x1(ks[20], ch // 2, 1)},
    }
    if stem == "deep":
        params["stem"] = [init_conv_bn(ks[1], 3, 3, 3, 64),
                          init_conv_bn(ks[2], 3, 3, 64, 64),
                          init_conv_bn(ks[3], 3, 3, 64, 128)]
    else:
        params["stem"] = [init_conv_bn(ks[1], 7, 7, 3, 64)]
    return params


def _aspp(p, x):
    outs = [conv_bn_relu(p["b0"], x)]
    for name, rate in zip(("b1", "b2", "b3"), ASPP_RATES):
        outs.append(_dilated_conv_bn(p[name], x, rate))
    gp = jnp.mean(x, axis=(1, 2), keepdims=True)
    gp = conv_bn_relu(p["pool"], gp)
    # bilinear upsample of a 1x1 map (align_corners=True) = broadcast
    outs.append(jnp.broadcast_to(gp, outs[0].shape))
    return conv_bn_relu(p["project"], jnp.concatenate(outs, axis=-1))


def deeplab_backbone(params, cfg: DeeplabISConfig, image: jnp.ndarray,
                     points: jnp.ndarray, coord_bias=None):
    """Trunk to (skip-projected c1, c4) — the feature-BRS 'after_c4'
    insertion point (reference brs.py:132-143: c4 is scaled, the
    skip-projected c1 is cached). `coord_bias` optionally perturbs the
    disk coord channels (DistMap-BRS, brs.py:272-276)."""
    layers, block, stem = RESNET_SPECS[cfg.backbone]
    rgb, coords = is_inputs(image, points, cfg.norm_radius, cfg.use_disks,
                            cfg.with_prev_mask, cfg.dtype,
                            coord_bias=coord_bias)
    extra = maps_transform(params["maps_transform"], coords,
                           leaky=cfg.use_leaky_relu)

    if stem == "deep":
        x = conv_bn_relu(params["stem"][0], rgb, stride=2)
        x = conv_bn_relu(params["stem"][1], x)
        x = conv_bn_relu(params["stem"][2], x)
    else:
        x = conv_bn_relu(params["stem"][0], rgb, stride=2)

    # coord inject: zero-pad channels up to stem width (resnet.py:33-36)
    pad = x.shape[-1] - extra.shape[-1]
    if pad > 0:
        extra = jnp.pad(extra, ((0, 0),) * 3 + ((0, pad),))
    x = x + extra

    # MaxPool2d(3, stride=2, padding=1) — symmetric torch padding
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))

    c1 = _layer(params["layer1"], x, block, stride=1)             # s4
    c2 = _layer(params["layer2"], c1, block, stride=2)            # s8
    c3 = _layer(params["layer3"], c2, block, stride=1, dilation=2)  # s8 d2
    c4 = _layer(params["layer4"], c3, block, stride=1, dilation=4)  # s8 d4
    skip = conv_bn_relu(params["skip"], c1)
    return skip, c4


def deeplab_aspp_concat(params, c4: jnp.ndarray,
                        skip: jnp.ndarray) -> jnp.ndarray:
    """ASPP(c4) upsampled + skip concat — the 'after_aspp' insertion
    feature map (ch+32 channels; deeplab_v3.py:96-101, brs.py:136-140)."""
    y = _aspp(params["aspp"], c4)
    y = bilinear_resize(y, skip.shape[1], skip.shape[2], align_corners=True)
    return jnp.concatenate([y, skip], axis=-1)               # (aspp, skip)


def deeplab_decoder(params, y: jnp.ndarray) -> jnp.ndarray:
    """_DeepLabHead on the concat map -> ch-channel features — the
    'after_deeplab' insertion feature map (brs.py:144-145)."""
    d = params["dhead"]
    y = _sep(d["sep1"], y)
    y = _sep(d["sep2"], y)
    return nn.conv1x1(d["cls"], y)


def deeplab_seg_head(params, y: jnp.ndarray) -> jnp.ndarray:
    """SepConvHead -> 1-channel logits (basic_blocks.py:27-71)."""
    h = params["head"]
    y = _sep(h["sep1"], y)
    y = _sep(h["sep2"], y)
    return nn.conv1x1(h["cls"], y)


def deeplab_is_forward(params, cfg: DeeplabISConfig, image: jnp.ndarray,
                       points: jnp.ndarray, coord_bias=None,
                       **_) -> Dict[str, jnp.ndarray]:
    skip, c4 = deeplab_backbone(params, cfg, image, points, coord_bias)
    y = deeplab_aspp_concat(params, c4, skip)
    y = deeplab_decoder(params, y)
    seg = deeplab_seg_head(params, y)

    hh, ww = image.shape[1], image.shape[2]
    return {"instances": bilinear_resize(seg, hh, ww, align_corners=True),
            "instances_aux": None}
