"""DeepLabV3+ (ResNet) interactive-segmentation model.

Compact JAX re-derivation of `isegm/model/modeling/deeplab_v3.py:12-176` over
the ResNetV1b backbone (`resnetv1b.py:6-281`), wrapper at
`is_deeplab_model.py:10-27`:

  * ResNet-v1b deep stem (3x 3x3 convs, stride 2) — RITM coord features
    (maps_transform, 64ch stride 2) added after the first stem conv, like
    HRNet; layers 3/4/6/3 bottlenecks; output stride 16 (layer4 dilated);
  * ASPP: 1x1 + three dilated 3x3 (rates 6/12/18 at os16) + global pooling
    branch, projected to `ch`;
  * decoder: low-level c1 skip (1x1 -> 48ch) + upsampled ASPP, two 3x3
    convs (deeplab_v3.py:93-118);
  * SepConvHead (basic_blocks.py): two depthwise-separable convs -> 1ch.

Frozen-BN everywhere (zoo/common.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.resize import bilinear_resize
from .common import (conv_bn_relu, init_conv_bn, init_maps_transform,
                     maps_transform, is_inputs)

RESNET_LAYERS = {"resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3),
                 "resnet101": (3, 4, 23, 3)}


@dataclasses.dataclass(frozen=True)
class DeeplabISConfig:
    backbone: str = "resnet50"
    ch: int = 128
    num_max_points: int = 24
    norm_radius: float = 5.0
    use_disks: bool = True
    with_prev_mask: bool = True
    use_leaky_relu: bool = True
    dtype: Any = jnp.float32

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _init_bottleneck(key, cin, planes, stride, dilation=1):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {"c1": init_conv_bn(k1, 1, 1, cin, planes),
         "c2": init_conv_bn(k2, 3, 3, planes, planes),
         "c3": init_conv_bn(k3, 1, 1, planes, planes * 4)}
    if stride != 1 or cin != planes * 4:
        p["down"] = init_conv_bn(k4, 1, 1, cin, planes * 4)
    return p


def _bottleneck(p, x, stride: int, dilation: int = 1):
    res = x
    y = conv_bn_relu(p["c1"], x)
    if dilation == 1:
        y = conv_bn_relu(p["c2"], y, stride=stride)
    else:
        w = p["c2"]["conv"]["w"]
        z = jax.lax.conv_general_dilated(
            y, w.astype(y.dtype), (stride, stride), "SAME",
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(y.dtype)
        from .common import frozen_bn
        y = jax.nn.relu(frozen_bn(p["c2"]["bn"], z))
    y = conv_bn_relu(p["c3"], y, relu=False)
    if "down" in p:
        res = conv_bn_relu(p["down"], x, stride=stride, relu=False)
    return jax.nn.relu(res + y)


def _init_layer(key, cin, planes, blocks):
    return [_init_bottleneck(jax.random.fold_in(key, j),
                             cin if j == 0 else planes * 4, planes, 1)
            for j in range(blocks)]


def _layer(ps, x, stride: int, dilation: int = 1):
    for j, p in enumerate(ps):
        x = _bottleneck(p, x, stride if j == 0 else 1, dilation)
    return x


def init_deeplab_is(key, cfg: DeeplabISConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 16)
    coord_ch = 3 if cfg.with_prev_mask else 2
    layers = RESNET_LAYERS[cfg.backbone]
    ch = cfg.ch
    params: Dict[str, Any] = {
        "maps_transform": init_maps_transform(ks[0], coord_ch),
        # v1b deep stem: 3x3 s2 -> 3x3 -> 3x3 (resnetv1b.py deep_stem)
        "stem1": init_conv_bn(ks[1], 3, 3, 3, 32),
        "stem2": init_conv_bn(ks[2], 3, 3, 32, 32),
        "stem3": init_conv_bn(ks[3], 3, 3, 32, 64),
        "layer1": _init_layer(ks[4], 64, 64, layers[0]),
        "layer2": _init_layer(ks[5], 256, 128, layers[1]),
        "layer3": _init_layer(ks[6], 512, 256, layers[2]),
        "layer4": _init_layer(ks[7], 1024, 512, layers[3]),
        "aspp": {
            "b0": init_conv_bn(ks[8], 1, 1, 2048, ch),
            "b1": init_conv_bn(ks[9], 3, 3, 2048, ch),
            "b2": init_conv_bn(ks[10], 3, 3, 2048, ch),
            "b3": init_conv_bn(ks[11], 3, 3, 2048, ch),
            "pool": init_conv_bn(ks[12], 1, 1, 2048, ch),
            "project": init_conv_bn(ks[13], 1, 1, ch * 5, ch),
        },
        "c1_skip": init_conv_bn(ks[14], 1, 1, 256, 48),
        "decoder": [init_conv_bn(jax.random.fold_in(ks[15], 0), 3, 3,
                                 ch + 48, ch),
                    init_conv_bn(jax.random.fold_in(ks[15], 1), 3, 3, ch, ch)],
        "head": {
            # SepConvHead: 2 separable convs then 1x1 cls
            "dw1": nn.init_conv(jax.random.fold_in(key, 91), 3, 3, 1, ch),
            "pw1": init_conv_bn(jax.random.fold_in(key, 92), 1, 1, ch, ch // 2),
            "dw2": nn.init_conv(jax.random.fold_in(key, 93), 3, 3, 1, ch // 2),
            "pw2": init_conv_bn(jax.random.fold_in(key, 94), 1, 1, ch // 2,
                                ch // 2),
            "cls": nn.init_conv1x1(jax.random.fold_in(key, 95), ch // 2, 1),
        },
    }
    return params


def _dwconv(w, x, ch):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=ch,
        preferred_element_type=jnp.float32).astype(x.dtype)


def _aspp(p, x, rates=(6, 12, 18)):
    outs = [conv_bn_relu(p["b0"], x)]
    for name, rate in zip(("b1", "b2", "b3"), rates):
        w = p[name]["conv"]["w"]
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            rhs_dilation=(rate, rate),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        from .common import frozen_bn
        outs.append(jax.nn.relu(frozen_bn(p[name]["bn"], y)))
    gp = jnp.mean(x, axis=(1, 2), keepdims=True)
    gp = conv_bn_relu(p["pool"], gp)
    outs.append(jnp.broadcast_to(gp, outs[0].shape))
    return conv_bn_relu(p["project"], jnp.concatenate(outs, axis=-1))


def deeplab_is_forward(params, cfg: DeeplabISConfig, image: jnp.ndarray,
                       points: jnp.ndarray, **_) -> Dict[str, jnp.ndarray]:
    rgb, coords = is_inputs(image, points, cfg.norm_radius, cfg.use_disks,
                            cfg.with_prev_mask, cfg.dtype)
    extra = maps_transform(params["maps_transform"], coords,
                           leaky=cfg.use_leaky_relu)

    x = conv_bn_relu(params["stem1"], rgb, stride=2)        # s2, 32ch
    x = conv_bn_relu(params["stem2"], x)                    # 32ch
    x = conv_bn_relu(params["stem3"], x)                    # 64ch
    x = x + extra                                           # coord inject
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")         # maxpool s2

    c1 = _layer(params["layer1"], x, stride=1)              # s4, 256
    c2 = _layer(params["layer2"], c1, stride=2)             # s8, 512
    c3 = _layer(params["layer3"], c2, stride=2)             # s16, 1024
    c4 = _layer(params["layer4"], c3, stride=1, dilation=2)  # s16, 2048

    y = _aspp(params["aspp"], c4)
    y = bilinear_resize(y, c1.shape[1], c1.shape[2], align_corners=True)
    skip = conv_bn_relu(params["c1_skip"], c1)
    y = jnp.concatenate([y, skip], axis=-1)
    for dec in params["decoder"]:
        y = conv_bn_relu(dec, y)

    h = params["head"]
    y = _dwconv(h["dw1"]["w"], y, y.shape[-1]) + h["dw1"]["b"].astype(y.dtype)
    y = conv_bn_relu(h["pw1"], y)
    y = _dwconv(h["dw2"]["w"], y, y.shape[-1]) + h["dw2"]["b"].astype(y.dtype)
    y = conv_bn_relu(h["pw2"], y)
    seg = nn.conv1x1(h["cls"], y)

    hh, ww = image.shape[1], image.shape[2]
    return {"instances": bilinear_resize(seg, hh, ww, align_corners=True),
            "instances_aux": None}
