"""Shared pieces for the legacy zoo.

* `frozen_bn` — BatchNorm evaluated with stored statistics (params carry
  running mean/var; training keeps them frozen). The parameter layout
  holds torch BN weights one-to-one (per-family converters TBD); at random
  init it's an identity affine. This replaces live
  batch statistics — documented deviation from the reference's
  nn.BatchNorm2d, chosen so the functional/jit training path stays pure.
* `maps_transform` — RITM's coord-feature adapter (is_model.py:28-36):
  conv1x1(C->16) + (Leaky)ReLU + conv3x3 stride 2 (16->64) + ScaleLayer
  (ops.py ScaleLayer semantics: multiply by a learned scale init 0.05).
* `is_inputs` — ImageNet normalization + disk/prev-mask coord channels
  shared by every ISModel (is_model.py:42-95).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.distmaps import dist_maps

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def init_frozen_bn(channels: int) -> Dict[str, Any]:
    return {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,)),
            "mean": jnp.zeros((channels,)), "var": jnp.ones((channels,))}


def frozen_bn(p, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"] * inv).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * p["scale"] * inv).astype(x.dtype)
    return x * scale + bias


def init_conv_bn(key, kh, kw, cin, cout, bias: bool = False) -> Dict[str, Any]:
    return {"conv": nn.init_conv(key, kh, kw, cin, cout, bias=bias),
            "bn": init_frozen_bn(cout)}


def conv_bn_relu(p, x, stride: int = 1, relu: bool = True,
                 padding="TORCH") -> jnp.ndarray:
    y = frozen_bn(p["bn"], nn.conv2d(p["conv"], x, stride=stride,
                                     padding=padding))
    return jax.nn.relu(y) if relu else y


def init_maps_transform(key, in_ch: int) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"conv1": nn.init_conv1x1(k1, in_ch, 16),
            "conv2": nn.init_conv(k2, 3, 3, 16, 64),
            "scale": jnp.asarray(0.05, jnp.float32)}


def maps_transform(p, coords: jnp.ndarray,
                   leaky: bool = False) -> jnp.ndarray:
    x = nn.conv1x1(p["conv1"], coords)
    x = jax.nn.leaky_relu(x, 0.2) if leaky else jax.nn.relu(x)
    x = nn.conv2d(p["conv2"], x, stride=2)
    return x * p["scale"].astype(x.dtype)


def is_inputs(image: jnp.ndarray, points: jnp.ndarray, norm_radius: float,
              use_disks: bool, with_prev_mask: bool, dtype,
              coord_bias=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,H,W,3|4) + clicks -> (normalized rgb, coord channels).

    `coord_bias` (B,H,W,2) optionally perturbs the disk channels only
    (never the prev-mask channel) — the DistMap-BRS optimization target
    (reference brs.py:272-276)."""
    image = image.astype(dtype)
    prev_mask = None
    if with_prev_mask:
        prev_mask = image[..., 3:4]
        image = image[..., :3]
    mean = jnp.asarray(IMAGENET_MEAN, image.dtype)
    std = jnp.asarray(IMAGENET_STD, image.dtype)
    rgb = (image - mean) / std
    h, w = rgb.shape[1], rgb.shape[2]
    disks = dist_maps(points, h, w, norm_radius=norm_radius,
                      use_disks=use_disks).astype(dtype)
    if coord_bias is not None:
        disks = disks + coord_bias.astype(dtype)
    coords = jnp.concatenate([prev_mask, disks], axis=-1) \
        if prev_mask is not None else disks
    return rgb, coords
