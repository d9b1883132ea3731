"""SimpleFPN neck with Dual-cross Merging Attention gating.

Re-derivation of `SimpleFPN` (reference `isegm/model/is_vpu_model.py:18-136`):
  * FFN projects (2W+3)-dim PPuE prompt vectors to the neck dim;
  * a depth-3 two-way transformer produces per-depth (queries, keys)
    intermediates;
  * gating (is_vpu_model.py:104-121):
      q_out  = q + sum_i queries_i                       (P2CL branch input)
      chan_i = sigmoid(max_over_tokens(queries_i))       (channel gate)
      tok_i  = sigmoid(max_over_channels(keys_i))        (token gate)
      x_i    = x + x*chan_i + x*tok_i
  * four conv branches produce strides 4/8/16/32 (deconvs as matmuls +
    pixel-shuffle, GroupNorm(1), GELU) — is_vpu_model.py:55-86,128-131.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .. import nn
from .two_way import TwoWayConfig, init_two_way, two_way_forward


@dataclasses.dataclass(frozen=True)
class NeckConfig:
    in_dim: int = 768
    out_dims: Tuple[int, int, int, int] = (128, 256, 512, 1024)
    img_size: Tuple[int, int] = (448, 448)
    hide_dim: int = 1024
    two_way: TwoWayConfig = TwoWayConfig()

    @property
    def prompt_dim(self) -> int:
        return self.img_size[0] * 2 + 3

    @property
    def down4_chan(self) -> int:
        return max(self.out_dims[0] * 2, self.in_dim // 2)

    @property
    def down8_chan(self) -> int:
        return max(self.out_dims[1], self.in_dim // 2)

    @property
    def down32_chan(self) -> int:
        return max(self.out_dims[3], self.in_dim * 2)


def init_neck(key, cfg: NeckConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 12)
    d = cfg.in_dim
    return {
        "ffn": {"fc1": nn.init_linear(ks[0], cfg.prompt_dim, cfg.hide_dim * 2),
                "fc2": nn.init_linear(ks[1], cfg.hide_dim * 2, d)},
        "att": init_two_way(ks[2], cfg.two_way),
        "down4": {
            "deconv1": nn.init_deconv2x2(ks[3], d, cfg.down4_chan),
            "gn1": nn.init_group_norm(cfg.down4_chan),
            "deconv2": nn.init_deconv2x2(ks[4], cfg.down4_chan, cfg.down4_chan // 2),
            "gn2": nn.init_group_norm(cfg.down4_chan // 2),
            "conv": nn.init_conv1x1(ks[5], cfg.down4_chan // 2, cfg.out_dims[0]),
            "gn3": nn.init_group_norm(cfg.out_dims[0]),
        },
        "down8": {
            "deconv": nn.init_deconv2x2(ks[6], d, cfg.down8_chan),
            "gn1": nn.init_group_norm(cfg.down8_chan),
            "conv": nn.init_conv1x1(ks[7], cfg.down8_chan, cfg.out_dims[1]),
            "gn2": nn.init_group_norm(cfg.out_dims[1]),
        },
        "down16": {
            "conv": nn.init_conv1x1(ks[8], d, cfg.out_dims[2]),
            "gn": nn.init_group_norm(cfg.out_dims[2]),
        },
        "down32": {
            "conv1": nn.init_conv(ks[9], 2, 2, d, cfg.down32_chan),
            "gn1": nn.init_group_norm(cfg.down32_chan),
            "conv2": nn.init_conv1x1(ks[10], cfg.down32_chan, cfg.out_dims[3]),
            "gn2": nn.init_group_norm(cfg.out_dims[3]),
        },
    }


def _down4(p, x):
    x = nn.deconv2x2(p["deconv1"], x)
    x = nn.gelu(nn.group_norm1(p["gn1"], x))
    x = nn.deconv2x2(p["deconv2"], x)
    x = nn.group_norm1(p["gn2"], x)
    x = nn.conv1x1(p["conv"], x)
    return nn.gelu(nn.group_norm1(p["gn3"], x))


def _down8(p, x):
    x = nn.deconv2x2(p["deconv"], x)
    x = nn.group_norm1(p["gn1"], x)
    x = nn.conv1x1(p["conv"], x)
    return nn.gelu(nn.group_norm1(p["gn2"], x))


def _down16(p, x):
    return nn.gelu(nn.group_norm1(p["gn"], nn.conv1x1(p["conv"], x)))


def _down32(p, x):
    x = nn.conv2d(p["conv1"], x, stride=2, padding="VALID")
    x = nn.group_norm1(p["gn1"], x)
    x = nn.conv1x1(p["conv2"], x)
    return nn.gelu(nn.group_norm1(p["gn2"], x))


def neck_forward(params, cfg: NeckConfig, x: jnp.ndarray, q: jnp.ndarray,
                 grid_hw: Tuple[int, int], extra_queries=None
                 ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """x: (B, HW, C) backbone tokens; q: (B, L, 2W+3) PPuE prompt vectors.

    `extra_queries` (B, K, C) are appended to the DMA query stream (the
    caption co-training hook: projected CLIP text embeddings ride the same
    two-way attention and feature gates as click prompts — the evident
    intent of the reference's captions plumbing, trainer.py:321,393-395)
    and stripped from q_out so the P2CL head keeps its 2N click channels.

    Returns ([s4, s8, s16, s32] NHWC feature maps, q_out (B, L, C)).
    """
    if q.shape[-1] != x.shape[-1]:
        q = nn.mlp(params["ffn"], q.astype(x.dtype), act=jax.nn.relu)

    n_extra = 0
    if extra_queries is not None:
        n_extra = extra_queries.shape[1]
        q = jnp.concatenate([q, extra_queries.astype(q.dtype)], axis=1)

    b, n, c = x.shape
    hs = two_way_forward(params["att"], cfg.two_way, q, x, grid_hw)
    (q_x2, x2_q), (q_x3, x3_q), (q_x4, x4_q) = hs
    q_out = q + q_x2 + q_x3 + q_x4
    if n_extra:
        q_out = q_out[:, :-n_extra]

    def chan_gate(qi):   # (B, L, C) -> (B, 1, C)
        return jax.nn.sigmoid(jnp.max(qi, axis=1))[:, None, :]

    def tok_gate(ki):    # (B, N, C) -> (B, N, 1)
        return jax.nn.sigmoid(jnp.max(ki, axis=2))[:, :, None]

    x2 = x + x * chan_gate(q_x2) + x * tok_gate(x2_q)
    x3 = x + x * chan_gate(q_x3) + x * tok_gate(x3_q)
    x4 = x + x * chan_gate(q_x4) + x * tok_gate(x4_q)

    gh, gw = grid_hw
    to_map = lambda t: t.reshape(b, gh, gw, c)
    s4 = _down4(params["down4"], to_map(x))
    s8 = _down8(params["down8"], to_map(x2))
    s16 = _down16(params["down16"], to_map(x3))
    s32 = _down32(params["down32"], to_map(x4))
    return [s4, s8, s16, s32], q_out
