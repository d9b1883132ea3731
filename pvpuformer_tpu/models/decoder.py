"""CRIS/DETR-style vision-language TransformerDecoder.

Re-derivation of the alternative decoder stack the reference carries for its
`is_vitdetr_*` experiment variants (`isegm/model/modeling/transformer.py:
17-219` TransformerDecoder/TransformerDecoderLayer and
`detr_transformer.py:18-372`): query self-attention -> cross-attention onto
image tokens with 2-D sin-cos positional encodings -> FFN, pre-norm, with
per-layer intermediate outputs available. The shipped VPU path uses the
TwoWayTransformer instead (models/two_way.py); this exists for capability
parity with those experiment configs.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import nn


def pos1d_sincos(d_model: int, length: int) -> np.ndarray:
    """1-D sine-cosine positions (transformer.py pos1d)."""
    pe = np.zeros((length, d_model), np.float32)
    position = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def pos2d_sincos(d_model: int, h: int, w: int) -> np.ndarray:
    """2-D sine-cosine positions (transformer.py pos2d: half the channels
    encode x, half y, interleaved sin/cos)."""
    assert d_model % 4 == 0
    pe = np.zeros((d_model, h, w), np.float32)
    dm = d_model // 2
    div = np.exp(np.arange(0, dm, 2, dtype=np.float32)
                 * -(math.log(10000.0) / dm))
    pw = np.arange(w, dtype=np.float32)[:, None] * div[None]
    ph = np.arange(h, dtype=np.float32)[:, None] * div[None]
    pe[0:dm:2] = np.broadcast_to(np.sin(pw).T[:, None, :], (dm // 2, h, w))
    pe[1:dm:2] = np.broadcast_to(np.cos(pw).T[:, None, :], (dm // 2, h, w))
    pe[dm::2] = np.broadcast_to(np.sin(ph).T[:, :, None], (dm // 2, h, w))
    pe[dm + 1::2] = np.broadcast_to(np.cos(ph).T[:, :, None], (dm // 2, h, w))
    return pe.reshape(d_model, h * w).T                    # (HW, D)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    num_layers: int = 3
    d_model: int = 512
    nhead: int = 8
    dim_ffn: int = 2048
    return_intermediate: bool = False


def _init_layer(key, cfg: DecoderConfig):
    ks = jax.random.split(key, 8)
    d = cfg.d_model
    return {
        "self_qkv": nn.init_linear(ks[0], d, 3 * d, init="xavier"),
        "self_proj": nn.init_linear(ks[1], d, d, init="xavier"),
        "cross_q": nn.init_linear(ks[2], d, d, init="xavier"),
        "cross_kv": nn.init_linear(ks[3], d, 2 * d, init="xavier"),
        "cross_proj": nn.init_linear(ks[4], d, d, init="xavier"),
        "ffn": nn.init_mlp(ks[5], d, cfg.dim_ffn, init="xavier"),
        "norm1": nn.init_layer_norm(d),
        "norm2": nn.init_layer_norm(d),
        "norm3": nn.init_layer_norm(d),
    }


def init_decoder(key, cfg: DecoderConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, cfg.num_layers + 1)
    return {"layers": [_init_layer(ks[i], cfg)
                       for i in range(cfg.num_layers)],
            "norm": nn.init_layer_norm(cfg.d_model)}


def _mha(q, k, v, heads: int):
    b, nq, d = q.shape
    qh = q.reshape(b, nq, heads, d // heads)
    kh = k.reshape(b, -1, heads, d // heads)
    vh = v.reshape(b, -1, heads, d // heads)
    return nn.sdpa(qh, kh, vh).reshape(b, nq, d)


def decoder_forward(params, cfg: DecoderConfig, queries: jnp.ndarray,
                    memory: jnp.ndarray, grid_hw: Tuple[int, int],
                    query_pos: Optional[jnp.ndarray] = None):
    """queries (B, L, D), memory (B, HW, D) image tokens.

    Pre-norm layers (transformer.py TransformerDecoderLayer): self-attn over
    queries (+query pos), cross-attn with pos2d-encoded memory keys, FFN.
    Returns final queries, or the per-layer stack when return_intermediate.
    """
    b, l, d = queries.shape
    pos_m = jnp.asarray(pos2d_sincos(d, *grid_hw))[None].astype(queries.dtype)
    if query_pos is None:
        query_pos = jnp.asarray(pos1d_sincos(d, l))[None].astype(queries.dtype)

    x = queries
    inters: List[jnp.ndarray] = []
    for p in params["layers"]:
        # DETR convention: positions enter q/k inputs, values stay position-
        # free (q_proj(h+pos), k_proj(h+pos), v_proj(h))
        h = nn.layer_norm(p["norm1"], x)
        qk = nn.linear(p["self_qkv"], h + query_pos)
        q, k = qk[..., :d], qk[..., d:2 * d]
        v = nn.linear(p["self_qkv"], h)[..., 2 * d:]
        x = x + nn.linear(p["self_proj"], _mha(q, k, v, cfg.nhead))
        h = nn.layer_norm(p["norm2"], x)
        q = nn.linear(p["cross_q"], h + query_pos)
        kv = nn.linear(p["cross_kv"], memory + pos_m)
        k, v = jnp.split(kv, 2, axis=-1)
        x = x + nn.linear(p["cross_proj"], _mha(q, k, v, cfg.nhead))
        h = nn.layer_norm(p["norm3"], x)
        x = x + nn.mlp(p["ffn"], h)
        if cfg.return_intermediate:
            inters.append(nn.layer_norm(params["norm"], x))
    if cfg.return_intermediate:
        return jnp.stack(inters)
    return nn.layer_norm(params["norm"], x)
