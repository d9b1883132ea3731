"""Two-way (queries <-> image) cross-attention transformer — the DMA core.

Re-derivation of the SAM-style TwoWayTransformer used as Dual-cross Merging
Attention (reference `isegm/model/modeling/transformer.py:222-521`):

Per block (transformer.py:387-463):
  1. query self-attention (the first block skips the PE add AND the residual);
  2. token->image cross-attention (internally downsampled dim), residual+LN;
  3. query MLP, residual+LN;
  4. image->token cross-attention, residual+LN on the image tokens.
Afterwards a final token->image attention + LN (transformer.py:374-379).

Positional terms: query PE = the *input* query embedding itself; image PE =
fixed interleaved sin/cos 2-D encoding (transformer.py:290-318), computed
host-side as a constant.

Returns the per-depth intermediates the DMA gating consumes
(transformer.py:362-382): [(q_after_block_0, k_0), ..., (q_final, k_last)].
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import nn


@dataclasses.dataclass(frozen=True)
class TwoWayConfig:
    depth: int = 3
    embedding_dim: int = 768
    num_heads: int = 8
    mlp_dim: int = 1024
    attention_downsample_rate: int = 2
    ln_eps: float = 1e-5   # torch LayerNorm default


def pos2d_interleaved(d_model: int, h: int, w: int) -> np.ndarray:
    """Interleaved sin/cos 2-D positional encoding (transformer.py:290-318).

    Returns (h*w, d_model) with token order row-major (y*w + x). The first
    d/2 channels interleave sin/cos of the COLUMN position, the second half
    of the ROW position.
    """
    assert d_model % 4 == 0
    pe = np.zeros((d_model, h, w), dtype=np.float64)
    dm = d_model // 2
    div = np.exp(np.arange(0.0, dm, 2) * -(math.log(10000.0) / dm))
    pos_w = np.arange(0.0, w)[:, None] * div[None, :]     # (w, dm/2)
    pos_h = np.arange(0.0, h)[:, None] * div[None, :]
    pe[0:dm:2] = np.sin(pos_w).T[:, None, :]
    pe[1:dm:2] = np.cos(pos_w).T[:, None, :]
    pe[dm::2] = np.sin(pos_h).T[:, :, None]
    pe[dm + 1::2] = np.cos(pos_h).T[:, :, None]
    return pe.reshape(d_model, h * w).T.astype(np.float32)


def init_attention(key, embedding_dim: int, num_heads: int,
                   downsample_rate: int = 1) -> Dict[str, Any]:
    internal = embedding_dim // downsample_rate
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": nn.init_linear(k1, embedding_dim, internal),
        "k": nn.init_linear(k2, embedding_dim, internal),
        "v": nn.init_linear(k3, embedding_dim, internal),
        "out": nn.init_linear(k4, internal, embedding_dim),
    }


def attention(p, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              num_heads: int) -> jnp.ndarray:
    """Downsampling attention (transformer.py:466-521).

    constrain_acts (no-op outside parallel.mesh.activation_sharding) pins
    batch-over-`data`, rest-replicated on the projection outputs: the
    point-token tensors here are tiny (12-24 tokens) and partly broadcast
    (query PEs), and without a pinned layout GSPMD invents shardings for
    them that involuntarily rematerialize in the fsdp backward."""
    from ..parallel.mesh import constrain_acts

    q = constrain_acts(nn.linear(p["q"], q))
    k = constrain_acts(nn.linear(p["k"], k))
    v = constrain_acts(nn.linear(p["v"], v))
    b, nq, c = q.shape
    nk = k.shape[1]
    q = q.reshape(b, nq, num_heads, c // num_heads)
    k = k.reshape(b, nk, num_heads, c // num_heads)
    v = v.reshape(b, nk, num_heads, c // num_heads)
    out = constrain_acts(nn.sdpa(q, k, v).reshape(b, nq, c))
    return constrain_acts(nn.linear(p["out"], out))


def init_block(key, cfg: TwoWayConfig) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d = cfg.embedding_dim
    return {
        "self_attn": init_attention(k1, d, cfg.num_heads, 1),
        "norm1": nn.init_layer_norm(d),
        "cross_t2i": init_attention(k2, d, cfg.num_heads, cfg.attention_downsample_rate),
        "norm2": nn.init_layer_norm(d),
        "mlp": {"fc1": nn.init_linear(k3, d, cfg.mlp_dim),
                "fc2": nn.init_linear(k4, cfg.mlp_dim, d)},
        "norm3": nn.init_layer_norm(d),
        "cross_i2t": init_attention(jax.random.fold_in(key, 9), d, cfg.num_heads,
                                    cfg.attention_downsample_rate),
        "norm4": nn.init_layer_norm(d),
    }


def init_two_way(key, cfg: TwoWayConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.depth + 1)
    return {
        "layers": [init_block(keys[i], cfg) for i in range(cfg.depth)],
        "final_t2i": init_attention(keys[-1], cfg.embedding_dim, cfg.num_heads,
                                    cfg.attention_downsample_rate),
        "norm_final": nn.init_layer_norm(cfg.embedding_dim),
    }


def _block_forward(p, cfg: TwoWayConfig, queries, keys, query_pe, key_pe,
                   skip_first_layer_pe: bool):
    eps = cfg.ln_eps
    if skip_first_layer_pe:
        queries = attention(p["self_attn"], queries, queries, queries, cfg.num_heads)
    else:
        q = queries + query_pe
        queries = queries + attention(p["self_attn"], q, q, queries, cfg.num_heads)
    queries = nn.layer_norm(p["norm1"], queries, eps)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + attention(p["cross_t2i"], q, k, keys, cfg.num_heads)
    queries = nn.layer_norm(p["norm2"], queries, eps)

    queries = queries + nn.mlp(p["mlp"], queries, act=jax.nn.relu)
    queries = nn.layer_norm(p["norm3"], queries, eps)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + attention(p["cross_i2t"], k, q, queries, cfg.num_heads)
    keys = nn.layer_norm(p["norm4"], keys, eps)
    return queries, keys


def two_way_forward(params, cfg: TwoWayConfig, point_embedding: jnp.ndarray,
                    image_embedding: jnp.ndarray, grid_hw: Tuple[int, int]
                    ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """point_embedding: (B, L, D); image_embedding: (B, HW, D).

    Returns the intermediates list (transformer.py:362-382) with
    return_intermediate=True semantics: entries after each non-final block,
    plus (final queries, last keys).
    """
    h, w = grid_hw
    image_pe = jnp.asarray(pos2d_interleaved(cfg.embedding_dim, h, w))[None]
    image_pe = image_pe.astype(image_embedding.dtype)
    query_pe = point_embedding

    queries, keys = point_embedding, image_embedding
    intermediate = []
    for i, layer in enumerate(params["layers"]):
        queries, keys = _block_forward(layer, cfg, queries, keys, query_pe,
                                       image_pe, skip_first_layer_pe=(i == 0))
        if i != cfg.depth - 1:
            intermediate.append((queries, keys))

    q = queries + query_pe
    k = keys + image_pe
    attn_out = attention(params["final_t2i"], q, k, keys, cfg.num_heads)
    queries = nn.layer_norm(params["norm_final"], queries + attn_out, cfg.ln_eps)
    intermediate.append((queries, keys))
    return intermediate
