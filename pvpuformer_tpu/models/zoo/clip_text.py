"""CLIP text encoder — the text-prompt co-training surface.

The reference carries a full CLIP implementation
(`isegm/model/modeling/clip.py:10-554`) for text co-training experiments
(captions plumbing at `isegm/engine/trainer.py:321,393-395`); the shipped
VPU configs never enable it. This compact module provides the text side —
token embedding, causal transformer, ln_final, text projection, and
`encode_text` pooling at the EOT token — so caption embeddings can feed a
prompt stream (e.g. as extra DMA queries).

Tokenization: CLIP's BPE needs its merges vocabulary (an external asset the
reference loads from disk); `byte_tokenizer` is a self-contained fallback
(bytes + BOS/EOS, same 77-token context) — adequate for the experimental
path, documented as a deviation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ... import nn


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512                 # output projection dim

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _init_block(key, d: int):
    ks = jax.random.split(key, 4)
    return {"ln1": nn.init_layer_norm(d),
            "qkv": nn.init_linear(ks[0], d, 3 * d, init="xavier"),
            "proj": nn.init_linear(ks[1], d, d, init="xavier"),
            "ln2": nn.init_layer_norm(d),
            "mlp": nn.init_mlp(ks[2], d, 4 * d, init="xavier")}


def init_clip_text(key, cfg: ClipTextConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, cfg.layers + 4)
    return {
        "token_embedding": nn.normal_init(ks[0], (cfg.vocab_size, cfg.width),
                                          std=0.02),
        "pos_embedding": nn.normal_init(ks[1],
                                        (cfg.context_length, cfg.width),
                                        std=0.01),
        "blocks": [_init_block(ks[2 + i], cfg.width)
                   for i in range(cfg.layers)],
        "ln_final": nn.init_layer_norm(cfg.width),
        "text_projection": nn.normal_init(ks[-1], (cfg.width, cfg.embed_dim),
                                          std=cfg.width ** -0.5),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


def _causal_attn(p, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, n, d = x.shape
    qkv = nn.linear(p["qkv"], x).reshape(b, n, 3, heads, d // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (d // heads) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.tril(jnp.ones((n, n), bool))
    logits = jnp.where(mask, logits, -1e9)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return nn.linear(p["proj"], out.reshape(b, n, d))


def encode_text(params, cfg: ClipTextConfig,
                tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens: (B, context_length) int32 ids (0-padded after EOT).
    Returns (B, embed_dim) embeddings pooled at the argmax (EOT) token
    (clip.py encode_text semantics)."""
    x = params["token_embedding"][tokens] + params["pos_embedding"]
    for p in params["blocks"]:
        x = x + _causal_attn(p, nn.layer_norm(p["ln1"], x, 1e-5), cfg.heads)
        x = x + nn.mlp(p["mlp"], nn.layer_norm(p["ln2"], x, 1e-5),
                       act=nn.quick_gelu)   # clip.py:250 QuickGELU
    x = nn.layer_norm(params["ln_final"], x, 1e-5)
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.dot(pooled, params["text_projection"].astype(pooled.dtype),
                   preferred_element_type=jnp.float32).astype(pooled.dtype)


BOS, EOS = 49406, 49407


def byte_tokenizer(texts: List[str], context_length: int = 77) -> np.ndarray:
    """Self-contained fallback tokenizer: BOS + utf-8 bytes + EOS, padded.
    Byte ids occupy [1, 256] so EOS stays the max id (EOT pooling works)."""
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        ids = [BOS] + [b + 1 for b in t.encode("utf-8")][:context_length - 2]
        ids.append(EOS)
        out[i, :len(ids)] = ids
    return out
