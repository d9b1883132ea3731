"""CRIS/DETR-style vision-language TransformerDecoder.

Re-derivation of the alternative decoder stack the reference carries for its
`is_vitdetr_*` experiment variants (`isegm/model/modeling/transformer.py:
17-219` TransformerDecoder/TransformerDecoderLayer and
`detr_transformer.py:18-372`): query self-attention -> cross-attention onto
image tokens with 2-D sin-cos positional encodings -> FFN, pre-norm, with
per-layer intermediate outputs available. The shipped VPU path uses the
TwoWayTransformer instead (models/two_way.py); this exists for capability
parity with those experiment configs.

Deviation (PARITY.md #8b): inference-only scope — the reference layer's
dropout(0.1) on the self/cross/FFN residuals is omitted (parity is tested
in eval mode, where torch dropout is identity). Wire dropout plumbing in
before using this stack for training.
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


def _init_attn(key, d: int):
    """torch nn.MultiheadAttention layout: packed in-proj + out-proj."""
    k1, k2 = jax.random.split(key)
    return {"in_proj": nn.init_linear(k1, d, 3 * d, init="xavier"),
            "out": nn.init_linear(k2, d, d, init="xavier")}


def _init_layer(key, cfg: DecoderConfig):
    ks = jax.random.split(key, 6)
    d = cfg.d_model
    return {
        "self_attn": _init_attn(ks[0], d),
        "self_attn_norm": nn.init_layer_norm(d),
        "cross_attn": _init_attn(ks[1], d),
        "cross_attn_norm": nn.init_layer_norm(d),
        # ffn = Linear -> ReLU -> LayerNorm(dim_ffn) -> Linear
        # (transformer.py:160-164)
        "ffn": {"fc1": nn.init_linear(ks[2], d, cfg.dim_ffn, init="xavier"),
                "ln": nn.init_layer_norm(cfg.dim_ffn),
                "fc2": nn.init_linear(ks[3], cfg.dim_ffn, d, init="xavier")},
        "norm1": nn.init_layer_norm(d),
        "norm2": nn.init_layer_norm(d),
        "norm3": nn.init_layer_norm(d),
    }


def init_decoder(key, cfg: DecoderConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, cfg.num_layers + 1)
    return {"layers": [_init_layer(ks[i], cfg)
                       for i in range(cfg.num_layers)],
            "norm": nn.init_layer_norm(cfg.d_model)}


def _mha(p, q, k, v, heads: int):
    """torch nn.MultiheadAttention with a packed in-projection: q/k/v each
    go through their slice of in_proj, then scaled-dot-product, then
    out-proj."""
    d = q.shape[-1]
    in_proj = p["in_proj"]
    if "w_q" in in_proj:                 # int8-quantized deployment params
        def proj(x, i):
            sub = {"w_q": in_proj["w_q"][:, i * d:(i + 1) * d],
                   "w_s": in_proj["w_s"][i * d:(i + 1) * d]}
            if "b" in in_proj:
                sub["b"] = in_proj["b"][i * d:(i + 1) * d]
            return nn._linear_int8(sub, x)
    else:
        w = in_proj["w"]
        b = in_proj.get("b")

        def proj(x, i):
            y = nn.mxu_dot(x, w[:, i * d:(i + 1) * d].astype(x.dtype))
            if b is not None:
                y = y + b[i * d:(i + 1) * d].astype(x.dtype)
            return y
    qp, kp, vp = proj(q, 0), proj(k, 1), proj(v, 2)
    bsz, nq, _ = qp.shape
    out = nn.sdpa(qp.reshape(bsz, nq, heads, d // heads),
                  kp.reshape(bsz, -1, heads, d // heads),
                  vp.reshape(bsz, -1, heads, d // heads)).reshape(bsz, nq, d)
    return nn.linear(p["out"], out)


def _ffn(p, x):
    h = jax.nn.relu(nn.linear(p["fc1"], x))
    return nn.linear(p["fc2"], nn.layer_norm(p["ln"], h, 1e-5))


def decoder_forward(params, cfg: DecoderConfig, vis: jnp.ndarray,
                    txt: jnp.ndarray, grid_hw: Tuple[int, int],
                    as_text: bool = False, image_to_token: bool = False):
    """vis (B, HW, D) image tokens; txt (B, L, D) query tokens.

    Exact re-derivation of TransformerDecoder.forward /
    TransformerDecoderLayer.forward (transformer.py:90-219):
      * every layer self-attends over the ORIGINAL vis (the residual vis
        update is layer-local, transformer.py:186-190 with the outer loop
        at :117 always passing the same `vis`);
      * cross-attention queries = norm2(txt) (+pos1d only when as_text),
        keys = the layer's self-attended vis + pos2d, values = that vis;
      * FFN carries an inner LayerNorm on the hidden (transformer.py:162);
      * final norm is LayerNorm + ReLU (transformer.py:35);
      * image_to_token=True threads the vis side instead of txt.
    Returns the final normalized output, or the per-layer intermediate list
    when cfg.return_intermediate (last entry == final output,
    transformer.py:126-137).
    """
    b, hw, d = vis.shape
    l = txt.shape[1]
    vis_pos = jnp.asarray(pos2d_sincos(d, *grid_hw))[None].astype(vis.dtype)
    txt_pos = (jnp.asarray(pos1d_sincos(d, l))[None].astype(txt.dtype)
               if as_text else None)

    out = vis if image_to_token else txt
    inters: List[jnp.ndarray] = []

    def final_norm(x):
        return jax.nn.relu(nn.layer_norm(params["norm"], x, 1e-5))

    for p in params["layers"]:
        # layer-local self-attention over the original vis
        vis2 = nn.layer_norm(p["norm1"], vis, 1e-5)
        a = vis2 + vis_pos
        vis2 = _mha(p["self_attn"], a, a, vis2, cfg.nhead)
        vis2 = nn.layer_norm(p["self_attn_norm"], vis2, 1e-5)
        vis_l = vis + vis2

        if image_to_token:
            # queries come from the self-attended vis; keys/values are the
            # threaded output (transformer.py:193-201, where the threaded
            # `output` arrives through the layer's txt argument)
            h = nn.layer_norm(p["norm2"], vis_l, 1e-5)
            q = h + vis_pos
            kv = out if txt_pos is None else out + txt_pos
            c = _mha(p["cross_attn"], q, kv, out, cfg.nhead)
            out = vis_l + nn.layer_norm(p["cross_attn_norm"], c, 1e-5)
        else:
            h = nn.layer_norm(p["norm2"], out, 1e-5)
            q = h if txt_pos is None else h + txt_pos
            c = _mha(p["cross_attn"], q, vis_l + vis_pos, vis_l, cfg.nhead)
            out = out + nn.layer_norm(p["cross_attn_norm"], c, 1e-5)

        out = out + _ffn(p["ffn"], nn.layer_norm(p["norm3"], out, 1e-5))
        if cfg.return_intermediate:
            inters.append(final_norm(out))

    if cfg.return_intermediate:
        inters[-1] = final_norm(out)
        return inters
    return final_norm(out)
