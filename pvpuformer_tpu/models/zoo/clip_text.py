"""CLIP — text encoder, visual towers, and tokenizer.

The reference carries a full CLIP implementation
(`isegm/model/modeling/clip.py:10-554`) for text co-training experiments
(captions plumbing at `isegm/engine/trainer.py:321,393-395`); the shipped
VPU configs never enable it. This module provides the full surface:

  * text side — token embedding, causal transformer (QuickGELU, LN eps
    1e-5), ln_final, text projection, `encode_text` pooling at the EOT
    token (clip.py:439-456);
  * ModifiedResNet visual tower (clip.py:10-223): 3-conv stem + avgpool,
    anti-aliased bottlenecks (avgpool before strided projections), and the
    CRIS-style multi-scale return (x2, x3, attention-pooled x4) with the
    bicubic positional-embedding resize in AttentionPool2d (clip.py:80-144
    — bicubic align_corners=False, computed here as two constant
    interpolation matrices so it stays jit-friendly);
  * VisionTransformer visual tower (clip.py:286-332): patch conv, class
    token, ln_pre/ln_post, returns projected GRID tokens (the reference
    pools x[:, 1:], not the cls token);
  * tokenization — `bpe_tokenizer` is the standard CLIP byte-level BPE
    (bytes_to_unicode + merges; the reference ships no tokenizer code and
    the merges vocabulary is an external asset) used when a merges file is
    available; `byte_tokenizer` is the self-contained fallback (bytes +
    BOS/EOS, same 77-token context), documented as a deviation.
"""
from __future__ import annotations

import dataclasses
import gzip
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ... import nn
from .common import frozen_bn, init_frozen_bn


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


def _causal_attn(p, x: jnp.ndarray, heads: int,
                 causal: bool = True) -> jnp.ndarray:
    b, n, d = x.shape
    qkv = nn.linear(p["qkv"], x).reshape(b, n, 3, heads, d // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (d // heads) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
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


# ---------------------------------------------------------------------------
# ModifiedResNet visual tower (clip.py:10-223)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ClipVisualConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)   # RN50
    width: int = 64
    heads: int = 32                     # embed_dim // 64 for RN50
    output_dim: int = 1024
    input_resolution: int = 224

    @property
    def embed_dim(self) -> int:
        return self.width * 32          # clip.py:194

    @property
    def spacial_dim(self) -> int:
        return self.input_resolution // 32

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _init_clip_bottleneck(key, cin: int, planes: int, stride: int):
    ks = jax.random.split(key, 4)
    p = {"c1": {"conv": nn.init_conv(ks[0], 1, 1, cin, planes, bias=False),
                "bn": init_frozen_bn(planes)},
         "c2": {"conv": nn.init_conv(ks[1], 3, 3, planes, planes, bias=False),
                "bn": init_frozen_bn(planes)},
         "c3": {"conv": nn.init_conv(ks[2], 1, 1, planes, planes * 4,
                                     bias=False),
                "bn": init_frozen_bn(planes * 4)}}
    if stride > 1 or cin != planes * 4:
        p["down"] = {"conv": nn.init_conv(ks[3], 1, 1, cin, planes * 4,
                                          bias=False),
                     "bn": init_frozen_bn(planes * 4)}
    return p


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """nn.AvgPool2d(k): kernel=stride=k, no padding."""
    y = jax.lax.reduce_window(x.astype(jnp.float32), 0.0, jax.lax.add,
                              (1, k, k, 1), (1, k, k, 1), "VALID")
    return (y / (k * k)).astype(x.dtype)


def _clip_bottleneck(p, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """clip.py Bottleneck (:44-57): all convs stride 1; avgpool after conv2
    and prepended to the downsample projection when stride > 1."""
    y = jax.nn.relu(frozen_bn(p["c1"]["bn"], nn.conv1x1(p["c1"]["conv"], x)))
    y = jax.nn.relu(frozen_bn(p["c2"]["bn"], nn.conv2d(p["c2"]["conv"], y)))
    if stride > 1:
        y = _avg_pool(y, stride)
    y = frozen_bn(p["c3"]["bn"], nn.conv1x1(p["c3"]["conv"], y))
    if "down" in p:
        idn = _avg_pool(x, stride) if stride > 1 else x
        idn = frozen_bn(p["down"]["bn"], nn.conv1x1(p["down"]["conv"], idn))
    else:
        idn = x
    return jax.nn.relu(y + idn)


def init_modified_resnet(key, cfg: ClipVisualConfig) -> Dict[str, Any]:
    w = cfg.width
    ks = jax.random.split(key, 10)
    ed = cfg.embed_dim

    def layer(k, cin, planes, blocks, stride):
        ps = [_init_clip_bottleneck(jax.random.fold_in(k, 0), cin, planes,
                                    stride)]
        for j in range(1, blocks):
            ps.append(_init_clip_bottleneck(jax.random.fold_in(k, j),
                                            planes * 4, planes, 1))
        return ps

    return {
        "stem1": {"conv": nn.init_conv(ks[0], 3, 3, 3, w // 2, bias=False),
                  "bn": init_frozen_bn(w // 2)},
        "stem2": {"conv": nn.init_conv(ks[1], 3, 3, w // 2, w // 2,
                                       bias=False),
                  "bn": init_frozen_bn(w // 2)},
        "stem3": {"conv": nn.init_conv(ks[2], 3, 3, w // 2, w, bias=False),
                  "bn": init_frozen_bn(w)},
        "layer1": layer(ks[3], w, w, cfg.layers[0], 1),
        "layer2": layer(ks[4], w * 4, w * 2, cfg.layers[1], 2),
        "layer3": layer(ks[5], w * 8, w * 4, cfg.layers[2], 2),
        "layer4": layer(ks[6], w * 16, w * 8, cfg.layers[3], 2),
        "attnpool": {
            "pos": jax.random.normal(ks[7], (cfg.spacial_dim ** 2 + 1, ed))
            / ed ** 0.5,
            "q": nn.init_linear(ks[8], ed, ed),
            "k": nn.init_linear(jax.random.fold_in(ks[8], 1), ed, ed),
            "v": nn.init_linear(jax.random.fold_in(ks[8], 2), ed, ed),
            "c": nn.init_linear(jax.random.fold_in(ks[8], 3), ed,
                                cfg.output_dim),
            "connect": {"conv": nn.init_conv(ks[9], 1, 1, ed, cfg.output_dim,
                                             bias=False),
                        "bn": init_frozen_bn(cfg.output_dim)},
        },
    }


def _attention_pool(p, x: jnp.ndarray, heads: int,
                    spacial_dim: int) -> jnp.ndarray:
    """AttentionPool2d (clip.py:110-144): per-pixel QKV self-attention with
    bicubic-resized positional embedding and a conv+BN residual."""
    from ...ops.resize import _bicubic_axis_matrix
    b, h, w, c = x.shape
    res = frozen_bn(p["connect"]["bn"], nn.conv1x1(p["connect"]["conv"], x))

    # resize_pos_embed (clip.py:80-108): bicubic align_corners=False over
    # the grid tokens (cls row dropped) — two constant matrices, traced-safe
    pos = p["pos"][1:].reshape(spacial_dim, spacial_dim, c)
    mh = jnp.asarray(_bicubic_axis_matrix(spacial_dim, h), x.dtype)
    mw = jnp.asarray(_bicubic_axis_matrix(spacial_dim, w), x.dtype)
    pos = jnp.einsum("Oh,hwc->Owc", mh, pos.astype(x.dtype))
    pos = jnp.einsum("Pw,hwc->hPc", mw, pos)

    t = x.reshape(b, h * w, c) + pos.reshape(1, h * w, c)
    hd = c // heads
    q = nn.linear(p["q"], t).reshape(b, -1, heads, hd) * hd ** -0.5
    k = nn.linear(p["k"], t).reshape(b, -1, heads, hd)
    v = nn.linear(p["v"], t).reshape(b, -1, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = nn.linear(p["c"], out.reshape(b, h * w, c))
    out = out.reshape(b, h, w, -1)
    return jax.nn.relu(out + res)


def encode_image_resnet(params, cfg: ClipVisualConfig, image: jnp.ndarray):
    """image (B, H, W, 3) -> (x2, x3, attention-pooled x4)
    (clip.py:207-223 — the CRIS-style multi-scale return)."""
    x = image
    for s in ("stem1", "stem2", "stem3"):
        x = jax.nn.relu(frozen_bn(params[s]["bn"],
                                  nn.conv2d(params[s]["conv"], x,
                                            stride=2 if s == "stem1" else 1)))
    x = _avg_pool(x, 2)
    for name, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2),
                         ("layer4", 2)):
        for j, blk in enumerate(params[name]):
            x = _clip_bottleneck(blk, x, stride if j == 0 else 1)
        if name == "layer2":
            x2 = x
        elif name == "layer3":
            x3 = x
    x4 = _attention_pool(params["attnpool"], x, cfg.heads, cfg.spacial_dim)
    return x2, x3, x4


# ---------------------------------------------------------------------------
# VisionTransformer visual tower (clip.py:286-332)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ClipViTConfig:
    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def init_clip_vit(key, cfg: ClipViTConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, cfg.layers + 6)
    scale = cfg.width ** -0.5
    grid = cfg.input_resolution // cfg.patch_size
    return {
        "conv1": nn.init_conv(ks[0], cfg.patch_size, cfg.patch_size, 3,
                              cfg.width, bias=False),
        "class_embedding": scale * jax.random.normal(ks[1], (cfg.width,)),
        "pos_embedding": scale * jax.random.normal(
            ks[2], (grid * grid + 1, cfg.width)),
        "ln_pre": nn.init_layer_norm(cfg.width),
        "blocks": [_init_block(ks[3 + i], cfg.width)
                   for i in range(cfg.layers)],
        "ln_post": nn.init_layer_norm(cfg.width),
        "proj": scale * jax.random.normal(ks[-1], (cfg.width,
                                                   cfg.output_dim)),
    }


def encode_image_vit(params, cfg: ClipViTConfig,
                     image: jnp.ndarray) -> jnp.ndarray:
    """image (B, H, W, 3) -> projected GRID tokens (B, gh*gw, output_dim)
    (clip.py:309-332 — ln_post over x[:, 1:], cls token dropped)."""
    x = nn.conv2d(params["conv1"], image, stride=cfg.patch_size,
                  padding=((0, 0), (0, 0)))
    b, gh, gw, c = x.shape
    x = x.reshape(b, gh * gw, c)
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype),
                           (b, 1, c))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = nn.layer_norm(params["ln_pre"], x, 1e-5)
    for p in params["blocks"]:
        x = x + _causal_attn(p, nn.layer_norm(p["ln1"], x, 1e-5),
                             cfg.heads, causal=False)
        x = x + nn.mlp(p["mlp"], nn.layer_norm(p["ln2"], x, 1e-5),
                       act=nn.quick_gelu)
    x = nn.layer_norm(params["ln_post"], x[:, 1:], 1e-5)
    return jnp.einsum("bnc,cd->bnd", x, params["proj"].astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# tokenizers
# ---------------------------------------------------------------------------

BOS, EOS = 49406, 49407


def _bytes_to_unicode() -> Dict[int, str]:
    """Standard CLIP/GPT-2 byte <-> printable-unicode table."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class BPETokenizer:
    """The standard CLIP byte-level BPE, given a merges vocabulary file
    (`bpe_simple_vocab_16e6.txt.gz` layout). The reference ships no
    tokenizer code — this re-derives the public CLIP contract so real CLIP
    checkpoints tokenize identically; `byte_tokenizer` is the asset-free
    fallback."""

    def __init__(self, merges_path: str):
        import regex
        opener = gzip.open if str(merges_path).endswith(".gz") else open
        with opener(merges_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1]
                  if m]
        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {}
        self.pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", regex.IGNORECASE)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(
                p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        import html
        text = html.unescape(html.unescape(text))
        text = " ".join(text.split()).strip().lower()
        ids: List[int] = []
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def __call__(self, texts: List[str],
                 context_length: int = 77) -> np.ndarray:
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [BOS] + self.encode(t)[:context_length - 2] + [EOS]
            out[i, :len(ids)] = ids
        return out


def get_tokenizer(merges_path: Optional[str] = None):
    """Real BPE when a merges vocabulary is available, byte fallback
    otherwise."""
    import os
    if merges_path and os.path.exists(merges_path):
        return BPETokenizer(merges_path)
    return byte_tokenizer


def byte_tokenizer(texts: List[str], context_length: int = 77) -> np.ndarray:
    """Self-contained fallback tokenizer: BOS + utf-8 bytes + EOS, padded.
    Byte ids occupy [1, 256] so EOS stays the max id (EOT pooling works)."""
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        ids = [BOS] + [b + 1 for b in t.encode("utf-8")][:context_length - 2]
        ids.append(EOS)
        out[i, :len(ids)] = ids
    return out
