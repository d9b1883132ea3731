"""MAE-style plain ViT backbone with window patchify, TPU-native.

Re-derivation of the reference backbone (`isegm/model/modeling/models_vit.py`):
  * pre-norm blocks `x + attn(ln(x))`, `x + mlp(ln(x))`, LN eps 1e-6;
  * learned pos-embed with an (unused in the backbone path) cls slot —
    `forward_backbone` adds `pos_embed[:, 1:]` (models_vit.py:262);
  * window patchify for finetuning at 448: all blocks except every
    `num_blocks_per_group`-th run on 224x224-pixel token windows
    (models_vit.py:224-287) — here a pure reshape, vmapped by batching the
    windows into the leading axis;
  * optional random token shuffle mode (models_vit.py:193-222).

Patch embedding is a reshape + matmul (MXU) rather than a conv lowering;
attention runs through `nn.sdpa` (f32 softmax) — swap-in point for the
Pallas flash kernel in ops/attention.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import nn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: Tuple[int, int] = (448, 448)
    patch_size: Tuple[int, int] = (16, 16)
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    window_pixels: int = 224        # pretraining resolution for window split
    attn_impl: str = "auto"         # "auto" (fused on TPU, xla elsewhere) |
                                    # "xla" (nn.sdpa) | "flash" (streaming
                                    # Pallas kernel) | "fused" (single-block
                                    # Pallas kernel, ops/fused_attention.py)
    ln_f32: bool = True             # False: LN in bf16 (inference speed)
    mlp_impl: str = "xla"           # "xla" | "fused" (Pallas LN+MLP+residual
                                    # kernel, ops/fused_mlp.py; grad-safe)

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size[0],
                self.img_size[1] // self.patch_size[1])

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw

    @property
    def blocks_per_group(self) -> int:
        # models_vit.py:274
        return 6 if self.depth == 12 else self.depth // 4


VIT_PRESETS = {
    # models_vit.py:306-319
    "base": dict(patch_size=(16, 16), embed_dim=768, depth=12, num_heads=12),
    "large": dict(patch_size=(16, 16), embed_dim=1024, depth=24, num_heads=16),
    "huge": dict(patch_size=(14, 14), embed_dim=1280, depth=32, num_heads=16),
}


def init_block(key, dim: int, num_heads: int, mlp_ratio: float,
               qkv_bias: bool) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "norm1": nn.init_layer_norm(dim),
        "attn": {
            "qkv": nn.init_linear(k1, dim, dim * 3, bias=qkv_bias, init="xavier"),
            "proj": nn.init_linear(k2, dim, dim, init="xavier"),
        },
        "norm2": nn.init_layer_norm(dim),
        "mlp": nn.init_mlp(k3, dim, int(dim * mlp_ratio), init="xavier"),
    }


def block_forward(p, x: jnp.ndarray, num_heads: int, eps: float,
                  attn_impl: str = "xla", ln_f32: bool = True,
                  mlp_impl: str = "xla") -> jnp.ndarray:
    # constrain_acts is a no-op outside parallel.mesh.activation_sharding;
    # under a tensor-parallel trace it pins the Megatron activation layout
    # (heads/hidden over `model`, batch over `data`) so GSPMD never falls
    # back to involuntary full rematerialization in the backward.
    from ..parallel.mesh import constrain_acts

    b, n, d = x.shape
    h = nn.layer_norm(p["norm1"], x, eps, f32=ln_f32)
    qkv = nn.linear(p["attn"]["qkv"], h).reshape(b, n, 3, num_heads, d // num_heads)
    qkv = constrain_acts(qkv, model_dim=3)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if attn_impl == "auto":
        # Resolved at trace time from static shapes: the single-block fused
        # kernel wins on TPU at every ViT-B/L/H TRAIN and batched-eval shape
        # (scripts/bench_attn.py; up to 2.2x at H-global) but LOSES at
        # single-session inference batches, where the per-(b,h) grid is too
        # thin to fill the chip and XLA's dense batching is better (same
        # conclusion as the r2 flash A/B). The measured crossover sits at
        # score-matrix work b*H*N^2 ~ 3-6e7 (dense wins at 2.95e7 =
        # 4 imgs x 784 tokens; fused wins at 5.9e7 from either side —
        # 2026-08-21 v5e, /tmp-bench recorded in README "Train-shape
        # attention microbench"). On CPU/GPU backends always dense: Pallas
        # would run in interpret mode. Trace-time resolution keeps stored
        # checkpoint configs portable across platforms and batch sizes.
        from ..ops.fused_attention import MIN_SCORE_WORK
        from ..parallel import mesh as _mesh
        # Under a multi-device activation-sharding trace keep the dense
        # path: GSPMD has no partitioning rule for pallas_call, so the
        # kernel would force replication of sharded activations (lifting
        # this needs an explicit shard_map around the kernel — future
        # headroom, not a correctness risk).
        sharded = _mesh._ACT_MESH is not None and \
            _mesh._ACT_MESH.devices.size > 1
        tpu = jax.default_backend() == "tpu" and not sharded
        attn_impl = ("fused" if tpu and b * num_heads * n * n >= MIN_SCORE_WORK
                     else "xla")
    if attn_impl == "flash":
        from ..ops.attention import flash_attention
        attn = flash_attention(q, k, v).reshape(b, n, d)
    elif attn_impl == "fused":
        from ..ops.fused_attention import fused_attention
        attn = fused_attention(q, k, v).reshape(b, n, d)
    else:
        attn = nn.sdpa(q, k, v).reshape(b, n, d)
    attn = constrain_acts(attn, model_dim=2)
    x = constrain_acts(x + nn.linear(p["attn"]["proj"], attn))
    if mlp_impl == "fused" and "w_q" not in p["mlp"]["fc1"]:
        # the Pallas fused kernel reads f32/bf16 weights; int8-quantized
        # params fall through to the dispatching XLA path
        from ..ops.fused_mlp import fused_ln_mlp
        x = fused_ln_mlp(x, p["norm2"], p["mlp"], eps)
    else:
        h = nn.layer_norm(p["norm2"], x, eps, f32=ln_f32)
        hidden = constrain_acts(nn.gelu(nn.linear(p["mlp"]["fc1"], h)),
                                model_dim=2)
        x = constrain_acts(x + nn.linear(p["mlp"]["fc2"], hidden))
    return x


def init_vit(key, cfg: ViTConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.depth + 3)
    params = {
        "patch_embed": nn.init_patch_embed(keys[0], cfg.patch_size, cfg.in_chans,
                                           cfg.embed_dim, init="xavier"),
        "pos_embed": nn.normal_init(keys[1], (1, cfg.num_patches + 1, cfg.embed_dim)),
        "cls_token": nn.normal_init(keys[2], (1, 1, cfg.embed_dim)),
        "blocks": [init_block(keys[3 + i], cfg.embed_dim, cfg.num_heads,
                              cfg.mlp_ratio, cfg.qkv_bias)
                   for i in range(cfg.depth)],
    }
    return params


def _window_counts(cfg: ViTConfig) -> Tuple[int, int]:
    gh, gw = cfg.grid_size
    win_h_grid = cfg.window_pixels // cfg.patch_size[0]
    win_w_grid = cfg.window_pixels // cfg.patch_size[1]
    if gh % max(win_h_grid, 1) or gw % max(win_w_grid, 1) or gh < win_h_grid:
        return 1, 1
    return gh // win_h_grid, gw // win_w_grid


def _patchify(x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """(B, N, C) -> (B*wh*ww, N/(wh*ww), C), models_vit.py:225-239."""
    wh, ww = _window_counts(cfg)
    if wh * ww == 1:
        return x
    b, n, c = x.shape
    gh, gw = cfg.grid_size
    x = x.reshape(b, wh, gh // wh, ww, gw // ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * wh * ww, n // (wh * ww), c)


def _unpatchify(x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    wh, ww = _window_counts(cfg)
    if wh * ww == 1:
        return x
    bw, n, c = x.shape
    b = bw // (wh * ww)
    gh, gw = cfg.grid_size
    x = x.reshape(b, wh, ww, gh // wh, gw // ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, wh * ww * n, c)


def vit_backbone_forward(params, cfg: ViTConfig, x_patches: jnp.ndarray,
                         additional: Optional[jnp.ndarray] = None,
                         shuffle_key: Optional[jax.Array] = None) -> jnp.ndarray:
    """`forward_backbone` (models_vit.py:257-287).

    x_patches: (B, H, W, in_chans) image (NHWC); additional: (B, N, D)
    extra patch embeddings (the coord-feature embedding) added before pos.
    """
    x = nn.patch_embed(params["patch_embed"], x_patches, cfg.patch_size)
    if additional is not None:
        x = x + additional
    x = x + params["pos_embed"][:, 1:].astype(x.dtype)

    depth = cfg.depth
    assert depth % 4 == 0

    if shuffle_key is not None:
        # random shuffle-split mode (models_vit.py:193-222,266-272). With
        # <= window_pixels^2 tokens each split is the full sequence, making
        # the shuffle a no-op for attention; kept for capability parity.
        b, n, c = x.shape
        for i in range(depth):
            shuffle_key, sub = jax.random.split(shuffle_key)
            noise = jax.random.uniform(sub, (b, n))
            ids = jnp.argsort(noise, axis=1)
            inv = jnp.argsort(ids, axis=1)
            xs = jnp.take_along_axis(x, ids[:, :, None], axis=1)
            xs = block_forward(params["blocks"][i], xs, cfg.num_heads, cfg.ln_eps,
                               cfg.attn_impl, cfg.ln_f32, cfg.mlp_impl)
            x = jnp.take_along_axis(xs, inv[:, :, None], axis=1)
        return x

    nbpg = cfg.blocks_per_group
    is_patchified = False
    for i in range(1, depth + 1):
        if i % nbpg:
            if not is_patchified:
                x = _patchify(x, cfg)
                is_patchified = True
        else:
            if is_patchified:
                x = _unpatchify(x, cfg)
                is_patchified = False
        x = block_forward(params["blocks"][i - 1], x, cfg.num_heads, cfg.ln_eps,
                          cfg.attn_impl, cfg.ln_f32, cfg.mlp_impl)
    if is_patchified:
        x = _unpatchify(x, cfg)
    return x
