"""Minimal functional NN primitives (pytree params, explicit init/apply).

Design notes (TPU-first):
  * Activations are NHWC (TPU-preferred conv layout); the reference is NCHW
    torch — layout is internal, parity is checked on values.
  * Patch embedding and 2x2-stride-2 (de)convolutions are expressed as
    reshapes + matmuls so they land on the MXU instead of conv lowerings.
  * All matmuls take `preferred_element_type=jnp.float32` so bf16 inputs
    accumulate in f32.
  * Params are plain nested dicts of jnp arrays -> trivially checkpointable
    and shardable with `jax.sharding`.

Torch-parity conventions (so converted reference weights drop in):
  * linear `w` is stored (in, out) — transpose of torch's (out, in).
  * layer_norm matches torch LayerNorm (eps configurable).
  * group_norm(1, C) matches torch GroupNorm(1, C): normalize over (H, W, C).
"""
from __future__ import annotations

import functools
import math
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, dtype=jnp.float32, fan_in=None, fan_out=None):
    """Xavier/Glorot uniform, matching torch.nn.init.xavier_uniform_."""
    if fan_in is None:
        fan_in = shape[0] if len(shape) == 2 else int(jnp.prod(jnp.array(shape[:-1])))
    if fan_out is None:
        fan_out = shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal_init(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform(key, shape, dtype=jnp.float32, fan_in=None):
    """torch's default conv/linear init: kaiming_uniform(a=sqrt(5)) ~ U(-1/sqrt(fan_in), ...)."""
    if fan_in is None:
        fan_in = shape[0] if len(shape) == 2 else int(jnp.prod(jnp.array(shape[:-1])))
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -math.sqrt(3.0) * bound, math.sqrt(3.0) * bound)


# ---------------------------------------------------------------------------
# linear / mlp
# ---------------------------------------------------------------------------

def mxu_dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """dot with dtype-correct MXU accumulation.

    bf16 inputs: emit a bf16-out dot. The TPU MXU accumulates bf16 products
    in f32 either way and rounds once on output, so this is numerically the
    `preferred_element_type=f32` + astype(bf16) form — but the output AVAL
    is bf16, so the backward cotangent stays bf16 and the two VJP matmuls
    (dx, dW) run at bf16 MXU rate. With the f32-out form every
    activation-grad matmul in the train step silently ran f32 (trace-
    measured: 22 ms/step of linear backward at ViT-B@448 b8).
    f32/f64 inputs keep explicit f32 accumulation (parity paths).
    """
    if x.dtype == jnp.bfloat16:
        return jnp.dot(x, w)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def mxu_einsum(spec: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """einsum with the same dtype policy as mxu_dot (see its docstring)."""
    if a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16:
        return jnp.einsum(spec, a, b)
    return jnp.einsum(spec, a, b,
                      preferred_element_type=jnp.float32).astype(a.dtype)

def init_linear(key, in_dim: int, out_dim: int, bias: bool = True,
                init: str = "torch") -> Params:
    kw, kb = jax.random.split(key)
    if init == "xavier":
        w = xavier_uniform(kw, (in_dim, out_dim))
    else:  # torch default
        w = kaiming_uniform(kw, (in_dim, out_dim), fan_in=in_dim)
    p = {"w": w}
    if bias:
        bound = math.sqrt(1.0 / in_dim)
        p["b"] = (jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
                  if init == "torch" else jnp.zeros((out_dim,)))
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:
        return _linear_int8(p, x)
    y = mxu_dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# int8 quantized linear (inference-only serving path)
#
# TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate, and int8
# weights halve the weight HBM traffic besides. Scheme: per-output-channel
# symmetric weight scales (PTQ, offline) + per-token dynamic symmetric
# activation scales (computed on the fly — one amax reduction per call).
# `linear`/`mlp` dispatch on the param structure ("w_q" present), so any
# module whose weights went through `quantize_linear` runs quantized with no
# config or call-site change; quantization is a deployment-time param
# transform, not part of the model identity (configs/checkpoints are
# unchanged — serialization stores the original f32/bf16 masters).
# ---------------------------------------------------------------------------

def quantize_linear(p: Params) -> Params:
    """PTQ a linear param dict {"w": (in, out)[, "b"]} to int8.

    Returns {"w_q": int8 (in, out), "w_s": f32 (out,)[, "b"]}. Symmetric
    per-output-channel: w ~= w_q * w_s.
    """
    w = jnp.asarray(p["w"], jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = {"w_q": wq, "w_s": s}
    if "b" in p:
        out["b"] = jnp.asarray(p["b"], jnp.float32)
    return out


def _linear_int8(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-activation int8 matmul: both operands int8 so XLA lowers the
    contraction onto the MXU's int8 path (int32 accumulate)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["w_q"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * p["w_s"]
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def quantize_params(params: Params, min_in_dim: int = 64) -> Params:
    """Recursively PTQ every linear-shaped leaf dict in a param tree.

    A node is quantized iff it looks like an `init_linear` product: a dict
    with a 2-D float "w" whose fan-in is at least `min_in_dim` (tiny
    projections gain nothing and lose precision; LayerNorm/conv nodes don't
    match the shape test). Lists/tuples/dicts are walked; everything else is
    returned as-is.
    """
    def walk(node):
        if isinstance(node, dict):
            w = node.get("w")
            if (w is not None and hasattr(w, "ndim") and w.ndim == 2
                    and jnp.issubdtype(w.dtype, jnp.floating)
                    and w.shape[0] >= min_in_dim
                    and set(node) <= {"w", "b"}):
                return quantize_linear(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def init_mlp(key, in_dim: int, hidden: int, out_dim: Optional[int] = None,
             init: str = "torch") -> Params:
    out_dim = out_dim or in_dim
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, in_dim, hidden, init=init),
            "fc2": init_linear(k2, hidden, out_dim, init=init)}


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU matching torch `nn.GELU()`/`F.gelu` (exact erf — what the
    reference uses everywhere; `jax.nn.gelu`'s default tanh approximation is
    ~1e-3 off, which broke bit-parity with converted weights).

    Dtype dispatch (static, at trace time): in bf16 the tanh approximation's
    error sits below bf16's own quantization (~4e-3 relative), so the fast
    form is numerically free there and saves ~0.77 ms/click on the ViT-B@448
    TPU click path (measured erf vs tanh, bench.py). f32/f64 — the --parity
    eval path and all oracle tests — always get exact erf."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU, x * sigmoid(1.702 x) (clip.py:234-236)."""
    return x * jax.nn.sigmoid(1.702 * x)


def mlp(p: Params, x: jnp.ndarray, act: Callable = gelu) -> jnp.ndarray:
    return linear(p["fc2"], act(linear(p["fc1"], x)))


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_bf16(x, scale, bias, eps):
    """LayerNorm for bf16 activations: f32 math in-register, bf16 residuals.

    Plain autodiff through the f32-math LayerNorm saves f32 linearization
    residuals (the centered input, etc.) — at ViT-B@448 train shapes that is
    ~19 MB of f32 HBM per LN per block per direction. Here the VJP saves the
    bf16 x (lossless — x IS bf16) plus the tiny per-token f32 (mean, rsqrt)
    and recomputes x̂ in the backward, so all large tensors stay bf16. The
    backward formula is the exact analytic LN gradient; recomputing x̂ from
    the saved f32 mean/inv is bitwise what autodiff would have read back."""
    return _ln_bf16_fwd(x, scale, bias, eps)[0]


def _ln_bf16_fwd(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * inv
    out = (y * scale + bias).astype(x.dtype)
    return out, (x, mean, inv, scale)


def _ln_bf16_bwd(eps, res, g):
    x, mean, inv, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    xhat = (xf - mean) * inv
    lead = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=lead)
    dbias = jnp.sum(gf, axis=lead)
    dxhat = gf * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = ((dxhat - m1 - xhat * m2) * inv).astype(x.dtype)
    return dx, dscale, dbias


_ln_bf16.defvjp(_ln_bf16_fwd, _ln_bf16_bwd)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6,
               f32: bool = True) -> jnp.ndarray:
    """torch-parity LayerNorm. f32=False normalizes in the input dtype —
    an inference-speed option (the f32 round trips cost ~36 convert+reduce
    fusions per ViT-B click); keep f32=True for training/parity. bf16
    inputs with f32 math route through _ln_bf16 (identical forward, bf16
    VJP residuals); f32/f64 parity paths keep plain autodiff."""
    if f32 and x.dtype == jnp.bfloat16:
        return _ln_bf16(x, p["scale"].astype(jnp.float32),
                        p["bias"].astype(jnp.float32), eps)
    xf = x.astype(jnp.float32) if f32 else x
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if f32:
        y = y * p["scale"] + p["bias"]
    else:
        y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y.astype(x.dtype)


def init_group_norm(channels: int) -> Params:
    return {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))}


def group_norm1(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm with a single group over NHWC input (== torch GroupNorm(1, C)).

    Normalizes each sample over all of (H, W, C); per-channel affine.
    """
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# convolutions (NHWC)
# ---------------------------------------------------------------------------

def init_conv(key, kh: int, kw: int, in_ch: int, out_ch: int, bias: bool = True,
              groups: int = 1) -> Params:
    """torch Conv2d init; for groups > 1 the weight is (kh, kw, in_ch//groups,
    out_ch) HWIO with fan_in = kh*kw*in_ch//groups (torch's fan-in)."""
    kkw, kkb = jax.random.split(key)
    fan_in = kh * kw * (in_ch // groups)
    p = {"w": kaiming_uniform(kkw, (kh, kw, in_ch // groups, out_ch),
                              fan_in=fan_in)}
    if bias:
        bound = math.sqrt(1.0 / fan_in)
        p["b"] = jax.random.uniform(kkb, (out_ch,), jnp.float32, -bound, bound)
    return p


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv_nhwc(x: jnp.ndarray, w: jnp.ndarray, strides, padding, groups,
              rhs_dilation) -> jnp.ndarray:
    """NHWC/HWIO conv with f32 MXU accumulation that survives `jax.grad`.

    jax 0.9.0's conv transpose rule rejects `preferred_element_type=f32`
    with bf16 operands ("requires arguments to have the same dtypes, got
    bfloat16, float32"), so the f32-accumulated conv is not differentiable
    as written. This wrapper keeps the f32-accumulated forward and defines
    the backward as the VJP of the *same-dtype* conv (operand-dtype
    accumulation for the two gradient convs — standard mixed-precision
    practice; on TPU the MXU still accumulates f32 internally and only the
    gradient outputs round to bf16). Output dtype: f32 (caller casts)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, rhs_dilation=rhs_dilation,
        preferred_element_type=jnp.float32)


def _conv_nhwc_fwd(x, w, strides, padding, groups, rhs_dilation):
    return conv_nhwc(x, w, strides, padding, groups, rhs_dilation), (x, w)


def _conv_nhwc_bwd(strides, padding, groups, rhs_dilation, res, g):
    x, w = res
    _, vjp = jax.vjp(
        lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups, rhs_dilation=rhs_dilation), x, w)
    return vjp(g.astype(x.dtype))


conv_nhwc.defvjp(_conv_nhwc_fwd, _conv_nhwc_bwd)


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1,
           padding: str | Sequence = "TORCH", groups: int = 1) -> jnp.ndarray:
    """"TORCH" padding (default) = symmetric k//2 per side, exactly torch's
    Conv2d(padding=k//2). NOT the same as XLA "SAME" when stride > 1: SAME
    pads asymmetrically (e.g. (0,1) for k3 s2 on even input), which shifted
    every strided conv in the zoo by one pixel vs the reference."""
    if isinstance(padding, str) and padding == "TORCH":
        kh, kw = p["w"].shape[0], p["w"].shape[1]
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    if not isinstance(padding, str):
        padding = tuple(tuple(pp) for pp in padding)
    y = conv_nhwc(x, p["w"].astype(x.dtype), (stride, stride), padding,
                  groups, (1, 1)).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv1x1(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Pointwise conv as a matmul (MXU)."""
    y = mxu_dot(x, p["w"].reshape(p["w"].shape[-2], p["w"].shape[-1]).astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_conv1x1(key, in_ch: int, out_ch: int, bias: bool = True) -> Params:
    p = init_conv(key, 1, 1, in_ch, out_ch, bias)
    return p


def init_deconv2x2(key, in_ch: int, out_ch: int, bias: bool = True) -> Params:
    """ConvTranspose2d(k=2, s=2). Stored as (in, 2, 2, out) for the matmul form.

    torch init: kaiming_uniform with fan_in = in_ch * k * k computed on the
    (in, out, k, k) weight -> fan_in = out_ch ... torch uses weight shape
    (in, out, kh, kw) and fan_in = out_ch*kh*kw for ConvTranspose. We follow.
    """
    kkw, kkb = jax.random.split(key)
    fan_in = out_ch * 4  # torch _calculate_fan_in for ConvTranspose2d
    p = {"w": kaiming_uniform(kkw, (in_ch, 2, 2, out_ch), fan_in=fan_in)}
    if bias:
        bound = math.sqrt(1.0 / fan_in)
        p["b"] = jax.random.uniform(kkb, (out_ch,), jnp.float32, -bound, bound)
    return p


def deconv2x2(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """2x upsampling transposed conv as matmul + pixel-shuffle (MXU-friendly).

    out[2i+di, 2j+dj, o] = sum_c x[i, j, c] * w[c, di, dj, o]
    Matches torch ConvTranspose2d(in, out, 2, stride=2) exactly.
    """
    b, h, w, cin = x.shape
    wmat = p["w"].reshape(cin, -1).astype(x.dtype)          # (cin, 4*out)
    y = mxu_dot(x, wmat)
    out = y.shape[-1] // 4
    y = y.reshape(b, h, w, 2, 2, out)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, out)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_patch_embed(key, patch: Tuple[int, int], in_ch: int, embed_dim: int,
                     init: str = "xavier") -> Params:
    """Patch embedding stored as a linear over flattened patches.

    Weight layout (ph*pw*in_ch, embed_dim) with the flattened index ordered
    (ph, pw, in_ch) — i.e. HWIO row-major, matching `extract_patches` below.
    """
    kw_, kb_ = jax.random.split(key)
    fan_in = patch[0] * patch[1] * in_ch
    if init == "xavier":
        # reference inits patch_embed like nn.Linear xavier_uniform on the
        # (out, in) view (models_vit.py:168-171)
        w = xavier_uniform(kw_, (fan_in, embed_dim), fan_in=fan_in, fan_out=embed_dim)
    else:
        w = kaiming_uniform(kw_, (fan_in, embed_dim), fan_in=fan_in)
    bound = math.sqrt(1.0 / fan_in)
    b = jax.random.uniform(kb_, (embed_dim,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def patch_embed(p: Params, x: jnp.ndarray, patch: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/ph * W/pw, D) via reshape + matmul.

    Measured alternative (v5e, 448^2x3): a strided-conv lowering is 2.2x
    faster STANDALONE (63 vs 136 us — the extract-patches transpose puts
    c=3 in the lane dim at ~2% utilization) but 0.26 ms/click SLOWER inside
    the full click program (4.13 vs 3.88 p50 — XLA overlaps the transpose
    copies with neighboring matmuls there, and the conv breaks that
    schedule), so the matmul form stays.
    """
    ph, pw = patch
    b, h, w, c = x.shape
    gh, gw = h // ph, w // pw
    x = x.reshape(b, gh, ph, gw, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, ph * pw * c)
    if "w_q" in p:                      # int8-quantized deployment params
        return _linear_int8(p, x)
    y = mxu_dot(x, p["w"].astype(x.dtype))
    return y + p["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# attention (dense path; the Pallas flash kernel lives in ops/attention.py)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _softmax_bf16(logits: jnp.ndarray) -> jnp.ndarray:
    """Last-axis softmax: f32 math in-register, bf16 in/out AND bf16
    residual. jax.nn.softmax on upcast logits saves its f32 output for the
    VJP — at ViT-B@448 train shapes that is a 59 MB f32 copy per windowed
    block per step (trace-measured). Here the VJP keeps everything bf16
    with f32 reductions only."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        logits.dtype)


def _softmax_bf16_fwd(logits):
    p = _softmax_bf16(logits)
    return p, p


def _softmax_bf16_bwd(p, g):
    # s = Σ_k p·g as a batched dot_general with f32 accumulation: XLA fused
    # the naive `sum(pf * gf)` with its elementwise consumer and materialized
    # the converted f32 tensor (59 MB at the global-attention train shapes,
    # trace-observed). The dot reads p and g in bf16; bf16×bf16 products are
    # exact in f32, so s is bitwise the naive form's value.
    nd = p.ndim
    batch = tuple(range(nd - 1))
    s = jax.lax.dot_general(p, g, (((nd - 1,), (nd - 1,)), (batch, batch)),
                            preferred_element_type=jnp.float32)[..., None]
    return ((g.astype(jnp.float32) - s) * p.astype(jnp.float32)).astype(p.dtype),


_softmax_bf16.defvjp(_softmax_bf16_fwd, _softmax_bf16_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sdpa_bf16(q, k, v, scale: float):
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k) * jnp.bfloat16(scale)
    probs = _softmax_bf16(logits)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


def _sdpa_bf16_fwd(q, k, v, scale):
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k) * jnp.bfloat16(scale)
    probs = _softmax_bf16(logits)
    out = jnp.einsum("...hqk,...khd->...qhd", probs, v)
    return out, (q, k, v, probs)


def _sdpa_bf16_bwd(scale, res, g):
    # Hand-structured backward: same math as autodiff (bf16 probs residual,
    # f32-accum softmax inner product, ds cast to bf16 before the dq/dk
    # matmuls) but with the contractions WRITTEN in their natural einsum
    # forms instead of XLA-transposed fwd ops, and the score residual kept
    # bf16 (autodiff through jax.nn.softmax saves its f32 output).
    # scripts/bench_attn.py at the b32 train shapes (2026-08-21, v5e):
    # -7% (window 3.17 vs 3.40 ms) / wash (global 7.79 vs 7.79) per
    # attention fwd+bwd vs plain autodiff of the same bf16 math — worth
    # ~4% of the full b32 step (906.9 vs 943.3 ms at ni=3). A Pallas flash
    # fwd+bwd (stock kernels, padded 196->256 / 784->896 with segment ids)
    # measured 2.9x / 1.26x SLOWER than dense at these shapes and stays
    # out (same conclusion as the round-2 inference A/B; README
    # "Train-shape attention microbench").
    q, k, v, p = res
    dv = jnp.einsum("...hqk,...qhd->...khd", p, g)
    dp = jnp.einsum("...qhd,...khd->...hqk", g, v)
    s = jnp.einsum("...hqk,...hqk->...hq", p, dp,
                   preferred_element_type=jnp.float32)
    ds = (p.astype(jnp.float32) *
          (dp.astype(jnp.float32) - s[..., None])).astype(jnp.bfloat16)
    dq = jnp.einsum("...hqk,...khd->...qhd", ds, k) * jnp.bfloat16(scale)
    dk = jnp.einsum("...hqk,...qhd->...khd", ds, q) * jnp.bfloat16(scale)
    return dq, dk, dv


_sdpa_bf16.defvjp(_sdpa_bf16_fwd, _sdpa_bf16_bwd)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         scale: Optional[float] = None) -> jnp.ndarray:
    """Scaled dot-product attention over (..., N, H, Dh) -> (..., N, H, Dh).

    Softmax computed in f32 for stability regardless of input dtype.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    # Accumulate scores in f32 on the MXU, but MATERIALIZE them in the input
    # dtype: under bf16 compute this halves the score-matrix HBM traffic
    # (the dominant non-matmul cost at ViT-B@448 shapes — 0.5 ms/click
    # measured) and the rounding is below bf16 output noise. f32/f64 inputs
    # are unchanged (the cast is identity). Softmax math stays f32, but in
    # bf16 the saved residual and the VJP run in bf16 — with the backward
    # contractions hand-structured (_sdpa_bf16_bwd).
    if q.dtype == jnp.bfloat16:
        return _sdpa_bf16(q, k, v, float(scale))
    logits = (jnp.einsum("...qhd,...khd->...hqk", q, k,
                         preferred_element_type=jnp.float32)
              * scale).astype(q.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def dropout(key, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def cast_params(params: Params, dtype) -> Params:
    """Cast float parameter leaves to `dtype` once, up front.

    The apply functions cast weights to the activation dtype per call; with
    f32 masters and bf16 activations that re-converts every parameter every
    forward (~0.6 ms of pure HBM traffic per ViT-B click on v5e). Inference
    paths call this at predictor construction; training keeps f32 masters.
    """
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, params)
