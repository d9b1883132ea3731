"""Fused LayerNorm + MLP + residual Pallas kernel (TPU).

One transformer-block MLP half, `out = x + fc2(gelu(fc1(LN(x))))`, as a
single VMEM-resident pass: each row tile is read once and written once,
with both weight matrices resident in VMEM across the whole grid.

Measured on v5e at ViT-B@448 inference shapes (b2, 784 tokens): 2.53 ms
backbone vs 2.45 ms for the XLA lowering — XLA's own fusion already keeps
this chain off HBM well enough, so the kernel stays OPT-IN
(`ViTConfig.mlp_impl="fused"`), same status as the flash-attention kernel
(ops/attention.py) and the Pallas EDT (ops/edt_pallas.py). It may win at
other shapes (longer sequences, larger batch); re-measure before enabling.

Semantics match nn.layer_norm(f32=True) + nn.mlp with nn.gelu's dtype
dispatch (erf in f32, tanh under bf16). The op carries a custom VJP whose
backward recomputes through the plain XLA ops, so it is safe under
jax.grad (training keeps XLA's fused backward).

Sized for ViT-B (both 768x3072 weight matrices fit VMEM in bf16); the
wrapper falls back to the XLA path when the weights don't fit.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
# both weight matrices + tiles must fit in ~16 MB VMEM
_VMEM_BUDGET = 13 * 1024 * 1024


def _kernel(x_ref, gamma_ref, beta_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, eps: float, approx_gelu: bool):
    x = x_ref[:].astype(jnp.float32)                       # (TM, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    y = y.astype(x_ref.dtype)

    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=approx_gelu).astype(x_ref.dtype)

    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32) + x
    out_ref[:] = o.astype(x_ref.dtype)


def _xla_ref(x2d, gamma, beta, w1, b1, w2, b2, eps, approx_gelu):
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x2d.dtype)
    h = jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=approx_gelu).astype(x2d.dtype)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    return (o + xf).astype(x2d.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused(x2d, gamma, beta, w1, b1, w2, b2, eps, approx_gelu):
    m, d = x2d.shape
    hdim = w1.shape[1]
    mp = pl.cdiv(m, TILE_M) * TILE_M
    xp = jnp.pad(x2d, ((0, mp - m), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, approx_gelu=approx_gelu),
        grid=(mp // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, d), x2d.dtype),
        interpret=interpret,
    )(xp, gamma[None], beta[None], w1, b1[None], w2, b2[None])
    return out[:m]


def _fused_fwd(x2d, gamma, beta, w1, b1, w2, b2, eps, approx_gelu):
    return (_fused(x2d, gamma, beta, w1, b1, w2, b2, eps, approx_gelu),
            (x2d, gamma, beta, w1, b1, w2, b2))


def _fused_bwd(eps, approx_gelu, res, g):
    x2d, gamma, beta, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_ref(*a, eps=eps, approx_gelu=approx_gelu),
        x2d, gamma, beta, w1, b1, w2, b2)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fits_vmem(d: int, hidden: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    weights = 2 * d * hidden * itemsize
    tiles = TILE_M * (2 * d * itemsize + hidden * 4 + d * 4)
    return weights + tiles <= _VMEM_BUDGET


def fused_ln_mlp(x: jnp.ndarray, ln: Dict[str, Any], mlp: Dict[str, Any],
                 eps: float = 1e-6) -> jnp.ndarray:
    """x: (..., D). Returns x + mlp(layer_norm(x)) — one fused kernel when
    the weights fit VMEM, otherwise the plain XLA ops."""
    w1, b1 = mlp["fc1"]["w"], mlp["fc1"]["b"]
    w2, b2 = mlp["fc2"]["w"], mlp["fc2"]["b"]
    d, hidden = w1.shape
    approx = x.dtype == jnp.bfloat16          # nn.gelu dtype dispatch
    lead = x.shape[:-1]
    x2d = x.reshape(-1, d)
    args = (x2d, ln["scale"], ln["bias"], w1.astype(x.dtype),
            b1, w2.astype(x.dtype), b2)
    # the kernel uses tanh-GELU (erf/erfc has no Pallas TPU lowering), so it
    # only serves the bf16 path — exactly where nn.gelu is tanh anyway; the
    # f32 --parity path always takes the XLA reference ops
    if x.dtype != jnp.bfloat16 or not fits_vmem(d, hidden, x.dtype):
        out = _xla_ref(*args, eps=eps, approx_gelu=approx)
    else:
        out = _fused(*args, eps, approx)
    return out.reshape(*lead, d)
