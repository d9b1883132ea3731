"""Fused flash-attention Pallas kernel for the ViT blocks.

The reference computes attention as materialized (B, H, N, N) score tensors
(`isegm/model/modeling/models_vit.py` Attention); XLA's lowering of the dense
`nn.sdpa` path is correct but leaves MXU utilization on the table at the
ViT-B@448 shapes (N in {196, 784}, head_dim 64). This kernel tiles the
computation flash-attention style (online softmax, scores never materialized
beyond one (block_q, block_k) tile — see jax.experimental.pallas.ops.tpu
patterns) and pads the awkward 49-multiple ViT sequence lengths up to lane
multiples with length masking.

Numerics: softmax statistics and both matmuls accumulate in f32 regardless of
input dtype (bf16 in the inference config); equality with `nn.sdpa` is
checked to bf16 tolerance in tests.

Training support: `flash_attention` carries a custom VJP whose backward
recomputes the (tiny at these sizes) dense softmax in XLA — the forward stays
a fused kernel, the backward costs one extra dense attention.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, block_k: int, seq_len: int, scale: float):
    """Grid: (BH, n_q_blocks, n_k_blocks). Blocks:
    q (1, block_q, d), k/v (1, block_k, d), o (1, block_q, d)."""
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # (block_q, d)
    k = k_ref[0]                                   # (block_k, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    # mask padded KV columns (seq padded up to a lane multiple)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < seq_len, s, MASK_VALUE)

    m_prev = m_scr[:]                              # (block_q, 1)
    l_prev = l_scr[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_next
    l_scr[:] = l_next

    v = v_ref[0]
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(ki == n_k - 1)
    def _store():
        l = l_scr[:]
        inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:] * inv).astype(o_ref.dtype)


def _flash_fwd_padded(q, k, v, scale: float, seq_len: int,
                      block_q: int, block_k: int,
                      interpret: bool = False) -> jnp.ndarray:
    """q/k/v: (BH, Npad, D) with Npad % block == 0."""
    bh, npad, d = q.shape
    grid = (bh, npad // block_q, npad // block_k)
    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               seq_len=seq_len, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, npad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda b, qi, ki: (b, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * npad * npad * d,
            bytes_accessed=3 * bh * npad * d * q.dtype.itemsize,
            transcendentals=bh * npad * npad,
        ),
        interpret=interpret,
    )(q, k, v)


def _dense_sdpa(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None, block_q: int = 128,
                    block_k: int = 128) -> jnp.ndarray:
    """(B, N, H, Dh) attention == nn.sdpa, flash-tiled on TPU.

    N is padded to a block multiple internally; head_dim must be a multiple
    of 8 (ViT-B/L/H: 64/64/80). On non-TPU backends the same kernel runs in
    Pallas interpret mode (slow but exact — exercised by the CPU unit tests).
    """
    b, n, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    interpret = jax.default_backend() != "tpu"

    npad = _round_up(n, max(block_q, block_k))
    def prep(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    qf, kf, vf = prep(q), prep(k), prep(v)
    o = _flash_fwd_padded(qf, kf, vf, scale, n, block_q, block_k,
                          interpret=interpret)
    o = o[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(o, 1, 2)


def _fwd(q, k, v, scale, block_q, block_k):
    return flash_attention(q, k, v, scale, block_q, block_k), (q, k, v)


def _bwd(scale, block_q, block_k, res, g):
    """Dense recompute backward: at ViT sizes (N <= 784) the (N, N) probs
    tensor is small, so a rematerialized XLA backward is cheaper than a
    second Pallas kernel pair and bitwise-stable."""
    q, k, v = res
    d = q.shape[-1]
    s = 1.0 / math.sqrt(d) if scale is None else scale

    def f(q, k, v):
        return _dense_sdpa(q, k, v, s)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
