"""Single-block fused attention kernels for the ViT train/inference shapes.

The reference computes attention as materialized (B, H, N, N) score tensors
(`isegm/model/modeling/models_vit.py:257-287`); our dense `nn.sdpa` keeps
that structure (with a hand-tuned bf16 VJP) and the b32 train trace pins it
at ~10-15% MXU: the (N, N) scores are written to HBM, re-read by the PV
matmul, saved as the VJP residual, and re-read twice more by the backward.

At the VPU shapes (N in {196, 784}, head_dim 64) one head's whole score
matrix fits in VMEM many times over, so unlike flash attention there is
nothing to stream and no online softmax is needed: each grid cell DMAs G
whole (N, D) q/k/v slices, computes scores -> softmax -> PV entirely in
VMEM, and writes only the (N, D) output — the O(N^2) tensors never touch
HBM. The backward RECOMPUTES scores from q/k (one extra QK^T, 1/6 of the
backward's matmul FLOPs) instead of saving them, trading a cheap MXU pass
for the dense path's dominant cost (N^2 residual HBM traffic). This is
"flash attention with a single KV block", which degenerates into something
much simpler than the streaming kernels in ops/attention.py — and unlike
those (measured 2.9x/1.26x SLOWER than dense at these shapes, README
"Train-shape attention microbench") it has no online-softmax rescaling,
no padding-segment bookkeeping, and a grid coarse enough to keep the MXU
busy.

Numerics: scores/softmax accumulate in f32 (slightly better than the dense
bf16 path, which rounds logits to bf16 before the softmax); the backward
uses the same bf16-residual structure as nn._sdpa_bf16_bwd. Parity vs
nn.sdpa is bounded in tests/test_attention.py (bf16 noise).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Measured crossover vs the dense path (fwd, v5e, 2026-08-21, README
# "Train-shape attention microbench"): dense wins at b*H*N^2 = 2.95e7
# (4 imgs x 784 tokens) and below; fused wins from 5.9e7 up on both the
# window and global geometries. Callers that add an outer vmap batch
# (inference/batched.py) must fold it into b before comparing.
MIN_SCORE_WORK = 45_000_000


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vmem_estimate(g: int, n: int, d: int, itemsize: int, n_in: int,
                   n_out: int) -> int:
    """Rough VMEM footprint: double-buffered IO blocks + per-instance
    score-sized temporaries (f32 scores + bf16 probs for fwd; twice that
    for bwd, folded into callers passing n_in/n_out)."""
    dl = _round_up(d, 128)
    nl = _round_up(n, 128)
    io = 2 * (n_in + n_out) * g * n * dl * itemsize
    tmp = (n * nl * 4 + n * nl * itemsize) * (2 if n_in >= 4 else 1)
    return int((io + tmp) * 1.2)


def _pick_g(bh: int, n: int, d: int, itemsize: int, n_in: int,
            n_out: int, budget: int = 9 * 1024 * 1024) -> int:
    """Largest per-cell group that fits the VMEM budget.

    Swept on v5e at the ViT-B train shapes (2026-08-21): forcing larger
    groups than this picks moves timings by at most ~2.5% (window g=16:
    2554 vs 2620 us f+b) — inside tunnel run-to-run noise — and the next
    doubling fails Mosaic VMEM allocation (window g=32 / global g=8
    backward). The estimate's 1.2 slack over-counts somewhat (window fwd
    g=16 compiles at an estimated 16.1 MB), but the conservative choice
    costs nothing measurable, so it stays."""
    for g in (16, 8, 4, 2, 1):
        if bh % g == 0 and _vmem_estimate(g, n, d, itemsize, n_in,
                                          n_out) <= budget:
            return g
    return 1


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, g: int):
    for i in range(g):
        q = q_ref[i]                                   # (N, D)
        s = jax.lax.dot_general(q, k_ref[i], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(q.dtype), v_ref[i],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[i] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, g: int):
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        do = g_ref[i]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p32 = e / jnp.sum(e, axis=1, keepdims=True)
        p = p32.astype(q.dtype)
        # dv = p^T @ dO  (contract the query rows)
        dv_ref[i] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # dp = dO @ v^T, f32; softmax VJP with f32 row reduction
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        srow = jnp.sum(p32 * dp, axis=1, keepdims=True)
        ds = (p32 * (dp - srow)).astype(q.dtype)
        dq_ref[i] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        dk_ref[i] = (jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _fwd_call(qf, kf, vf, scale: float, interpret: bool) -> jnp.ndarray:
    bh, n, d = qf.shape
    g = _pick_g(bh, n, d, qf.dtype.itemsize, n_in=3, n_out=1)
    spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, g=g),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), qf.dtype),
        grid=(bh // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * d,
            bytes_accessed=4 * bh * n * d * qf.dtype.itemsize,
            transcendentals=bh * n * n),
        interpret=interpret,
    )(qf, kf, vf)


def _bwd_call(qf, kf, vf, gf, scale: float,
              interpret: bool) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    bh, n, d = qf.shape
    g = _pick_g(bh, n, d, qf.dtype.itemsize, n_in=4, n_out=3)
    spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, n, d), qf.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, g=g),
        out_shape=(shape, shape, shape),
        grid=(bh // g,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=12 * bh * n * n * d,
            bytes_accessed=7 * bh * n * d * qf.dtype.itemsize,
            transcendentals=bh * n * n),
        interpret=interpret,
    )(qf, kf, vf, gf)


def _to_bhnd(x: jnp.ndarray) -> jnp.ndarray:
    """(..., N, H, D) -> (BH, N, D)."""
    *lead, n, h, d = x.shape
    b = math.prod(lead) if lead else 1
    x = x.reshape(b, n, h, d)
    return jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)


def _from_bhnd(x: jnp.ndarray, lead: Tuple[int, ...], h: int) -> jnp.ndarray:
    bh, n, d = x.shape
    x = x.reshape(bh // h, h, n, d)
    return jnp.swapaxes(x, 1, 2).reshape(*lead, n, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """Drop-in for nn.sdpa over (..., N, H, Dh): single-block fused kernel.

    On non-TPU backends the kernels run in Pallas interpret mode (slow but
    exact — exercised by the CPU unit tests).
    """
    *lead, n, h, d = q.shape
    s = 1.0 / math.sqrt(d) if scale is None else float(scale)
    interpret = jax.default_backend() != "tpu"
    o = _fwd_call(_to_bhnd(q), _to_bhnd(k), _to_bhnd(v), s, interpret)
    return _from_bhnd(o, tuple(lead), h)


def _vjp_fwd(q, k, v, scale):
    return fused_attention(q, k, v, scale), (q, k, v)


def _vjp_bwd(scale, res, g):
    q, k, v = res
    *lead, n, h, d = q.shape
    s = 1.0 / math.sqrt(d) if scale is None else float(scale)
    interpret = jax.default_backend() != "tpu"
    dq, dk, dv = _bwd_call(_to_bhnd(q), _to_bhnd(k), _to_bhnd(v),
                           _to_bhnd(g), s, interpret)
    lead = tuple(lead)
    return (_from_bhnd(dq, lead, h), _from_bhnd(dk, lead, h),
            _from_bhnd(dv, lead, h))


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)
