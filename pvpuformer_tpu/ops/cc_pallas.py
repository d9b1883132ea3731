"""Pallas kernel: 8-connected component labels, all rounds in VMEM.

Training-time box synthesis (`engine/prompt_sim.synth_boxes`, re-deriving
`isegm/engine/trainer.py:1061-1131` cal_box + max_connected_regions) needs
connected-component labels of the error mask every box round. The XLA
implementation (`prompt_sim.cc_labels`) iterates "3x3 max-pool + row/column
segmented max-scans"; each `associative_scan` is a log-depth chain of HLO
slices that round-trips HBM, so even with early-exit (while_loop on
convergence) it costs ~14 ms for a b8 448^2 batch on v5e — comparable to
the whole model fwd+bwd. This kernel runs the identical iteration with
every round resident in VMEM: shifts are register relayouts, the segmented
scans are unrolled log-step doubling, and HBM is touched once per mask
(read) + once (write) — measured 1.4 ms for the same batch, bit-identical
labels.

Label semantics match `prompt_sim.cc_labels` exactly: 0 = background, a
component's pixels all end at the max *unpadded* flat index + 1 among its
pixels (parity-tested against the XLA path and scipy.ndimage in
tests/test_engine.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x: jnp.ndarray, d: int, axis: int, fill) -> jnp.ndarray:
    """result[i] = x[i - d] along `axis` (d may be negative); `fill` pads."""
    n = x.shape[axis]
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(d)
    pad = jnp.full(pad_shape, fill, x.dtype)
    if d > 0:
        kept = jax.lax.slice_in_dim(x, 0, n - d, axis=axis)
        return jnp.concatenate([pad, kept], axis=axis)
    kept = jax.lax.slice_in_dim(x, -d, n, axis=axis)
    return jnp.concatenate([kept, pad], axis=axis)


def _segmented_run_max(lab: jnp.ndarray, reset: jnp.ndarray,
                       axis: int) -> jnp.ndarray:
    """Max label within each contiguous not-reset run along `axis`, via
    unrolled log-step segmented doubling (both directions).

    `reset` is int32 0/1, not bool: Mosaic's TPU lowering rejects
    `concatenate` on i1 vectors (HTTP-500 internal error through the axon
    remote-compile helper, bisected in scripts/check_cc_pallas.py), so the
    segment flags stay int32 end-to-end and combine with max()."""
    n = lab.shape[axis]
    outs = []
    for direction in (1, -1):
        v, r = lab, reset
        d = 1
        while d < n:
            v_s = _shift(v, direction * d, axis, jnp.int32(0))
            r_s = _shift(r, direction * d, axis, jnp.int32(1))
            v = jnp.where(r == 1, v, jnp.maximum(v, v_s))
            r = jnp.maximum(r, r_s)
            d *= 2
        outs.append(v)
    return jnp.maximum(outs[0], outs[1])


def _flood(lab: jnp.ndarray, mask: jnp.ndarray, reset: jnp.ndarray,
           iters: int) -> jnp.ndarray:
    """`iters` rounds of 8-connected max propagation of `lab` over `mask`."""

    def round_(_, lab):
        # separable 3x3 max-pool (8-connectivity hop across run boundaries)
        m1 = jnp.maximum(lab, jnp.maximum(_shift(lab, 1, 1, jnp.int32(0)),
                                          _shift(lab, -1, 1, jnp.int32(0))))
        m2 = jnp.maximum(m1, jnp.maximum(_shift(m1, 1, 0, jnp.int32(0)),
                                         _shift(m1, -1, 0, jnp.int32(0))))
        lab = jnp.where(mask, m2, 0)
        lab = _segmented_run_max(lab, reset, axis=1)
        lab = _segmented_run_max(lab, reset, axis=0)
        return jnp.where(mask, lab, 0)

    return jax.lax.fori_loop(0, iters, round_, lab)


def _cc_kernel(m_ref, o_ref, *, h: int, w: int, iters: int):
    mask = m_ref[0] != 0                                   # (Hp, Wp) bool
    hp, wp = mask.shape
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    # unpadded flat index + 1 (padded pixels carry mask=False, value unused)
    idx = r_iota * w + c_iota + 1
    lab = jnp.where(mask, idx, 0)
    reset = 1 - m_ref[0]                     # int32 0/1, see _segmented_run_max
    o_ref[0] = _flood(lab, mask, reset, iters)


def _prop_kernel(m_ref, v_ref, o_ref, *, iters: int):
    mask = m_ref[0] != 0
    reset = 1 - m_ref[0]
    lab = jnp.where(mask, v_ref[0], 0)
    o_ref[0] = _flood(lab, mask, reset, iters)


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def component_max_pallas(masks: jnp.ndarray, values: jnp.ndarray,
                         iters: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """Per-component max of `values` over each 8-connected component of
    `masks`, propagated in VMEM. masks: (B, H, W) bool; values: (B, H, W)
    int32 (non-negative; background reads 0). Used to broadcast a value
    planted at one pixel (e.g. a component representative) to the whole
    component without a per-pixel gather."""
    b, h, w = masks.shape
    hp = ((h + 7) // 8) * 8
    wp = ((w + 127) // 128) * 128
    m = jnp.pad(masks.astype(jnp.int32), ((0, 0), (0, hp - h), (0, wp - w)))
    v = jnp.pad(values.astype(jnp.int32), ((0, 0), (0, hp - h), (0, wp - w)))

    out = pl.pallas_call(
        functools.partial(_prop_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=iters * 60 * b * hp * wp,
            bytes_accessed=3 * b * hp * wp * 4, transcendentals=0),
        interpret=interpret,
    )(m, v)
    return out[:, :h, :w]


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def cc_labels_pallas(masks: jnp.ndarray, iters: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) bool -> (B, H, W) int32 component labels (0 = background)."""
    b, h, w = masks.shape
    hp = ((h + 7) // 8) * 8
    wp = ((w + 127) // 128) * 128
    x = jnp.pad(masks.astype(jnp.int32), ((0, 0), (0, hp - h), (0, wp - w)))

    out = pl.pallas_call(
        functools.partial(_cc_kernel, h=h, w=w, iters=iters),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=iters * 60 * b * hp * wp,
            bytes_accessed=2 * b * hp * wp * 4, transcendentals=0),
        interpret=interpret,
    )(x)
    return out[:, :h, :w]
