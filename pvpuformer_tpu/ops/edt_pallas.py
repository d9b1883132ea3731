"""Pallas kernel for the EDT min-plus pass.

The exact-EDT's second pass computes, per row,
    D[r, c] = min_{c'} dcol2[r, c'] + (c - c')^2
— an O(W^2) min-plus product per row (ops/edt.py pass 2). XLA's fused
reduction handles it, but inside the full click-step program its VMEM
footprint degrades scheduling (measured: 0.46 ms standalone vs ~1.0 ms
in-context per fn/fp pair at 448^2). This kernel tiles rows explicitly and
streams input-column chunks with a running minimum, keeping the working set
at (rows_tile, chunk, W) f32 in VMEM regardless of the surrounding program.

Numerics identical to the XLA path (exact integer-valued f32 distances);
oracle-tested against it and cv2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_TILE = 8
COL_CHUNK = 128


def _minplus_kernel(f_ref, o_ref, *, w: int, chunk: int):
    """f_ref: (ROWS_TILE, Wpad) squared col-distances of one row tile;
    o_ref: (ROWS_TILE, Wpad) output squared distances."""
    wpad = f_ref.shape[1]
    n_chunks = wpad // chunk

    # TPU iota must be integer-typed; cast after
    c_out = jax.lax.broadcasted_iota(jnp.int32, (ROWS_TILE, wpad),
                                     1).astype(jnp.float32)

    def body(k, acc):
        f = f_ref[:, pl.ds(k * chunk, chunk)]              # (T, chunk)
        c_in = (k * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                ).astype(jnp.float32)                      # (1, chunk)
        # mask padded input columns out of the minimum
        valid = c_in < w
        fv = jnp.where(valid, f, jnp.float32(3.4e38))
        # (T, Wout, chunk): candidate = f[c'] + (c - c')^2
        diff = c_out[:, :, None] - c_in[None, :, :]        # (T, Wout, chunk)
        cand = fv[:, None, :] + diff * diff
        return jnp.minimum(acc, jnp.min(cand, axis=-1))

    init = jnp.full((ROWS_TILE, wpad), 3.4e38, jnp.float32)
    o_ref[:, :] = jax.lax.fori_loop(0, n_chunks, body, init)


@functools.partial(jax.jit, static_argnames=("interpret",))
def minplus_rows(dcol2: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(..., H, W) f32 -> per-row min-plus with the squared-offset kernel.

    Leading axes fold into the grid. W pads to a lane multiple internally.
    """
    orig_shape = dcol2.shape
    h, w = orig_shape[-2], orig_shape[-1]
    b = 1
    for s in orig_shape[:-2]:
        b *= s
    x = dcol2.reshape(b * h, w).astype(jnp.float32)

    rows_pad = (-x.shape[0]) % ROWS_TILE
    wpad = ((w + COL_CHUNK - 1) // COL_CHUNK) * COL_CHUNK
    x = jnp.pad(x, ((0, rows_pad), (0, wpad - w)),
                constant_values=3.4e38)
    n_tiles = x.shape[0] // ROWS_TILE

    out = pl.pallas_call(
        functools.partial(_minplus_kernel, w=w, chunk=COL_CHUNK),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((ROWS_TILE, wpad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS_TILE, wpad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=3 * x.shape[0] * wpad * wpad,
            bytes_accessed=2 * x.size * 4, transcendentals=0),
        interpret=interpret,
    )(x)

    out = out[:b * h, :w].reshape(orig_shape)
    return out
