#!/usr/bin/env python3
"""Microbenchmark LayerNorm lowering variants at the ViT-B click shapes.

The click-program trace (scripts/profile_trace.py) attributes ~0.95 ms/click
to convert+reduce fusions — the f32 LayerNorm stat passes over the token
tensor. Each (8,196,768) LN reduce measures ~81 us, ~30x off the ~3 us
bandwidth bound, so this probes where the time actually goes and whether a
different lowering (one-pass E[x^2]-E[x]^2 stats, bf16 stats, or a Pallas
single-VMEM-pass kernel) buys anything *in context* (residual + LN + matmul,
the way blocks consume it).

    python scripts/profile_ln.py [--dim 768] [--ctx]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu import nn
    from pvpuformer_tpu.utils.profiling import device_time_per_call

    d = args.dim
    shapes = [(8, 196, d), (2, 784, d)]
    # Random (not ones/zeros) scale+bias so XLA can't algebraically fold the
    # affine away when it becomes a constant in any lowering.
    rng = np.random.default_rng(0)
    p = {"scale": jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)), jnp.float32),
         "bias": jnp.asarray(0.1 * rng.normal(size=(d,)), jnp.float32)}

    def ln_two_pass(c, x, w):                    # current nn.layer_norm
        return nn.layer_norm(w, x + c.astype(x.dtype), 1e-6, f32=True)

    def ln_one_pass(c, x, w):                    # var = E[x^2] - mean^2
        xf = (x + c.astype(x.dtype)).astype(jnp.float32)
        s1 = jnp.mean(xf, axis=-1, keepdims=True)
        s2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = (xf - s1) * jax.lax.rsqrt(s2 - jnp.square(s1) + 1e-6)
        return (y * w["scale"] + w["bias"]).astype(x.dtype)

    def ln_bf16(c, x, w):
        return nn.layer_norm(w, x + c.astype(x.dtype), 1e-6, f32=False)

    # in-context: residual-add + LN + a (d, 3d) matmul, the block prologue
    wq = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.02, jnp.bfloat16)

    def ctx(ln):
        def f(c, x, r, w, wq):
            h = ln(c, x + r, w)
            return h @ wq
        return f

    for shape in shapes:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        r = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        print(f"shape {shape}  ({np.prod(shape) * 2 / 1e6:.2f} MB bf16)")
        for name, fn in [("two_pass_f32", ln_two_pass),
                         ("one_pass_f32", ln_one_pass),
                         ("bf16", ln_bf16)]:
            # Pass p as an argument (not a closure): closed-over device
            # arrays become HLO constants, letting XLA fold the affine and
            # skew the alone-vs-ctx comparison (advisor finding, round 2).
            t_alone = device_time_per_call(
                lambda c, x, w: fn(c, x, w), (x, p))
            t_ctx = device_time_per_call(ctx(lambda c, xx, w: fn(c, xx, w)),
                                         (x, r, p, wq))
            print(f"  {name:14s} alone {t_alone * 1e3:7.1f} us   "
                  f"+res+qkv {t_ctx * 1e3:7.1f} us")
        # matmul-only floor for the ctx number
        t_mm = device_time_per_call(
            lambda c, x, wq: (x + c.astype(x.dtype)) @ wq, (x, wq))
        print(f"  {'qkv_mm_only':14s} alone {t_mm * 1e3:7.1f} us")


if __name__ == "__main__":
    main()
