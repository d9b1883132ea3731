#!/usr/bin/env python3
"""MXU ceiling probe: timed GEMM chains at the ViT-B@448 shapes.

Compares achieved TFLOP/s of bare bf16 GEMMs against the model's effective
rate, to tell "the forward is at hardware ceiling" apart from "the forward
leaves MXU idle". Shapes: the windowed blocks run (8x196, 768) tokens and
the global blocks (2x784, 768); the MLP GEMMs dominate.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from pvpuformer_tpu.utils.profiling import device_time_per_call


def gemm_rate(m: int, k: int, n: int, dtype=jnp.bfloat16) -> float:
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(m, k)), dtype)
    w = jnp.asarray(r.normal(size=(k, n)), dtype)

    def f(c, x, w):
        y = jnp.dot(x + c.astype(x.dtype), w,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        return y

    ms = device_time_per_call(f, (x, w))
    return 2 * m * k * n / (ms * 1e-3) / 1e12


def block_chain_rate() -> float:
    """One ViT-B block at windowed shape (8, 196, 768)."""
    from pvpuformer_tpu.models.vit import ViTConfig, init_block, block_forward
    cfg = ViTConfig()
    p = init_block(jax.random.key(0), 768, 12, 4.0, True)
    p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(8, 196, 768)), jnp.bfloat16)

    def f(c, p, x):
        return block_forward(p, x + c.astype(x.dtype), 12, 1e-6)

    ms = device_time_per_call(f, (p, x))
    ntok = 8 * 196
    flops = ntok * 768 * (3 * 768 + 768 + 2 * 3072) * 2 \
        + 2 * 8 * 12 * 196 * 196 * 64 * 2 * 2
    print(f"  one windowed block: {ms:.3f} ms")
    return flops / (ms * 1e-3) / 1e12


def main() -> None:
    print("bf16 GEMM ceiling probes:")
    for (m, k, n) in [(1568, 768, 3072), (1568, 3072, 768),
                      (1568, 768, 2304), (4096, 4096, 4096)]:
        print(f"  ({m:5d},{k:5d},{n:5d}): {gemm_rate(m, k, n):6.1f} TF/s")
    print(f"vit block effective:  {block_chain_rate():6.1f} TF/s")


if __name__ == "__main__":
    main()
