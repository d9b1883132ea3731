#!/usr/bin/env python3
"""On-TPU check: cc_labels_pallas vs the XLA cc_labels fixpoint + timing."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from pvpuformer_tpu.ops.cc_pallas import cc_labels_pallas
from pvpuformer_tpu.engine.prompt_sim import cc_labels
from pvpuformer_tpu.utils.profiling import device_time_per_call


def blobby(seed, h=448, w=448):
    rng = np.random.default_rng(seed)
    m = np.zeros((h, w), bool)
    for _ in range(6):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        ry, rx = rng.integers(5, h // 3), rng.integers(5, w // 3)
        yy, xx = np.ogrid[:h, :w]
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
    return m


if __name__ == "__main__":
    # correctness, unaligned shape
    for seed in range(3):
        m = blobby(seed, 57, 83)
        ref = np.asarray(jax.jit(cc_labels)(jnp.asarray(m)))
        got = np.asarray(cc_labels_pallas(jnp.asarray(m)[None]))[0]
        same = np.array_equal(ref, got)
        print(f"seed {seed} 57x83: {'MATCH' if same else 'MISMATCH'}"
              f" ({len(np.unique(ref)) - 1} comps)")
        if not same:
            sys.exit(1)
    # correctness + timing at training shape
    masks = np.stack([blobby(s) for s in range(8)])
    ref = np.asarray(jax.jit(jax.vmap(cc_labels))(jnp.asarray(masks)))
    got = np.asarray(cc_labels_pallas(jnp.asarray(masks)))
    print("b8 448^2:", "MATCH" if np.array_equal(ref, got) else "MISMATCH")

    dm = jnp.asarray(masks)

    def f_xla(c, m):
        return jnp.sum(jax.vmap(cc_labels)(
            (m.astype(jnp.float32) + c) > 0.5).astype(jnp.float32))

    def f_pal(c, m):
        return jnp.sum(cc_labels_pallas(
            (m.astype(jnp.float32) + c) > 0.5).astype(jnp.float32))

    for name, f in [("xla", f_xla), ("pallas", f_pal)]:
        t = device_time_per_call(f, (dm,))
        print(f"cc_labels b8 448^2 ({name}): {t * 1e3:8.2f} ms")
