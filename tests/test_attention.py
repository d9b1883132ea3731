"""Flash-attention Pallas kernel vs the dense sdpa oracle (interpret mode on
CPU; the same kernel compiles on TPU — parity re-checked there by bench)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pvpuformer_tpu.ops.attention import flash_attention
from pvpuformer_tpu import nn


def rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(1, 196, 4, 64), (2, 128, 2, 32),
                                   (1, 200, 3, 64)])
def test_flash_matches_sdpa(shape):
    r = rng(1)
    b, n, h, d = shape
    q = jnp.asarray(r.normal(size=shape), jnp.float32)
    k = jnp.asarray(r.normal(size=shape), jnp.float32)
    v = jnp.asarray(r.normal(size=shape), jnp.float32)
    ours = np.asarray(flash_attention(q, k, v))
    ref = np.asarray(nn.sdpa(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_flash_grad_matches_sdpa():
    r = rng(2)
    shape = (1, 130, 2, 32)          # non-multiple-of-128 => padding path
    q = jnp.asarray(r.normal(size=shape), jnp.float32)
    k = jnp.asarray(r.normal(size=shape), jnp.float32)
    v = jnp.asarray(r.normal(size=shape), jnp.float32)

    def loss(f):
        def inner(q, k, v):
            return jnp.sum(f(q, k, v) ** 2)
        return inner

    g1 = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(nn.sdpa), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=1e-4)
