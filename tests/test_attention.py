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


# ------------------------------------------------------- bf16 custom VJPs

def test_ln_bf16_custom_vjp_matches_f64_autodiff():
    """layer_norm's bf16 path (_ln_bf16: bf16 residuals, analytic backward)
    must produce the same gradients as plain autodiff through the f64 LN on
    the identical (bf16-valued) inputs, to bf16 output precision.

    The f64 reference runs under jax.enable_x64(True) — without it the
    `.astype(float64)` casts silently truncate to f32 (r4 advisor)."""
    r = rng(7)
    d = 96
    x = jnp.asarray(r.standard_normal((4, 33, d)) * 2.0, jnp.bfloat16)
    p = {"scale": jnp.asarray(r.uniform(0.5, 1.5, d), jnp.float32),
         "bias": jnp.asarray(r.standard_normal(d) * 0.1, jnp.float32)}
    w = jnp.asarray(r.standard_normal((4, 33, d)), jnp.bfloat16)

    def loss_ours(x, p):
        return jnp.sum((nn.layer_norm(p, x) * w).astype(jnp.float32))

    def loss_ref(x64, p64):
        xf = x64
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        return jnp.sum((y * p64["scale"] + p64["bias"]) * w.astype(jnp.float64))

    gx, gp = jax.grad(loss_ours, argnums=(0, 1))(x, p)
    with jax.enable_x64(True):
        x64 = x.astype(jnp.float64)
        p64 = jax.tree.map(lambda a: a.astype(jnp.float64), p)
        rx, rp = jax.grad(loss_ref, argnums=(0, 1))(x64, p64)
        assert rx.dtype == jnp.float64
        rx, rp = np.asarray(rx), jax.tree.map(np.asarray, rp)

    np.testing.assert_allclose(np.asarray(gx, np.float64), rx,
                               atol=0.02, rtol=0.05)
    np.testing.assert_allclose(np.asarray(gp["scale"]), rp["scale"],
                               atol=0.15, rtol=0.02)
    np.testing.assert_allclose(np.asarray(gp["bias"]), rp["bias"],
                               atol=0.15, rtol=0.02)


def test_softmax_bf16_vjp_matches_f64_autodiff():
    """sdpa's bf16 softmax (_softmax_bf16 custom VJP, dot_general-reduced
    backward) vs autodiff through an f64 softmax on identical values."""
    r = rng(8)
    logits = jnp.asarray(r.standard_normal((2, 3, 40, 40)) * 3.0, jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((2, 3, 40, 40)), jnp.bfloat16)

    g = jax.grad(lambda l: jnp.sum(
        (nn._softmax_bf16(l) * w).astype(jnp.float32)))(logits)
    with jax.enable_x64(True):
        ref = jax.grad(lambda l: jnp.sum(
            jax.nn.softmax(l, -1) * w.astype(jnp.float64)))(
            logits.astype(jnp.float64))
        assert ref.dtype == jnp.float64
        ref = np.asarray(ref)
    np.testing.assert_allclose(np.asarray(g, np.float64), ref,
                               atol=0.005, rtol=0.05)


def test_sdpa_bf16_manual_vjp_matches_f64_autodiff():
    """The bf16 sdpa's hand-structured backward (nn._sdpa_bf16_bwd — natural
    einsum forms instead of XLA-transposed fwd ops, bf16 score residuals;
    -7% window / wash global per attention fwd+bwd at the b32 training
    shapes, scripts/bench_attn.py 2026-08-21) vs autodiff through an f64
    dense attention on identical values."""
    r = rng(11)
    b, n, h, d = 2, 52, 3, 16
    q = jnp.asarray(r.standard_normal((b, n, h, d)), jnp.bfloat16)
    k = jnp.asarray(r.standard_normal((b, n, h, d)), jnp.bfloat16)
    v = jnp.asarray(r.standard_normal((b, n, h, d)), jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((b, n, h, d)), jnp.bfloat16)

    def loss_bf16(q, k, v):
        return jnp.sum((nn.sdpa(q, k, v) * w).astype(jnp.float32))

    def loss_f64(q, k, v):
        return jnp.sum(nn.sdpa(q, k, v) * w.astype(jnp.float64))

    grads = jax.grad(loss_bf16, argnums=(0, 1, 2))(q, k, v)
    with jax.enable_x64(True):
        refs = jax.grad(loss_f64, argnums=(0, 1, 2))(
            q.astype(jnp.float64), k.astype(jnp.float64),
            v.astype(jnp.float64))
        assert all(ref.dtype == jnp.float64 for ref in refs)
        refs = [np.asarray(ref) for ref in refs]
    for g, ref, name in zip(grads, refs, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g, np.float64), ref,
            atol=0.05, rtol=0.05, err_msg=f"d{name}")


# ------------------------------------------- fused single-block kernel

from pvpuformer_tpu.ops.fused_attention import fused_attention  # noqa: E402


@pytest.mark.parametrize("shape", [(2, 52, 3, 16),        # odd sizes
                                   (1, 196, 4, 64),       # window geometry
                                   (2, 2, 49, 2, 8)])     # 5-D lead (B, W)
def test_fused_matches_sdpa(shape):
    """ops/fused_attention vs the dense oracle, interpret mode on CPU (the
    same kernels compile on TPU; parity re-checked there by bench_attn)."""
    r = rng(3)
    q = jnp.asarray(r.normal(size=shape), jnp.float32)
    k = jnp.asarray(r.normal(size=shape), jnp.float32)
    v = jnp.asarray(r.normal(size=shape), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(fused_attention(q, k, v))
        ref = np.asarray(nn.sdpa(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_fused_grad_matches_sdpa():
    """The recompute backward (_bwd_kernel): dq/dk/dv vs autodiff of the
    dense path on identical f32 values, highest matmul precision."""
    r = rng(4)
    shape = (2, 49, 2, 32)
    q = jnp.asarray(r.normal(size=shape), jnp.float32)
    k = jnp.asarray(r.normal(size=shape), jnp.float32)
    v = jnp.asarray(r.normal(size=shape), jnp.float32)

    def loss(f):
        def inner(q, k, v):
            return jnp.sum(f(q, k, v) ** 2)
        return inner

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss(fused_attention), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss(nn.sdpa), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=1e-4, err_msg=f"d{name}")


def test_fused_bf16_grad_matches_f64_autodiff():
    """bf16 fused kernel gradients vs an f64 dense-autodiff oracle — same
    envelope as the nn._sdpa_bf16_bwd test above (the fused backward uses
    the identical bf16-residual structure, recomputed in VMEM)."""
    r = rng(12)
    b, n, h, d = 2, 52, 3, 16
    q = jnp.asarray(r.standard_normal((b, n, h, d)), jnp.bfloat16)
    k = jnp.asarray(r.standard_normal((b, n, h, d)), jnp.bfloat16)
    v = jnp.asarray(r.standard_normal((b, n, h, d)), jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((b, n, h, d)), jnp.bfloat16)

    def loss_bf16(q, k, v):
        return jnp.sum((fused_attention(q, k, v) * w).astype(jnp.float32))

    def loss_f64(q, k, v):
        return jnp.sum(nn.sdpa(q, k, v) * w.astype(jnp.float64))

    grads = jax.grad(loss_bf16, argnums=(0, 1, 2))(q, k, v)
    with jax.enable_x64(True):
        refs = jax.grad(loss_f64, argnums=(0, 1, 2))(
            q.astype(jnp.float64), k.astype(jnp.float64),
            v.astype(jnp.float64))
        refs = [np.asarray(ref) for ref in refs]
    for g, ref, name in zip(grads, refs, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g, np.float64), ref,
            atol=0.05, rtol=0.05, err_msg=f"d{name}")


def test_fused_backbone_grads_match_xla():
    """Gradient parity THROUGH THE MODEL (VERDICT r4 #1's ask for wiring
    attention kernels into training): value_and_grad of a scalar loss over
    the full ViT backbone — window + global blocks — with attn_impl="fused"
    (interpret mode on CPU) vs the dense "xla" path, f32, highest matmul
    precision. Covers the custom-VJP wiring (residuals, window-batched
    leading dims) that the kernel-level tests above can't see."""
    import dataclasses
    from pvpuformer_tpu.models.vit import (ViTConfig, init_vit,
                                           vit_backbone_forward)

    cfg = ViTConfig(img_size=(64, 64), patch_size=(16, 16), embed_dim=64,
                    depth=4, num_heads=4, window_pixels=32)
    params = init_vit(jax.random.key(0), cfg)
    img = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))

    def loss(params, cfg):
        return jnp.sum(vit_backbone_forward(params, cfg, img) ** 2)

    with jax.default_matmul_precision("highest"):
        vx, gx = jax.value_and_grad(loss)(params, cfg)
        vf, gf = jax.value_and_grad(loss)(
            params, dataclasses.replace(cfg, attn_impl="fused"))
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5)
    from jax.flatten_util import ravel_pytree
    flat_x, _ = ravel_pytree(gx)
    flat_f, _ = ravel_pytree(gf)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_x),
                               atol=5e-4, rtol=1e-3)
