"""Fused LN+MLP Pallas kernel vs the plain-ops oracle (interpret mode on
CPU; the same kernel runs compiled on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from pvpuformer_tpu import nn
from pvpuformer_tpu.ops.fused_mlp import fused_ln_mlp, fits_vmem


def _setup(d=256, hidden=1024, seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(2, 100, d)).astype(np.float32))
    ln = {"scale": jnp.asarray(r.normal(1, 0.1, d).astype(np.float32)),
          "bias": jnp.asarray(r.normal(0, 0.1, d).astype(np.float32))}
    mlp = {"fc1": {"w": jnp.asarray(r.normal(0, 0.05, (d, hidden)).astype(np.float32)),
                   "b": jnp.asarray(r.normal(0, 0.05, hidden).astype(np.float32))},
           "fc2": {"w": jnp.asarray(r.normal(0, 0.05, (hidden, d)).astype(np.float32)),
                   "b": jnp.asarray(r.normal(0, 0.05, d).astype(np.float32))}}
    return x, ln, mlp


def _oracle(x, ln, mlp):
    return x + nn.mlp(mlp, nn.layer_norm(ln, x, 1e-6))


def test_f32_path_exact():
    """f32 input takes the XLA reference path — must match the plain ops."""
    x, ln, mlp = _setup()
    np.testing.assert_allclose(np.asarray(fused_ln_mlp(x, ln, mlp)),
                               np.asarray(_oracle(x, ln, mlp)), atol=1e-6)


def test_bf16_kernel_matches_oracle():
    x, ln, mlp = _setup()
    xb = x.astype(jnp.bfloat16)
    mlpb = {k: jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
            for k, v in mlp.items()}
    out = fused_ln_mlp(xb, ln, mlpb)
    ref = _oracle(xb, ln, mlpb)
    assert out.dtype == jnp.bfloat16
    # kernel keeps gelu/bias math in f32 where the XLA path rounds between
    # steps -> agreement is at the bf16 rounding level
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.06, rtol=0.05)


def test_bf16_grad_matches_oracle():
    """The custom VJP recomputes through plain ops — grads must agree."""
    x, ln, mlp = _setup(d=128, hidden=256)
    xb = x.astype(jnp.bfloat16)
    mlpb = {k: jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
            for k, v in mlp.items()}
    g1 = jax.grad(lambda a: jnp.sum(
        fused_ln_mlp(a, ln, mlpb).astype(jnp.float32) ** 2))(xb)
    g2 = jax.grad(lambda a: jnp.sum(
        _oracle(a, ln, mlpb).astype(jnp.float32) ** 2))(xb)
    np.testing.assert_allclose(np.asarray(g1, np.float32),
                               np.asarray(g2, np.float32),
                               atol=0.5, rtol=0.05)


def test_vmem_gate():
    assert fits_vmem(768, 3072, jnp.bfloat16)       # ViT-B
    assert not fits_vmem(1280, 5120, jnp.bfloat16)  # ViT-H spills -> fallback


def test_vit_config_plumbs_mlp_impl():
    from pvpuformer_tpu.models.vit import ViTConfig, init_vit, vit_backbone_forward
    cfg = ViTConfig(img_size=(64, 64), patch_size=(16, 16), embed_dim=128,
                    depth=4, num_heads=4, mlp_impl="fused")
    params = init_vit(jax.random.key(0), cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    out = vit_backbone_forward(params, cfg, x)
    assert out.shape == (1, 16, 128) and bool(jnp.isfinite(
        out.astype(jnp.float32)).all())
