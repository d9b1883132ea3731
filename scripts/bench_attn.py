#!/usr/bin/env python3
"""Microbench: attention fwd+bwd at the training shapes, dense vs flash.

The b32 ni=3 train-step trace (2026-08-21) attributes ~113 ms/step to
score-matrix matmuls (window (128,12,196,196) + global (32,12,784,784))
running at ~10% MXU because the scores are materialized, saved as
residuals, and re-read by the backward. Flash-style tiling never
materializes them. This measures, per attention instance:

  * dense: nn.sdpa (the shipped path) fwd + bwd
  * flash: jax.experimental.pallas.ops.tpu.flash_attention (stock Pallas
    kernels incl. the dq/dkv backward kernels) fwd + bwd. The stock
    kernels require 128-multiple sequence lengths, so the ViT's 49-multiple
    lengths are padded up (196->256, 784->896) with segment ids; pad
    queries attend pad keys (NOT nothing — a fully-masked row would NaN
    and the NaN would ride P^T dO into the valid keys' gradients).

    python scripts/bench_attn.py [--which window global]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", nargs="+", default=["window", "global"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu import nn as N
    from pvpuformer_tpu.utils.profiling import device_time_per_call

    shapes = {
        # (batch, heads, seq, head_dim) — training shapes at b32, ViT-B@448
        "window": (128, 12, 196, 64),   # 32 images x 4 windows (2x2 of 28^2)
        "global": (32, 12, 784, 64),
    }

    for name in args.which:
        b, h, n, d = shapes[name]
        key = jax.random.key(0)
        kq, kk, kv = jax.random.split(key, 3)
        # nn.sdpa takes (..., N, H, D)
        q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)

        def dense_fwd_bwd(c, q, k, v):
            def loss(q, k, v):
                o = N.sdpa(q + c.astype(q.dtype), k, v)
                return jnp.sum(o.astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return l + sum(jnp.sum(g).astype(jnp.float32) for g in grads)

        ms = device_time_per_call(dense_fwd_bwd, (q, k, v))
        print(f"{name} dense sdpa fwd+bwd:      {ms:8.3f} ms", flush=True)

        # the PRE-custom-VJP baseline: same forward math, plain autodiff
        # backward (XLA transposes the fwd einsums; jax.nn.softmax saves its
        # f32 output as the residual) — what nn.sdpa compiled to before
        # _sdpa_bf16's hand-structured VJP landed (r4)
        def autodiff_sdpa(q, k, v):
            scale = 1.0 / float(np.sqrt(q.shape[-1]))
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.bfloat16(scale)
            p = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v)

        def autodiff_fwd_bwd(c, q, k, v):
            def loss(q, k, v):
                o = autodiff_sdpa(q + c.astype(q.dtype), k, v)
                return jnp.sum(o.astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return l + sum(jnp.sum(g).astype(jnp.float32) for g in grads)

        ms = device_time_per_call(autodiff_fwd_bwd, (q, k, v))
        print(f"{name} autodiff (pre-r4) f+b:   {ms:8.3f} ms", flush=True)

        def dense_fwd(c, q, k, v):
            return jnp.sum(
                N.sdpa(q + c.astype(q.dtype), k, v).astype(jnp.float32))

        ms = device_time_per_call(dense_fwd, (q, k, v))
        print(f"{name} dense sdpa fwd only:     {ms:8.3f} ms", flush=True)

        # hand-written VJP: same math, explicit einsum forms for the
        # backward so XLA doesn't have to transpose the fwd contractions
        import functools as ft

        @ft.partial(jax.custom_vjp, nondiff_argnums=())
        def sdpa_manual(q, k, v):
            return N.sdpa(q, k, v)

        def _mfwd(q, k, v):
            scale = 1.0 / float(np.sqrt(q.shape[-1]))
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * \
                jnp.bfloat16(scale)
            p = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1).astype(q.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
            return o, (q, k, v, p)

        def _mbwd(res, g):
            q, k, v, p = res
            scale = 1.0 / float(np.sqrt(q.shape[-1]))
            dv = jnp.einsum("bhqk,bqhd->bkhd", p, g)
            dp = jnp.einsum("bqhd,bkhd->bhqk", g, v)
            # softmax vjp with f32-accum inner sum
            s = jnp.einsum("bhqk,bhqk->bhq", p, dp,
                           preferred_element_type=jnp.float32)
            ds = (p.astype(jnp.float32) *
                  (dp.astype(jnp.float32) - s[..., None])).astype(q.dtype)
            dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k) * jnp.bfloat16(scale)
            dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q) * jnp.bfloat16(scale)
            return dq, dk, dv

        sdpa_manual.defvjp(_mfwd, _mbwd)

        def manual_fwd_bwd(c, q, k, v):
            def loss(q, k, v):
                o = sdpa_manual(q + c.astype(q.dtype), k, v)
                return jnp.sum(o.astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return l + sum(jnp.sum(g).astype(jnp.float32) for g in grads)

        ms = device_time_per_call(manual_fwd_bwd, (q, k, v))
        print(f"{name} manual-vjp fwd+bwd:      {ms:8.3f} ms", flush=True)

        # single-block fused kernel (ops/fused_attention.py): scores live
        # and die in VMEM; backward recomputes them from q/k
        from pvpuformer_tpu.ops.fused_attention import fused_attention

        def fused_fwd(c, q, k, v):
            return jnp.sum(
                fused_attention(q + c.astype(q.dtype), k, v)
                .astype(jnp.float32))

        ms = device_time_per_call(fused_fwd, (q, k, v))
        print(f"{name} fused-kernel fwd only:   {ms:8.3f} ms", flush=True)

        def fused_fwd_bwd(c, q, k, v):
            def loss(q, k, v):
                o = fused_attention(q + c.astype(q.dtype), k, v)
                return jnp.sum(o.astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return l + sum(jnp.sum(g).astype(jnp.float32) for g in grads)

        ms = device_time_per_call(fused_fwd_bwd, (q, k, v))
        print(f"{name} fused-kernel fwd+bwd:    {ms:8.3f} ms", flush=True)

        # numerics: fused vs dense, fwd + grads
        def loss_d(q, k, v):
            return jnp.sum(N.sdpa(q, k, v).astype(jnp.float32) ** 2)

        def loss_u(q, k, v):
            return jnp.sum(fused_attention(q, k, v).astype(jnp.float32) ** 2)

        ld, gd = jax.value_and_grad(loss_d, argnums=(0, 1, 2))(q, k, v)
        lu, gu = jax.value_and_grad(loss_u, argnums=(0, 1, 2))(q, k, v)
        gerr = max(float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b_.astype(jnp.float32))))
            for a, b_ in zip(gd, gu))
        gscale = max(float(jnp.max(jnp.abs(a))) for a in gd)
        print(f"{name} fused |dloss| {abs(float(ld - lu)):.4f} of "
              f"{float(ld):.1f}  max|dgrad| {gerr:.5f} "
              f"(grad scale {gscale:.2f})", flush=True)

        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)
        except Exception as e:
            print(f"  stock flash unavailable: {e}")
            continue

        npad = ((n + 127) // 128) * 128
        scale = 1.0 / float(np.sqrt(d))
        seg = jnp.asarray(
            np.concatenate([np.zeros(n, np.int32),
                            np.ones(npad - n, np.int32)]))
        seg_b = jnp.broadcast_to(seg, (b, npad))
        segment_ids = SegmentIds(q=seg_b, kv=seg_b)

        def pad_bhnd(x):
            # (B, N, H, D) -> (B, H, Npad, D)
            xh = jnp.transpose(x, (0, 2, 1, 3))
            return jnp.pad(xh, ((0, 0), (0, 0), (0, npad - n), (0, 0)))

        for bq, bkv in ((min(npad, 512), min(npad, 128)),
                        (min(npad, 256), min(npad, 256)),
                        (npad, npad)):
            if npad % bq or npad % bkv:
                continue
            try:
                bs = BlockSizes(block_q=bq, block_k_major=bkv, block_k=bkv,
                                block_b=1,
                                block_q_major_dkv=bq, block_k_major_dkv=bkv,
                                block_q_dkv=bq, block_k_dkv=bkv,
                                block_q_dq=bq, block_k_dq=bkv,
                                block_k_major_dq=bkv)

                def flash_fwd_bwd(c, q, k, v, bs=bs):
                    def loss(q, k, v):
                        o = flash_attention(
                            pad_bhnd(q + c.astype(q.dtype)), pad_bhnd(k),
                            pad_bhnd(v), segment_ids=segment_ids,
                            causal=False, sm_scale=scale, block_sizes=bs)
                        return jnp.sum(o[:, :, :n].astype(jnp.float32))
                    l, grads = jax.value_and_grad(
                        loss, argnums=(0, 1, 2))(q, k, v)
                    return l + sum(jnp.sum(g).astype(jnp.float32)
                                   for g in grads)

                ms = device_time_per_call(flash_fwd_bwd, (q, k, v))
                print(f"{name} flash npad={npad} bq={bq} bkv={bkv}: "
                      f"{ms:8.3f} ms", flush=True)
            except Exception as e:
                print(f"{name} flash bq={bq} bkv={bkv}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)

        # numerics: fwd and grads, dense vs padded flash
        try:
            def loss_d(q, k, v):
                return jnp.sum(N.sdpa(q, k, v).astype(jnp.float32) ** 2)

            def loss_f(q, k, v):
                o = flash_attention(pad_bhnd(q), pad_bhnd(k), pad_bhnd(v),
                                    segment_ids=segment_ids, causal=False,
                                    sm_scale=scale)
                o = jnp.transpose(o[:, :, :n], (0, 2, 1, 3))
                return jnp.sum(o.astype(jnp.float32) ** 2)

            ld, gd = jax.value_and_grad(loss_d, argnums=(0, 1, 2))(q, k, v)
            lf, gf = jax.value_and_grad(loss_f, argnums=(0, 1, 2))(q, k, v)
            gerr = max(float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b_.astype(jnp.float32))))
                for a, b_ in zip(gd, gf))
            gscale = max(float(jnp.max(jnp.abs(a))) for a in gd)
            print(f"{name} |dloss| {abs(float(ld - lf)):.4f} of {float(ld):.1f}"
                  f"  max|dgrad| {gerr:.5f} (grad scale {gscale:.2f})")
        except Exception as e:
            print(f"{name} numerics check failed: {str(e)[:140]}")


if __name__ == "__main__":
    main()
