#!/usr/bin/env python3
"""Protocol-level int8-vs-bf16 accuracy gate for the PTQ serving variant.

Runs the FUSED click loop (the exact program bench.py times) twice — bf16
and int8 (nn.quantize_params) — over >=20 synthetic samples at the
depth-4/768 protocol-certification scale (the per-click numerics of the
quantized 768-dim linears match ViT-B; tests/test_reference_direct.py uses
the same config for bit-parity vs the torch reference) and reports:

  * click-sequence divergence: fraction of sessions whose (sign, y, x)
    click sequences differ anywhere, and the first divergent click index;
  * per-click |IoU(bf16) - IoU(int8)| mean / p95 / max;
  * NoC@50/80 under both paths.

`--train-steps K` first fits the model on synthetic blobs for K steps
(Adam, the iterloss step) so the comparison also covers TRAINED decision
boundaries, not just random-weight ones. Results are recorded in
BASELINE.md ("int8 accuracy gate") and bounded by
tests/test_quant.py::test_int8_protocol_click_loop_bound.

Usage: python scripts/gate_int8.py [--samples 24] [--clicks 6]
           [--train-steps 0] [--platform cpu]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def protocol_cfg(nmp: int = 24, crop=(224, 224), dim: int = 768):
    """The depth-4 config of the protocol-parity certification
    (tests/test_reference_direct.py::_protocol_pair) at a chosen width.

    `dim` selects the quantization geometry of the shipped backbone sizes
    (reference models_vit.py:306-319): 768 = ViT-B (12 heads, p16),
    1024 = ViT-L (16 heads, p16), 1280 = ViT-H (16 heads, p14 — 16x16
    token grid at 224 like the others). Depth stays 4 so the gate measures
    per-click divergence of the QUANTIZED LINEAR GEOMETRY (per-channel
    weight scales + per-token activation scales at that fan-in/fan-out),
    not 24-32 blocks of compute; the full-width two-way neck and d_model
    head match vpu_{large,huge}_config (models/vpu.py:90-120)."""
    from pvpuformer_tpu.models.fpn import NeckConfig
    from pvpuformer_tpu.models.seg_head import HeadConfig
    from pvpuformer_tpu.models.two_way import TwoWayConfig
    from pvpuformer_tpu.models.vit import ViTConfig
    from pvpuformer_tpu.models.vpu import VPUConfig

    heads = {768: 12, 1024: 16, 1280: 16}[dim]
    patch = 14 if dim == 1280 else 16
    return VPUConfig(
        backbone=ViTConfig(img_size=crop, patch_size=(patch, patch),
                           embed_dim=dim, depth=4, num_heads=heads),
        neck=NeckConfig(in_dim=dim, out_dims=(128, 256, 512, 1024),
                        img_size=crop,
                        two_way=TwoWayConfig(embedding_dim=dim)),
        head=HeadConfig(in_channels=(128, 256, 512, 1024), channels=256,
                        upsample="x1", d_model=dim),
        num_max_points=nmp)


def synth_sample(seed: int, h: int = 96, w: int = 128):
    """The protocol tests' synthetic ellipse generator (_synth_sample)."""
    r = np.random.default_rng(seed)
    image = (r.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    yy, xx = np.mgrid[:h, :w]
    cy, cx = r.integers(h // 4, 3 * h // 4), r.integers(w // 4, 3 * w // 4)
    ry, rx = r.integers(12, h // 3), r.integers(12, w // 3)
    gt = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0)
    return image, gt.astype(np.float32)


def train_synthetic(params, mcfg, steps: int, batch: int = 4):
    """Fit on synthetic blobs (the demo_train_eval_synthetic recipe shrunk
    to the gate's crop) so decision boundaries are meaningful."""
    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.engine.optimizer import make_optimizer
    from pvpuformer_tpu.engine.train_step import TrainConfig, train_step
    from pvpuformer_tpu.data.points_sampler import MultiPointSampler

    h, w = mcfg.backbone.img_size
    tcfg = TrainConfig(model=mcfg)
    tx = make_optimizer(params, "adam", lr=5e-5, milestones=(),
                        gamma=1.0, steps_per_epoch=steps)
    opt_state = tx.init(params)
    sampler = MultiPointSampler(mcfg.num_max_points, prob_gamma=0.8)
    thr = jnp.asarray([0.5])
    rng = np.random.default_rng(0)
    for step in range(steps):
        imgs, gts, pts = [], [], []
        for i in range(batch):
            img, gt = synth_sample(10_000 + step * batch + i, h, w)
            canvas_img = np.zeros((h, w, 3), np.float32)
            canvas_gt = np.zeros((h, w), np.float32)
            canvas_img[:img.shape[0], :img.shape[1]] = img / 255.0
            canvas_gt[:gt.shape[0], :gt.shape[1]] = gt
            imgs.append(canvas_img)
            gts.append(canvas_gt)
            pts.append(sampler.sample(rng, [canvas_gt > 0.5])[0])
        b = {"image": jnp.asarray(np.stack(imgs)),
             "instances": jnp.asarray(np.stack(gts))[..., None],
             "points": jnp.asarray(np.stack(pts).astype(np.float32)),
             "scribbles": jnp.zeros((batch, 1000, 2), jnp.float32),
             "scribble_rects": jnp.zeros((batch, 4), jnp.float32)}
        params, opt_state, logs, _, _ = train_step(
            params, opt_state, b, jax.random.key(step), thr,
            cfg=tcfg, tx=tx, num_iters=1 + step % 3)
        if step % 25 == 0:
            print(f"  train step {step}: loss {float(logs['loss']):.4f}",
                  flush=True)
    return params


def run_sessions(params, mcfg, n_samples: int, clicks: int, int8: bool):
    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig

    pcfg = PredictorConfig(model=mcfg, target_size=mcfg.backbone.img_size,
                           with_flip=True, skip_clicks=-1, min_crop_size=200)
    pred = Predictor(params, pcfg, int8=int8)
    curves, seqs = [], []
    for s in range(n_samples):
        image, gt = synth_sample(s)
        pred.set_input(image, gt)
        curves.append(pred.run_clicks(clicks))
        pts = pred.clicks
        n = pts.shape[0] // 2
        seqs.append([(bool(i < n), int(pts[i, 0]), int(pts[i, 1]))
                     for i in np.argsort(pts[:, 2]) if pts[i, 2] >= 0])
    return np.stack(curves), seqs


def noc(curves: np.ndarray, thr: float, max_clicks: int) -> float:
    reached = curves >= thr
    first = np.where(reached.any(axis=1), reached.argmax(axis=1) + 1,
                     max_clicks)
    return float(first.mean())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=24)
    ap.add_argument("--clicks", type=int, default=6)
    ap.add_argument("--train-steps", type=int, default=0)
    ap.add_argument("--dim", type=int, default=768,
                    choices=[768, 1024, 1280],
                    help="quantization geometry: ViT-B/L/H widths")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    mcfg = protocol_cfg(dim=args.dim)
    from pvpuformer_tpu.models.vpu import init_vpu
    params = init_vpu(jax.random.key(0), mcfg)
    if args.train_steps:
        print(f"# training {args.train_steps} steps on synthetic blobs")
        params = train_synthetic(params, mcfg, args.train_steps)

    print(f"# gate: depth-4/{args.dim}@224, {args.samples} samples x "
          f"{args.clicks} clicks, weights="
          f"{'trained' if args.train_steps else 'random-init'}")
    bf, seq_bf = run_sessions(params, mcfg, args.samples, args.clicks, False)
    q, seq_q = run_sessions(params, mcfg, args.samples, args.clicks, True)

    diverged = [i for i in range(args.samples) if seq_bf[i] != seq_q[i]]
    first_div = []
    for i in diverged:
        k = next(j for j in range(min(len(seq_bf[i]), len(seq_q[i])) + 1)
                 if j >= len(seq_bf[i]) or j >= len(seq_q[i])
                 or seq_bf[i][j] != seq_q[i][j])
        first_div.append(k)
    delta = np.abs(bf - q)
    out = {
        "dim": args.dim,
        "samples": args.samples, "clicks": args.clicks,
        "train_steps": args.train_steps,
        "seq_divergence_rate": round(len(diverged) / args.samples, 4),
        "first_divergent_click": first_div,
        "iou_delta_mean": round(float(delta.mean()), 5),
        "iou_delta_p95": round(float(np.percentile(delta, 95)), 5),
        "iou_delta_max": round(float(delta.max()), 5),
        "noc50_bf16": round(noc(bf, 0.5, args.clicks), 3),
        "noc50_int8": round(noc(q, 0.5, args.clicks), 3),
        "noc80_bf16": round(noc(bf, 0.8, args.clicks), 3),
        "noc80_int8": round(noc(q, 0.8, args.clicks), 3),
        "final_miou_bf16": round(float(bf[:, -1].mean()), 4),
        "final_miou_int8": round(float(q[:, -1].mean()), 4),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
