"""North-star benchmark: p50 per-click latency, ViT-B@448, single chip.

Protocol: interactive sessions of 20 oracle-driven clicks, each session ONE
XLA dispatch (inference/predictor.click_scan — EDT next-click, zoom-in,
flip-TTA ViT-B forward, paste-back and IoU all fused on device; the reference
pays >=4 host<->device transitions per click, SURVEY §3.2). Per-click latency
= session wall time / 20, including the per-session dispatch + IoU-curve
readback. The 5 ms p50 target on v5e is from BASELINE.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = target_ms / measured_ms (>1.0 beats the target).
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MS = 5.0
CLICKS_PER_SESSION = 20
WARMUP_SESSIONS = 2
MEASURE_SESSIONS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pvpuformer_tpu.models.vpu import vpu_base_config, init_vpu
    from pvpuformer_tpu.inference.predictor import (Predictor,
                                                    PredictorConfig)

    platform = jax.devices()[0].platform
    mcfg = vpu_base_config(dtype=jnp.bfloat16)
    params = init_vpu(jax.random.key(0), mcfg)
    pcfg = PredictorConfig(model=mcfg, target_size=(448, 448), with_flip=True)
    predictor = Predictor(params, pcfg)

    rng = np.random.default_rng(0)
    image = (rng.uniform(size=(448, 448, 3)) * 255).astype(np.uint8)
    gt = np.zeros((448, 448), np.float32)
    gt[96:352, 128:320] = 1.0

    predictor.set_input(image, gt)
    for _ in range(WARMUP_SESSIONS):            # compile + warm
        predictor.run_clicks(CLICKS_PER_SESSION)

    per_click_ms = []
    for _ in range(MEASURE_SESSIONS):
        predictor.set_input(image, gt)
        jax.block_until_ready(tuple(predictor.state))   # exclude H2D upload
        t0 = time.perf_counter()
        ious = predictor.run_clicks(CLICKS_PER_SESSION)
        dt = time.perf_counter() - t0           # curve readback blocks
        per_click_ms.append(dt * 1e3 / CLICKS_PER_SESSION)
    assert np.isfinite(ious).all()

    p50 = float(np.percentile(per_click_ms, 50))
    print(json.dumps({
        "metric": f"p50_per_click_latency_ms_vitb448_{platform}",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / p50, 3),
    }))


if __name__ == "__main__":
    main()
