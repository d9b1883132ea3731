#!/usr/bin/env python3
"""A/B harness over the bench.py protocol: same 20-click sessions program,
with backbone/config variants selectable from the CLI. Used to decide the
shipped defaults (results recorded in README's perf section).

    python scripts/bench_ab.py --variants base,ln_bf16,mlp_fused,int8
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLICKS = 20
SESSIONS = 10
WARMUP = 2
MEASURE = 10


def measure(mcfg, int8: bool, pcfg_overrides=None) -> float:
    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.models.vpu import init_vpu
    from pvpuformer_tpu.inference.predictor import (PredictorConfig,
                                                    click_scan, init_session)
    from pvpuformer_tpu.nn import cast_params, quantize_params

    params = cast_params(init_vpu(jax.random.key(0), mcfg), jnp.bfloat16)
    if int8:
        params = quantize_params(params)
    pcfg = PredictorConfig(model=mcfg, target_size=(448, 448), with_flip=True,
                           **(pcfg_overrides or {}))

    rng = np.random.default_rng(0)
    image = (rng.uniform(size=(448, 448, 3)) * 255).astype(np.uint8)
    gt = np.zeros((448, 448), np.float32)
    gt[96:352, 128:320] = 1.0
    st0 = init_session(image, gt, mcfg.num_max_points, (448, 448))

    @jax.jit
    def sessions(params, st0):
        def one(_, __):
            _, ious = click_scan(params, pcfg, st0, CLICKS)
            return 0, ious
        _, curves = jax.lax.scan(one, 0, None, length=SESSIONS)
        return curves

    curves = np.asarray(sessions(params, st0))
    for _ in range(WARMUP - 1):
        curves = np.asarray(sessions(params, st0))
    assert np.isfinite(curves).all()

    ms = []
    for _ in range(MEASURE):
        t0 = time.perf_counter()
        np.asarray(sessions(params, st0))
        ms.append((time.perf_counter() - t0) * 1e3 / (CLICKS * SESSIONS))
    return float(np.percentile(ms, 50))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,ln_bf16,mlp_fused,int8")
    args = ap.parse_args()

    import jax.numpy as jnp
    from pvpuformer_tpu.models.vpu import (vpu_base_config, vpu_huge_config,
                                           vpu_large_config)

    base = vpu_base_config(dtype=jnp.bfloat16)
    out = {}
    for v in args.variants.split(","):
        v = v.strip()
        mcfg, int8, pov = base, False, None
        if v == "base":
            pass
        elif v in ("large", "large_int8", "huge", "huge_int8"):
            # BASELINE configs 4/5 serving rows (zoo constructors wired
            # through the same A/B protocol — VERDICT round-2 ask #7)
            mcfg = (vpu_large_config if v.startswith("large")
                    else vpu_huge_config)(dtype=jnp.bfloat16)
            int8 = v.endswith("_int8")
        elif v == "edt_none":
            pov = {"edt_chunk": None}
        elif v == "edt_pallas":
            pov = {"edt_impl": "pallas"}
        elif v == "int8_edt_none":
            int8, pov = True, {"edt_chunk": None}
        elif v == "ln_bf16":
            mcfg = dataclasses.replace(
                base, backbone=dataclasses.replace(base.backbone,
                                                   ln_f32=False))
        elif v == "mlp_fused":
            mcfg = dataclasses.replace(
                base, backbone=dataclasses.replace(base.backbone,
                                                   mlp_impl="fused"))
        elif v == "int8":
            int8 = True
        elif v == "int8_ln_bf16":
            mcfg = dataclasses.replace(
                base, backbone=dataclasses.replace(base.backbone,
                                                   ln_f32=False))
            int8 = True
        elif v == "flash":
            mcfg = dataclasses.replace(
                base, backbone=dataclasses.replace(base.backbone,
                                                   attn_impl="flash"))
        else:
            raise SystemExit(f"unknown variant {v}")
        p50 = measure(mcfg, int8, pov)
        out[v] = round(p50, 3)
        print(f"{v:<14} p50 {p50:.3f} ms/click", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
