#!/usr/bin/env python3
"""Batched-eval throughput on the ambient device (TPU): clicks/s for
B sessions x 20 clicks per dispatch, at both min-plus EDT chunkings
(PredictorConfig.edt_chunk 32 vs None — the EDT runs vmapped across
sessions here, where the unchunked fused reduction wins standalone;
see ops/edt.squared_edt).

Usage: python scripts/profile_batched.py [--batch 16] [--clicks 20]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--clicks", type=int, default=20)
    p.add_argument("--hw", type=int, default=448)
    p.add_argument("--json", action="store_true",
                   help="emit one BENCH-style JSON line per variant "
                        "(BASELINE.md tracked batched-eval throughput, "
                        "fixed protocol b{batch} x {clicks} clicks)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.inference.batched import (batched_click_scan,
                                                  _stack_states)
    from pvpuformer_tpu.inference.datasets import SyntheticDataset
    from pvpuformer_tpu.inference.predictor import (PredictorConfig,
                                                    init_session)
    from pvpuformer_tpu.models.vpu import vpu_base_config, init_vpu
    from pvpuformer_tpu.nn import cast_params

    mcfg = vpu_base_config(dtype=jnp.bfloat16)
    params = cast_params(init_vpu(jax.random.key(0), mcfg), jnp.bfloat16)
    ds = SyntheticDataset(n_samples=args.batch, hw=(args.hw, args.hw))
    states = []
    for i in range(args.batch):
        s = ds.get_sample(i)
        states.append(init_session(s.image, s.gt_mask(0),
                                   mcfg.num_max_points,
                                   (args.hw, args.hw)))
    stacked = _stack_states(states)

    from pvpuformer_tpu.nn import quantize_params
    variants = [("chunk=32   rows=scan ", params, 32, "scan"),
                ("chunk=None rows=scan ", params, None, "scan"),
                ("chunk=None rows=dense", params, None, "dense"),
                ("int8 chunkNone dense ", quantize_params(params), None,
                 "dense")]
    from pvpuformer_tpu.inference.batched import resolve_batched_cfg
    import dataclasses
    base = PredictorConfig(model=mcfg, target_size=(args.hw, args.hw))
    for label, pp, chunk, rows in variants:
        # per-variant EDT A/B on top of the shipped batched resolution
        # (which also pins the fused attention kernel at these batches,
        # bf16 only — int8 measured slower with it)
        shipped = resolve_batched_cfg(base, args.batch,
                                      int8="int8" in label)
        cfg = dataclasses.replace(shipped, edt_chunk=chunk, edt_rows=rows)
        # compile
        _, ious = batched_click_scan(pp, cfg, stacked, args.clicks)
        np.asarray(ious)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            _, ious = batched_click_scan(pp, cfg, stacked, args.clicks)
            np.asarray(ious)          # force the readback through the tunnel
        dt = (time.time() - t0) / reps
        cps = args.batch * args.clicks / dt
        print(f"{label}: {dt * 1e3:8.1f} ms/dispatch "
              f"({cps:7.1f} clicks/s, b{args.batch} x {args.clicks})",
              flush=True)
        if args.json:
            import json
            # "bf16" = the shipped BatchedEvaluator configuration (tracked
            # metric); r5 moves that from chunkNone/scan to chunkNone/dense
            tag = "int8" if "int8" in label else \
                ("bf16" if chunk is None and rows == "dense" else
                 "bf16_scan" if chunk is None else "bf16_chunked")
            print(json.dumps({
                "metric": f"batched_eval_clicks_per_sec_vitb{args.hw}_{tag}",
                "value": round(cps, 1), "unit": "clicks/s",
                "protocol": f"b{args.batch}x{args.clicks}"}), flush=True)


if __name__ == "__main__":
    main()
