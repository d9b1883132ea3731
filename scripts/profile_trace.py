#!/usr/bin/env python3
"""Per-op attribution of the click-program device time via jax.profiler.

Runs the bench.py program (20-click interactive sessions, ViT-B@448, bf16,
flip TTA) under a profiler trace, then parses the written Chrome-format
trace (`*.trace.json.gz`) and aggregates device-lane op durations by HLO
name, grouping fusions under their leading compute op. This is the tool for
"where do the 3.9 ms/click actually go" — finer than the component split in
scripts/profile_click.py (which times module boundaries, not XLA ops).

jax.profiler traces DO work through the axon TPU tunnel (the trace is taken
on the worker and shipped back); see .claude/skills/verify/SKILL.md.

    python scripts/profile_trace.py [--top 40] [--sessions 4]
"""
from __future__ import annotations

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_trace_events(log_dir: str):
    """All complete ('X') events from every trace.json.gz under log_dir."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    events, pid_names, tid_names = [], {}, {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            ph = ev.get("ph")
            if ph == "M" and ev.get("name") == "process_name":
                pid_names[ev.get("pid")] = ev["args"].get("name", "")
            elif ph == "M" and ev.get("name") == "thread_name":
                tid_names[(ev.get("pid"), ev.get("tid"))] = \
                    ev["args"].get("name", "")
            elif ph == "X":
                events.append(ev)
    return events, pid_names, tid_names


def lane_tables(events, pid_names, tid_names):
    """Per-(pid, tid) lane: (lane label, Counter(op family -> ms), total)."""
    lanes = collections.defaultdict(collections.Counter)
    for ev in events:
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3               # us -> ms
        if not name or dur <= 0:
            continue
        # strip uniquifying suffixes: fusion.123 -> fusion, dot.5 -> dot
        fam = name.split("(")[0]
        fam = "".join(c for c in fam if not c.isdigit()).rstrip("._-")
        lanes[(ev.get("pid"), ev.get("tid"))][fam] += dur
    out = []
    for (pid, tid), counter in lanes.items():
        label = (f"{pid_names.get(pid, pid)} / "
                 f"{tid_names.get((pid, tid), tid)}")
        out.append((label, counter, sum(counter.values())))
    out.sort(key=lambda r: -r[2])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--clicks", type=int, default=20)
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir (prints path)")
    ap.add_argument("--raw", action="store_true",
                    help="rank individual HLO ops (no family grouping) and "
                         "show their metadata args")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.models.vpu import vpu_base_config, init_vpu
    from pvpuformer_tpu.inference.predictor import (PredictorConfig,
                                                    click_scan, init_session)
    from pvpuformer_tpu.nn import cast_params

    mcfg = vpu_base_config(dtype=jnp.bfloat16)
    params = cast_params(init_vpu(jax.random.key(0), mcfg), jnp.bfloat16)
    pcfg = PredictorConfig(model=mcfg, target_size=(448, 448), with_flip=True)

    rng = np.random.default_rng(0)
    image = (rng.uniform(size=(448, 448, 3)) * 255).astype(np.uint8)
    gt = np.zeros((448, 448), np.float32)
    gt[96:352, 128:320] = 1.0
    st0 = init_session(image, gt, mcfg.num_max_points, (448, 448))

    @jax.jit
    def sessions(params, st0):
        def one(_, __):
            _, ious = click_scan(params, pcfg, st0, args.clicks)
            return 0, ious
        _, curves = jax.lax.scan(one, 0, None, length=args.sessions)
        return curves

    np.asarray(sessions(params, st0))               # compile + warm
    np.asarray(sessions(params, st0))

    log_dir = tempfile.mkdtemp(prefix="click_trace_")
    jax.profiler.start_trace(log_dir)
    np.asarray(sessions(params, st0))
    jax.profiler.stop_trace()

    events, pid_names, tid_names = load_trace_events(log_dir)
    n_clicks = args.sessions * args.clicks
    if args.raw:
        per_op = collections.Counter()
        meta = {}
        for ev in events:
            lane = tid_names.get((ev.get("pid"), ev.get("tid")), "")
            if lane != "XLA Ops":
                continue
            name = ev.get("name", "")
            if name.startswith("while"):
                continue                       # enclosing region event
            per_op[name] += ev.get("dur", 0) / 1e3
            if name not in meta and ev.get("args"):
                meta[name] = ev["args"]
        total = sum(per_op.values())
        print(f"total (op lane, region events excluded) {total:.2f} ms "
              f"({total / max(n_clicks, 1):.3f} ms/click)\n")
        for name, ms in per_op.most_common(args.top):
            a = meta.get(name, {})
            hint = a.get("long_name") or a.get("tf_op") or ""
            print(f"{ms:8.2f} ms  {ms / n_clicks:7.3f}/click  {name}")
            if hint:
                print(f"           {str(hint)[:110]}")
        return
    for label, counter, total in lane_tables(events, pid_names, tid_names):
        if "TPU" not in label and "device" not in label:
            continue                                # host lanes: skip
        print(f"\n=== lane: {label} — total {total:.2f} ms "
              f"({total / max(n_clicks, 1):.3f} ms/click) ===")
        print(f"{'op family':<58} {'ms':>9} {'ms/click':>9} {'%':>6}")
        for name, ms in counter.most_common(args.top):
            print(f"{name[:57]:<58} {ms:9.2f} {ms / n_clicks:9.3f} "
                  f"{100 * ms / max(total, 1e-9):6.1f}")
    if args.keep:
        print(f"\ntrace dir: {log_dir}")


if __name__ == "__main__":
    main()
