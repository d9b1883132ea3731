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


# train-step attribution buckets keyed on the op's `source` metadata
# (file:line the op was traced from — the jax name-stack in tf_op is too
# shallow after XLA fusion, but source survives). First hit wins.
_TRAIN_SOURCE_BUCKETS = [
    ("optimizer (adam+lrd)", ("optax/", "engine/optimizer.py")),
    ("metric (iou@thr)", ("engine/metrics.py",)),
    ("EDT next-click", ("ops/edt.py", "ops/edt_pallas.py")),
    ("box synth (cc+bbox)", ("ops/cc_pallas.py",)),
    ("prompt sim (clicks/boxes/ed)", ("engine/prompt_sim.py",)),
    ("PPuE encode", ("ops/ppue.py",)),
    ("disk rasterize", ("ops/rasterize.py",)),
    ("loss assembly", ("engine/losses.py",)),
    ("model: vit", ("models/vit.py",)),
    ("model: neck (DMA)", ("models/fpn.py", "models/two_way.py",
                           "models/decoder.py")),
    ("model: head (+P2CL)", ("models/seg_head.py",)),
    ("model: nn prims", ("pvpuformer_tpu/nn.py",)),
    ("resize", ("ops/resize.py",)),
    ("step glue (concat/sigmoid)", ("engine/train_step.py",)),
    ("model: vpu io", ("models/vpu.py",)),
    # inference-side sources (the --batched view; never hit in --train)
    ("predictor glue (roi/clicks/iou)", ("inference/predictor.py",
                                         "inference/batched.py")),
    ("rng", ("jax/_src/random", "jax/_src/prng")),
]


def bucket_of(source: str, tf_op: str = "") -> str:
    for label, keys in _TRAIN_SOURCE_BUCKETS:
        if any(k in source for k in keys):
            return label
    return "(other)"


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
    ap.add_argument("--train", action="store_true",
                    help="trace ONE jitted train_step (ViT-B@448 b8 bf16, "
                         "--iters rounds) instead of the click program, and "
                         "bucket device time by the op_name path — the "
                         "'where do the 73 ms/step go' view")
    ap.add_argument("--batched", action="store_true",
                    help="trace ONE batched_click_scan (--batch sessions x "
                         "--clicks rounds, b16x448^2 bf16 by default — the "
                         "BASELINE tracked batched-eval program) and bucket "
                         "device time by source path, reported per round "
                         "and per click (VERDICT r4 #4 attribution)")
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4,
                    help="train steps inside the traced window")
    ap.add_argument("--parse-dir", default=None,
                    help="re-analyze a kept --train trace dir without "
                         "re-running on the TPU")
    ap.add_argument("--size", default="base",
                    choices=("base", "large", "huge"),
                    help="backbone size for the click program (BASELINE "
                         "configs 4/5 serving rows)")
    ap.add_argument("--int8", action="store_true",
                    help="PTQ the linears before tracing the click program")
    args = ap.parse_args()

    if args.parse_dir:
        return report_train_trace(args.parse_dir, args)
    if args.train:
        return trace_train(args)
    if args.batched:
        return trace_batched(args)

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.models.vpu import (vpu_base_config, vpu_huge_config,
                                           vpu_large_config, init_vpu)
    from pvpuformer_tpu.inference.predictor import (PredictorConfig,
                                                    click_scan, init_session)
    from pvpuformer_tpu.nn import cast_params

    make_cfg = {"base": vpu_base_config, "large": vpu_large_config,
                "huge": vpu_huge_config}[args.size]
    mcfg = make_cfg(dtype=jnp.bfloat16)
    params = cast_params(init_vpu(jax.random.key(0), mcfg), jnp.bfloat16)
    if args.int8:
        from pvpuformer_tpu.nn import quantize_params
        params = quantize_params(params)
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


def trace_train(args) -> None:
    """Trace `--steps` jitted train_steps and attribute device-lane op time
    to the _TRAIN_BUCKETS categories via the op_name metadata path. This is
    the round-3 'attribute the ~35 ms/round outside the model' tool
    (VERDICT weak #1): the table should sum to ~100% of the measured
    step time from scripts/profile_train.py."""
    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.engine.optimizer import make_optimizer
    from pvpuformer_tpu.engine.train_step import TrainConfig, train_step
    from pvpuformer_tpu.models.vpu import vpu_base_config, init_vpu

    b, hw = args.batch, 448
    mcfg = vpu_base_config(crop=(hw, hw), dtype=jnp.bfloat16)
    cfg = TrainConfig(model=mcfg, remat=False)
    params = init_vpu(jax.random.key(0), mcfg)
    tx = make_optimizer(params, "adam", lr=5e-5, milestones=(190, 210),
                        gamma=0.1, steps_per_epoch=100)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    gt = np.zeros((b, hw, hw, 1), np.float32)
    gt[:, hw // 4: hw // 2, hw // 4: hw // 2] = 1.0
    points = np.full((b, 48, 3), -1.0, np.float32)
    points[:, 0] = (hw // 3, hw // 3, 0)
    batch = {
        "image": jnp.asarray(rng.uniform(size=(b, hw, hw, 3)), jnp.float32),
        "instances": jnp.asarray(gt),
        "points": jnp.asarray(points),
        "scribbles": jnp.zeros((b, 1000, 2), jnp.float32),
        "scribble_rects": jnp.zeros((b, 4), jnp.float32),
    }
    thr = jnp.asarray([0.4, 0.375, 0.425])

    def run(params, opt_state, seed):
        params, opt_state, logs, _, _ = train_step(
            params, opt_state, batch, jax.random.key(seed), thr,
            cfg=cfg, tx=tx, num_iters=args.iters)
        return params, opt_state, logs

    params, opt_state, logs = run(params, opt_state, 1)   # compile + warm
    np.asarray(logs["loss"])

    log_dir = tempfile.mkdtemp(prefix="train_trace_")
    # silence the host/python tracers: with them on, the host lane floods
    # the Chrome trace past its 1M-event cap and the device-op events get
    # truncated away (observed: 6 device events survived out of 1e6).
    opts = None
    if hasattr(jax.profiler, "ProfileOptions"):
        opts = jax.profiler.ProfileOptions()
        opts.host_tracer_level = 1
        opts.python_tracer_level = 0
    jax.profiler.start_trace(log_dir, profiler_options=opts)
    for s in range(args.steps):
        params, opt_state, logs = run(params, opt_state, 2 + s)
    np.asarray(logs["loss"])
    jax.profiler.stop_trace()

    print(f"# train_step ViT-B@{hw} b{b} bf16 num_iters={args.iters}, "
          f"{args.steps} steps traced")
    report_train_trace(log_dir, args)
    if args.keep:
        print(f"\ntrace dir: {log_dir}")


def trace_batched(args) -> None:
    """Trace ONE warmed batched_click_scan dispatch and attribute device-lane
    op time by source path. This is the batched-eval analogue of --train:
    the BASELINE 'images/sec/chip (tracked)' metric's program, decomposed so
    the non-forward overhead per round (EDT, zoom-in resizes, paste/IoU glue)
    stops being a guess (VERDICT r4 weak #3)."""
    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.inference.batched import (batched_click_scan,
                                                  _stack_states)
    from pvpuformer_tpu.inference.datasets import SyntheticDataset
    from pvpuformer_tpu.inference.predictor import (PredictorConfig,
                                                    init_session)
    from pvpuformer_tpu.models.vpu import vpu_base_config, init_vpu
    from pvpuformer_tpu.nn import cast_params, quantize_params

    b, hw = args.batch, 448
    mcfg = vpu_base_config(dtype=jnp.bfloat16)
    params = cast_params(init_vpu(jax.random.key(0), mcfg), jnp.bfloat16)
    if args.int8:
        params = quantize_params(params)
    cfg = PredictorConfig(model=mcfg, target_size=(hw, hw), with_flip=True,
                          skip_clicks=-1, edt_chunk=None)

    ds = SyntheticDataset(n_samples=b, hw=(hw, hw))
    states = []
    for i in range(b):
        s = ds.get_sample(i)
        states.append(init_session(s.image, s.gt_mask(0),
                                   mcfg.num_max_points, (hw, hw)))
    stacked = _stack_states(states)

    def run():
        _, ious = batched_click_scan(params, cfg, stacked, args.clicks)
        return np.asarray(ious)

    run()                                            # compile + warm
    run()

    log_dir = tempfile.mkdtemp(prefix="batched_trace_")
    opts = None
    if hasattr(jax.profiler, "ProfileOptions"):
        opts = jax.profiler.ProfileOptions()
        opts.host_tracer_level = 1
        opts.python_tracer_level = 0
    jax.profiler.start_trace(log_dir, profiler_options=opts)
    run()
    jax.profiler.stop_trace()

    print(f"# batched_click_scan b{b}x{hw}^2 bf16"
          f"{' int8' if args.int8 else ''}, {args.clicks} click rounds "
          f"(1 dispatch traced; per round = all {b} sessions advance 1 "
          f"click, per click = /{b})")
    report_train_trace(log_dir, args, n=args.clicks, unit="round",
                       per_click=b)
    if args.keep:
        print(f"\ntrace dir: {log_dir}")


def report_train_trace(log_dir: str, args, n: int = None,
                       unit: str = "step", per_click: int = 0) -> None:
    """Bucket device-lane op time by the `source` metadata (file:line)."""
    events, pid_names, tid_names = load_trace_events(log_dir)
    buckets = collections.Counter()
    fwd_bwd = collections.Counter()
    raw = collections.Counter()
    raw_meta = {}
    for ev in events:
        lane = tid_names.get((ev.get("pid"), ev.get("tid")), "")
        if lane != "XLA Ops":
            continue
        name = ev.get("name", "")
        # control-flow wrappers re-count their executed branch's ops (the
        # children appear separately in the lane) — skip the containers
        if name.startswith(("while", "conditional", "call")):
            continue
        a = ev.get("args") or {}
        src = str(a.get("source") or "")
        tf_op = str(a.get("tf_op") or "")
        dur = ev.get("dur", 0) / 1e3
        bk = bucket_of(src, tf_op)
        buckets[bk] += dur
        fwd_bwd["backward" if "transpose(" in tf_op else "forward"] += dur
        raw[name] += dur
        raw_meta.setdefault(name, (src, tf_op, str(a.get("long_name"))[:100]))

    total = sum(buckets.values())
    if n is None:
        n = args.steps
    click_note = (f", {total / (n * per_click):.3f} ms/click"
                  if per_click else "")
    print(f"device op time: {total:.2f} ms total, "
          f"{total / n:.2f} ms/{unit}{click_note}\n")
    print(f"{'bucket':<30} {'ms/' + unit:>9} {'%':>6}")
    for name, ms in buckets.most_common():
        print(f"{name:<30} {ms / n:9.2f} {100 * ms / total:6.1f}")
    if not per_click:
        print(f"\nforward {fwd_bwd['forward'] / n:.2f} ms/{unit}, "
              f"backward(+transpose) {fwd_bwd['backward'] / n:.2f} ms/{unit}")
    print(f"\ntop {args.top} raw ops:")
    for name, ms in raw.most_common(args.top):
        src, tf_op, long = raw_meta[name]
        print(f"{ms / n:8.3f} ms/{unit}  [{bucket_of(src, tf_op):<22}] "
              f"{name}")
        print(f"           src={src}  op={tf_op[:80]}")
        print(f"           {long}")


if __name__ == "__main__":
    main()
