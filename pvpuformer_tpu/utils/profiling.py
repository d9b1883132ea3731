"""Profiling / latency instrumentation.

The reference's only timing is wall-clock SPC/SPI over the eval loop
(`isegm/inference/utils.py:11-18`) plus CUDA memory counters
(`evaluate_vpumodel.py:156-158`). The north-star metric here is p50 per-click
latency (BASELINE.json), so this module provides:

  * LatencyRecorder — percentile summary of per-click wall times;
  * device_time_per_call — tunnel-safe device timing: run K iterations of a
    fn inside one jit via lax.scan and difference two K values, canceling
    dispatch + RTT (the axon tunnel makes naive block_until_ready timing
    meaningless — see .claude/skills/verify/SKILL.md);
  * trace — jax.profiler wrapper for TensorBoard traces;
  * memory_stats — per-device HBM counters (the CUDA counter equivalent).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class LatencyRecorder:
    def __init__(self):
        self.samples_ms: List[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples_ms.append((time.perf_counter() - t0) * 1e3)

    def add(self, seconds: float) -> None:
        self.samples_ms.append(seconds * 1e3)

    def summary(self) -> Dict[str, float]:
        if not self.samples_ms:
            return {}
        a = np.asarray(self.samples_ms)
        return {"count": len(a), "p50_ms": float(np.percentile(a, 50)),
                "p90_ms": float(np.percentile(a, 90)),
                "p99_ms": float(np.percentile(a, 99)),
                "mean_ms": float(a.mean()), "max_ms": float(a.max())}

    def histogram(self, bins: int = 20):
        counts, edges = np.histogram(np.asarray(self.samples_ms), bins=bins)
        return counts, edges


def device_time_per_call(fn: Callable[..., jnp.ndarray], args: Sequence,
                         k_lo: int = 4, k_hi: int = 24,
                         reps: int = 3) -> float:
    """Milliseconds per fn(c, *args) call, measured on device.

    fn receives a f32 scalar carry `c` as its FIRST argument and MUST mix it
    into its computation (e.g. `x + c.astype(x.dtype)`), otherwise XLA hoists
    the loop-invariant body out of the timing scan and the measurement reads
    ~0. Inputs must be passed as arguments — closed-over device arrays become
    HLO constants and get constant-folded at compile time. Two chain lengths
    are differenced so dispatch/readback overhead cancels.
    """
    assert args, ("pass inputs as ARGUMENTS: closed-over device arrays "
                  "become HLO constants and XLA constant-folds the whole "
                  "computation at compile time")

    def scan_n(k):
        @jax.jit
        def g(*a):
            def body(c, _):
                out = fn(c, *a)
                return c * 0.5 + jnp.sum(out.astype(jnp.float32)) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c
        np.asarray(g(*args))                        # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(g(*args))                    # force real completion
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (scan_n(k_hi) - scan_n(k_lo)) / (k_hi - k_lo) * 1e3


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory counters (evaluate_vpumodel.py:156-158 equivalent)."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except (RuntimeError, NotImplementedError):
            s = {}
        out[str(d)] = {
            "bytes_in_use_mb": s.get("bytes_in_use", 0) / 2 ** 20,
            "peak_bytes_in_use_mb": s.get("peak_bytes_in_use", 0) / 2 ** 20,
            "bytes_limit_mb": s.get("bytes_limit", 0) / 2 ** 20,
        }
    return out
