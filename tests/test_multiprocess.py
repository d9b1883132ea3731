"""TRUE multi-process (multi-host) execution tests.

Until round 5 the multi-host path (train.py:63-65 `jax.distributed.
initialize`, data/loader.py process_index striding) was documentation-only:
every test and the driver dryrun ran ONE process with 8 virtual devices.
These tests actually launch two OS processes with 4 CPU devices each, build
a process-spanning 8-device mesh with gloo collectives, and require the
sharded `train_step` trajectory to match the single-process 8-device run —
the same guarantee the reference gets from DDP's all-reduce
(/root/reference/isegm/utils/exp.py:29-32, distributed.py:50-67).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "mp_train_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_workers(tmp_path, steps: int):
    port = _free_port()
    env = dict(os.environ)
    # the worker pins its own JAX_PLATFORMS/XLA_FLAGS before importing jax
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), "--process-id", str(pid),
             "--num-processes", "2", "--port", str(port),
             "--out", str(out), "--steps", str(steps)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    results = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=1500)
        assert p.returncode == 0, (stdout[-2000:], stderr[-3000:])
    for out in outs:
        results.append(json.loads(out.read_text()))
    return results


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    """2 processes x 4 CPU devices, gloo collectives, process-spanning mesh:
    every process sees the same loss trajectory, and that trajectory matches
    the single-process 8-device run over identically-composed global batches
    (loader process_index striding on the worker side, the concatenated
    union here)."""
    steps = 3
    results = _launch_workers(tmp_path, steps)

    r0, r1 = results
    assert r0["process_count"] == 2 and r0["n_global_devices"] == 8
    # SPMD: both processes computed the SAME global program -> identical
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["checksum"] == r1["checksum"]

    # single-process reference over the same global batches, same keys
    import jax
    from jax.sharding import Mesh

    import mp_train_worker as W

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))
    ref_losses, ref_checksum = W.run_train_steps(
        mesh, W.global_batch_order(), steps=steps)

    assert np.isfinite(ref_losses).all()
    # gloo cross-process all-reduce may order reductions differently from
    # the intra-process collective — allow f32 reduction noise, nothing more
    np.testing.assert_allclose(r0["losses"], ref_losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r0["checksum"], ref_checksum, rtol=1e-5)


@pytest.mark.slow
def test_loader_process_shards_partition_global_batch():
    """The per-process loader shards partition each global batch: disjoint,
    union = the single-loader batch rows (DistributedSampler semantics,
    distributed.py:50-57)."""
    import mp_train_worker as W

    full = next(iter(W.make_loader(0, 1)))
    halves = [next(iter(W.make_loader(p, 2))) for p in range(2)]
    assert all(h["image"].shape[0] == 4 for h in halves)
    union = np.concatenate([h["image"] for h in halves])
    # same multiset of rows as the unsharded batch (order is interleaved)
    key = lambda arr: sorted(map(tuple, arr.reshape(arr.shape[0], -1)[:, :8]))
    assert key(union) == key(full["image"])
    assert len({k for h in halves for k in key(h["image"])}) == 8
