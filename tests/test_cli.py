"""CLI smoke tests (subprocess, CPU): train -> checkpoint -> evaluate."""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def run(args, timeout=1200):   # generous: the subprocess recompiles from a
                               # cold cache and the host may be running the
                               # rest of the suite in parallel
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_train_then_evaluate_cli(tmp_path):
    # 1. train the tiny synthetic recipe for one epoch
    r = run(["train.py", "models/iSegNet/vpu_tiny_synthetic.py",
             "--debug", "--batch-size", "8", "--platform", "cpu",
             "--exp-name", "clitest"])
    assert r.returncode == 0, r.stderr[-2000:]
    exps = sorted((REPO / "experiments" / "iSegNet" /
                   "vpu_tiny_synthetic").glob("*_clitest"))
    assert exps, "experiment dir missing"
    ckpt = exps[-1] / "checkpoints" / "last_checkpoint.npz"
    assert ckpt.exists(), "checkpoint missing"

    # 2. evaluate that checkpoint on the synthetic dataset
    r = run(["scripts/evaluate.py", "NoBRS", "--checkpoint", str(ckpt),
             "--datasets", "Synthetic", "--n-clicks", "2", "--limit", "1",
             "--print-ious", "--save-ious",
             "--logs-path", str(tmp_path / "logs")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "NoC@80%" in r.stdout and "NoBRS" in r.stdout
    assert "mIoU@k" in r.stdout
    pickles = list((tmp_path / "logs").glob("*.pickle"))
    assert pickles, "IoU pickle missing"
