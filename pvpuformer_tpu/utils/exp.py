"""Experiment management: YAML config cascade, numbered experiment dirs,
resume lookup, logging setup.

Re-derivation of `isegm/utils/exp.py:16-186`:
  * `load_config(model_script)` walks from the model script's directory up to
    the repo root collecting `config.yml` files (child overrides parent) and
    applies per-model `SUBCONFIGS` sections (exp.py:152-186);
  * `init_experiment` creates `<EXPS_PATH>/<script-rel-path>/NNN[_suffix]/`
    with checkpoints/ and vis/ subdirs and snapshots the model script
    (exp.py:34-67);
  * `find_resume_exp` globs a checkpoint prefix (exp.py:128-142).

No process-group init here — distribution is a Mesh, not a backend
(parallel/mesh.py); multi-host launch is `jax.distributed.initialize()` by
the caller when running on real multi-host slices.
"""
from __future__ import annotations

import logging
import shutil
import sys
from datetime import datetime
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, Optional

logger = logging.getLogger("pvpuformer_tpu")


class EasyCfg(SimpleNamespace):
    """Attribute-dict like the reference's EasyDict usage."""

    def __getitem__(self, k):
        return getattr(self, k)

    def __setitem__(self, k, v):
        setattr(self, k, v)

    def __contains__(self, k):
        return hasattr(self, k)

    def get(self, k, default=None):
        return getattr(self, k, default)


def load_config_file(config_path, model_name: Optional[str] = None,
                     return_edict: bool = False):
    """exp.py:177-186: YAML + optional SUBCONFIGS override per model."""
    import yaml
    with open(config_path) as f:
        cfg = yaml.safe_load(f) or {}
    if "SUBCONFIGS" in cfg:
        subconfigs = cfg.pop("SUBCONFIGS")
        if model_name is not None and model_name in subconfigs:
            cfg.update(subconfigs[model_name])
    return EasyCfg(**cfg) if return_edict else cfg


def load_config(model_path, repo_root=None) -> EasyCfg:
    """exp.py:152-174: cascade of config.yml from the model's dir upward."""
    model_path = Path(model_path).resolve()
    model_name = model_path.stem
    root = Path(repo_root).resolve() if repo_root else Path.cwd().resolve()

    cfg: Dict[str, Any] = {}
    cwd = model_path.parent
    chain = []
    while True:
        candidate = cwd / "config.yml"
        if candidate.exists():
            chain.append(candidate)
        if cwd == root or cwd == cwd.parent:
            break
        cwd = cwd.parent
    for path in reversed(chain):                 # parent first, child overrides
        cfg.update(load_config_file(path, model_name))
    return EasyCfg(**cfg)


def init_experiment(model_path, exps_path=None, exp_suffix: str = "",
                    resume_exp: Optional[str] = None,
                    repo_root=None) -> EasyCfg:
    """exp.py:16-67 equivalent: returns cfg with EXP_PATH / CHECKPOINTS_PATH /
    VIS_PATH / LOGS_PATH set and the model script snapshotted."""
    model_path = Path(model_path).resolve()
    cfg = load_config(model_path, repo_root)
    if exps_path is None:
        exps_path = cfg.get("EXPS_PATH", "./experiments")

    rel = Path(model_path.parent.name) / model_path.stem
    exp_parent = Path(exps_path) / rel
    exp_parent.mkdir(parents=True, exist_ok=True)

    if resume_exp:
        candidates = sorted(exp_parent.glob(f"{resume_exp}*"))
        assert candidates, f"no experiment matching {resume_exp!r} under {exp_parent}"
        exp_path = candidates[0]
        logger.info("resuming experiment %s", exp_path)
    else:
        indices = [int(p.name.split("_")[0]) for p in exp_parent.iterdir()
                   if p.is_dir() and p.name.split("_")[0].isdigit()]
        index = max(indices, default=-1) + 1
        name = f"{index:03d}" + (f"_{exp_suffix}" if exp_suffix else "")
        exp_path = exp_parent / name
        exp_path.mkdir()

    cfg.EXP_PATH = exp_path
    cfg.CHECKPOINTS_PATH = exp_path / "checkpoints"
    cfg.VIS_PATH = exp_path / "vis"
    cfg.LOGS_PATH = exp_path / "logs"
    for p in (cfg.CHECKPOINTS_PATH, cfg.VIS_PATH, cfg.LOGS_PATH):
        p.mkdir(exist_ok=True)

    if not resume_exp:
        shutil.copy(model_path, exp_path / model_path.name)

    stamp = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    add_logging(cfg.LOGS_PATH, prefix=f"train_{stamp}_")
    return cfg


def add_logging(logs_path, prefix: str = "") -> None:
    """isegm/utils/log.py:12-27 equivalent."""
    Path(logs_path).mkdir(parents=True, exist_ok=True)
    stamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    handler = logging.FileHandler(Path(logs_path) / f"{prefix}{stamp}.log")
    handler.setFormatter(logging.Formatter(
        "(%(levelname)s) %(asctime)s: %(message)s", "%Y-%m-%d %H:%M:%S"))
    logger.addHandler(handler)
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(logging.Formatter("%(asctime)s %(message)s",
                                          "%H:%M:%S"))
        logger.addHandler(sh)
    logger.setLevel(logging.INFO)


def load_module(script_path):
    """train.py:97-102: import a config-as-code model script."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("model_script", script_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module
