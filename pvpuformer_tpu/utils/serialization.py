"""Self-describing checkpoints: config + params pytree in one .npz.

Keeps the reference's key property (`isegm/utils/serialization.py:7-112`,
SURVEY §3.5): a checkpoint stores both the weights and the full model config,
so `load_checkpoint` can rebuild the exact model without external context.
The torch `{state_dict, config}` pickle becomes a numpy .npz holding the
flattened pytree plus a JSON config header — no pickle, portable, mmap-able.

Config serialization covers the nested frozen dataclasses (VPUConfig and
friends) via a class registry; jnp dtypes round-trip by name.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------- config

def _registry() -> Dict[str, Any]:
    from ..models.vit import ViTConfig
    from ..models.two_way import TwoWayConfig
    from ..models.fpn import NeckConfig
    from ..models.seg_head import HeadConfig
    from ..models.vpu import VPUConfig
    from ..models.plainvit import PlainVitConfig
    from ..engine.train_step import TrainConfig
    from ..inference.predictor import PredictorConfig
    from ..ops.ppue import PPuEConfig
    classes = [ViTConfig, TwoWayConfig, NeckConfig, HeadConfig, VPUConfig,
               PlainVitConfig, TrainConfig, PredictorConfig, PPuEConfig]
    try:
        from ..models.zoo.segformer import SegformerISConfig
        from ..models.zoo.hrnet import HRNetISConfig
        from ..models.zoo.deeplab import DeeplabISConfig
        from ..models.zoo.swin import SwinISConfig
        from ..models.zoo.hrformer import HRFormerISConfig
        from ..models.zoo.swin_unet import SwinUNetISConfig
        from ..models.zoo.clip_text import (ClipTextConfig, ClipVisualConfig,
                                            ClipViTConfig)
        classes += [SegformerISConfig, HRNetISConfig, DeeplabISConfig,
                    SwinISConfig, HRFormerISConfig, SwinUNetISConfig,
                    ClipTextConfig, ClipVisualConfig, ClipViTConfig]
    except ImportError:
        pass
    return {c.__name__: c for c in classes}


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "float16": jnp.float16, "float64": jnp.float64}


def config_to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        out = {"__class__": type(cfg).__name__}
        for f in dataclasses.fields(cfg):
            out[f.name] = config_to_dict(getattr(cfg, f.name))
        return out
    if isinstance(cfg, type) or (hasattr(cfg, "dtype") and not
                                 isinstance(cfg, (int, float, bool))):
        # jnp dtype objects / dtype classes
        return {"__dtype__": jnp.dtype(cfg).name}
    if isinstance(cfg, (list, tuple)):
        return {"__tuple__": [config_to_dict(v) for v in cfg]}
    return cfg


def config_from_dict(d: Any) -> Any:
    if isinstance(d, dict) and "__class__" in d:
        cls = _registry()[d["__class__"]]
        # tolerate version skew both ways: fields absent from the stored
        # config take the dataclass default; stored fields this version no
        # longer has are dropped
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: config_from_dict(v) for k, v in d.items()
                  if k != "__class__" and k in known}
        return cls(**kwargs)
    if isinstance(d, dict) and "__dtype__" in d:
        return _DTYPES[d["__dtype__"]]
    if isinstance(d, dict) and "__tuple__" in d:
        return tuple(config_from_dict(v) for v in d["__tuple__"])
    return d


# --------------------------------------------------------------------- pytree

def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}#{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def build(node):
        if not isinstance(node, dict):
            return jnp.asarray(node)
        if node and all(k.startswith("#") for k in node):
            idx = sorted(node, key=lambda s: int(s[1:]))
            return [build(node[k]) for k in idx]
        return {k: build(v) for k, v in node.items()}

    return build(root)


# ---------------------------------------------------------------- checkpoints

def save_checkpoint(path, params: Any, config: Any = None,
                    opt_state: Any = None, step: int = 0,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Write a self-describing checkpoint (misc.py:15-33 equivalent)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {f"params/{k}": v for k, v in flatten_tree(params).items()}
    if opt_state is not None:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(leaves):
            arrays[f"opt/#{i}"] = np.asarray(leaf)
    header = {
        "config": config_to_dict(config) if config is not None else None,
        "step": int(step),
        "extra": extra or {},
        "format": "pvpuformer-tpu/ckpt/1",
    }
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.replace(path)


def save_checkpoint_orbax(path, params: Any, config: Any = None,
                          opt_state: Any = None, step: int = 0,
                          extra: Optional[Dict[str, Any]] = None) -> None:
    """Orbax-backed checkpoint for sharded / multi-host training: params stay
    sharded (no host gather, unlike the .npz path) and writes are
    fault-tolerant. Layout: <path>/state (pytree) + <path>/header.json."""
    import json as _json
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        ckptr.save(path / "state", state, force=True)
    if jax.process_index() == 0:
        header = {"config": config_to_dict(config) if config is not None
                  else None, "step": int(step), "extra": extra or {},
                  "format": "pvpuformer-tpu/orbax/1"}
        (path / "header.json").write_text(_json.dumps(header))


def load_checkpoint_orbax(path, state_like: Any
                          ) -> Tuple[Any, Any, int, Dict[str, Any]]:
    """Restore an orbax checkpoint; `state_like` provides the pytree
    structure/shardings ({"params": ..., ["opt_state": ...]})."""
    import json as _json
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path / "state", state_like)
    header = _json.loads((path / "header.json").read_text())
    config = config_from_dict(header["config"]) \
        if header.get("config") is not None else None
    return state, config, int(header.get("step", 0)), \
        dict(header.get("extra") or {})


def load_checkpoint(path, opt_state_like: Any = None
                    ) -> Tuple[Any, Any, int, Dict[str, Any]]:
    """Returns (params, config, step, extra); if `opt_state_like` is given,
    extra['opt_state'] holds the restored optimizer state."""
    with np.load(Path(path), allow_pickle=False) as z:
        header = json.loads(bytes(z["__header__"].tobytes()).decode())
        params_flat = {k[len("params/"):]: z[k] for k in z.files
                       if k.startswith("params/")}
        params = unflatten_tree(params_flat)
        extra = dict(header.get("extra") or {})
        if opt_state_like is not None:
            leaves = [z[f"opt/#{i}"] for i in range(
                len([k for k in z.files if k.startswith("opt/")]))]
            treedef = jax.tree_util.tree_structure(opt_state_like)
            extra["opt_state"] = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(l) for l in leaves])
    config = config_from_dict(header["config"]) \
        if header.get("config") is not None else None
    return params, config, int(header.get("step", 0)), extra
