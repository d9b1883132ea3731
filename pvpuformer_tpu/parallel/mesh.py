"""Device mesh + sharding rules — the entire "distributed backend".

The reference's distributed stack is NCCL process groups, DDP wrappers,
DistributedSampler and loss all-reduce helpers
(`isegm/utils/exp.py:29-32`, `isegm/utils/distributed.py:6-67`,
`isegm/engine/trainer.py:76-78,118-120,205`). On TPU none of that is code:
a `jax.sharding.Mesh` + sharding annotations on the jitted train step make
XLA insert the collectives (grad psum over the `data` axis replaces
`reduce_loss_dict`; per-host data loading replaces `DistributedSampler`).

Axes:
  * `data`  — batch (DP). Gradient all-reduce rides ICI automatically.
  * `model` — optional tensor sharding of the big ViT/neck matmuls
    (Megatron-style column/row split, expressed purely as NamedSharding on
    the weights) and/or FSDP-style parameter sharding. The reference has no
    TP/PP/EP (SURVEY §2.8) — this is headroom for ViT-H, not parity.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """A ("data", "model") mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    arr = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over `data`, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return ".".join(parts)


def _tp_spec(path: str, leaf) -> P:
    """Megatron-style tensor-parallel placement for the ViT/neck weights.

    Column-split the fan-out of qkv / mlp.fc1 (out dim over `model`),
    row-split the fan-in of proj / mlp.fc2 — XLA then keeps the attention
    heads / hidden units local and all-reduces once per block.
    """
    nd = getattr(leaf, "ndim", 0)
    if nd < 2:
        return P()
    if path.endswith(("attn.qkv.w", "mlp.fc1.w", "fc1.w")):
        return P(None, "model")
    if path.endswith(("attn.proj.w", "mlp.fc2.w", "fc2.w")):
        return P("model", None)
    return P()


def _fsdp_spec(path: str, leaf, min_size: int = 2 ** 16) -> P:
    """ZeRO-3-ish: shard the largest dim of big >=2-D params over `data`."""
    nd = getattr(leaf, "ndim", 0)
    if nd < 2 or leaf.size < min_size:
        return P()
    axis = int(np.argmax(leaf.shape))
    spec = [None] * nd
    spec[axis] = "data"
    return P(*spec)


def param_sharding(params: Any, mesh: Mesh, mode: str = "replicated") -> Any:
    """Per-leaf NamedSharding pytree. mode: replicated | tp | fsdp | tp+fsdp.

    Sharded dims that don't divide the mesh axis fall back to replicated
    (keeps tiny test shapes working on 8 virtual devices).
    """
    def spec_for(path, leaf) -> NamedSharding:
        p = _path_str(path)
        spec = P()
        if "tp" in mode:
            spec = _tp_spec(p, leaf)
        if spec == P() and "fsdp" in mode:
            spec = _fsdp_spec(p, leaf)
        # divisibility check
        for dim, name in enumerate(spec):
            if name is None:
                continue
            if leaf.shape[dim] % mesh.shape[name]:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh, mode: str = "replicated") -> Any:
    shardings = param_sharding(params, mesh, mode)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
