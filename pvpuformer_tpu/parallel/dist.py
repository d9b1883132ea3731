"""Small backend-free distributed utility surface.

The reference exposes `get_rank / get_world_size / synchronize /
reduce_loss_dict` over torch.distributed (`isegm/utils/distributed.py:6-47`);
engine code here is already backend-free (XLA collectives via sharded jit),
but migrating code expects these names, so they exist as thin JAX wrappers:

  * rank/world size = JAX process index/count (multi-host);
  * `synchronize` = a tiny cross-device psum barrier;
  * `reduce_metrics` = mean of scalar dicts across devices/processes.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Block until all devices reach this point (distributed.py:14-23)."""
    if len(jax.devices()) == 1:
        return
    x = jnp.ones((len(jax.devices()),))
    jax.block_until_ready(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x))


def reduce_metrics(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean of scalar metrics across devices (reduce_loss_dict,
    distributed.py:25-47). With a sharded-jit train step this is already
    done by the batch mean; this helper covers host-side scalars."""
    n = len(jax.devices())
    if n == 1:
        return dict(metrics)
    keys = sorted(metrics)
    vals = jnp.asarray([float(metrics[k]) for k in keys])
    vals = jnp.broadcast_to(vals, (n, len(keys)))
    out = jax.pmap(lambda v: jax.lax.pmean(v, "i"), axis_name="i")(vals)
    return {k: float(v) for k, v in zip(keys, np.asarray(out[0]))}
