"""Optimizers: Adam/AdamW/SGD with MultiStepLR, per-leaf lr multipliers and
BEiT-style layer-wise lr decay.

Re-derives the reference optimizer stack:
  * `get_optimizer` with per-param `lr_mult` groups (isegm/engine/optimizer.py:6-27,
    modifiers at isegm/model/modifiers.py:3-11);
  * `get_optimizer_with_layerwise_decay` -> `param_groups_lrd`
    (isegm/utils/lr_decay.py:15-85): layer_decay^(num_layers - layer_id) scale
    over backbone params, weight decay 0.02 on >=2-D params, BEiT layer-id map
    (pos_embed/cls_token/patch_embed -> 0, blocks.i -> i+1, rest -> depth+1);
  * MultiStepLR(milestones=[190, 210], gamma=0.1) stepped per epoch
    (vpu_base448_cocolvis.py:153-154).

Deviation (documented): the reference's layer-wise path silently drops model
parameters outside backbone/neck/head (lr_decay.py:24-70 only walks those
three) — here every leaf is optimized, with scale 1.0 / no decay for the rest.

Weight decay follows torch.optim.Adam semantics (L2 added to the gradient
*before* the Adam moments), not AdamW.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float,
                 steps_per_epoch: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """torch MultiStepLR as an optax schedule over *update steps*."""
    boundaries = sorted(int(m) * steps_per_epoch for m in milestones)

    def schedule(count):
        lr = jnp.asarray(base_lr, jnp.float32)
        for b in boundaries:
            lr = jnp.where(count >= b, lr * gamma, lr)
        return lr

    return schedule


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def vit_layer_id(path: str, depth: int) -> int:
    """BEiT layer-id for a *backbone* param path (lr_decay.py:76-85)."""
    if re.match(r"^(pos_embed|cls_token|patch_embed)", path):
        return 0
    m = re.match(r"^blocks\.(\d+)", path)
    if m:
        return int(m.group(1)) + 1
    return depth + 1


def layerwise_scales(params, depth: int, layer_decay: float = 0.75):
    """Per-leaf lr-scale pytree: layer_decay^(num_layers - layer_id) on the
    backbone (num_layers = depth + 1), 1.0 elsewhere (lr_decay.py:22-23)."""
    num_layers = depth + 1

    def scale(path, leaf):
        p = _path_str(path)
        if p.startswith("backbone."):
            lid = vit_layer_id(p[len("backbone."):], depth)
            return layer_decay ** (num_layers - lid)
        return 1.0

    return jax.tree_util.tree_map_with_path(scale, params)


def decay_mask(params) -> Any:
    """Weight-decay mask matching lr_decay.py:29-35 extended model-wide:
    decay on >=2-D backbone/neck/head params, none on 1-D (norms, biases)."""
    def mask(path, leaf):
        p = _path_str(path)
        in_scope = p.startswith(("backbone.", "neck.", "head."))
        return bool(in_scope and getattr(leaf, "ndim", 0) >= 2)

    return jax.tree_util.tree_map_with_path(mask, params)


def _scale_updates_by_tree(scales) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda u, s: u * s, updates, scales)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(params, opt_name: str = "adam", lr: float = 5e-5,
                   betas: Tuple[float, float] = (0.9, 0.999),
                   eps: float = 1e-8,
                   milestones: Sequence[int] = (),
                   gamma: float = 0.1,
                   steps_per_epoch: int = 1,
                   layerwise_decay: bool = False,
                   layer_decay: float = 0.75,
                   weight_decay: float = 0.02,
                   backbone_depth: Optional[int] = None,
                   lr_mult_tree=None,
                   momentum: float = 0.9) -> optax.GradientTransformation:
    """Build the full training transformation (optimizer.py:6-42 semantics).

    `params` is used only for shaping scale/mask pytrees.
    """
    chain = []
    if layerwise_decay and weight_decay > 0:
        # torch Adam-style decoupled-from-nothing L2: grad += wd * param
        chain.append(optax.add_decayed_weights(weight_decay,
                                               mask=decay_mask(params)))

    name = opt_name.lower()
    if name in ("adam", "adamw"):
        if name == "adamw" and weight_decay > 0 and not layerwise_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    elif name == "sgd":
        if momentum:
            chain.append(optax.trace(decay=momentum))
    else:
        raise ValueError(f"unknown optimizer {opt_name!r}")

    scales = None
    if layerwise_decay:
        if backbone_depth is None:
            backbone_depth = len(params["backbone"]["blocks"])
        scales = layerwise_scales(params, backbone_depth, layer_decay)
    if lr_mult_tree is not None:
        scales = (lr_mult_tree if scales is None else
                  jax.tree_util.tree_map(lambda a, b: a * b, scales,
                                         lr_mult_tree))
    if scales is not None:
        chain.append(_scale_updates_by_tree(scales))

    if milestones:
        sched = multistep_lr(lr, milestones, gamma, steps_per_epoch)
        chain.append(optax.scale_by_schedule(lambda c: -sched(c)))
    else:
        chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def with_grad_accumulation(tx: optax.GradientTransformation,
                           every: int) -> optax.GradientTransformation:
    """Gradient accumulation (trainer.py:188-202 `accumulate_grads`): updates
    apply every `every` steps, gradients average in between. The MultiStepLR
    boundaries count optimizer updates, matching the reference's per-epoch
    scheduler stepping."""
    if every <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=every)
