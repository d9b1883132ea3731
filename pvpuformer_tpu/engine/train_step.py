"""The iterloss training step — one XLA program per (num_iters, batch shape).

Re-derives ISTrainer.batch_forward's iterloss branch
(`isegm/engine/trainer.py:310-491`) as a pure jitted function:

  per batch: num_iters in [1, max_num_next_clicks] rounds (drawn on host,
  passed static so each variant compiles once); each round
    1. draws as_prompt_type = randint(0, 1) (trainer.py:367) — traced;
    2. at round 0 synthesizes boxes from the initial error masks without
       touching points (trainer.py:369-376);
    3. forwards (image ++ stop_grad(prev_probs)) with the PPuE prompts;
    4. accumulates NFL(instances, gt) * w + Dice * w + 2 * BCE(P2CL, ed) * w,
       w = iterloss_weights[round] (trainer.py:399-419, loss cfg at
       vpu_base448_cocolvis.py:73-80);
    5. prev = sigmoid(instances) (trainer.py:427-431);
    6. next prompts from the new error masks: next click + per-slot ed-mask
       labels + boxes (trainer.py:434-448), all on device (engine/prompt_sim);
    7. optional prev-mask dropout (trainer.py:455-457).

The reference pays a D2H/H2D + cv2 round trip per round per sample here; on
TPU the whole loop is one dispatch. Scribble prompts come precomputed from
the input pipeline (they depend only on gt — trainer.py:727).

Scale-out: call `train_step` under a Mesh with the batch sharded over `data`
and params replicated (or fsdp/tp-sharded, parallel/mesh.py) — the mean over
the batch makes XLA psum the gradients; there is no DDP wrapper to port.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.vpu import VPUConfig, vpu_forward_traced_type
from . import losses as L
from .prompt_sim import (get_next_prompts, next_clicks, synth_boxes,
                         update_ed_mask)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: VPUConfig
    max_num_next_clicks: int = 3                    # vpu_base448_cocolvis.py:173
    iterloss_weights: Tuple[float, ...] = (1.0, 2.0, 3.0)
    instance_loss_weight: float = 1.0               # NFL
    instance_aux_loss_weight: float = 1.0           # Dice
    instance_aux3_loss_weight: float = 2.0          # P2CL BCE
    nfl_alpha: float = 0.5
    nfl_gamma: float = 2.0
    pred_thresh: float = 0.49
    use_random_clicks: bool = True
    use_iterloss: bool = True                       # False = RITM iter-mask
    pclout: bool = False                            # trainer.py:426-431: feed
                                                    # raw logits (not sigmoid)
                                                    # as the next prev mask
    as_allmask: bool = False
    prev_mask_drop_prob: float = 0.0
    remat: bool = True                              # jax.checkpoint per round


def _round_losses(cfg: TrainConfig, out: Dict[str, jnp.ndarray],
                  gt: jnp.ndarray, ed_mask: jnp.ndarray, w: float,
                  logs: Dict[str, jnp.ndarray], k: int) -> jnp.ndarray:
    """The three configured losses for one round (trainer.py:399-419)."""
    total = jnp.float32(0.0)
    nfl_v, nfl_aux = L.normalized_focal_loss(
        out["instances"], gt, alpha=cfg.nfl_alpha, gamma=cfg.nfl_gamma,
        with_aux=True)
    nfl = jnp.mean(nfl_v)
    logs[f"instance_loss_{k}_{int(w)}"] = nfl
    # NFL normalizer diagnostics feeding the host EMA logger
    # (losses.py:63-71 _k_sum/_m_max, logged at trainer.py:215-217)
    valid = nfl_aux["no_ignore"]
    logs[f"nfl_mult_mean_{k}"] = jnp.sum(
        jnp.where(valid, nfl_aux["sample_mult"], 0.0)) / \
        jnp.maximum(jnp.sum(valid), 1)
    logs[f"nfl_beta_pmax_{k}"] = jnp.mean(nfl_aux["beta_pmax"])
    total += cfg.instance_loss_weight * nfl * w

    dice = jnp.mean(L.dice_loss(out["instances"], gt, use_sigmoid=True,
                                naive_dice=True))
    logs[f"instance_aux_loss_{k}_{int(w)}"] = dice
    total += cfg.instance_aux_loss_weight * dice * w

    if cfg.instance_aux3_loss_weight > 0 and out.get("instances_aux") is not None:
        bce = jnp.mean(L.sigmoid_bce_loss(
            out["instances_aux"], ed_mask.astype(jnp.float32),
            from_sigmoid=True))
        logs[f"instance_aux3_loss_{k}_{int(w)}"] = bce
        total += cfg.instance_aux3_loss_weight * bce * w
    return total


def _round_forward(params, cfg: TrainConfig, fwd, net_input, points, boxes,
                   scribbles, rects, prompt_type, captions, gt, ed_mask,
                   w: float, k: int):
    """One iterloss round: model forward + that round's losses.

    This is the remat (jax.checkpoint) unit when cfg.remat is on. The
    checkpoint boundary must enclose the LOSSES, not just the model forward:
    out["instances_aux"] is (B, H, W, 2N) — 616 MB at the shipped recipe's
    b32/448²/24pts — and if the loss consumes it outside the checkpoint it
    becomes a saved residual that stays live until that round's backward.
    With three rounds pending that alone OOMed the 16G v5e chip (measured:
    b32 ni=3 exceeded HBM by 239M with the forward-only boundary). Here the
    only values escaping a round are scalars (loss, logs) and instances
    (B, H, W, 1), so per-pending-round residency is just the round inputs.
    """
    out = fwd(params, cfg.model, net_input, points, boxes.astype(jnp.float32),
              scribbles, rects, prompt_type, captions=captions)
    logs: Dict[str, jnp.ndarray] = {}
    total = _round_losses(cfg, out, gt, ed_mask, w, logs, k)
    return total, logs, out["instances"]


def _round_loss_aux(params, cfg, fwd, net_input, points, boxes, scribbles,
                    rects, prompt_type, captions, gt, ed_mask, w, k):
    """(loss, aux) form of _round_forward for per-round value_and_grad."""
    total, logs, instances = _round_forward(
        params, cfg, fwd, net_input, points, boxes, scribbles, rects,
        prompt_type, captions, gt, ed_mask, w, k)
    return total, (logs, instances)


def _iterloss_loop(params, cfg: TrainConfig, batch: Dict[str, jnp.ndarray],
                   key: jax.Array, num_iters: int, with_grads: bool):
    """Shared iterloss round loop; see iterloss_forward for semantics.

    with_grads=False: returns (total, aux, None) — one joint computation,
    differentiable as a whole (cfg.remat checkpoints each round).

    with_grads=True: returns (total, aux, grads) with grads accumulated by a
    per-round jax.value_and_grad. This is valid because NO gradient crosses
    rounds — prev is stop_gradient'd (trainer.py:427-431 semantics), points/
    boxes/ed_mask come from the no-grad prompt sim — so d(total)/d(params) =
    sum_k d(loss_k)/d(params) exactly. Each round completes its own
    forward+backward before the next begins, so peak HBM is one round's
    fwd+bwd + the grad accumulator, independent of num_iters. That is what
    lets the SHIPPED recipe (b32, up to 3 rounds, vpu_base448_cocolvis.py)
    fit one 16G v5e chip: the whole-loop backward needed 15.9-16.2G (OOM,
    measured 2026-08-21 remat on or off) vs ~13G this way — and it is also
    faster than jax.checkpoint, which would recompute each round's forward.
    """
    image = batch["image"]
    captions = batch.get("captions")
    gt = batch["instances"].astype(jnp.float32)
    points = batch["points"].astype(jnp.float32)
    scribbles = batch["scribbles"].astype(jnp.float32)
    rects = batch["scribble_rects"].astype(jnp.float32)
    b, h, w, _ = image.shape
    n = points.shape[1] // 2

    gtm = gt[..., 0] > 0.5
    # ed_mask_label init: first N slots = gt, last N = ~gt (trainer.py:329-331)
    ed_mask = jnp.concatenate(
        [jnp.repeat(gtm[..., None], n, axis=-1),
         jnp.repeat((~gtm)[..., None], n, axis=-1)], axis=-1)  # (B,H,W,2N) bool

    prev = jnp.zeros((b, h, w, 1), jnp.float32)

    if not cfg.use_random_clicks:
        # trainer.py:333-338: discard sampler clicks, take one error-mask click
        key, k0 = jax.random.split(key)
        points = jnp.full_like(points, -1.0)
        points, _ = next_clicks(prev[..., 0], gt[..., 0], points, k0,
                                pred_thresh=cfg.pred_thresh)

    fwd = vpu_forward_traced_type
    if cfg.remat:
        fwd = jax.checkpoint(fwd, static_argnums=(1,))

    if not cfg.use_iterloss:
        total, aux = _itermask_forward(params, cfg, fwd, image, gt, points,
                                       scribbles, rects, ed_mask, prev, key,
                                       num_iters)
        return total, aux, None

    # Iterloss remat unit = the whole round incl. losses (see _round_forward);
    # the plain (un-checkpointed) forward goes inside it. Irrelevant in
    # with_grads mode: each round is already its own backward.
    round_fn = _round_forward
    if cfg.remat and not with_grads:
        round_fn = jax.checkpoint(
            _round_forward, static_argnums=(1, 2, 12, 13))

    grads = None
    total = jnp.float32(0.0)
    logs: Dict[str, jnp.ndarray] = {}
    no_boxes = jnp.zeros((b, 5), jnp.int32)
    # Box synthesis (connected components + bbox) is by far the most
    # expensive prompt-sim piece on TPU (~78 ms vs 31 ms for the whole model
    # fwd+bwd at b8/448, scripts/profile_train.py), but the round only
    # consumes boxes when as_prompt_type lands on 1. The reference computes
    # cal_box every round on host and lets the model pick
    # (trainer.py:367-448); here each round draws its prompt type FIRST and
    # synthesizes boxes under a scalar `lax.cond`, so XLA skips the CC work
    # on click rounds. Identical training-data distribution: the box branch,
    # when taken, consumes exactly the same keys/masks as before.
    prompt_type = None
    for k in range(num_iters):
        key, kp, kt, kd = jax.random.split(key, 4)
        if k == 0:
            prompt_type = jax.random.randint(kt, (), 0, 2)  # trainer.py:367
            # boxes from the initial error masks; points/ed untouched
            boxes = jax.lax.cond(
                prompt_type == 1,
                lambda: get_next_prompts(prev[..., 0], gt[..., 0], points,
                                         ed_mask, kp,
                                         pred_thresh=cfg.pred_thresh,
                                         as_allmask=cfg.as_allmask,
                                         update_points=False)[1],
                lambda: no_boxes)

        net_input = jnp.concatenate(
            [image, jax.lax.stop_gradient(prev).astype(image.dtype)], axis=-1)
        round_args = (params, cfg, vpu_forward_traced_type, net_input, points,
                      boxes, scribbles, rects, prompt_type, captions, gt,
                      ed_mask, cfg.iterloss_weights[k], k)
        if with_grads:
            (round_total, (round_logs, instances)), g = jax.value_and_grad(
                _round_loss_aux, has_aux=True)(*round_args)
            grads = g if grads is None else \
                jax.tree_util.tree_map(jnp.add, grads, g)
        else:
            round_total, round_logs, instances = round_fn(*round_args)
        total += round_total
        logs.update(round_logs)

        prev = instances.astype(jnp.float32) if cfg.pclout else \
            jax.nn.sigmoid(instances.astype(jnp.float32))
        prev = jax.lax.stop_gradient(prev)

        if with_grads and k < num_iters - 1:
            # Nothing makes round k's backward a data dependency of round
            # k+1's forward, and XLA's scheduler happily interleaves them —
            # which re-creates the all-rounds-live peak this mode exists to
            # avoid (measured: b32 ni=2 OOMed without this barrier while
            # ni=1 fit with 3.8G headroom). Tying the accumulated grads to
            # `prev` forces each round's fwd+bwd to fully retire first.
            grads, prev = jax.lax.optimization_barrier((grads, prev))

        if k < num_iters - 1:
            key, kn, kb, ktn = jax.random.split(key, 4)
            # next round's type decides whether the box branch runs at all
            next_type = jax.random.randint(ktn, (), 0, 2)
            new_points, info = next_clicks(prev[..., 0], gt[..., 0], points,
                                           kn, pred_thresh=cfg.pred_thresh)
            boxes = jax.lax.cond(
                next_type == 1,
                lambda: synth_boxes(gt[..., 0], info.fn_mask, info.fp_mask,
                                    points, kb, as_allmask=cfg.as_allmask),
                lambda: no_boxes)
            points = new_points
            ed_mask = update_ed_mask(ed_mask, info)
            prompt_type = next_type

            if cfg.prev_mask_drop_prob > 0:
                keep = jax.random.uniform(kd, (b, 1, 1, 1)) >= \
                    cfg.prev_mask_drop_prob
                prev = prev * keep

    logs["loss"] = total
    aux = {"logs": logs, "final_instances": instances,
           "points": points}
    return total, aux, grads


def iterloss_forward(params, cfg: TrainConfig, batch: Dict[str, jnp.ndarray],
                     key: jax.Array, num_iters: int
                     ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Loss + logs for one batch. batch keys: image (B,H,W,3) in [0,1],
    instances (B,H,W,1), points (B,2N,3), scribbles (B,S,2),
    scribble_rects (B,4), and optionally captions (B, context_length) int32
    CLIP token ids (trainer.py:321,393-395 caption co-training: the text
    embedding rides the DMA query stream every round — the reference's
    as_click flag routes text only into round 0, but its model drops the
    captions entirely; see models/vpu.caption_queries)."""
    total, aux, _ = _iterloss_loop(params, cfg, batch, key, num_iters,
                                   with_grads=False)
    return total, aux


def iterloss_value_and_grad(params, cfg: TrainConfig, batch, key,
                            num_iters: int):
    """(loss, aux), grads — with per-round grad accumulation on the iterloss
    path (see _iterloss_loop: gradient-equivalent and ~3G less peak HBM than
    differentiating the whole loop). The itermask branch has a single
    supervised forward, so plain value_and_grad is already minimal there."""
    if cfg.use_iterloss:
        total, aux, grads = _iterloss_loop(params, cfg, batch, key,
                                           num_iters, with_grads=True)
        return (total, aux), grads
    return jax.value_and_grad(iterloss_forward, has_aux=True)(
        params, cfg, batch, key, num_iters)


def _itermask_forward(params, cfg: TrainConfig, fwd, image, gt, points,
                      scribbles, rects, ed_mask, prev, key, num_iters: int):
    """RITM iter-mask branch (trainer.py:459-491 + find_next_n_points at
    493-522): simulate num_iters click rounds WITHOUT gradients, then one
    supervised forward on the final state. Loss = NFL + Dice (no P2CL round
    accumulation)."""
    for _ in range(num_iters):
        key, kt, kn = jax.random.split(key, 3)
        net_input = jnp.concatenate([image, prev.astype(image.dtype)],
                                    axis=-1)
        out = fwd(params, cfg.model, net_input, points,
                  jnp.zeros((image.shape[0], 5), jnp.float32), scribbles,
                  rects, jnp.int32(0))
        prev = jax.lax.stop_gradient(
            jax.nn.sigmoid(out["instances"].astype(jnp.float32)))
        points, _ = next_clicks(prev[..., 0], gt[..., 0], points, kn,
                                pred_thresh=cfg.pred_thresh)
        points = jax.lax.stop_gradient(points)

    net_input = jnp.concatenate([image, prev.astype(image.dtype)], axis=-1)
    out = fwd(params, cfg.model, net_input, points,
              jnp.zeros((image.shape[0], 5), jnp.float32), scribbles, rects,
              jnp.int32(0))
    logs: Dict[str, jnp.ndarray] = {}
    nfl = jnp.mean(L.normalized_focal_loss(out["instances"], gt,
                                           alpha=cfg.nfl_alpha,
                                           gamma=cfg.nfl_gamma))
    dice = jnp.mean(L.dice_loss(out["instances"], gt, use_sigmoid=True,
                                naive_dice=True))
    logs["instance_loss"] = nfl
    logs["instance_aux_loss"] = dice
    total = cfg.instance_loss_weight * nfl + cfg.instance_aux_loss_weight * dice
    logs["loss"] = total
    return total, {"logs": logs, "final_instances": out["instances"],
                   "points": points}


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tx", "num_iters"),
                   donate_argnames=("params", "opt_state"))
def train_step(params, opt_state, batch, key, metric_thresholds,
               *, cfg: TrainConfig, tx: optax.GradientTransformation,
               num_iters: int):
    """One optimization step. Returns (params, opt_state, logs, metric_ious,
    metric_valid). metric_* feed AdaptiveIoU on host (engine/metrics.py)."""
    (loss, aux), grads = iterloss_value_and_grad(params, cfg, batch, key,
                                                 num_iters)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    from .metrics import iou_at_thresholds
    ious, valid = iou_at_thresholds(aux["final_instances"],
                                    batch["instances"].astype(jnp.float32),
                                    metric_thresholds)
    return params, opt_state, aux["logs"], ious, valid


@functools.partial(jax.jit, static_argnames=("cfg", "num_iters"))
def eval_step(params, batch, key, metric_thresholds, *, cfg: TrainConfig,
              num_iters: int):
    """Validation: same rounds, no update (trainer.py:266-298)."""
    loss, aux = iterloss_forward(params, cfg, batch, key, num_iters)
    from .metrics import iou_at_thresholds
    ious, valid = iou_at_thresholds(aux["final_instances"],
                                    batch["instances"].astype(jnp.float32),
                                    metric_thresholds)
    return aux["logs"], ious, valid
