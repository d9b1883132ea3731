"""Training metrics.

AdaptiveIoU re-derives the reference metric (`isegm/model/metrics.py:29-101`):
an EMA-adapted binarization threshold (init 0.4, +/-0.025 hill-climb,
beta=0.99) plus epoch-mean IoU at the adapted threshold.

TPU split: the per-batch IoUs at the three candidate thresholds are computed
in one jittable function (callable from inside the sharded train step, with
the batch axis reduced by `psum` outside). The EMA/hill-climb state machine
exists twice with identical semantics (parity-tested against each other):
  * `AdaptiveIoU` — the host class, mirroring the reference's eager updates
    (tests, eval tooling, checkpoints);
  * `adaptive_iou_step` over an `AdaptiveIoUState` — a jitted device update
    the training loop threads through its steps, so the hot loop never
    synchronizes on the metric (reading the IoU triplet back to host every
    step would block dispatch pipelining; see engine/trainer.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def iou_at_thresholds(pred_logits: jnp.ndarray, gt: jnp.ndarray,
                      thresholds: jnp.ndarray,
                      ignore_label: float = -1.0):
    """Per-sample IoU of sigmoid(pred) > t for each threshold t.

    pred_logits/gt: (B, H, W, 1). thresholds: (T,).
    Returns (ious (T, B), valid (B,)) where valid marks samples with a
    non-empty union (metrics.py:90-101 drops union==0 samples) and a
    non-empty gt (metrics.py:48-50 skips all-empty batches).
    """
    pred = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    gt = gt.astype(jnp.float32)
    gt_mask = gt > 0.5
    ignore = gt == ignore_label

    def one(t):
        pm = (pred > t) & (~ignore)
        union = jnp.mean((pm | gt_mask).astype(jnp.float32),
                         axis=(1, 2, 3))
        inter = jnp.mean((pm & gt_mask).astype(jnp.float32),
                         axis=(1, 2, 3))
        return inter / jnp.maximum(union, 1e-12), union > 0

    ious, valids = jax.vmap(one)(thresholds)
    gt_nonempty = jnp.sum(gt_mask, axis=(1, 2, 3)) > 0
    return ious, valids[0] & gt_nonempty


class AdaptiveIoUState(NamedTuple):
    """Device-resident AdaptiveIoU scalars (all f32, replicated)."""
    iou_thresh: jnp.ndarray
    ema_iou: jnp.ndarray
    epoch_iou_sum: jnp.ndarray
    epoch_batch_count: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("thresh_step",))
def state_thresholds(state: AdaptiveIoUState,
                     thresh_step: float = 0.025) -> jnp.ndarray:
    """[t, t-step, t+step] candidate thresholds for `iou_at_thresholds`."""
    t = state.iou_thresh
    return jnp.stack([t, t - thresh_step, t + thresh_step])


@functools.partial(jax.jit,
                   static_argnames=("thresh_step", "thresh_beta", "iou_beta"))
def adaptive_iou_step(state: AdaptiveIoUState, ious: jnp.ndarray,
                      valid: jnp.ndarray, thresh_step: float = 0.025,
                      thresh_beta: float = 0.99, iou_beta: float = 0.9
                      ) -> AdaptiveIoUState:
    """One hill-climb + EMA update (metrics.py:52-61), on device.

    ious: (3, B) at [t, t-step, t+step]; valid: (B,). Batches with no valid
    sample leave the state untouched (metrics.py:48-50). Same arithmetic as
    `AdaptiveIoU.update_from_ious` up to reduction order (masked-sum/n vs
    mean-of-selected); parity-tested in tests/test_engine.py."""
    vf = valid.astype(jnp.float32)
    n = jnp.sum(vf)
    means = jnp.sum(ious * vf[None, :], axis=1) / jnp.maximum(n, 1.0)

    t = state.iou_thresh
    cand = jnp.stack([t, t - thresh_step, t + thresh_step])
    best_iou, best_t = means[0], cand[0]
    for i in (1, 2):                      # reference scan order, strict >
        better = means[i] > best_iou
        best_iou = jnp.where(better, means[i], best_iou)
        best_t = jnp.where(better, cand[i], best_t)

    upd = n > 0
    return AdaptiveIoUState(
        iou_thresh=jnp.where(
            upd, thresh_beta * t + (1.0 - thresh_beta) * best_t, t),
        ema_iou=jnp.where(
            upd, iou_beta * state.ema_iou + (1.0 - iou_beta) * best_iou,
            state.ema_iou),
        epoch_iou_sum=jnp.where(upd, state.epoch_iou_sum + best_iou,
                                state.epoch_iou_sum),
        epoch_batch_count=jnp.where(upd, state.epoch_batch_count + 1.0,
                                    state.epoch_batch_count),
    )


class AdaptiveIoU:
    """Host-side EMA threshold adaptation (metrics.py:29-84)."""

    def __init__(self, init_thresh: float = 0.4, thresh_step: float = 0.025,
                 thresh_beta: float = 0.99, iou_beta: float = 0.9,
                 ignore_label: float = -1.0,
                 pred_output: str = "instances", gt_output: str = "instances"):
        self._init = dict(init_thresh=init_thresh, thresh_step=thresh_step,
                          thresh_beta=thresh_beta, iou_beta=iou_beta)
        self._iou_thresh = init_thresh
        self._thresh_step = thresh_step
        self._thresh_beta = thresh_beta
        self._iou_beta = iou_beta
        self._ignore_label = ignore_label
        self._ema_iou = 0.0
        self._epoch_iou_sum = 0.0
        self._epoch_batch_count = 0
        self.pred_outputs = (pred_output,)
        self.gt_outputs = (gt_output,)

    @property
    def name(self) -> str:
        return "AdaptiveIoU"

    @property
    def iou_thresh(self) -> float:
        return self._iou_thresh

    @property
    def thresh_step(self) -> float:
        return self._thresh_step

    @property
    def thresh_beta(self) -> float:
        return self._thresh_beta

    @property
    def iou_beta(self) -> float:
        return self._iou_beta

    def thresholds(self) -> np.ndarray:
        t = self._iou_thresh
        return np.array([t, t - self._thresh_step, t + self._thresh_step],
                        np.float32)

    def update_from_ious(self, ious: np.ndarray, valid: np.ndarray) -> None:
        """ious: (3, B) at [t, t-step, t+step]; valid: (B,). Device part done
        by `iou_at_thresholds`; this applies the hill-climb + EMAs
        (metrics.py:52-61)."""
        if not np.any(valid):
            return
        means = np.asarray(ious)[:, np.asarray(valid)].mean(axis=1)
        cand = [self._iou_thresh, self._iou_thresh - self._thresh_step,
                self._iou_thresh + self._thresh_step]
        max_iou, best_thresh = means[0], cand[0]
        # reference iterates [t-step, t+step] updating on strict improvement
        for i in (1, 2):
            if means[i] > max_iou:
                max_iou, best_thresh = means[i], cand[i]
        self._iou_thresh = (self._thresh_beta * self._iou_thresh
                            + (1 - self._thresh_beta) * best_thresh)
        self._ema_iou = self._iou_beta * self._ema_iou + \
            (1 - self._iou_beta) * max_iou
        self._epoch_iou_sum += max_iou
        self._epoch_batch_count += 1

    def update(self, pred_logits, gt) -> None:
        """Convenience eager update (host or single-device)."""
        ious, valid = iou_at_thresholds(jnp.asarray(pred_logits),
                                        jnp.asarray(gt),
                                        jnp.asarray(self.thresholds()),
                                        self._ignore_label)
        self.update_from_ious(np.asarray(ious), np.asarray(valid))

    def device_state(self) -> AdaptiveIoUState:
        """Snapshot the host scalars as a device-resident state (the training
        loop threads this through `adaptive_iou_step` without host syncs)."""
        return AdaptiveIoUState(
            iou_thresh=jnp.float32(self._iou_thresh),
            ema_iou=jnp.float32(self._ema_iou),
            epoch_iou_sum=jnp.float32(self._epoch_iou_sum),
            epoch_batch_count=jnp.float32(self._epoch_batch_count))

    def ingest_state(self, state: AdaptiveIoUState) -> None:
        """Sync a device state back into the host object (one readback per
        scalar — call at epoch/log boundaries, never per step)."""
        self._iou_thresh = float(state.iou_thresh)
        self._ema_iou = float(state.ema_iou)
        self._epoch_iou_sum = float(state.epoch_iou_sum)
        self._epoch_batch_count = int(round(float(state.epoch_batch_count)))

    def get_epoch_value(self) -> float:
        if self._epoch_batch_count > 0:
            return self._epoch_iou_sum / self._epoch_batch_count
        return 0.0

    def reset_epoch_stats(self) -> None:
        self._epoch_iou_sum = 0.0
        self._epoch_batch_count = 0

    def log_states(self, log_fn, tag_prefix: str, global_step: int) -> None:
        log_fn(f"{tag_prefix}_ema_iou", self._ema_iou, global_step)
        log_fn(f"{tag_prefix}_iou_thresh", self._iou_thresh, global_step)
