"""Training driver: epoch loop, metrics, checkpoint schedule, logging.

Re-derivation of ISTrainer's outer machinery (`isegm/engine/trainer.py:25-298`)
around the fused train step (engine/train_step.py):
  * per batch, the host draws num_iters = randint(1, max_num_next_clicks)
    (trainer.py:339) and dispatches the matching pre-compiled step variant;
  * AdaptiveIoU updated from the step's on-device IoU triplet;
  * checkpoints follow the piecewise interval schedule
    [(start_epoch, every), ...] (trainer.py:257-264), writing
    `last_checkpoint.npz` + numbered epoch files, self-describing
    (utils/serialization.py);
  * scalar logging to the console logger and optionally TensorBoard
    (torch.utils.tensorboard when available, matching SummaryWriterAvg usage
    at trainer.py:209-244).

Distributed: under a Mesh the loader shards per process and batches are
placed with `shard_batch`; gradient reduction is XLA's (no DDP plumbing).
"""
from __future__ import annotations

import logging
import random
import time
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..parallel import make_mesh, shard_batch, shard_params
from ..utils.serialization import save_checkpoint, load_checkpoint
from .metrics import AdaptiveIoU, adaptive_iou_step, state_thresholds
from .train_step import TrainConfig, train_step, eval_step

logger = logging.getLogger("pvpuformer_tpu")


class _AvgWriter:
    """Window-averaged scalar logging (SummaryWriterAvg, isegm/utils/log.py:
    51-97): scalars accumulate and flush as means every `period` steps;
    disable_avg writes pass through immediately."""

    def __init__(self, writer, period: int = 25):
        self._w = writer
        self._period = period
        self._acc = {}

    def add_scalar(self, tag, value, global_step, disable_avg=False):
        if disable_avg or self._period <= 1:
            self._w.add_scalar(tag, float(value), global_step)
            return
        # `value` may be a device scalar: accumulate WITHOUT float() so the
        # training loop never blocks on the device — the one readback per
        # window happens at dump time.
        s, n = self._acc.get(tag, (0.0, 0))
        s, n = s + value, n + 1
        if n >= self._period:
            self._w.add_scalar(tag, float(s) / n, global_step)
            s, n = 0.0, 0
        self._acc[tag] = (s, n)


def _interval_for_epoch(schedule, epoch: int) -> int:
    """checkpoint_interval as int or [(start, every), ...] (trainer.py:257)."""
    if isinstance(schedule, int):
        return schedule
    every = schedule[0][1]
    for start, e in schedule:
        if epoch >= start:
            every = e
    return every


class Trainer:
    def __init__(self, params, cfg: TrainConfig, tx, train_loader,
                 val_loader=None, *,
                 checkpoint_dir: Optional[str] = None,
                 checkpoint_interval=10,
                 metrics: Optional[Sequence[AdaptiveIoU]] = None,
                 mesh=None, param_mode: str = "replicated",
                 tb_dir: Optional[str] = None,
                 vis_dir: Optional[str] = None,
                 image_dump_interval: int = 0,
                 tb_dump_period: int = 25,
                 log_every: int = 25, seed: int = 0):
        self.cfg = cfg
        self.tx = tx
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.checkpoint_interval = checkpoint_interval
        self.metrics = list(metrics) if metrics is not None else [AdaptiveIoU()]
        self.val_metrics = [AdaptiveIoU() for _ in self.metrics]
        self.mesh = mesh if mesh is not None else make_mesh()
        self.param_mode = param_mode
        self.vis_dir = Path(vis_dir) if vis_dir else None
        self.image_dump_interval = image_dump_interval
        self.log_every = log_every
        self.seed = seed
        self.global_step = 0
        self.epoch = 0

        with self.mesh:
            # copy on ingest: train_step donates its param buffers, and
            # device_put with an identical sharding can alias the caller's
            # arrays — without the copy, the caller's params would be
            # deleted after the first step
            params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params)
            self.params = shard_params(params, self.mesh, param_mode)
            self.opt_state = tx.init(self.params)

        self._tb = None
        if tb_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = _AvgWriter(SummaryWriter(tb_dir),
                                      period=tb_dump_period)
            except ImportError:
                logger.warning("tensorboard unavailable; console logging only")

    # ------------------------------------------------------------------ utils

    def _log_scalar(self, tag: str, value: float) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, self.global_step)

    def _place(self, batch: Dict[str, np.ndarray]):
        return shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                           self.mesh)

    # ------------------------------------------------------------------- train

    def training(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        rng = random.Random(f"{self.seed}-{epoch}")
        for m in self.metrics:
            m.reset_epoch_stats()
        sums: Dict[str, float] = {}
        count = 0
        t0 = time.time()

        # Async device loop: the AdaptiveIoU state and the per-key loss sums
        # live on device, so the host never blocks on step results — XLA
        # pipelines step k+1's dispatch while step k runs. The only per-window
        # sync is float(loss) for the console line every `log_every` steps.
        from ..parallel.mesh import activation_sharding

        m = self.metrics[0]
        mstate = m.device_state()
        # activation_sharding pins the Megatron activation layout while the
        # step traces, so tp-mode GSPMD never involuntarily rematerializes
        # (no-op on pure-DP meshes)
        with self.mesh, activation_sharding(self.mesh):
            for i, batch in enumerate(self.train_loader):
                num_iters = rng.randint(1, self.cfg.max_num_next_clicks)
                key = jax.random.key((self.seed << 20) ^ self.global_step)
                thr = state_thresholds(mstate, thresh_step=m.thresh_step)
                self.params, self.opt_state, logs, ious, valid = train_step(
                    self.params, self.opt_state, self._place(batch), key, thr,
                    cfg=self.cfg, tx=self.tx, num_iters=num_iters)
                mstate = adaptive_iou_step(
                    mstate, ious, valid, thresh_step=m.thresh_step,
                    thresh_beta=m.thresh_beta, iou_beta=m.iou_beta)
                self.global_step += 1

                for k, v in logs.items():
                    sums[k] = sums[k] + v if k in sums else v
                count += 1
                if (i + 1) % self.log_every == 0:
                    logger.info("epoch %d step %d loss %.4f (%.2f s/it)",
                                epoch, i + 1, float(logs["loss"]),
                                (time.time() - t0) / (i + 1))
                self._log_scalar("Losses/loss", logs["loss"])
                if self.image_dump_interval > 0 and \
                        self.global_step % self.image_dump_interval == 0:
                    self._dump_visualization(batch)
        m.ingest_state(mstate)

        means = {k: float(v) / max(count, 1) for k, v in sums.items()}
        means["AdaptiveIoU"] = self.metrics[0].get_epoch_value()
        logger.info("epoch %d done: loss %.4f iou %.4f", epoch,
                    means.get("loss", float("nan")), means["AdaptiveIoU"])
        return means

    def validation(self, epoch: int) -> Dict[str, float]:
        assert self.val_loader is not None
        for m in self.val_metrics:
            m.reset_epoch_stats()
        rng = random.Random(f"{self.seed}-{epoch}-val")
        sums: Dict[str, float] = {}
        count = 0
        from ..parallel.mesh import activation_sharding

        m = self.val_metrics[0]
        mstate = m.device_state()
        with self.mesh, activation_sharding(self.mesh):
            for batch in self.val_loader:
                num_iters = rng.randint(1, self.cfg.max_num_next_clicks)
                key = jax.random.key(epoch * 131071 + count)
                thr = state_thresholds(mstate, thresh_step=m.thresh_step)
                logs, ious, valid = eval_step(
                    self.params, self._place(batch), key, thr,
                    cfg=self.cfg, num_iters=num_iters)
                mstate = adaptive_iou_step(
                    mstate, ious, valid, thresh_step=m.thresh_step,
                    thresh_beta=m.thresh_beta, iou_beta=m.iou_beta)
                for k, v in logs.items():
                    sums[k] = sums[k] + v if k in sums else v
                count += 1
        m.ingest_state(mstate)
        means = {k: float(v) / max(count, 1) for k, v in sums.items()}
        means["AdaptiveIoU"] = self.val_metrics[0].get_epoch_value()
        logger.info("val epoch %d: loss %.4f iou %.4f", epoch,
                    means.get("loss", float("nan")), means["AdaptiveIoU"])
        return means

    def _dump_visualization(self, batch) -> None:
        """Periodic qualitative panels (trainer.py:219-220, save_visualization
        at 556-592): first sample's [image + clicks | gt prob map | predicted
        prob map] row, plus a blend row with instance boundaries and the
        FN/FP error map (utils/vis boundary/error helpers)."""
        if self.vis_dir is None or jax.process_index() != 0:
            return
        from ..models.registry import forward_for
        from ..utils.vis import (draw_probmap, draw_with_blend_and_clicks,
                                 error_map, get_boundaries)

        img = np.asarray(batch["image"][0])
        gt = np.asarray(batch["instances"][0, :, :, 0])
        pts = np.asarray(batch["points"][:1])
        fwd = forward_for(self.cfg.model)
        net_in = jnp.concatenate(
            [jnp.asarray(batch["image"][:1]),
             jnp.zeros_like(jnp.asarray(batch["instances"][:1]))], axis=-1)
        out = fwd(self.params, self.cfg.model, net_in, jnp.asarray(pts))
        pred = np.asarray(
            jax.nn.sigmoid(out["instances"][0, :, :, 0].astype(jnp.float32)))

        image_u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
        # reference row (trainer.py:584-591): clicks + probmaps of gt/pred
        # (gt ignore pixels rendered at 0.25, trainer.py:588)
        gt_disp = gt.copy()
        gt_disp[gt_disp < 0] = 0.25
        row1 = np.concatenate([
            # order-coded markers, like the reference's draw_points on the
            # (y, x, indx) rows of the point tensor (trainer.py:584-585)
            draw_with_blend_and_clicks(image_u8, clicks_list=pts[0],
                                       order_markers=True),
            draw_probmap(gt_disp),
            draw_probmap(pred),
        ], axis=1)
        # blend row with instance boundaries + FN/FP error map
        gtb = (gt > 0.5).astype(np.int32)
        blend = draw_with_blend_and_clicks(image_u8, mask=gtb,
                                           clicks_list=pts[0])
        blend[get_boundaries(gtb)] = (255, 255, 255)
        row2 = np.concatenate([
            blend,
            draw_with_blend_and_clicks(image_u8,
                                       mask=(pred > 0.5).astype(int) * 2),
            error_map(gtb, pred > 0.5),
        ], axis=1)
        panel = np.concatenate([row1, row2], axis=0)
        self.vis_dir.mkdir(parents=True, exist_ok=True)
        from PIL import Image
        Image.fromarray(panel).save(
            self.vis_dir / f"{self.global_step:06d}.jpg")

    # --------------------------------------------------------------- chkpoints

    def save(self, epoch: int, name: Optional[str] = None) -> None:
        if self.checkpoint_dir is None or jax.process_index() != 0:
            return
        path = self.checkpoint_dir / (name or f"{epoch:03d}.npz")
        save_checkpoint(path, jax.device_get(self.params),
                        config=self.cfg, opt_state=jax.device_get(self.opt_state),
                        step=self.global_step, extra={"epoch": epoch})
        save_checkpoint(self.checkpoint_dir / "last_checkpoint.npz",
                        jax.device_get(self.params), config=self.cfg,
                        opt_state=jax.device_get(self.opt_state),
                        step=self.global_step, extra={"epoch": epoch})
        logger.info("saved checkpoint %s", path)

    def resume(self, path) -> int:
        params, cfg, step, extra = load_checkpoint(path,
                                                   opt_state_like=self.opt_state)
        with self.mesh:
            self.params = shard_params(params, self.mesh, self.param_mode)
            if "opt_state" in extra:
                self.opt_state = extra["opt_state"]
        self.global_step = step
        self.epoch = int(extra.get("epoch", -1)) + 1
        logger.info("resumed from %s at epoch %d step %d", path, self.epoch,
                    step)
        return self.epoch

    # --------------------------------------------------------------------- run

    def run(self, num_epochs: int, start_epoch: Optional[int] = None,
            validation: bool = False) -> None:
        start = self.epoch if start_epoch is None else start_epoch
        for epoch in range(start, num_epochs):
            self.epoch = epoch
            self.training(epoch)
            if validation and self.val_loader is not None:
                self.validation(epoch)
            if (epoch + 1) % _interval_for_epoch(self.checkpoint_interval,
                                                 epoch) == 0 \
                    or epoch == num_epochs - 1:
                self.save(epoch)
