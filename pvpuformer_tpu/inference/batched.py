"""Batched multi-instance evaluation — throughput mode.

The reference evaluates one (image, object) at a time (single process,
`scripts/evaluate_vpumodel.py:85`, SURVEY §2.8 "eval parallelism: none").
On TPU the full interactive session is a pure function of SessionState
(inference/predictor.py), so B sessions run as ONE program: `vmap` over the
stacked states, `scan` over the 20 click rounds. The flip-TTA forward then
sees batch 2B — MXU utilization scales with B instead of stalling at 2 —
and the per-object dispatch/readback cost is amortized B ways. This is
BASELINE config 5 ("batched multi-instance eval, throughput stress").

Sessions are grouped by canvas bucket so shapes stay static; each group pads
to the batch size with dummy sessions (masked out of the results).
"""
from __future__ import annotations

import functools
import time
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .predictor import (PredictorConfig, SessionState, click_scan,
                        init_session)


@functools.partial(jax.jit, static_argnames=("cfg", "num_clicks"))
def batched_click_scan(params, cfg: PredictorConfig, states: SessionState,
                       num_clicks: int):
    """states: SessionState with a leading batch axis on every leaf.
    Returns (final states, ious (B, num_clicks))."""
    return jax.vmap(lambda st: click_scan(params, cfg, st, num_clicks))(states)


def _stack_states(states: Sequence[SessionState]) -> SessionState:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def resolve_batched_cfg(cfg: PredictorConfig, batch_size: int,
                        mesh=None, int8: bool = False) -> PredictorConfig:
    """The shipped batched-mode configuration (also what profile_batched
    times as the tracked metric).

    * EDT selection (measured, scripts/profile_batched.py 2026-08-21,
      b16x448^2x20): one unchunked min-plus block + the dense pass-1 ->
      204.3 clicks/s vs 179.6 for the single-session defaults (chunk=32/
      scan there wins VMEM competition with the b2 model; across 16
      vmapped sessions the big fused reductions win). Outputs are
      bit-identical (test_squared_edt_dense_rows_bit_identical).
    * Attention: the model's "auto" resolution sees only the INNER flip
      batch (the sessions axis is added by vmap in batched_click_scan), so
      it would pick the dense path; fold the vmapped session count into
      the score-work estimate here, where it is known, and pin the fused
      kernel when the combined batch clears the crossover.
    """
    import dataclasses

    cfg = dataclasses.replace(cfg, edt_chunk=None, edt_rows="dense")
    bb = cfg.model.backbone
    multi_dev = mesh is not None and mesh.devices.size > 1
    # multi_dev: keep dense — GSPMD has no pallas_call partitioning rule
    # (same guard as the "auto" resolution in models/vit.block_forward)
    if (not int8 and not multi_dev and jax.default_backend() == "tpu"
            and bb.attn_impl == "auto"):
        from ..ops.fused_attention import MIN_SCORE_WORK
        per_dev = batch_size // (mesh.shape["data"] if mesh is not None
                                 else 1)
        eff_b = per_dev * (2 if cfg.with_flip else 1)
        n = bb.grid_size[0] * bb.grid_size[1]
        if eff_b * bb.num_heads * n * n >= MIN_SCORE_WORK:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model,
                    backbone=dataclasses.replace(bb, attn_impl="fused")))
    return cfg


class BatchedEvaluator:
    """Evaluate a dataset B sessions at a time.

    With `mesh`, sessions are additionally sharded over the mesh's `data`
    axis inside the same program (scale-out eval the reference never had,
    SURVEY §2.8: "eval parallelism: none"): params are replicated once,
    each device runs batch_size/|data| sessions, and the only cross-device
    traffic is the result gather. batch_size must divide by the data-axis
    size (the padding below already rounds every group up to batch_size).
    """

    def __init__(self, params, cfg: PredictorConfig, batch_size: int = 8,
                 mesh=None, int8: bool = False):
        from ..nn import cast_params
        self.params = cast_params(params, cfg.model.dtype)
        if int8:
            from ..nn import quantize_params
            self.params = quantize_params(self.params)
        self.cfg = resolve_batched_cfg(cfg, batch_size, mesh, int8=int8)
        self.batch_size = batch_size
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import shard_params
            assert batch_size % mesh.shape["data"] == 0, \
                (batch_size, dict(mesh.shape))
            self.params = shard_params(self.params, mesh)

    def _canvas(self, h: int, w: int) -> Tuple[int, int]:
        b = self.cfg.canvas_bucket
        return (-(-h // b) * b, -(-w // b) * b)

    def evaluate(self, dataset, max_clicks: int = 20,
                 max_iou_thr: float = 0.95, min_clicks: int = 1
                 ) -> Tuple[List[np.ndarray], float, Dict[str, float]]:
        """Returns (per-object IoU curves in dataset order, elapsed seconds,
        stats {objects_per_sec, clicks_per_sec})."""
        n = self.cfg.model.num_max_points

        # gather all (canvas, order_index, session) then group by canvas
        groups: Dict[Tuple[int, int], List[Tuple[int, SessionState]]] = {}
        order = 0
        for index in range(len(dataset)):
            sample = dataset.get_sample(index)
            for obj_id in sample.objects_ids:
                canvas = self._canvas(*sample.image.shape[:2])
                st = init_session(sample.image, sample.gt_mask(obj_id), n,
                                  canvas)
                groups.setdefault(canvas, []).append((order, st))
                order += 1

        curves: List = [None] * order
        start = time.time()
        total_clicks = 0
        for canvas, items in groups.items():
            for lo in range(0, len(items), self.batch_size):
                chunk = items[lo:lo + self.batch_size]
                pad = self.batch_size - len(chunk)
                states = [st for _, st in chunk] + \
                    [chunk[-1][1]] * pad               # pad with a duplicate
                stacked = _stack_states(states)
                if self.mesh is not None:
                    from ..parallel.mesh import (activation_sharding,
                                                 shard_batch)
                    stacked = shard_batch(stacked, self.mesh)
                    with self.mesh, activation_sharding(self.mesh):
                        _, ious = batched_click_scan(
                            self.params, self.cfg, stacked, max_clicks)
                else:
                    _, ious = batched_click_scan(self.params, self.cfg,
                                                 stacked, max_clicks)
                ious = np.asarray(ious)
                for (idx, _), curve in zip(chunk, ious):
                    over = np.nonzero(curve[min_clicks - 1:] >= max_iou_thr)[0]
                    k = (over[0] + min_clicks) if len(over) else max_clicks
                    curves[idx] = curve[:k].astype(np.float32)
                    total_clicks += k
        elapsed = time.time() - start
        stats = {
            "objects_per_sec": order / max(elapsed, 1e-9),
            "clicks_per_sec": total_clicks / max(elapsed, 1e-9),
        }
        return curves, elapsed, stats
