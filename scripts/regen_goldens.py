#!/usr/bin/env python3
"""Regenerate the golden regression files in tests/.

Goldens pin semantics certified elsewhere so that a later regression is
caught by the FAST suite, without torch or /root/reference mounted:

  * golden_click_loop.json  — the fused click loop (certified bit-exact vs
    the reference's evaluate_sample/Clicker/BasePredictor loop in
    tests/test_reference_direct.py::test_click_protocol...).
  * golden_prompt_loop.json — the box/scribble prompt protocols
    (prompt_mode=1/2 x as_multi_prompts; certified in
    test_prompt_protocol_matches_reference_eval_loop): per-variant IoU
    curves + final click tensors of 4-click sessions on the tiny model,
    PLUS fixed-input pins of the prompt-synthesis primitives themselves
    (synth_boxes / _append_error_click / _rewrite_points_box /
    _rewrite_points_scribble / synth_scribbles).

Regenerate DELIBERATELY when semantics change and say why in the commit
(CLAUDE.md conventions):

    JAX_PLATFORMS=cpu python scripts/regen_goldens.py [--only click|prompt]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def _round(x, nd=6):
    return np.round(np.asarray(x, np.float64), nd).tolist()


def _session_golden(tiny_cfg, variants):
    import jax
    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
    from pvpuformer_tpu.models.vpu import init_vpu

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    r = np.random.default_rng(7)
    image = (r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    gt = np.zeros((64, 64), np.float32)
    gt[14:50, 18:46] = 1.0

    out = {}
    for name, mode, multi in variants:
        cfg = PredictorConfig(model=mcfg, target_size=(64, 64),
                              min_crop_size=32, prompt_mode=mode,
                              as_multi_prompts=multi,
                              deterministic_prompts=True)
        pred = Predictor(params, cfg)
        pred.set_input(image, gt)
        ious, prob_means = [], []
        for _ in range(4):
            ious.append(pred.next_click())
            # thresholded IoU saturates on random weights; the mean
            # probability is sensitive to the full prompt path numerics
            prob_means.append(float(pred.probs.mean()))
        out[name] = {"ious": _round(ious),
                     "prob_means": _round(prob_means),
                     "clicks": _round(pred.clicks)}
    return out


def _synth_golden():
    """Fixed-input pins of the certified prompt-synthesis primitives."""
    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.engine.prompt_sim import synth_boxes, synth_scribbles
    from pvpuformer_tpu.inference.predictor import (
        _append_error_click, _rewrite_points_box, _rewrite_points_scribble)

    h, w = 48, 64
    yy, xx = np.mgrid[:h, :w]
    gt = ((((yy - 22.0) / 14.0) ** 2 + ((xx - 30.0) / 20.0) ** 2) <= 1.0)
    prev = ((((yy - 26.0) / 12.0) ** 2 + ((xx - 36.0) / 16.0) ** 2) <= 1.0)
    gt_j = jnp.asarray(gt[None].astype(np.float32))
    prev_j = jnp.asarray(prev[None].astype(np.float32)) * 0.9
    gtb = gt_j > 0.5
    fn = gtb & (prev_j < 0.49)
    fp = (~gtb) & (prev_j > 0.49)

    n = 6                                    # half capacity
    pts = np.full((1, 2 * n, 3), -1.0, np.float32)
    pts[0, 0] = (22.0, 30.0, 0.0)            # one positive click
    pts[0, n] = (40.0, 52.0, 1.0)            # one negative click
    pts_j = jnp.asarray(pts)
    key = jax.random.key(3)
    n_dyn = jnp.int32(2)

    boxes = synth_boxes(gt_j, fn, fp, pts_j, key, as_allmask=False,
                        jitter=False, n_dyn=n_dyn)
    err_pts = _append_error_click(prev_j, gt_j, pts_j, n_dyn, key, True, 0.49)
    rw_box_first = _rewrite_points_box(pts_j, gtb, key, n_dyn,
                                       jnp.asarray(True), True)
    rw_box_later = _rewrite_points_box(pts_j, gtb, key, n_dyn,
                                       jnp.asarray(False), True)
    rw_scr_first = _rewrite_points_scribble(pts_j, gtb, key, n_dyn,
                                            jnp.asarray(True), True)
    rw_scr_later = _rewrite_points_scribble(pts_j, gtb, key, n_dyn,
                                            jnp.asarray(False), True)
    scr, rects = synth_scribbles(gt_j, key, num_samples=1000)

    return {
        "boxes": _round(boxes),
        "error_click_points": _round(err_pts),
        "rewrite_box_first": _round(rw_box_first),
        "rewrite_box_later": _round(rw_box_later),
        "rewrite_scribble_first": _round(rw_scr_first),
        "rewrite_scribble_later": _round(rw_scr_later),
        "scribble_rects": _round(rects),
        "scribble_curve": _round(scr, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["click", "prompt"], default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from test_models import tiny_cfg

    tests = REPO / "tests"
    if args.only in (None, "click"):
        import jax as _j
        from pvpuformer_tpu.inference.predictor import (Predictor,
                                                        PredictorConfig)
        from pvpuformer_tpu.models.vpu import init_vpu
        mcfg = tiny_cfg()
        params = init_vpu(_j.random.key(0), mcfg)
        cfg = PredictorConfig(model=mcfg, target_size=(64, 64),
                              min_crop_size=32)
        pred = Predictor(params, cfg)
        r = np.random.default_rng(7)
        image = (r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
        gt = np.zeros((64, 64), np.float32)
        gt[14:50, 18:46] = 1.0
        pred.set_input(image, gt)
        ious = [pred.next_click() for _ in range(5)]
        golden = {"ious": _round(ious), "clicks": _round(pred.clicks)}
        (tests / "golden_click_loop.json").write_text(
            json.dumps(golden, indent=1))
        print("wrote golden_click_loop.json")

    if args.only in (None, "prompt"):
        golden = {
            "sessions": _session_golden(
                tiny_cfg, [("mode1_multi", 1, True),
                           ("mode1_points", 1, False),
                           ("mode2_multi", 2, True),
                           ("mode2_points", 2, False)]),
            "synth": _synth_golden(),
        }
        (tests / "golden_prompt_loop.json").write_text(
            json.dumps(golden, indent=1))
        print("wrote golden_prompt_loop.json")


if __name__ == "__main__":
    main()
