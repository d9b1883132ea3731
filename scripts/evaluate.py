#!/usr/bin/env python3
"""NoC evaluation CLI — the reference's `scripts/evaluate_vpumodel.py`.

    python scripts/evaluate.py NoBRS --checkpoint ckpt.npz \
        --datasets GrabCut,Berkeley,DAVIS,SBD,PascalVOC \
        [--n-clicks 20] [--target-iou 0.95] [--thresh 0.49] \
        [--iou-analysis] [--print-ious] [--save-ious] [--vis-preds] \
        [--prompt-mode 0|1|2]

Protocol constants follow evaluate_vpumodel.py: 20 clicks max, target IoU
0.95 (1.01 under --iou-analysis), threshold 0.49, flip TTA on, zoom-in target
448 (672 for DAVIS) with skip_clicks=-1 under cvpr mode
(evaluate_vpumodel.py:54-58,87-90,132,187-204). Checkpoints are
self-describing (config embedded); --random-weights builds ViT-B/448 for
pipeline smoke runs. Positional `mode` keeps the reference CLI shape; BRS
optimizers beyond NoBRS plug in via inference/brs.py when present.
"""
from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", nargs="?", default="NoBRS",
                   help="NoBRS / f-BRS-A|B|C / RGB-BRS / DistMap-BRS "
                        "(inference/brs.py) / SAM (segment-anything "
                        "side-by-side, evaluate_sammodel.py equivalent)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--sam-checkpoint", default=None,
                   help="SAM mode: segment_anything checkpoint .pth "
                        "(variant inferred from the filename, "
                        "evaluate_sammodel.py:134-139)")
    p.add_argument("--sam-model-type", default=None,
                   choices=[None, "vit_b", "vit_l", "vit_h"])
    p.add_argument("--sam-multimask", action="store_true",
                   help="multimask_output=True, score-argmax mask selection")
    p.add_argument("--sam-feedback-mask", action="store_true",
                   help="feed previous low-res logits back via mask_input "
                        "(predictors/sam_base.py variant; the reference "
                        "sam_evaluation loop does not)")
    p.add_argument("--random-weights", action="store_true",
                   help="random ViT-B/448 weights (pipeline smoke run)")
    p.add_argument("--model-size", default="base",
                   choices=["base", "large", "huge"],
                   help="model family for --random-weights (BASELINE "
                        "configs 4/5 dress rehearsal: ViT-L / ViT-H)")
    p.add_argument("--exp-path", default=None,
                   help="resolve the checkpoint from the experiments tree "
                        "instead of --checkpoint: 'rel/exp[:prefix]' globs "
                        "<EXPS_PATH>/rel/exp* and picks the newest "
                        "checkpoints/prefix*.npz (evaluate_vpumodel.py:"
                        "211-232)")
    p.add_argument("--cf-n", type=int, default=0,
                   help="CFR-ICL cascade-forward refinement count "
                        "(evaluate_vpumodel.py:162, run_evaluate_vpu.sh)")
    p.add_argument("--cf-click", type=int, default=1,
                   help="apply the cascade only for the first K clicks")
    p.add_argument("--acf", action="store_true",
                   help="adaptive cascade: stop refining when <20 px change")
    p.add_argument("--clicks-limit", type=int, default=None,
                   help="feed only the first K clicks to the network "
                        "(-1 = n-clicks; evaluate_vpumodel.py:167-170)")
    p.add_argument("--eval-ritm", action="store_true",
                   help="RITM eval protocol: zoom-in target 400 (600 for "
                        "DAVIS), skip_clicks=1 (evaluate_vpumodel.py:"
                        "173-185)")
    p.add_argument("--model-name", default=None,
                   help="label printed in the results-table header")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (the image pins JAX_PLATFORMS, "
                        "so an env var alone doesn't stick)")
    p.add_argument("--datasets", default="GrabCut,Berkeley,SBD,DAVIS,"
                                         "PascalVOC,COCO_MVal")
    p.add_argument("--n-clicks", type=int, default=20)
    p.add_argument("--target-iou", type=float, default=0.95)
    p.add_argument("--min-n-clicks", type=int, default=1)
    p.add_argument("--thresh", type=float, default=0.49)
    p.add_argument("--iou-analysis", action="store_true")
    p.add_argument("--print-ious", action="store_true")
    p.add_argument("--save-ious", action="store_true")
    p.add_argument("--vis-preds", action="store_true")
    p.add_argument("--prompt-mode", type=int, default=0, choices=[0, 1, 2],
                   help="0 clicks (shipped protocol) / 1 +boxes / 2 +scribbles")
    p.add_argument("--eval-mode", default="cvpr")
    p.add_argument("--batched", type=int, default=0, metavar="B",
                   help="evaluate B sessions per dispatch (throughput mode; "
                        "0 = sequential, one dispatch per session)")
    p.add_argument("--eval-mesh", type=int, default=0, metavar="D",
                   help="with --batched: shard each session batch over a "
                        "D-device data mesh inside the same program (B must "
                        "divide by D); 0 = single device")
    p.add_argument("--int8", action="store_true",
                   help="PTQ every linear to int8 (per-channel weights + "
                        "dynamic per-token activations; v5e MXU int8 runs "
                        "2x bf16). NoBRS only; serving extension, no "
                        "reference counterpart")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--parity", action="store_true",
                   help="bit-comparability mode vs the torch reference: "
                        "f32 activations + 'highest' matmul precision "
                        "(full-f32 MXU passes) — slower, for NoC parity "
                        "checks with converted reference weights")
    p.add_argument("--logs-path", default="./experiments/evaluation_logs")
    p.add_argument("--config-path", default=None,
                   help="config.yml with dataset paths (default: repo root)")
    p.add_argument("--limit", type=int, default=0,
                   help="evaluate only the first N samples (smoke runs)")
    p.add_argument("--profile", action="store_true",
                   help="per-click latency percentiles + histogram + HBM "
                        "counters (SURVEY §5 tracing equivalent)")
    p.add_argument("--shard", default=None, metavar="I/N",
                   help="evaluate shard I of N (multi-host eval: run one "
                        "shard per host, e.g. 0/4 .. 3/4, with --save-ious; "
                        "then --merge-shards reprints the full table; "
                        "replaces the reference's single-process eval, "
                        "SURVEY §2.8)")
    p.add_argument("--merge-shards", default=None, metavar="GLOB",
                   help="merge the IoU pickles matching GLOB (written by "
                        "per-host --shard --save-ious runs) and reprint the "
                        "combined per-dataset NoC tables; no model is "
                        "loaded")
    return p.parse_args()


DATASET_ZOOM = {"DAVIS": (672, 672)}           # evaluate_vpumodel.py:187-204
DATASET_PATH_KEYS = {
    "GrabCut": "GRABCUT_PATH", "Berkeley": "BERKELEY_PATH",
    "DAVIS": "DAVIS_PATH", "COCO_MVal": "COCO_MVAL_PATH",
    "PascalVOC": "PASCALVOC_PATH", "SBD": "SBD_EVAL_PATH",
    "SBD_Train": "SBD_EVAL_PATH", "BraTS": "BraTS_PATH",
    "ssTEM": "ssTEM_PATH", "OAIZIB": "OAIZIB_PATH",
    "HARD": "HARD_PATH", "ADE20K": "ADE20K_PATH",
}


def resolve_exp_checkpoint(args) -> str:
    """'rel/exp[:prefix]' -> newest <EXPS_PATH>/rel/exp*/checkpoints/prefix*
    (.npz / orbax dir), mirroring get_checkpoints_list_and_logs_path
    (evaluate_vpumodel.py:211-232)."""
    from pvpuformer_tpu.utils.exp import load_config_file

    root = Path(__file__).resolve().parent.parent
    cfg_path = args.config_path or (root / "config.yml")
    paths = load_config_file(cfg_path) if Path(cfg_path).exists() else {}
    exps = Path(paths.get("EXPS_PATH", root / "experiments"))

    rel, _, prefix = args.exp_path.partition(":")
    target = exps / rel
    candidates = sorted(target.parent.glob(target.name + "*"))
    assert candidates, f"no experiment matches {target}*"
    ckpts = sorted((candidates[-1] / "checkpoints").glob(
        (prefix or "") + "*.npz"), reverse=True)
    assert ckpts, f"no checkpoints under {candidates[-1]}/checkpoints"
    return str(ckpts[0])


def build_model(args):
    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.models.vpu import (init_vpu, vpu_base_config,
                                           vpu_huge_config, vpu_large_config)
    from pvpuformer_tpu.utils.serialization import load_checkpoint

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.exp_path and not args.checkpoint:
        args.checkpoint = resolve_exp_checkpoint(args)
    if args.checkpoint:
        params, cfg, _, _ = load_checkpoint(args.checkpoint)
        mcfg = cfg.model if hasattr(cfg, "model") else cfg
        mcfg = mcfg.replace(dtype=dtype)
        return params, mcfg
    assert args.random_weights, "--checkpoint or --random-weights required"
    make = {"base": vpu_base_config, "large": vpu_large_config,
            "huge": vpu_huge_config}[args.model_size]
    mcfg = make(dtype=dtype)
    return init_vpu(jax.random.key(0), mcfg), mcfg


def maybe_interp_pos_embed(params, mcfg, crop):
    """Eval-time pos-embed re-interpolation (pos_embed.py:99-128)."""
    import dataclasses
    from pvpuformer_tpu.utils.torch_ingest import interpolate_pos_embed_np
    if not hasattr(mcfg, "backbone"):   # zoo configs have no pos embed
        return params, mcfg
    if mcfg.backbone.img_size == crop:
        return params, mcfg
    src = mcfg.backbone.grid_size
    bcfg = dataclasses.replace(mcfg.backbone, img_size=crop)
    pos = np.asarray(params["backbone"]["pos_embed"])
    params = dict(params)
    params["backbone"] = dict(params["backbone"])
    params["backbone"]["pos_embed"] = interpolate_pos_embed_np(
        pos, src, bcfg.grid_size)
    return params, mcfg.replace(backbone=bcfg)


def merge_shards(pattern: str, model_name=None) -> None:
    """--merge-shards: combine per-host --shard IoU pickles and reprint the
    full-dataset NoC tables (reference format, inference/utils.py:136-159).
    SPC is recomputed from the summed click count; the Time column shows
    the max shard wall-clock (hosts ran concurrently)."""
    import glob

    from pvpuformer_tpu.inference.evaluation import (
        compute_noc_metric, get_results_table, get_time_metrics,
        merge_shard_pickles)

    paths = sorted(glob.glob(pattern))
    if not paths:
        raise SystemExit(f"--merge-shards: no pickles match {pattern!r}")
    print(f"merging {len(paths)} shard pickle(s):")
    for p in paths:
        print(f"  {p}")
    merged = merge_shard_pickles(paths)
    for (dataset, mode), m in sorted(merged.items()):
        n_clicks = m["n_clicks"] or 20
        mean_spc, _ = get_time_metrics(m["all_ious"], m["elapsed"])
        noc, _, over_max = compute_noc_metric(
            m["all_ious"], iou_thrs=[0.8, 0.85, 0.9, 0.95],
            max_clicks=n_clicks)
        header, row = get_results_table(
            noc, over_max, mode, dataset, mean_spc, m["elapsed_max"],
            n_clicks, model_name=model_name)
        print(f"\n{dataset}: {len(m['all_ious'])} instances from "
              f"{m['shards']} shard(s)")
        print(header)
        print(row)


def main() -> None:
    args = parse_args()
    if args.merge_shards:
        merge_shards(args.merge_shards, model_name=args.model_name)
        return
    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    from pvpuformer_tpu.inference.datasets import get_dataset
    from pvpuformer_tpu.inference.evaluation import (
        compute_noc_metric, evaluate_dataset, get_results_table,
        get_time_metrics, mean_iou_per_click)
    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
    from pvpuformer_tpu.utils.exp import load_config_file

    root = Path(__file__).resolve().parent.parent
    cfg_path = args.config_path or (root / "config.yml")
    paths = load_config_file(cfg_path) if Path(cfg_path).exists() else {}

    if args.parity:
        import jax
        args.dtype = "float32"
        jax.config.update("jax_default_matmul_precision", "highest")

    sam_mode = args.mode.upper() == "SAM"
    if sam_mode:
        params = mcfg = None
    else:
        params, mcfg = build_model(args)
    target_iou = 1.01 if args.iou_analysis else args.target_iou

    logs_dir = Path(args.logs_path)
    logs_dir.mkdir(parents=True, exist_ok=True)

    for name in args.datasets.split(","):
        name = name.strip()
        if name == "Synthetic":
            dataset = get_dataset("Synthetic")
        else:
            key = DATASET_PATH_KEYS.get(name)
            path = paths.get(key) if key else None
            if not path or not Path(path).exists():
                print(f"[skip] {name}: dataset path not found "
                      f"({key}={path}) — set it in config.yml")
                continue
            dataset = get_dataset(name, path)
        if args.limit:
            dataset = _limited(dataset, args.limit)
        if args.shard:
            si, sn = (int(v) for v in args.shard.split("/"))
            dataset = _sharded(dataset, si, sn)

        if sam_mode:
            from pvpuformer_tpu.inference.sam_compat import SamCompatPredictor
            predictor = SamCompatPredictor(
                checkpoint=args.sam_checkpoint,
                model_type=args.sam_model_type,
                multimask=args.sam_multimask,
                feedback_mask=args.sam_feedback_mask)
        else:
            # VPU-style configs carry the trained crop; conv/Swin zoo configs
            # are size-agnostic — default their zoom-in target to 448².
            # "fixedH[,W]" overrides the per-dataset zoom targets
            # (evaluate_vpumodel.py:188-202); "cvpr" keeps them.
            default_crop = tuple(mcfg.backbone.img_size) \
                if hasattr(mcfg, "backbone") else (448, 448)
            skip_clicks = -1
            if args.eval_mode.startswith("fixed"):
                sizes = args.eval_mode.split(",")
                ch = int(sizes[0][5:])
                cw = int(sizes[1]) if len(sizes) == 2 else ch
                crop = (ch, cw)
            elif args.eval_ritm:
                # RITM protocol (evaluate_vpumodel.py:173-185 + the RITM
                # ZoomIn default skip_clicks=1, zoom_in.py:12)
                crop = (600, 600) if name == "DAVIS" else (400, 400)
                skip_clicks = 1
            else:
                crop = DATASET_ZOOM.get(name, default_crop)
            clicks_limit = args.clicks_limit
            if clicks_limit == -1:
                clicks_limit = args.n_clicks
            ds_params, ds_mcfg = maybe_interp_pos_embed(params, mcfg, crop)
            pcfg = PredictorConfig(model=ds_mcfg, target_size=crop,
                                   with_flip=True, prob_thresh=args.thresh,
                                   skip_clicks=skip_clicks,
                                   prompt_mode=args.prompt_mode,
                                   cascade_step=args.cf_n + 1,
                                   cascade_adaptive=args.acf,
                                   cascade_clicks=args.cf_click,
                                   net_clicks_limit=clicks_limit)
            if args.mode.lower() == "nobrs":
                predictor = Predictor(ds_params, pcfg, int8=args.int8)
            else:
                assert not args.int8, \
                    "--int8 is NoBRS-only (BRS differentiates the forward; " \
                    "the int8 rounding has no useful gradient)"
                from pvpuformer_tpu.inference.brs import get_predictor
                predictor = get_predictor(ds_params, pcfg,
                                          brs_mode=args.mode)

        vis_callback = _make_vis_callback(logs_dir / "vis" / name,
                                          prompt_mode=args.prompt_mode,
                                          prob_thresh=args.thresh) \
            if args.vis_preds else None
        if args.batched > 0 and vis_callback is None:
            assert args.mode.lower() == "nobrs", \
                "--batched supports NoBRS only"
            from pvpuformer_tpu.inference.batched import BatchedEvaluator
            mesh = None
            if args.eval_mesh:
                from pvpuformer_tpu.parallel.mesh import make_mesh
                mesh = make_mesh(args.eval_mesh)
            bev = BatchedEvaluator(ds_params, pcfg, batch_size=args.batched,
                                   mesh=mesh, int8=args.int8)
            all_ious, elapsed, stats = bev.evaluate(
                dataset, max_clicks=args.n_clicks, max_iou_thr=target_iou,
                min_clicks=args.min_n_clicks)
            print(f"throughput: {stats['objects_per_sec']:.3f} obj/s, "
                  f"{stats['clicks_per_sec']:.2f} clicks/s")
        else:
            recorder = None
            if args.profile:
                from pvpuformer_tpu.utils.profiling import LatencyRecorder
                recorder = LatencyRecorder()
                orig_next = predictor.next_click

                def timed_next():
                    with recorder.measure():
                        return orig_next()
                predictor.next_click = timed_next
                # per-click path so every click is individually timed
                vis_callback = vis_callback or (lambda *a: None)
            all_ious, elapsed = evaluate_dataset(
                dataset, predictor, max_iou_thr=target_iou,
                pred_thr=args.thresh, min_clicks=args.min_n_clicks,
                max_clicks=args.n_clicks, callback=vis_callback,
                progress=True)
            if recorder is not None and recorder.samples_ms:
                print("per-click latency:", recorder.summary())
                counts, edges = recorder.histogram(bins=10)
                for c, lo, hi in zip(counts, edges[:-1], edges[1:]):
                    print(f"  {lo:8.2f}-{hi:8.2f} ms: {'#' * int(c)}")
                from pvpuformer_tpu.utils.profiling import memory_stats
                print("memory:", memory_stats())

        mean_spc, mean_spi = get_time_metrics(all_ious, elapsed)
        noc, _, over_max = compute_noc_metric(
            all_ious, iou_thrs=[0.8, 0.85, 0.9, 0.95],
            max_clicks=args.n_clicks)
        header, row = get_results_table(noc, over_max, args.mode, name,
                                        mean_spc, elapsed, args.n_clicks,
                                        model_name=args.model_name)
        print(header)
        print(row)
        print(f"SPI: {mean_spi:.3f}s per instance")

        if args.print_ious:
            miou = mean_iou_per_click(all_ious, max_clicks=args.n_clicks)
            print("mIoU@k:", np.array2string(miou, precision=4))
        if args.save_ious or args.iou_analysis:
            shard_tag = (f"_s{args.shard.replace('/', 'of')}"
                         if args.shard else "")
            out = logs_dir / (f"{name}_{args.eval_mode}_{args.mode}"
                              f"_{args.n_clicks}{shard_tag}.pickle")
            with open(out, "wb") as f:
                pickle.dump({"all_ious": all_ious, "dataset": name,
                             "mode": args.mode, "elapsed": elapsed,
                             "n_clicks": args.n_clicks}, f)
            print("saved IoU curves to", out)


def _sharded(dataset, index, count):
    ids = list(range(index, len(dataset), count))

    class Sharded:
        def __len__(self):
            return len(ids)

        def get_sample(self, i):
            return dataset.get_sample(ids[i])

        name = getattr(dataset, "name", "sharded")
    return Sharded()


def _limited(dataset, n):
    class Limited:
        def __len__(self):
            return min(n, len(dataset))

        def get_sample(self, i):
            return dataset.get_sample(i)

        name = getattr(dataset, "name", "limited")
    return Limited()


def _display_box(gt_mask, probs, prob_thresh):
    """Host-side recompute of the round's box prompt for display (the
    device-side box of prompt_mode=1: bbox of the dominant FN/FP connected
    region, cal_box semantics, trainer.py:1061-1131 / prompt_sim.synth_boxes
    with jitter off)."""
    from scipy import ndimage
    gtb = gt_mask > 0.5
    pred = probs > prob_thresh
    fn = gtb & ~pred
    fp = ~gtb & pred
    err = fn if fn.sum() > fp.sum() else fp
    if not err.any():
        return None
    lab, n = ndimage.label(err, structure=np.ones((3, 3)))
    sizes = np.bincount(lab.ravel())
    sizes[0] = 0
    keep = (lab == sizes.argmax()) | (sizes[lab] > 0.1 * err.sum())
    ys, xs = np.nonzero(err & keep)
    y0, y1, x0, x1 = ys.min(), ys.max(), xs.min(), xs.max()
    return np.array([(x0 + x1) // 2, (y0 + y1) // 2, x1 - x0, y1 - y0, 0])


def _make_vis_callback(out_dir: Path, prompt_mode: int = 0,
                       prob_thresh: float = 0.49):
    """Reference-grade qualitative dump (evaluate_vpumodel.py:326-427): one
    2x3 panel row per click — gt blends, pred blend with the round's
    prompts, FN/FP error map with prompts, prob map, pred mask annotated
    with IoU/NoC — stacked vertically across clicks into one jpg per
    sample."""
    out_dir.mkdir(parents=True, exist_ok=True)
    cache = {}

    def callback(image, gt_mask, probs, iou, sample_id, click_indx, clicks):
        from pvpuformer_tpu.utils.vis import eval_panel
        from PIL import Image
        boxes = _display_box(gt_mask, probs, prob_thresh) \
            if prompt_mode == 1 else None
        panel = eval_panel(image, gt_mask, probs, iou, click_indx,
                           clicks_list=clicks, boxes=boxes,
                           prompt_type=prompt_mode, prob_thresh=prob_thresh)
        if cache.get("sample_id") != sample_id or \
                cache.get("click_indx", -1) > click_indx:
            cache["sample_id"] = sample_id
            cache["plot"] = None
        cache["click_indx"] = click_indx
        if cache.get("plot") is not None:
            panel = np.concatenate([cache["plot"], panel], axis=0)
        cache["plot"] = panel
        Image.fromarray(panel).save(out_dir / f"{sample_id}.jpg")

    return callback


if __name__ == "__main__":
    main()
