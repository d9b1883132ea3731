#!/usr/bin/env python3
"""Interactive segmentation demo (reference `demo.py` + `interactive_demo/`).

Two frontends over the same InteractiveController session API
(pvpuformer_tpu/inference/controller.py):

  * headless REPL (default — works over ssh):
        python demo.py --checkpoint ckpt.npz --image photo.jpg
    commands:  p X Y  (positive click)   n X Y  (negative click)
               undo | finish | save OUT.png | vis OUT.jpg | quit
  * Tk GUI (`--gui`): left click = positive, right click = negative,
    buttons for undo / finish object / save (interactive_demo/app.py
    equivalent, minimal).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--image", required=False, default=None)
    p.add_argument("--gui", action="store_true")
    p.add_argument("--prob-thresh", type=float, default=0.5)
    p.add_argument("--target-size", type=int, default=448)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    return p.parse_args()


def build_controller(args):
    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.inference.controller import InteractiveController
    from pvpuformer_tpu.inference.predictor import PredictorConfig
    from pvpuformer_tpu.models.vpu import vpu_base_config, init_vpu
    from pvpuformer_tpu.utils.serialization import load_checkpoint

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.checkpoint:
        params, cfg, _, _ = load_checkpoint(args.checkpoint)
        mcfg = (cfg.model if hasattr(cfg, "model") else cfg).replace(dtype=dtype)
    else:
        assert args.random_weights, "--checkpoint or --random-weights"
        mcfg = vpu_base_config(dtype=dtype)
        params = init_vpu(jax.random.key(0), mcfg)
    ts = mcfg.backbone.img_size if hasattr(mcfg, "backbone") \
        else (args.target_size, args.target_size)
    pcfg = PredictorConfig(model=mcfg, target_size=ts,
                           prob_thresh=0.49)
    return InteractiveController(params, pcfg, prob_thresh=args.prob_thresh)


def load_image(path) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def repl(controller, args) -> None:
    from PIL import Image
    print("commands: p X Y | n X Y | undo | finish | save OUT | vis OUT | quit")
    for line in sys.stdin:
        parts = line.split()
        if not parts:
            continue
        cmd = parts[0].lower()
        try:
            if cmd in ("p", "n"):
                x, y = float(parts[1]), float(parts[2])
                controller.add_click(x, y, cmd == "p")
                area = int((controller.current_object_prob
                            > args.prob_thresh).sum())
                print(f"click #{len(controller.clicks_list)} -> "
                      f"object area {area} px")
            elif cmd == "undo":
                controller.undo_click()
                print(f"{len(controller.clicks_list)} clicks")
            elif cmd == "finish":
                controller.finish_object()
                print(f"object {controller.object_count} saved")
            elif cmd == "save":
                Image.fromarray(controller.result_mask.astype(np.uint16)).save(parts[1])
                print("mask ->", parts[1])
            elif cmd == "vis":
                Image.fromarray(controller.get_visualization()).save(parts[1])
                print("panel ->", parts[1])
            elif cmd in ("quit", "exit", "q"):
                return
            else:
                print("?", cmd)
        except (IndexError, ValueError) as e:
            print("error:", e)


def gui(controller, args) -> None:
    """Minimal Tk frontend (interactive_demo/app.py:14-334 equivalent)."""
    import tkinter as tk
    from PIL import Image, ImageTk

    root = tk.Tk()
    root.title("pvpuformer-tpu demo")
    h, w = controller.image.shape[:2]
    canvas = tk.Canvas(root, width=w, height=h)
    canvas.pack()
    photo = {"img": None}

    def redraw():
        panel = controller.get_visualization()
        photo["img"] = ImageTk.PhotoImage(Image.fromarray(panel))
        canvas.create_image(0, 0, anchor="nw", image=photo["img"])

    def click(event, positive):
        controller.add_click(event.x, event.y, positive)
        redraw()

    canvas.bind("<Button-1>", lambda e: click(e, True))
    canvas.bind("<Button-3>", lambda e: click(e, False))

    bar = tk.Frame(root)
    bar.pack()
    tk.Button(bar, text="undo",
              command=lambda: (controller.undo_click(), redraw())).pack(side="left")
    tk.Button(bar, text="finish object",
              command=lambda: (controller.finish_object(), redraw())).pack(side="left")

    def save():
        from tkinter import filedialog
        path = filedialog.asksaveasfilename(defaultextension=".png")
        if path:
            Image.fromarray(controller.result_mask.astype(np.uint16)).save(path)
    tk.Button(bar, text="save mask", command=save).pack(side="left")

    redraw()
    root.mainloop()


def main() -> None:
    args = parse_args()
    controller = build_controller(args)
    if args.image:
        controller.set_image(load_image(args.image))
    else:
        rng = np.random.default_rng(0)
        controller.set_image(
            (rng.uniform(size=(448, 448, 3)) * 255).astype(np.uint8))
        print("(no --image given: using a random test image)")
    if args.gui:
        gui(controller, args)
    else:
        repl(controller, args)


if __name__ == "__main__":
    main()
