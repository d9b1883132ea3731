#!/usr/bin/env python3
"""Training entry point — config-as-code model scripts.

Mirrors the reference CLI (`train.py:9-106`):

    python train.py models/iSegNet/vpu_base448_cocolvis.py \
        --batch-size 32 --exp-name run1 [--resume-exp 003] [--debug]

The model script (see models/) defines MODEL_NAME and main(cfg); everything
about the model/data/schedule lives there. Paths come from the config.yml
cascade (pvpuformer_tpu/utils/exp.py). There is no --ngpus / NCCL setup: the
script trains over whatever `jax.devices()` offers via a Mesh; multi-host
slices call `jax.distributed.initialize()` first (JAX_COORDINATOR_ADDRESS).
"""
from __future__ import annotations

import argparse
from pathlib import Path

from pvpuformer_tpu.utils.exp import init_experiment, load_module


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_path", help="config-as-code model script")
    p.add_argument("--batch-size", type=int, default=-1)
    p.add_argument("--epochs", type=int, default=-1)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--exp-name", default="")
    p.add_argument("--resume-exp", default=None,
                   help="experiment prefix to resume (e.g. 003)")
    p.add_argument("--resume-prefix", default="last_checkpoint",
                   help="checkpoint file prefix inside the experiment")
    p.add_argument("--start-epoch", type=int, default=-1)
    p.add_argument("--weights", default=None,
                   help="initial weights checkpoint (.npz)")
    p.add_argument("--layerwise-decay", action="store_true")
    p.add_argument("--upsample", default="x1", choices=["x1", "x2", "x4"])
    p.add_argument("--random-split", action="store_true")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--param-mode", default="replicated",
                   choices=["replicated", "fsdp", "tp", "tp+fsdp"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--accumulate-grad", type=int, default=1,
                   help="apply the optimizer every K steps, averaging "
                        "gradients in between (reference train.py "
                        "--accumulate-grad / trainer.py:188-202)")
    p.add_argument("--debug", action="store_true", help="1 epoch smoke run")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (the image pins JAX_PLATFORMS, "
                        "so an env var alone doesn't stick)")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    import os
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        import jax
        jax.distributed.initialize()
    cfg = init_experiment(args.model_path, exp_suffix=args.exp_name,
                          resume_exp=args.resume_exp,
                          repo_root=Path(__file__).parent)
    for k, v in vars(args).items():
        setattr(cfg, k, v)
    model_script = load_module(args.model_path)
    model_script.main(cfg)


if __name__ == "__main__":
    main()
