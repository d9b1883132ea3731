#!/usr/bin/env python3
"""AOT-compile the train step and print its HBM footprint (no execution).

The shipped recipe is batch 32 with up to 3 iterloss rounds
(models/iSegNet/vpu_base448_cocolvis.py); this checks that each
(num_iters, remat) variant actually fits the 16G v5e HBM by compiling
ahead-of-time and reading the executable's memory analysis — a compile-only
probe, so it can't wedge anything by dying mid-run.

    python scripts/hbm_fit.py [--batch 32] [--iters 1 2 3] [--no-remat]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--crop", type=int, default=448)
    p.add_argument("--iters", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--remat", dest="remat", action="store_true", default=True)
    p.add_argument("--no-remat", dest="remat", action="store_false")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.engine.optimizer import make_optimizer
    from pvpuformer_tpu.engine.train_step import TrainConfig, train_step
    from pvpuformer_tpu.models.vpu import init_vpu, vpu_base_config

    b, hw = args.batch, args.crop
    mcfg = vpu_base_config(crop=(hw, hw), dtype=jnp.bfloat16)
    cfg = TrainConfig(model=mcfg, remat=args.remat)
    params = init_vpu(jax.random.key(0), mcfg)
    tx = make_optimizer(params, "adam", lr=5e-5, milestones=(190, 210),
                        gamma=0.1, steps_per_epoch=10, layerwise_decay=False)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    n = mcfg.num_max_points
    batch = {
        "image": jnp.asarray(rng.uniform(size=(b, hw, hw, 3)),
                             jnp.bfloat16),
        "instances": jnp.asarray(
            rng.uniform(size=(b, hw, hw, 1)) > 0.5, jnp.float32),
        "points": jnp.asarray(rng.uniform(size=(b, 2 * n, 3)) * hw,
                              jnp.float32),
        "scribbles": jnp.zeros((b, 64, 2), jnp.float32),
        "scribble_rects": jnp.zeros((b, 4), jnp.float32),
    }
    thr = jnp.asarray([0.4])
    key = jax.random.key(1)

    for ni in args.iters:
        fn = jax.jit(
            lambda p_, o_, bt, k_, t_: train_step(
                p_, o_, bt, k_, t_, cfg=cfg, tx=tx, num_iters=ni),
            donate_argnums=(0, 1))
        try:
            compiled = fn.lower(params, opt_state, batch, key, thr).compile()
        except Exception as e:  # OOM comes back as a compile error
            msg = str(e).splitlines()
            oom = next((l for l in msg if "Ran out of memory" in l), None) \
                or next((l for l in msg if "memory" in l.lower()), msg[0])
            i = oom.find("Ran out of memory")
            print(f"ni={ni} remat={args.remat} b{b}: COMPILE FAILED — "
                  f"{oom[max(i, 0):][:200].strip()}")
            continue
        m = compiled.memory_analysis()
        g = 1 / 2**30
        print(f"ni={ni} remat={args.remat} b{b}: "
              f"temp {m.temp_size_in_bytes * g:.2f}G "
              f"args {m.argument_size_in_bytes * g:.2f}G "
              f"out {m.output_size_in_bytes * g:.2f}G "
              f"(alias {m.alias_size_in_bytes * g:.2f}G) "
              f"gen {m.generated_code_size_in_bytes / 2**20:.0f}M")


if __name__ == "__main__":
    main()
