"""Worker process for the TRUE multi-process (multi-host) integration test.

The reference's data parallelism actually runs as multiple processes
(`torch.distributed.init_process_group('nccl', init_method='env://')`,
/root/reference/isegm/utils/exp.py:29-32; DDP wrap + DistributedSampler,
/root/reference/isegm/utils/distributed.py:50-67). Our equivalent is a
process-spanning `jax.sharding.Mesh`: each process calls
`jax.distributed.initialize`, owns a slice of the devices, loads its own
shard of every global batch (data/loader.py process_index striding), and the
jitted `train_step` runs SPMD over the global mesh with gloo collectives.

This module is both
  * a script: `python tests/mp_train_worker.py --process-id I
    --num-processes N --port P --out f.json [--steps K] [--mode train|eval]`
    pinned to 8//N local CPU devices, and
  * an import for tests/test_multiprocess.py, which reuses `tiny_cfg` /
    `make_dataset` / `run_train_steps` to produce the single-process
    8-device reference trajectory the two-process run must reproduce.

Env pinning (JAX_PLATFORMS=cpu + device count) must happen before jax's
backend initializes, hence the module-import guard below mirrors
tests/conftest.py rather than relying on the launcher's env alone.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _pin_cpu_devices(n: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}").strip()


def tiny_cfg():
    """The dryrun's tiny ViT-B-shaped recipe (embed 64, depth 4, 64^2)."""
    from pvpuformer_tpu.models.fpn import NeckConfig
    from pvpuformer_tpu.models.seg_head import HeadConfig
    from pvpuformer_tpu.models.two_way import TwoWayConfig
    from pvpuformer_tpu.models.vit import ViTConfig
    from pvpuformer_tpu.models.vpu import VPUConfig

    return VPUConfig(
        backbone=ViTConfig(img_size=(64, 64), patch_size=(16, 16),
                           embed_dim=64, depth=4, num_heads=2),
        neck=NeckConfig(in_dim=64, out_dims=(16, 32, 48, 64),
                        img_size=(64, 64), hide_dim=64,
                        two_way=TwoWayConfig(depth=3, embedding_dim=64,
                                             num_heads=4, mlp_dim=64)),
        head=HeadConfig(in_channels=(16, 32, 48, 64), channels=32,
                        d_model=64),
        num_max_points=6,
    )


class _RecordDataset:
    """Deterministic in-memory dataset of fixed-shape training records —
    what data/loader.py sees; record i depends only on i."""

    def __init__(self, n: int = 64, hw: int = 64, nmp: int = 6):
        self.n, self.hw, self.nmp = n, hw, nmp

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int):
        r = np.random.default_rng((777, i))
        hw = self.hw
        gt = np.zeros((hw, hw, 1), np.float32)
        y, x = r.integers(8, hw - 24, 2)
        gt[y:y + 16, x:x + 16, 0] = 1.0
        points = np.full((2 * self.nmp, 3), -1.0, np.float32)
        points[0] = (y + 8, x + 8, 0)
        return {
            "image": r.uniform(size=(hw, hw, 3)).astype(np.float32),
            "instances": gt,
            "points": points,
            "scribbles": np.zeros((50, 2), np.float32),
            "scribble_rects": np.zeros((4,), np.float32),
        }


def make_dataset():
    return _RecordDataset()


def make_loader(process_index: int, process_count: int, global_batch: int = 8):
    from pvpuformer_tpu.data.loader import Loader

    return Loader(make_dataset(), batch_size=global_batch, shuffle=True,
                  seed=5, num_workers=1, process_index=process_index,
                  process_count=process_count)


def global_batch_order(global_batch: int = 8, process_count: int = 2):
    """Row order of the GLOBAL device array when `process_count` loaders
    each contribute their local shard: process p owns the contiguous device
    slice [p*local : (p+1)*local), so the global array is the concatenation
    of the per-process local shards (each strided order[lo+p::pcount])."""
    loaders = [make_loader(p, process_count, global_batch)
               for p in range(process_count)]
    for batches in zip(*(iter(ld) for ld in loaders)):
        yield {k: np.concatenate([b[k] for b in batches])
               for k in batches[0]}


def run_train_steps(mesh, local_batches, *, steps: int, num_iters: int = 2):
    """The shared training trajectory: tiny recipe, adam, fixed keys.

    `local_batches` yields this process's LOCAL shard of each global batch;
    under multi-process each leaf is lifted to a global array with
    jax.make_array_from_process_local_data. Single-process (the reference
    trajectory) passes full global batches — same code path, pcount=1.
    Returns (losses per step, L1 checksum of the final params).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pvpuformer_tpu.engine.optimizer import make_optimizer
    from pvpuformer_tpu.engine.train_step import TrainConfig, train_step
    from pvpuformer_tpu.models.vpu import init_vpu

    mcfg = tiny_cfg()
    cfg = TrainConfig(model=mcfg)
    params = init_vpu(jax.random.key(0), mcfg)
    tx = make_optimizer(params, "adam", lr=1e-3, milestones=(190, 210),
                        gamma=0.1, steps_per_epoch=10)
    opt_state = tx.init(params)
    thr = jnp.asarray([0.4, 0.375, 0.425])

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def to_global(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    # params/opt/thr identical in every process (same init key) -> lift to
    # fully-replicated global arrays
    params = jax.tree_util.tree_map(lambda x: to_global(x, repl), params)
    opt_state = jax.tree_util.tree_map(
        lambda x: to_global(x, repl) if hasattr(x, "shape") else x, opt_state)
    thr = to_global(thr, repl)

    losses = []
    with mesh:
        for step, local in zip(range(steps), local_batches):
            gbatch = {k: to_global(v, data) for k, v in local.items()}
            params, opt_state, logs, ious, valid = train_step(
                params, opt_state, gbatch, jax.random.key(step), thr,
                cfg=cfg, tx=tx, num_iters=num_iters)
            losses.append(float(logs["loss"]))
    checksum = float(sum(
        jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
        for leaf in jax.tree_util.tree_leaves(params)))
    return losses, checksum


def _main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--total-devices", type=int, default=8)
    args = ap.parse_args()

    assert args.total_devices % args.num_processes == 0
    _pin_cpu_devices(args.total_devices // args.num_processes)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes, process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == args.total_devices

    from jax.sharding import Mesh

    # process-spanning mesh over ALL global devices (each process only
    # addresses its own slice). global_batch_order() in the single-process
    # reference assumes device order groups by process — assert it.
    devs = jax.devices()
    local = args.total_devices // args.num_processes
    assert all(d.process_index == i // local for i, d in enumerate(devs)), \
        [(i, d.process_index) for i, d in enumerate(devs)]
    mesh = Mesh(np.asarray(devs).reshape(args.total_devices, 1),
                ("data", "model"))

    loader = make_loader(jax.process_index(), jax.process_count())
    losses, checksum = run_train_steps(mesh, iter(loader), steps=args.steps)

    Path(args.out).write_text(json.dumps({
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "n_global_devices": len(jax.devices()),
        "losses": losses,
        "checksum": checksum,
    }))
    print(f"[proc {args.process_id}] losses={losses} checksum={checksum}",
          flush=True)


if __name__ == "__main__":
    _main()
