#!/usr/bin/env python3
"""Training-step component profile on the ambient device (TPU).

Decomposes the iterloss train step (ViT-B@448, batch 8 by default) into its
device-time components with the tunnel-safe carry-threaded timer
(utils/profiling.device_time_per_call):

  * grad(iterloss_forward) at num_iters 1..3 — the full step minus the
    (cheap) optax update;
  * plain fwd+bwd of the model on fixed prompts (no prompt simulation);
  * the prompt-simulation pieces: dist_maps rasterization, EDT next-click,
    connected-components box synthesis.

Usage: python scripts/profile_train.py [--batch 8] [--crop 448]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--crop", type=int, default=448)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    # remat defaults ON to match the shipped TrainConfig.remat=True — the
    # published numbers must be the shipped configuration (VERDICT r3 #4).
    # NOTE: --full-step's iterloss path accumulates per-round grads
    # (train_step._iterloss_loop with_grads=True) where remat is moot; the
    # flag still A/Bs the component mode's joint grad(iterloss_forward).
    p.add_argument("--remat", dest="remat", action="store_true",
                   default=True, help=argparse.SUPPRESS)
    p.add_argument("--no-remat", dest="remat", action="store_false",
                   help="disable jax.checkpoint per round (A/B: trades HBM "
                        "for recompute; shipped default is on; ignored by "
                        "--full-step's per-round-grad iterloss path)")
    p.add_argument("--full-step", action="store_true",
                   help="time the COMPLETE train_step (optimizer included) "
                        "async-pipelined like the trainer, instead of the "
                        "component breakdown; reports ms/step + samples/s")
    p.add_argument("--platform", default="ambient",
                   choices=["ambient", "cpu"],
                   help="cpu forces the host backend via jax.config (env "
                        "vars alone get re-pinned by the image's "
                        "sitecustomize — see tests/conftest.py)")
    args = p.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pvpuformer_tpu.engine.train_step import TrainConfig, iterloss_forward
    from pvpuformer_tpu.models.vpu import (vpu_base_config, init_vpu,
                                           vpu_forward)
    from pvpuformer_tpu.engine import losses as L
    from pvpuformer_tpu.engine.prompt_sim import (next_clicks, synth_boxes,
                                                  cc_labels)
    from pvpuformer_tpu.ops.distmaps import dist_maps
    from pvpuformer_tpu.utils.profiling import device_time_per_call

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b, hw = args.batch, args.crop
    mcfg = vpu_base_config(crop=(hw, hw), dtype=dtype)
    cfg = TrainConfig(model=mcfg, remat=args.remat)
    params = init_vpu(jax.random.key(0), mcfg)

    rng = np.random.default_rng(0)
    gt = np.zeros((b, hw, hw, 1), np.float32)
    gt[:, hw // 4: hw // 2, hw // 4: hw // 2] = 1.0
    points = np.full((b, 48, 3), -1.0, np.float32)
    points[:, 0] = (hw // 3, hw // 3, 0)
    batch = {
        "image": jnp.asarray(rng.uniform(size=(b, hw, hw, 3)),
                             jnp.float32),
        "instances": jnp.asarray(gt),
        "points": jnp.asarray(points),
        "scribbles": jnp.zeros((b, 1000, 2), jnp.float32),
        "scribble_rects": jnp.zeros((b, 4), jnp.float32),
    }
    key = jax.random.key(1)

    print(f"# ViT-B@{hw}, batch {b}, {args.dtype}, remat={args.remat}")

    from pvpuformer_tpu.engine.prompt_sim import set_cc_default_impl
    set_cc_default_impl("xla")          # sections re-select explicitly below

    def section(label, fn, fargs):
        """One timed section; a failure prints and moves on (a dtype bug in
        one repro must not block the component breakdown below it)."""
        try:
            ms = device_time_per_call(fn, fargs)
            print(f"{label:30s} {ms:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 - diagnostic tool
            print(f"{label:30s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # --- the SHIPPED step: train_step incl. adam+lrd, async-pipelined -----
    # The trainer never syncs per step (engine/trainer.py:145-150), so the
    # honest samples/s number is K dispatched steps / wall, with one
    # readback at the end. Mirrors the vpu_base448 recipe when run with
    # --batch 32 (its batch, vpu_base448_cocolvis.py:67).
    if args.full_step:
        from pvpuformer_tpu.engine.optimizer import make_optimizer
        from pvpuformer_tpu.engine.train_step import train_step
        import time as _time

        tx = make_optimizer(params, "adam", lr=5e-5, milestones=(190, 210),
                            gamma=0.1, steps_per_epoch=10,
                            layerwise_decay=False)
        thr = jnp.asarray([0.4])
        for ni in [1, 2, 3]:
            # train_step donates its param/opt buffers — copy (asarray
            # would alias and the donated originals get deleted)
            fparams = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params)
            opt_state = tx.init(fparams)
            fparams, opt_state, logs, _, _ = train_step(   # compile+warm
                fparams, opt_state, batch, key, thr, cfg=cfg, tx=tx,
                num_iters=ni)
            np.asarray(logs["loss"])
            K = 10
            t0 = _time.time()
            for s in range(K):
                fparams, opt_state, logs, _, _ = train_step(
                    fparams, opt_state, batch, jax.random.fold_in(key, s),
                    thr, cfg=cfg, tx=tx, num_iters=ni)
            np.asarray(logs["loss"])          # one sync at the end
            dt = (_time.time() - t0) / K
            print(f"train_step ni={ni} (shipped):      {dt * 1e3:8.2f} ms "
                  f"({b / dt:7.1f} samples/s)", flush=True)
        return

    # --- full loss+grad per num_iters ------------------------------------
    for ni in [1, 2, 3]:
        def step(c, params, batch, key, ni=ni):
            bb = dict(batch)
            bb["image"] = bb["image"] + c.astype(bb["image"].dtype)
            # vary the key with the timing carry so the prompt-type lax.cond
            # branches (click vs box round) are sampled across the scan, not
            # pinned to one realized path
            key = jax.random.fold_in(key, (c * 1e32).astype(jnp.int32))
            (loss, _), grads = jax.value_and_grad(
                iterloss_forward, has_aux=True)(params, cfg, bb, key, ni)
            return loss + sum(jnp.sum(g).astype(jnp.float32)
                              for g in jax.tree_util.tree_leaves(grads)[:1])
        section(f"grad(iterloss) num_iters={ni}:", step, (params, batch, key))

    # --- plain model fwd+bwd on fixed prompts ----------------------------
    def fwd_bwd(c, params, image, pts):
        def loss_fn(p):
            out = vpu_forward(
                p, mcfg,
                jnp.concatenate(
                    [image + c.astype(image.dtype),
                     jnp.zeros_like(image[..., :1])], axis=-1),
                pts, prompt_type=0)
            return jnp.mean(L.normalized_focal_loss(
                out["instances"], jnp.asarray(gt)))
        l, g = jax.value_and_grad(loss_fn)(params)
        return l + jnp.sum(jax.tree_util.tree_leaves(g)[0]).astype(
            jnp.float32)
    section("model fwd+bwd (no prompt sim):", fwd_bwd,
            (params, batch["image"], batch["points"]))

    def fwd_only(c, params, image, pts):
        out = vpu_forward(
            params, mcfg,
            jnp.concatenate([image + c.astype(image.dtype),
                             jnp.zeros_like(image[..., :1])], axis=-1),
            pts, prompt_type=0)
        return jnp.sum(out["instances"].astype(jnp.float32))
    section("model fwd only:", fwd_only,
            (params, batch["image"], batch["points"]))

    # --- prompt-sim pieces ------------------------------------------------
    def dmaps(c, pts, image):
        return jnp.sum(dist_maps(pts + c, hw, hw).astype(jnp.float32))
    section(f"dist_maps b{b}x{hw}^2x48:", dmaps,
            (batch["points"], batch["image"]))

    prev = jnp.zeros((b, hw, hw), jnp.float32)

    def nclick(c, prev, g, pts):
        pts2, _ = next_clicks(prev + c, g[..., 0], pts, jax.random.key(2))
        return jnp.sum(pts2.astype(jnp.float32))
    section("next_clicks (EDT+sample):", nclick,
            (prev, batch["instances"], batch["points"]))

    err = jnp.asarray(gt[..., 0] > 0.5)

    def boxes(c, g, pts):
        fn = (g[..., 0] + c) > 0.5
        fp = jnp.zeros_like(fn)
        return jnp.sum(synth_boxes(g[..., 0], fn, fp, pts,
                                   jax.random.key(3)).astype(jnp.float32))
    section("synth_boxes (cc=xla):", boxes,
            (batch["instances"], batch["points"]))

    set_cc_default_impl("auto")      # the real train-step path on TPU
    section("synth_boxes (cc=auto):", boxes,
            (batch["instances"], batch["points"]))
    set_cc_default_impl("xla")

    def cc(c, m):
        return jnp.sum(jax.vmap(cc_labels)((m + c) > 0.5).astype(
            jnp.float32))
    section(f"cc_labels b{b} (xla):", cc, (jnp.asarray(gt[..., 0]),))

    from pvpuformer_tpu.ops.cc_pallas import cc_labels_pallas

    def ccp(c, m):
        return jnp.sum(cc_labels_pallas((m + c) > 0.5).astype(jnp.float32))
    section(f"cc_labels b{b} (pallas):", ccp, (jnp.asarray(gt[..., 0]),))

    set_cc_default_impl("pallas")
    section("synth_boxes (pallas cc):", boxes,
            (batch["instances"], batch["points"]))

    from pvpuformer_tpu.engine.prompt_sim import connected_regions_mask_batch

    def keep_batch(c, m, impl):
        return jnp.sum(connected_regions_mask_batch(
            (m + c) > 0.5, impl=impl).astype(jnp.float32))
    section(f"cc keep b{b} (xla scatter):",
            lambda c, m: keep_batch(c, m, "xla"), (jnp.asarray(gt[..., 0]),))
    section(f"cc keep b{b} (pallas compact):",
            lambda c, m: keep_batch(c, m, "pallas"), (jnp.asarray(gt[..., 0]),))
    for ni in [1, 2, 3]:
        def stepp(c, params, batch, key, ni=ni):
            bb = dict(batch)
            bb["image"] = bb["image"] + c.astype(bb["image"].dtype)
            key = jax.random.fold_in(key, (c * 1e32).astype(jnp.int32))
            (loss, _), grads = jax.value_and_grad(
                iterloss_forward, has_aux=True)(params, cfg, bb, key, ni)
            return loss + sum(jnp.sum(g).astype(jnp.float32)
                              for g in jax.tree_util.tree_leaves(grads)[:1])
        section(f"grad(iterloss,pallas cc) ni={ni}:", stepp,
                (params, batch, key))
    set_cc_default_impl("auto")

    # --- fwd+bwd including the P2CL aux loss (the big (B,H,W,2N) path) ----
    gtm = jnp.asarray(gt[..., 0] > 0.5)
    nmax = points.shape[1] // 2
    ed = jnp.concatenate(
        [jnp.repeat(gtm[..., None], nmax, axis=-1),
         jnp.repeat((~gtm)[..., None], nmax, axis=-1)], axis=-1)

    def fwd_bwd_aux(c, params, image, pts):
        def loss_fn(p):
            out = vpu_forward(
                p, mcfg,
                jnp.concatenate(
                    [image + c.astype(image.dtype),
                     jnp.zeros_like(image[..., :1])], axis=-1),
                pts, prompt_type=0)
            l = jnp.mean(L.normalized_focal_loss(
                out["instances"], jnp.asarray(gt)))
            l += jnp.mean(L.sigmoid_bce_loss(
                out["instances_aux"], ed.astype(jnp.float32),
                from_sigmoid=True))
            return l
        l, g = jax.value_and_grad(loss_fn)(params)
        return l + jnp.sum(jax.tree_util.tree_leaves(g)[0]).astype(
            jnp.float32)
    section("model fwd+bwd (+P2CL aux):", fwd_bwd_aux,
            (params, batch["image"], batch["points"]))


if __name__ == "__main__":
    main()
