#!/usr/bin/env python3
"""Per-component device timing of the interactive click path (ViT-B@448).

Uses the tunnel-safe difference method (utils/profiling.device_time_per_call)
to attribute the per-click budget. NOTE: components must receive their inputs
as ARGUMENTS — closing over device arrays turns them into HLO constants and
XLA constant-folds the whole computation at compile time (hangs the build).

    python scripts/profile_click.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from pvpuformer_tpu.models.vpu import (vpu_base_config, init_vpu,
                                       vpu_forward, prepare_input,
                                       coord_features, vpu_backbone_embed)
from pvpuformer_tpu.models.fpn import neck_forward
from pvpuformer_tpu.models.seg_head import head_forward
from pvpuformer_tpu.ops.ppue import ppue_click
from pvpuformer_tpu.ops.edt import squared_edt_pair
from pvpuformer_tpu.ops.resize import bilinear_resize
from pvpuformer_tpu.inference.predictor import (PredictorConfig, click_step,
                                                init_session)
from pvpuformer_tpu.utils.profiling import device_time_per_call


def main() -> None:
    mcfg = vpu_base_config(dtype=jnp.bfloat16)
    params = init_vpu(jax.random.key(0), mcfg)
    img = jnp.zeros((2, 448, 448, 4), jnp.bfloat16)
    pts = jnp.full((2, 48, 3), -1.0)

    rgb, prev = prepare_input(mcfg, img)
    coords = coord_features(mcfg, rgb, prev, pts)
    tokens = vpu_backbone_embed(params, mcfg, rgb, coords)
    pv = ppue_click(pts, mcfg.ppue, num_max_points=24).astype(jnp.bfloat16)

    def bb(c, params, rgb, coords):
        return vpu_backbone_embed(params, mcfg, rgb + c.astype(rgb.dtype),
                                  coords)
    print(f"backbone (b2):        "
          f"{device_time_per_call(bb, (params, rgb, coords)):7.3f} ms",
          flush=True)

    def neck_head(c, params, tokens, pv):
        ms, q = neck_forward(params["neck"], mcfg.neck,
                             tokens + c.astype(tokens.dtype), pv,
                             mcfg.backbone.grid_size)
        seg, _ = head_forward(params["head"], mcfg.head, ms, q)
        return bilinear_resize(seg, 448, 448, align_corners=True)
    print(f"neck+head+upsample:   "
          f"{device_time_per_call(neck_head, (params, tokens, pv)):7.3f} ms",
          flush=True)

    def prompts(c, rgb, prev, pts):
        pts = pts + c
        cf = coord_features(mcfg, rgb, prev, pts)
        v = ppue_click(pts, mcfg.ppue, num_max_points=24)
        return jnp.sum(cf) + jnp.sum(v)
    print(f"disks+ppue:           "
          f"{device_time_per_call(prompts, (rgb, prev, pts)):7.3f} ms",
          flush=True)

    m = jnp.zeros((448, 448), bool).at[100:300, 100:300].set(True)

    def edt(c, m):
        m = m ^ (c > 1e30)
        a, b = squared_edt_pair(m, ~m)
        return jnp.max(a) + jnp.max(b)
    print(f"edt pair:             "
          f"{device_time_per_call(edt, (m,)):7.3f} ms", flush=True)

    def full(c, params, img, pts):
        return vpu_forward(params, mcfg, img + c.astype(img.dtype), pts,
                           prompt_type=0)["instances"]
    print(f"full forward (b2):    "
          f"{device_time_per_call(full, (params, img, pts)):7.3f} ms",
          flush=True)

    pcfg = PredictorConfig(model=mcfg)
    rng = np.random.default_rng(0)
    image = (rng.uniform(size=(448, 448, 3)) * 255).astype(np.uint8)
    gt = np.zeros((448, 448), np.float32)
    gt[96:352, 128:320] = 1.0
    state = init_session(image, gt, 24, (448, 448))

    def scan_k(k):
        @jax.jit
        def g(params, st):
            def body(s, _):
                return click_step(params, pcfg, s)
            _, ious = jax.lax.scan(body, st, None, length=k)
            return ious
        np.asarray(g(params, state))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(params, state))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t = (scan_k(24) - scan_k(4)) / 20 * 1e3
    print(f"click_step (total):   {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
