"""Engine tests: prompt simulation vs scipy oracles, optimizer schedules,
and the fused iterloss train step on an 8-virtual-device mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import ndimage

from pvpuformer_tpu.engine import prompt_sim as PS
from pvpuformer_tpu.engine import optimizer as OPT
from pvpuformer_tpu.engine.train_step import TrainConfig, train_step, eval_step
from pvpuformer_tpu.parallel import make_mesh, shard_batch, shard_params

from test_models import tiny_cfg


def rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------- connected regions

def blobby_mask(seed, h=48, w=56, nblobs=4):
    r = rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros((h, w), bool)
    for _ in range(nblobs):
        cy, cx = r.integers(0, h), r.integers(0, w)
        rad = r.integers(2, 9)
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= rad ** 2
    return m


def cc_keep_oracle(mask, keep_frac=0.1):
    """max_connected_regions semantics (largest component + >10% components)."""
    lab, nlab = ndimage.label(mask, structure=np.ones((3, 3)))
    if nlab == 0:
        return np.zeros_like(mask)
    sizes = np.bincount(lab.ravel())
    sizes[0] = 0
    largest = sizes.argmax()
    total = mask.sum()
    keep = np.zeros_like(mask)
    for j in range(1, nlab + 1):
        if j == largest or sizes[j] > keep_frac * total:
            keep |= lab == j
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_connected_regions_vs_scipy(seed, impl):
    m = blobby_mask(seed)
    ours = np.asarray(PS.connected_regions_mask(jnp.asarray(m), impl=impl))
    np.testing.assert_array_equal(ours, cc_keep_oracle(m))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_connected_regions_empty(impl):
    m = np.zeros((16, 16), bool)
    assert not np.asarray(
        PS.connected_regions_mask(jnp.asarray(m), impl=impl)).any()


def test_connected_regions_compact_cap_fallback():
    """More components than compact_cap must take the lax.cond scatter
    fallback and still match the oracle exactly (and the default cap)."""
    m = np.zeros((24, 48), bool)
    m[2:6, 2:6] = True                 # dominant component
    for r in range(10, 22, 3):         # 4 x 12 = 48 isolated speckles
        for c in range(2, 48, 4):
            m[r, c] = True
    for cap in (4, 256):               # 49 comps: 4 -> fallback, 256 -> fast
        got = np.asarray(PS.connected_regions_mask(
            jnp.asarray(m), impl="pallas", compact_cap=cap))
        np.testing.assert_array_equal(got, cc_keep_oracle(m),
                                      err_msg=f"cap={cap}")


def test_connected_regions_size_ties_match_across_impls():
    """Two equal-max-size components among many speckles (each <=10% of the
    foreground): both impls must break the largest-component tie the same
    way (scatter argmax -> smallest label). The scipy oracle is not pinned
    here — its tie order follows scipy's raster label order, not ours."""
    m = np.zeros((40, 64), bool)
    m[2:4, 2:4] = True            # 4 px
    m[30:32, 50:52] = True        # 4 px (joint largest)
    for r in range(10, 28, 3):    # 6 rows x 7 cols = 42 isolated speckles
        for c in range(8, 64, 8):
            m[r, c] = True        # total 50 px -> each 4-px comp is 8% < 10%
    a = np.asarray(PS.connected_regions_mask(jnp.asarray(m), impl="xla"))
    b = np.asarray(PS.connected_regions_mask(jnp.asarray(m), impl="pallas"))
    np.testing.assert_array_equal(a, b)


# ----------------------------------------------------------------- next click

def test_next_clicks_positive_case():
    h, w, n = 40, 40, 4
    gt = np.zeros((1, h, w), np.float32)
    gt[0, 10:30, 10:30] = 1.0
    pred = np.zeros((1, h, w), np.float32)   # everything missed -> FN = gt
    points = np.full((1, 2 * n, 3), -1.0, np.float32)

    pts, info = PS.next_clicks(jnp.asarray(pred), jnp.asarray(gt),
                               jnp.asarray(points), jax.random.key(0))
    pts = np.asarray(pts)
    assert bool(info.has_click[0]) and bool(info.is_positive[0])
    y, x, order = pts[0, 0]
    assert order == 1.0                       # first click
    # the click must lie in the dist > max/2 inner region of the square
    assert 14 <= y <= 25 and 14 <= x <= 25
    # ed mask update writes the FN mask into slot 0
    ed = jnp.zeros((1, h, w, 2 * n), bool)
    ed2 = np.asarray(PS.update_ed_mask(ed, info))
    np.testing.assert_array_equal(ed2[0, :, :, 0], gt[0] > 0.5)
    assert not ed2[0, :, :, 1].any()


def test_next_clicks_negative_goes_to_second_half():
    h, w, n = 40, 40, 4
    gt = np.zeros((1, h, w), np.float32)
    pred = np.zeros((1, h, w), np.float32)
    pred[0, 5:25, 5:25] = 1.0                 # false positive block
    points = np.full((1, 2 * n, 3), -1.0, np.float32)
    points[0, 0] = (7, 7, 0)                  # existing pos click, order 0

    pts, info = PS.next_clicks(jnp.asarray(pred), jnp.asarray(gt),
                               jnp.asarray(points), jax.random.key(1))
    pts = np.asarray(pts)
    assert not bool(info.is_positive[0])
    assert int(info.slot[0]) == n             # first negative slot
    assert pts[0, n, 2] == 1.0                # order = prev max (0) + 1


def test_next_clicks_no_error_leaves_points():
    gt = np.ones((1, 16, 16), np.float32)
    pred = np.ones((1, 16, 16), np.float32)   # perfect -> no fn/fp
    points = np.full((1, 4, 3), -1.0, np.float32)
    pts, info = PS.next_clicks(jnp.asarray(pred), jnp.asarray(gt),
                               jnp.asarray(points), jax.random.key(2))
    assert not bool(info.has_click[0])
    np.testing.assert_array_equal(np.asarray(pts), points)


# ---------------------------------------------------------------------- boxes

def test_synth_boxes_allmask_no_jitter_is_gt_bbox():
    h, w, n = 40, 48, 4
    gt = np.zeros((1, h, w), np.float32)
    gt[0, 8:24, 10:30] = 1.0                  # y0=8,y1=23,x0=10,x1=29
    fn = np.zeros((1, h, w), bool)
    fp = np.zeros((1, h, w), bool)
    points = np.full((1, 2 * n, 3), -1.0, np.float32)
    boxes = np.asarray(PS.synth_boxes(jnp.asarray(gt), jnp.asarray(fn),
                                      jnp.asarray(fp), jnp.asarray(points),
                                      jax.random.key(0), as_allmask=True,
                                      jitter=False))
    xc, yc, bw, bh, loc = boxes[0]
    assert (xc, yc, bw, bh) == ((10 + 29) // 2, (8 + 23) // 2, 19, 15)
    assert loc == 0


def test_synth_boxes_error_mask_largest_region():
    h, w, n = 40, 48, 4
    gt = np.zeros((1, h, w), np.float32)
    gt[0, 4:30, 4:40] = 1.0
    pred = np.zeros((1, h, w), np.float32)    # fn == gt (one big region)
    fn = gt.astype(bool)
    fp = np.zeros((1, h, w), bool)
    points = np.full((1, 2 * n, 3), -1.0, np.float32)
    boxes = np.asarray(PS.synth_boxes(jnp.asarray(gt), jnp.asarray(fn),
                                      jnp.asarray(fp), jnp.asarray(points),
                                      jax.random.key(0), as_allmask=False,
                                      jitter=False))
    xc, yc, bw, bh, loc = boxes[0]
    assert (xc, yc, bw, bh) == ((4 + 39) // 2, (4 + 29) // 2, 35, 25)
    assert loc == n - 1                       # positive branch hardcodes n-1


def test_synth_boxes_jitter_within_bounds():
    h, w, n = 64, 64, 4
    gt = np.zeros((1, h, w), np.float32)
    gt[0, 20:40, 20:40] = 1.0
    points = np.full((1, 2 * n, 3), -1.0, np.float32)
    for seed in range(4):
        boxes = np.asarray(PS.synth_boxes(
            jnp.asarray(gt), jnp.asarray(gt.astype(bool)),
            jnp.asarray(np.zeros((1, h, w), bool)), jnp.asarray(points),
            jax.random.key(seed), as_allmask=False, jitter=True))
        xc, yc, bw, bh, _ = boxes[0]
        assert bw >= 10 and bh >= 10
        assert 0 <= xc - bw // 2 and xc + bw // 2 <= w
        assert 0 <= yc - bh // 2 and yc + bh // 2 <= h


# ------------------------------------------------------------------ optimizer

def test_multistep_lr():
    sched = OPT.multistep_lr(1.0, [2, 4], 0.1, steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert float(sched(19)) == 1.0
    np.testing.assert_allclose(float(sched(20)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(39)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(40)), 0.01, rtol=1e-6)


def test_layerwise_scales_match_beit():
    params = {
        "backbone": {
            "pos_embed": np.zeros((1, 5, 8)),
            "patch_embed": {"w": np.zeros((8, 8))},
            "blocks": [{"attn": {"w": np.zeros((8, 8))}} for _ in range(4)],
        },
        "neck": {"w": np.zeros((8, 8))},
        "patch_embed_coords": {"w": np.zeros((8, 8))},
    }
    depth = 4
    scales = OPT.layerwise_scales(params, depth, 0.75)
    num_layers = depth + 1
    assert np.isclose(scales["backbone"]["pos_embed"], 0.75 ** num_layers)
    assert np.isclose(scales["backbone"]["blocks"][0]["attn"]["w"],
                      0.75 ** (num_layers - 1))
    assert np.isclose(scales["backbone"]["blocks"][3]["attn"]["w"],
                      0.75 ** (num_layers - 4))
    assert scales["neck"]["w"] == 1.0
    assert scales["patch_embed_coords"]["w"] == 1.0


# ----------------------------------------------------------------- train step

def tiny_batch(seed, b=4, hw=64, n=6, s=50):
    r = rng(seed)
    gt = np.zeros((b, hw, hw, 1), np.float32)
    for i in range(b):
        y, x = r.integers(8, 40, 2)
        gt[i, y:y + 16, x:x + 16, 0] = 1.0
    points = np.full((b, 2 * n, 3), -1.0, np.float32)
    for i in range(b):
        ys, xs = np.nonzero(gt[i, :, :, 0])
        j = r.integers(len(ys))
        points[i, 0] = (ys[j], xs[j], 0)
    return {
        "image": r.uniform(size=(b, hw, hw, 3)).astype(np.float32),
        "instances": gt,
        "points": points,
        "scribbles": np.zeros((b, s, 2), np.float32),
        "scribble_rects": np.zeros((b, 4), np.float32),
    }


@pytest.mark.slow
def test_caption_cotraining_step():
    """Caption co-training hook (trainer.py:321,393-395 scaffold): a model
    with a CLIP text tower takes batch['captions'] token ids, the text
    embedding enters as an extra DMA query (fpn.neck_forward), and
    gradients flow into the text tower and projection."""
    from pvpuformer_tpu.models.vpu import init_vpu
    from pvpuformer_tpu.models.zoo.clip_text import (ClipTextConfig,
                                                     byte_tokenizer)
    from pvpuformer_tpu.engine.train_step import train_step, TrainConfig
    from pvpuformer_tpu.engine import optimizer as OPT

    mcfg = tiny_cfg().replace(text=ClipTextConfig(
        vocab_size=49408, context_length=32, width=32, heads=2, layers=2,
        embed_dim=16))
    cfg = TrainConfig(model=mcfg, remat=False)
    params = init_vpu(jax.random.key(0), mcfg)
    assert "clip_text" in params and "caption_proj" in params
    tx = OPT.make_optimizer(params, "adam", lr=1e-3)
    opt_state = tx.init(params)
    thr = jnp.asarray([0.4, 0.375, 0.425])

    batch = {k: jnp.asarray(v) for k, v in tiny_batch(0, b=2).items()}
    toks = byte_tokenizer(["the left box", "a small square"], 32)
    batch["captions"] = jnp.asarray(toks)

    before = np.asarray(
        jax.tree_util.tree_leaves(params["caption_proj"])[0]).copy()
    params, opt_state, logs, ious, valid = train_step(
        params, opt_state, batch, jax.random.key(1), thr,
        cfg=cfg, tx=tx, num_iters=2)
    assert np.isfinite(float(logs["loss"]))
    after = np.asarray(jax.tree_util.tree_leaves(params["caption_proj"])[0])
    assert not np.allclose(before, after), "caption path got no gradient"

    # same model without captions still runs (hook is optional)
    batch.pop("captions")
    params, opt_state, logs, _, _ = train_step(
        params, opt_state, batch, jax.random.key(2), thr,
        cfg=cfg, tx=tx, num_iters=1)
    assert np.isfinite(float(logs["loss"]))


@pytest.mark.slow
def test_train_step_learns_on_mesh():
    from pvpuformer_tpu.models.vpu import init_vpu

    mesh = make_mesh(8)
    mcfg = tiny_cfg()
    cfg = TrainConfig(model=mcfg, remat=True)
    params = init_vpu(jax.random.key(0), mcfg)
    tx = OPT.make_optimizer(params, "adam", lr=1e-3)
    opt_state = tx.init(params)
    thr = jnp.asarray([0.4, 0.375, 0.425])

    losses = []
    with mesh:
        params = shard_params(params, mesh)
        for step in range(6):
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in tiny_batch(step, b=8).items()},
                mesh)
            params, opt_state, logs, ious, valid = train_step(
                params, opt_state, batch, jax.random.key(step), thr,
                cfg=cfg, tx=tx, num_iters=2)
            losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert ious.shape[0] == 3


@pytest.mark.slow
def test_eval_step_and_num_iters_variants():
    from pvpuformer_tpu.models.vpu import init_vpu

    mcfg = tiny_cfg()
    cfg = TrainConfig(model=mcfg, remat=False)
    params = init_vpu(jax.random.key(0), mcfg)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(0, b=2).items()}
    thr = jnp.asarray([0.4, 0.375, 0.425])
    logs, ious, valid = eval_step(params, batch, jax.random.key(0), thr,
                                  cfg=cfg, num_iters=1)
    assert np.isfinite(float(logs["loss"]))
    assert "instance_loss_0_1" in logs
    assert "instance_aux3_loss_0_1" in logs


def test_synth_scribbles_on_device():
    gt = np.zeros((2, 64, 64), np.float32)
    gt[0, 10:40, 15:50] = 1.0                 # one blob; sample 1 empty
    scr, rects = PS.synth_scribbles(jnp.asarray(gt), jax.random.key(0),
                                    num_samples=200)
    scr, rects = np.asarray(scr), np.asarray(rects)
    assert scr.shape == (2, 200, 2) and rects.shape == (2, 4)
    # (col, row) samples clipped to the bbox
    assert scr[0, :, 0].min() >= 15 and scr[0, :, 0].max() <= 49
    assert scr[0, :, 1].min() >= 10 and scr[0, :, 1].max() <= 39
    # rect (col_c, row_c, col_ext, row_ext)
    assert rects[0, 2] == 49 - 15 and rects[0, 3] == 39 - 10
    # empty gt -> all zeros (cal_scribble's null convention)
    assert not scr[1].any() and not rects[1].any()


@pytest.mark.slow
def test_itermask_training_mode():
    """RITM iter-mask branch (use_iterloss=False, trainer.py:459-491)."""
    from pvpuformer_tpu.models.vpu import init_vpu
    from test_engine import tiny_batch

    mcfg = tiny_cfg()
    cfg = TrainConfig(model=mcfg, use_iterloss=False, remat=False)
    params = init_vpu(jax.random.key(0), mcfg)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(0, b=2).items()}
    thr = jnp.asarray([0.4, 0.375, 0.425])
    logs, ious, valid = eval_step(params, batch, jax.random.key(0), thr,
                                  cfg=cfg, num_iters=2)
    assert np.isfinite(float(logs["loss"]))
    assert "instance_loss" in logs and "instance_aux3_loss_0_1" not in logs


def test_grad_accumulation_wrapper():
    import optax
    from pvpuformer_tpu.engine.optimizer import (make_optimizer,
                                                 with_grad_accumulation)
    params = {"w": jnp.zeros((4,))}
    tx = with_grad_accumulation(make_optimizer(params, "adam", lr=1.0), 2)
    state = tx.init(params)
    g = {"w": jnp.ones((4,))}
    # first micro-step: no update yet
    up, state = tx.update(g, state, params)
    assert np.allclose(np.asarray(up["w"]), 0.0)
    up, state = tx.update(g, state, params)
    assert np.abs(np.asarray(up["w"])).max() > 0


def test_dist_utils():
    from pvpuformer_tpu.parallel.dist import (get_rank, get_world_size,
                                              synchronize, reduce_metrics)
    assert get_rank() == 0 and get_world_size() == 1
    synchronize()
    out = reduce_metrics({"loss": 2.0, "iou": 0.5})
    assert out == {"loss": 2.0, "iou": 0.5} or np.isclose(out["loss"], 2.0)


@pytest.mark.slow
def test_bf16_training_and_vis_dump(tmp_path):
    """Mixed precision (f32 masters, bf16 activations) trains finitely and
    the periodic visualization dump writes panels (trainer.py:219,556-592)."""
    from pvpuformer_tpu.data import SyntheticTrainDataset, Loader
    from pvpuformer_tpu.engine.optimizer import make_optimizer
    from pvpuformer_tpu.engine.trainer import Trainer
    from pvpuformer_tpu.models.vpu import init_vpu

    mcfg = tiny_cfg().replace(dtype=jnp.bfloat16)
    cfg = TrainConfig(model=mcfg, remat=False)
    params = init_vpu(jax.random.key(0), mcfg)
    tx = make_optimizer(params, "adam", lr=1e-3)
    ds = SyntheticTrainDataset(n_samples=8, hw=(64, 64), epoch_len=8)
    loader = Loader(ds, batch_size=8, num_workers=1)
    tr = Trainer(params, cfg, tx, loader, vis_dir=str(tmp_path / "vis"),
                 image_dump_interval=1, checkpoint_dir=None)
    means = tr.training(0)
    assert np.isfinite(means["loss"])
    dumps = list((tmp_path / "vis").glob("*.jpg"))
    assert dumps, "no visualization panels written"


@pytest.mark.slow
def test_trainer_does_not_consume_caller_params():
    """train_step donates its buffers; Trainer must copy on ingest so the
    caller's params stay usable (regression for a real deleted-array crash)."""
    from pvpuformer_tpu.data import SyntheticTrainDataset, Loader
    from pvpuformer_tpu.engine.optimizer import make_optimizer
    from pvpuformer_tpu.engine.trainer import Trainer
    from pvpuformer_tpu.models.vpu import init_vpu, vpu_forward

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    tx = make_optimizer(params, "adam", lr=1e-3)
    ds = SyntheticTrainDataset(n_samples=8, hw=(64, 64), epoch_len=8)
    tr = Trainer(params, TrainConfig(model=mcfg, remat=False), tx,
                 Loader(ds, batch_size=8, num_workers=1))
    tr.training(0)
    # original params must still be alive and usable
    img = jnp.zeros((1, 64, 64, 4))
    pts = jnp.full((1, 12, 3), -1.0)
    out = vpu_forward(params, mcfg, img, pts, prompt_type=0)
    assert np.isfinite(np.asarray(out["instances"])).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_pallas_matches_xla(seed):
    """The Pallas CC kernel (ops/cc_pallas.py, interpret mode on CPU) must
    produce exactly the labels of the XLA cc_labels fixpoint."""
    from pvpuformer_tpu.ops.cc_pallas import cc_labels_pallas

    m = blobby_mask(seed, h=57, w=83)   # deliberately pad-unaligned
    ref = np.asarray(PS.cc_labels(jnp.asarray(m)))
    got = np.asarray(cc_labels_pallas(jnp.asarray(m)[None], interpret=True))[0]
    np.testing.assert_array_equal(got, ref)


def test_cc_pallas_impl_switch_regions():
    """connected_regions_mask through impl="pallas" (interpret) must match
    the scipy oracle, same as the XLA path."""
    from pvpuformer_tpu.ops.cc_pallas import cc_labels_pallas

    m = blobby_mask(7)
    lab = np.asarray(cc_labels_pallas(jnp.asarray(m)[None], interpret=True))[0]
    # regions derived from pallas labels == scipy keep-mask partition
    sizes = np.bincount(lab.ravel())
    sizes[0] = 0
    keep = (lab == sizes.argmax()) | (sizes[lab] > 0.1 * m.sum())
    keep &= m
    np.testing.assert_array_equal(keep, cc_keep_oracle(m))


def test_init_params_have_no_weak_typed_leaves():
    """A weak-typed init leaf changes dtype identity after the first
    optimizer step (weak f32 -> strong f32), so every jitted train_step
    recompiled TWICE (params, then adam mu/nu) before its cache stabilized
    — ~10-18 min of wasted TPU compile per train run (seg_head logit_scale
    regression, round 3). Every registered family must init strong-typed."""
    from pvpuformer_tpu.models import registry
    from pvpuformer_tpu.models.vpu import init_vpu

    params = init_vpu(jax.random.key(0), tiny_cfg())
    weak = [jax.tree_util.keystr(p)
            for p, l in jax.tree_util.tree_leaves_with_path(params)
            if getattr(l, "weak_type", False)]
    assert weak == [], f"weak-typed init leaves: {weak}"


def test_train_step_compiles_once():
    """The jit cache must not grow across steps of the same shape/config —
    the regression above showed up as cache_size 1 -> 2 -> 3."""
    mcfg = tiny_cfg()
    cfg = TrainConfig(model=mcfg, remat=False)
    from pvpuformer_tpu.models.vpu import init_vpu
    params = init_vpu(jax.random.key(0), mcfg)
    tx = OPT.make_optimizer(params, "adam", lr=5e-5, milestones=(190, 210),
                            gamma=0.1, steps_per_epoch=100)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(0, b=2).items()}
    thr = jnp.asarray([0.4, 0.375, 0.425])
    before = train_step._cache_size()
    for s in range(3):
        params, opt_state, logs, _, _ = train_step(
            params, opt_state, batch, jax.random.key(s), thr,
            cfg=cfg, tx=tx, num_iters=1)
        np.asarray(logs["loss"])
    assert train_step._cache_size() == before + 1


def test_train_step_attention_stays_bf16():
    """bf16 configs must keep bf16 activations through the WHOLE train graph.
    Regression: draw_box_into_coords/draw_scribble_into_coords max()-ed a
    0/1 f32 mask into the bf16 disk channels; the promoted f32 coords leaked
    through the coord patch-embed `x + additional` and every ViT block of
    every training round silently ran f32 (inference prompt_type=0 never
    draws boxes, so the click bench stayed bf16 and the leak was invisible
    until the round-3 train-step trace). Trace-time spy: every nn.sdpa call
    site in iterloss_forward must see bf16 queries."""
    import dataclasses
    from pvpuformer_tpu import nn as N
    from pvpuformer_tpu.engine.train_step import iterloss_forward
    from pvpuformer_tpu.models.vpu import init_vpu

    mcfg = dataclasses.replace(tiny_cfg(), dtype=jnp.bfloat16)
    cfg = TrainConfig(model=mcfg, remat=False)
    params = init_vpu(jax.random.key(0), mcfg)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(0, b=2).items()}

    seen = []
    orig = N.sdpa

    def spy(q, k, v, scale=None):
        seen.append((q.dtype, q.shape))
        return orig(q, k, v, scale)

    try:
        N.sdpa = spy     # models import `nn` as a module, so this hits all sites
        jax.make_jaxpr(lambda p: iterloss_forward(
            p, cfg, batch, jax.random.key(1), 2)[0])(params)
    finally:
        N.sdpa = orig
    bad = sorted({(str(d), s) for d, s in seen if d != jnp.bfloat16})
    assert seen and not bad, f"f32-promoted attention inputs: {bad}"


def test_per_round_grads_match_joint_backward():
    """train_step's iterloss path accumulates per-round value_and_grad
    (train_step._iterloss_loop with_grads=True) instead of differentiating
    the whole round loop: valid because prev/points/ed_mask are all
    stop-gradient, so no gradient crosses rounds. This is what lets the
    shipped recipe (b32, up to 3 rounds) fit one 16G v5e chip (whole-loop
    backward needed 15.9-16.2G, measured 2026-08-21). Pin the gradient
    equivalence against the joint backward."""
    from pvpuformer_tpu.engine.train_step import (iterloss_forward,
                                                  iterloss_value_and_grad)
    from pvpuformer_tpu.models.vpu import init_vpu

    mcfg = tiny_cfg()
    cfg = TrainConfig(model=mcfg, remat=True)
    params = init_vpu(jax.random.key(0), mcfg)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(0, b=2).items()}
    key = jax.random.key(1)

    for ni in (1, 3):
        (l1, aux1), g1 = jax.value_and_grad(iterloss_forward, has_aux=True)(
            params, cfg, batch, key, ni)
        (l2, aux2), g2 = iterloss_value_and_grad(params, cfg, batch, key, ni)
        assert float(l1) == pytest.approx(float(l2), abs=1e-5)
        flat1 = jax.tree_util.tree_leaves(g1)
        flat2 = jax.tree_util.tree_leaves(g2)
        assert len(flat1) == len(flat2)
        scale = max(float(jnp.max(jnp.abs(a))) for a in flat1)
        worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in
                    zip(flat1, flat2))
        # identical math, different accumulation order (fwd vs reverse)
        assert worst <= 1e-5 * max(scale, 1.0), (worst, scale)
        np.testing.assert_allclose(
            np.asarray(aux1["final_instances"], np.float32),
            np.asarray(aux2["final_instances"], np.float32), atol=1e-5)
        assert set(aux1["logs"]) == set(aux2["logs"])
