"""Model-layer tests: shapes, jit, window patchify semantics, DMA structure,
positional encodings, gradients."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pvpuformer_tpu.models.vit import (ViTConfig, init_vit, vit_backbone_forward,
                                       _patchify, _unpatchify)
from pvpuformer_tpu.models.two_way import (TwoWayConfig, init_two_way,
                                           two_way_forward, pos2d_interleaved)
from pvpuformer_tpu.models.vpu import (VPUConfig, vpu_base_config, init_vpu,
                                       vpu_forward)
from pvpuformer_tpu.models.fpn import NeckConfig
from pvpuformer_tpu.models.seg_head import HeadConfig


def tiny_cfg(window_pixels=224):
    return VPUConfig(
        backbone=ViTConfig(img_size=(64, 64), patch_size=(16, 16), embed_dim=64,
                           depth=4, num_heads=2, window_pixels=window_pixels),
        neck=NeckConfig(in_dim=64, out_dims=(16, 32, 48, 64), img_size=(64, 64),
                        hide_dim=64,
                        two_way=TwoWayConfig(depth=3, embedding_dim=64,
                                             num_heads=4, mlp_dim=64)),
        head=HeadConfig(in_channels=(16, 32, 48, 64), channels=32, d_model=64),
        num_max_points=6,
    )


def test_pos2d_matches_reference_formula():
    """Element-by-element check of the interleaved sin/cos encoding
    (transformer.py:290-318)."""
    import math
    d, h, w = 16, 3, 4
    pe = pos2d_interleaved(d, h, w)            # (h*w, d)
    dm = d // 2
    div = np.exp(np.arange(0, dm, 2) * -(math.log(10000.0) / dm))
    for y in range(h):
        for x in range(w):
            row = pe[y * w + x]
            for j, dv in enumerate(div):
                assert np.isclose(row[2 * j], np.sin(x * dv), atol=1e-6)
                assert np.isclose(row[2 * j + 1], np.cos(x * dv), atol=1e-6)
                assert np.isclose(row[dm + 2 * j], np.sin(y * dv), atol=1e-6)
                assert np.isclose(row[dm + 2 * j + 1], np.cos(y * dv), atol=1e-6)


def test_patchify_roundtrip_and_window_layout():
    cfg = ViTConfig(img_size=(64, 64), patch_size=(16, 16), embed_dim=8,
                    window_pixels=32)   # 4x4 grid, 2x2 windows of 2x2 tokens
    x = jnp.arange(2 * 16 * 8, dtype=jnp.float32).reshape(2, 16, 8)
    w = _patchify(x, cfg)
    assert w.shape == (2 * 4, 4, 8)
    # window 0 of batch 0 must contain tokens (0,0),(0,1),(1,0),(1,1) of the 4x4 grid
    grid = np.asarray(x[0]).reshape(4, 4, 8)
    np.testing.assert_array_equal(np.asarray(w[0]),
                                  grid[:2, :2].reshape(4, 8))
    back = _unpatchify(w, cfg)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_blocks_match_manual_grouping():
    """depth=4 -> blocks_per_group=1 -> every block global (i%1==0)."""
    cfg = ViTConfig(img_size=(64, 64), patch_size=(16, 16), embed_dim=32,
                    depth=4, num_heads=2, window_pixels=32)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out = vit_backbone_forward(params, cfg, x)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_window_vs_global_differ_when_windowed():
    """depth=8 -> blocks_per_group=2 -> odd blocks run windowed; output must
    differ from a config where windows are disabled (window covers grid)."""
    key = jax.random.PRNGKey(0)
    cfg_w = ViTConfig(img_size=(64, 64), patch_size=(16, 16), embed_dim=32,
                      depth=8, num_heads=2, window_pixels=32)
    cfg_g = ViTConfig(img_size=(64, 64), patch_size=(16, 16), embed_dim=32,
                      depth=8, num_heads=2, window_pixels=64)
    params = init_vit(key, cfg_w)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out_w = vit_backbone_forward(params, cfg_w, x)
    out_g = vit_backbone_forward(params, cfg_g, x)
    assert not np.allclose(np.asarray(out_w), np.asarray(out_g), atol=1e-4)


def test_two_way_shapes_and_intermediates():
    cfg = TwoWayConfig(depth=3, embedding_dim=64, num_heads=4, mlp_dim=128)
    params = init_two_way(jax.random.PRNGKey(0), cfg)
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 64))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 64))
    inter = two_way_forward(params, cfg, q, x, (4, 4))
    assert len(inter) == 3
    for qi, ki in inter:
        assert qi.shape == (2, 12, 64)
        assert ki.shape == (2, 16, 64)
    # first-layer self-attn has no residual: queries after block 0 should not
    # equal input plus something trivially
    assert np.isfinite(np.asarray(inter[-1][0])).all()


def test_vpu_forward_shapes_and_jit():
    cfg = tiny_cfg()
    params = init_vpu(jax.random.PRNGKey(0), cfg)
    b, n = 2, cfg.num_max_points
    image = jax.random.uniform(jax.random.PRNGKey(1), (b, 64, 64, 4))
    points = np.full((b, 2 * n, 3), -1, np.float32)
    points[0, 0] = (20, 30, 0)
    points[1, n] = (10, 10, 0)
    points = jnp.asarray(points)

    fwd = jax.jit(lambda p, im, pts: vpu_forward(p, cfg, im, pts))
    out = fwd(params, image, points)
    assert out["instances"].shape == (b, 64, 64, 1)
    assert out["instances_aux"].shape == (b, 64, 64, 2 * n)
    assert np.isfinite(np.asarray(out["instances"])).all()
    aux = np.asarray(out["instances_aux"])
    assert aux.min() >= -1e-5 and aux.max() <= 1.0 + 1e-5   # P2CL in [0,1]


def test_vpu_forward_box_and_scribble_types():
    cfg = tiny_cfg()
    params = init_vpu(jax.random.PRNGKey(0), cfg)
    b, n = 1, cfg.num_max_points
    image = jax.random.uniform(jax.random.PRNGKey(1), (b, 64, 64, 4))
    points = jnp.asarray(np.full((b, 2 * n, 3), -1, np.float32))
    boxes = jnp.asarray(np.array([[32, 32, 30, 24, 0]], np.float32))
    scr = jnp.asarray(np.random.default_rng(0).uniform(0, 64, (b, 1, 50, 2))
                      .astype(np.float32))
    rects = jnp.asarray(np.array([[[32, 32, 30, 24]]], np.float32))

    out_box = vpu_forward(params, cfg, image, points, boxes=boxes, prompt_type=1)
    assert out_box["instances"].shape == (b, 64, 64, 1)
    out_scr = vpu_forward(params, cfg, image, points,
                          scribbles=(scr, rects), prompt_type=2)
    assert out_scr["instances"].shape == (b, 64, 64, 1)


def test_vpu_gradients_flow():
    cfg = tiny_cfg()
    params = init_vpu(jax.random.PRNGKey(0), cfg)
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 4))
    points = np.full((1, 12, 3), -1, np.float32)
    points[0, 0] = (20, 30, 0)
    points = jnp.asarray(points)

    def loss(p):
        out = vpu_forward(p, cfg, image, points)
        return jnp.mean(jnp.square(out["instances"])) + \
            jnp.mean(jnp.square(out["instances_aux"]))

    grads = jax.grad(loss)(params)
    gnorms = jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads)
    # backbone + neck + head all receive gradient
    assert gnorms["backbone"]["blocks"][0]["attn"]["qkv"]["w"] > 0
    assert gnorms["neck"]["ffn"]["fc1"]["w"] > 0
    assert gnorms["head"]["conv_seg"]["w"] > 0
    assert gnorms["patch_embed_coords"]["w"] > 0


def test_vpu_base_config_dims():
    cfg = vpu_base_config()
    assert cfg.backbone.grid_size == (28, 28)
    assert cfg.neck.prompt_dim == 899
    assert cfg.head.out_channels == 256
    assert cfg.ppue.vec_dim == 899


def test_plainvit_forward():
    """PlainVit/SimpleClick legacy model (is_plainvit_model.py:59-95)."""
    from pvpuformer_tpu.models.plainvit import (PlainVitConfig, init_plainvit,
                                                plainvit_forward)
    from pvpuformer_tpu.models.two_way import TwoWayConfig
    cfg = PlainVitConfig(
        backbone=ViTConfig(img_size=(64, 64), patch_size=(16, 16),
                           embed_dim=64, depth=4, num_heads=2),
        neck=NeckConfig(in_dim=64, out_dims=(16, 32, 48, 64),
                        img_size=(64, 64), hide_dim=64,
                        two_way=TwoWayConfig(depth=3, embedding_dim=64,
                                             num_heads=4, mlp_dim=64)),
        head=HeadConfig(in_channels=(16, 32, 48, 64), channels=32,
                        d_model=64, ed_loss=False))
    params = init_plainvit(jax.random.key(0), cfg)
    assert "att" not in params["neck"] and "ffn" not in params["neck"]
    img = jnp.zeros((2, 64, 64, 4))
    pts = jnp.full((2, 12, 3), -1.0).at[0, 0].set(jnp.asarray([30.0, 30.0, 0]))
    out = jax.jit(lambda p, i, q: plainvit_forward(p, cfg, i, q))(params, img, pts)
    assert out["instances"].shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out["instances"])).all()


def test_traced_prompt_type_matches_static():
    """vpu_forward_traced_type (training path, where-selected encodings) must
    equal vpu_forward with the static prompt_type for each type."""
    import numpy as np
    from pvpuformer_tpu.models.vpu import vpu_forward_traced_type

    cfg = tiny_cfg()
    params = init_vpu(jax.random.key(1), cfg)
    r = np.random.default_rng(0)
    img = jnp.asarray(r.uniform(size=(2, 64, 64, 4)).astype(np.float32))
    pts = jnp.full((2, 12, 3), -1.0)
    pts = pts.at[0, 0].set(jnp.asarray([20.0, 24.0, 0.0]))
    pts = pts.at[1, 6].set(jnp.asarray([40.0, 30.0, 0.0]))
    boxes = jnp.asarray([[30, 30, 20, 16, 0], [20, 40, 12, 10, 7]],
                        jnp.float32)
    scr = jnp.zeros((2, 50, 2), jnp.float32).at[:, :, 0].set(25.0)
    scr = scr.at[:, :, 1].set(jnp.linspace(10, 40, 50))
    rects = jnp.asarray([[25, 25, 10, 30], [25, 25, 10, 30]], jnp.float32)

    for pt_type in (0, 1, 2):
        static = vpu_forward(params, cfg, img, pts, boxes=boxes,
                             scribbles=(scr[:, None], rects[:, None]),
                             prompt_type=pt_type)
        traced = vpu_forward_traced_type(params, cfg, img, pts, boxes, scr,
                                         rects, jnp.int32(pt_type))
        np.testing.assert_allclose(np.asarray(static["instances"]),
                                   np.asarray(traced["instances"]),
                                   atol=2e-4, rtol=1e-3)


def test_random_shuffle_split_mode():
    """models_vit.py:193-222 random token shuffle mode: permutation-invariant
    per-block attention means the output must be finite and, with a single
    full-sequence split, close to the unshuffled forward."""
    cfg = ViTConfig(img_size=(64, 64), patch_size=(16, 16), embed_dim=32,
                    depth=4, num_heads=4)
    params = init_vit(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    base = vit_backbone_forward(params, cfg, x)
    shuf = vit_backbone_forward(params, cfg, x,
                                shuffle_key=jax.random.key(5))
    assert shuf.shape == base.shape
    # full-sequence attention is permutation-equivariant -> same values
    np.testing.assert_allclose(np.asarray(shuf), np.asarray(base),
                               atol=5e-5, rtol=1e-4)


def test_large_huge_configs_shape_check():
    """ViT-L/H config consistency (DMA dim threaded; BASELINE configs 4/5),
    via eval_shape so no large weights materialize."""
    from pvpuformer_tpu.models.vpu import vpu_large_config, vpu_huge_config
    for f in (vpu_large_config, vpu_huge_config):
        cfg = f()
        params = jax.eval_shape(lambda k: init_vpu(k, cfg), jax.random.key(0))
        img = jax.ShapeDtypeStruct((1, 448, 448, 4), jnp.float32)
        pts = jax.ShapeDtypeStruct((1, 48, 3), jnp.float32)
        out = jax.eval_shape(lambda p, i, q: vpu_forward(p, cfg, i, q,
                                                         prompt_type=0),
                             params, img, pts)
        assert out["instances"].shape == (1, 448, 448, 1)
        assert cfg.neck.two_way.embedding_dim == cfg.backbone.embed_dim


def test_conv_bf16_grad_matches_f32():
    """jax 0.9.0's conv transpose rule rejects preferred_element_type=f32
    with bf16 operands; nn.conv_nhwc's custom VJP must make every conv2d
    variant (plain / strided / grouped / dilated) differentiable in bf16,
    with gradients close to the f32 reference."""
    from pvpuformer_tpu import nn

    r = np.random.default_rng(3)
    x32 = jnp.asarray(r.normal(size=(2, 8, 8, 16)), jnp.float32)
    variants = [
        dict(kh=3, kw=3, groups=1, stride=1, padding="TORCH"),
        dict(kh=2, kw=2, groups=1, stride=2, padding="VALID"),
        dict(kh=3, kw=3, groups=16, stride=1, padding="SAME"),
        dict(kh=3, kw=3, groups=1, stride=1, padding=((2, 2), (2, 2))),
    ]
    for v in variants:
        p = nn.init_conv(jax.random.PRNGKey(0), v["kh"], v["kw"],
                         16, 16, groups=v["groups"])

        def loss(params, x):
            y = nn.conv2d(params, x, stride=v["stride"],
                          padding=v["padding"], groups=v["groups"])
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        g32 = jax.grad(loss)(p, x32)
        gbf = jax.grad(loss)(p, x32.astype(jnp.bfloat16))  # crashed pre-fix
        for k in ("w", "b"):
            assert g32[k].dtype == gbf[k].dtype == jnp.float32
            denom = np.abs(np.asarray(g32[k])).max() + 1e-6
            rel = np.abs(np.asarray(gbf[k]) - np.asarray(g32[k])).max() / denom
            assert rel < 0.05, (v, k, rel)


def test_conv_dilated_bf16_grad():
    """DeepLab's dilated conv path (deeplab.py _dilated_conv_bn) must also
    differentiate in bf16 through nn.conv_nhwc."""
    from pvpuformer_tpu import nn

    r = np.random.default_rng(5)
    x = jnp.asarray(r.normal(size=(1, 9, 9, 8)), jnp.bfloat16)
    w = jnp.asarray(r.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)

    def loss(w):
        y = nn.conv_nhwc(x, w.astype(x.dtype), (1, 1),
                         ((2, 2), (2, 2)), 1, (2, 2))
        return jnp.sum(jnp.square(y))

    g = jax.grad(loss)(w)
    assert g.dtype == jnp.float32 and float(jnp.sum(jnp.abs(g))) > 0
