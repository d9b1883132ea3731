"""Checkpoint serialization roundtrip + torch->JAX weight ingest parity."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from pvpuformer_tpu.models.vit import ViTConfig, init_vit, vit_backbone_forward
from pvpuformer_tpu.models.vpu import VPUConfig, init_vpu
from pvpuformer_tpu.utils.serialization import (save_checkpoint,
                                                load_checkpoint,
                                                config_to_dict,
                                                config_from_dict,
                                                flatten_tree, unflatten_tree)
from pvpuformer_tpu.utils.torch_ingest import (convert_mae_vit,
                                               interpolate_pos_embed_np)

from test_models import tiny_cfg


def rng(seed=0):
    return np.random.default_rng(seed)


# ------------------------------------------------------------- serialization

def test_config_roundtrip():
    cfg = tiny_cfg().replace(dtype=jnp.bfloat16)
    d = config_to_dict(cfg)
    cfg2 = config_from_dict(d)
    assert cfg2 == cfg
    import json
    json.dumps(d)            # must be pure JSON


def test_tree_flatten_roundtrip():
    tree = {"a": {"b": np.arange(6).reshape(2, 3)},
            "blocks": [{"w": np.ones((2,))}, {"w": np.zeros((3,))}]}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "blocks/#0/w", "blocks/#1/w"}
    tree2 = unflatten_tree(flat)
    np.testing.assert_array_equal(tree2["a"]["b"], tree["a"]["b"])
    assert isinstance(tree2["blocks"], list)
    np.testing.assert_array_equal(tree2["blocks"][1]["w"], tree["blocks"][1]["w"])


def test_checkpoint_roundtrip(tmp_path):
    import optax
    cfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    p = tmp_path / "ckpt.npz"
    save_checkpoint(p, params, config=cfg, opt_state=opt_state, step=7,
                    extra={"epoch": 3})
    params2, cfg2, step, extra = load_checkpoint(p, opt_state_like=opt_state)
    assert cfg2 == cfg and step == 7 and extra["epoch"] == 3
    for (k1, v1), (k2, v2) in zip(sorted(flatten_tree(params).items()),
                                  sorted(flatten_tree(params2).items())):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    o1 = jax.tree_util.tree_leaves(opt_state)
    o2 = jax.tree_util.tree_leaves(extra["opt_state"])
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ----------------------------------------------------------------- torch ViT

class TorchBlock(torch.nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn_qkv = torch.nn.Linear(dim, dim * 3)
        self.attn_proj = torch.nn.Linear(dim, dim)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.mlp_fc1 = torch.nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp_fc2 = torch.nn.Linear(int(dim * mlp_ratio), dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.norm1(x)
        qkv = self.attn_qkv(h).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv.unbind(2)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(b, n, d)
        x = x + self.attn_proj(a)
        x = x + self.mlp_fc2(F.gelu(self.mlp_fc1(self.norm2(x))))
        return x


def make_torch_vit_sd(cfg: ViTConfig, seed=0):
    """Random state dict with the MAE/reference key names."""
    torch.manual_seed(seed)
    d = cfg.embed_dim
    gh, gw = cfg.grid_size
    sd = {
        "patch_embed.proj.weight": torch.randn(d, cfg.in_chans,
                                               *cfg.patch_size) * 0.05,
        "patch_embed.proj.bias": torch.randn(d) * 0.02,
        "pos_embed": torch.randn(1, gh * gw + 1, d) * 0.02,
        "cls_token": torch.zeros(1, 1, d),
    }
    blocks = []
    for i in range(cfg.depth):
        blk = TorchBlock(d, cfg.num_heads, cfg.mlp_ratio)
        blocks.append(blk)
        for name, t in blk.state_dict().items():
            key = name.replace("attn_", "attn.").replace("mlp_", "mlp.")
            sd[f"blocks.{i}.{key}"] = t
    return sd, blocks


def torch_vit_forward(sd, blocks, cfg, x_nchw):
    w = sd["patch_embed.proj.weight"]
    b = sd["patch_embed.proj.bias"]
    x = F.conv2d(x_nchw, w, b, stride=cfg.patch_size)
    x = x.flatten(2).transpose(1, 2)                       # (B, N, D)
    x = x + sd["pos_embed"][:, 1:]
    for blk in blocks:
        x = blk(x)
    return x


def test_mae_ingest_forward_parity():
    cfg = ViTConfig(img_size=(64, 64), patch_size=(16, 16), embed_dim=32,
                    depth=4, num_heads=4)
    sd, blocks = make_torch_vit_sd(cfg)
    params = convert_mae_vit({k: v.numpy() for k, v in sd.items()}, cfg)

    r = rng(3)
    x = r.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(vit_backbone_forward(params, cfg, jnp.asarray(x)))
    with torch.no_grad():
        ref = torch_vit_forward(sd, blocks, cfg,
                                torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-4, rtol=1e-3)


def test_pos_embed_interpolation_matches_torch():
    r = rng(4)
    pos = r.normal(size=(1, 1 + 4 * 4, 8)).astype(np.float32)
    ours = interpolate_pos_embed_np(pos, (4, 4), (7, 5))
    grid = torch.from_numpy(pos[:, 1:].reshape(1, 4, 4, 8).transpose(0, 3, 1, 2))
    ref = F.interpolate(grid, size=(7, 5), mode="bicubic",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).reshape(1, 35, 8).numpy()
    np.testing.assert_allclose(ours[:, 1:], ref, atol=1e-5)
    np.testing.assert_allclose(ours[:, :1], pos[:, :1])


def make_reference_vpu_sd(cfg, seed=0):
    """Synthetic state dict with the reference VitMultiGaussianVector_ed_Model
    parameter names/shapes (is_vpu_model.py:165-186 + SimpleFPN + head)."""
    r = np.random.default_rng(seed)
    d = cfg.backbone.embed_dim
    gh, gw = cfg.backbone.grid_size
    ph, pw = cfg.backbone.patch_size
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = r.normal(0, 0.02, (o, i)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = r.normal(0, 0.02, (o,)).astype(np.float32)

    def ln(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    def conv(name, i, o, k=1, bias=True):
        sd[f"{name}.weight"] = r.normal(0, 0.02, (o, i, k, k)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def deconv(name, i, o):
        sd[f"{name}.weight"] = r.normal(0, 0.02, (i, o, 2, 2)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def attn(name, dim, internal):
        for part in ("q_proj", "k_proj", "v_proj"):
            lin(f"{name}.{part}", dim, internal)
        lin(f"{name}.out_proj", internal, dim)

    # backbone (MAE ViT names)
    sd["backbone.patch_embed.proj.weight"] = r.normal(
        0, 0.02, (d, 3, ph, pw)).astype(np.float32)
    sd["backbone.patch_embed.proj.bias"] = np.zeros((d,), np.float32)
    sd["backbone.pos_embed"] = r.normal(
        0, 0.02, (1, gh * gw + 1, d)).astype(np.float32)
    sd["backbone.cls_token"] = np.zeros((1, 1, d), np.float32)
    for i in range(cfg.backbone.depth):
        b = f"backbone.blocks.{i}"
        ln(f"{b}.norm1", d)
        lin(f"{b}.attn.qkv", d, 3 * d)
        lin(f"{b}.attn.proj", d, d)
        ln(f"{b}.norm2", d)
        lin(f"{b}.mlp.fc1", d, int(d * cfg.backbone.mlp_ratio))
        lin(f"{b}.mlp.fc2", int(d * cfg.backbone.mlp_ratio), d)

    conv("patch_embed_coords.proj", 3, d, k=ph)
    sd["pe_layer.positional_encoding_gaussian_matrix"] = r.normal(
        0, 1, (2, d // 2)).astype(np.float32)
    for i in range(4):
        sd[f"point_embeddings.{i}.weight"] = r.normal(
            0, 1, (1, d)).astype(np.float32)
    sd["not_a_point_embed.weight"] = r.normal(0, 1, (1, d)).astype(np.float32)

    # neck
    nc = cfg.neck
    lin("neck.ffn_layer.lin1", nc.prompt_dim, nc.hide_dim * 2)
    lin("neck.ffn_layer.lin2", nc.hide_dim * 2, d)
    tw = nc.two_way
    internal = tw.embedding_dim // tw.attention_downsample_rate
    for i in range(tw.depth):
        b = f"neck.att.layers.{i}"
        attn(f"{b}.self_attn", d, d)
        ln(f"{b}.norm1", d)
        attn(f"{b}.cross_attn_token_to_image", d, internal)
        ln(f"{b}.norm2", d)
        lin(f"{b}.mlp.lin1", d, tw.mlp_dim)
        lin(f"{b}.mlp.lin2", tw.mlp_dim, d)
        ln(f"{b}.norm3", d)
        attn(f"{b}.cross_attn_image_to_token", d, internal)
        ln(f"{b}.norm4", d)
    attn("neck.att.final_attn_token_to_image", d, internal)
    ln("neck.att.norm_final_attn", d)

    deconv("neck.down_4.0", d, nc.down4_chan)
    ln("neck.down_4.1", nc.down4_chan)
    deconv("neck.down_4.3", nc.down4_chan, nc.down4_chan // 2)
    ln("neck.down_4.4", nc.down4_chan // 2)
    conv("neck.down_4.5", nc.down4_chan // 2, nc.out_dims[0])
    ln("neck.down_4.6", nc.out_dims[0])
    deconv("neck.down_8.0", d, nc.down8_chan)
    ln("neck.down_8.1", nc.down8_chan)
    conv("neck.down_8.2", nc.down8_chan, nc.out_dims[1])
    ln("neck.down_8.3", nc.out_dims[1])
    conv("neck.down_16.0", d, nc.out_dims[2])
    ln("neck.down_16.1", nc.out_dims[2])
    conv("neck.down_32.0", d, nc.down32_chan, k=2)
    ln("neck.down_32.1", nc.down32_chan)
    conv("neck.down_32.2", nc.down32_chan, nc.out_dims[3])
    ln("neck.down_32.3", nc.out_dims[3])

    # head
    hc = cfg.head
    for i, ic in enumerate(hc.in_channels):
        conv(f"head.convs.{i}.conv", ic, hc.out_channels)
    conv("head.fusion_conv.conv", hc.out_channels * 4, hc.out_channels)
    conv("head.conv_seg", hc.channels, 1)
    sd["head.logit_scale"] = np.asarray(np.log(1 / 0.07), np.float32)
    lin("head.ffn_layer.lin1", hc.d_model, hc.d_model * 2)
    lin("head.ffn_layer.lin2", hc.d_model * 2, hc.out_channels)
    conv("head_aux", 128, 1)
    return sd


def test_vpu_checkpoint_ingest_structure_and_forward():
    """convert_vpu_checkpoint produces exactly init_vpu's pytree (same keys,
    same shapes) and the converted params run the forward."""
    from pvpuformer_tpu.models.vpu import init_vpu, vpu_forward
    from pvpuformer_tpu.utils.serialization import flatten_tree
    from pvpuformer_tpu.utils.torch_ingest import convert_vpu_checkpoint

    cfg = tiny_cfg()
    sd = make_reference_vpu_sd(cfg)
    ours = convert_vpu_checkpoint(sd, cfg)
    want = init_vpu(jax.random.key(0), cfg)

    f_ours = flatten_tree(ours)
    f_want = flatten_tree(want)
    assert set(f_ours) == set(f_want), (
        sorted(set(f_want) - set(f_ours))[:5],
        sorted(set(f_ours) - set(f_want))[:5])
    for k in f_want:
        assert f_ours[k].shape == tuple(np.shape(f_want[k])), \
            (k, f_ours[k].shape, np.shape(f_want[k]))

    img = jnp.zeros((1, 64, 64, 4))
    pts = jnp.full((1, 12, 3), -1.0).at[0, 0].set(jnp.asarray([30.0, 30.0, 0]))
    out = vpu_forward(ours, cfg, img, pts, prompt_type=0)
    assert np.isfinite(np.asarray(out["instances"])).all()


def test_plainvit_checkpoint_ingest_structure():
    from pvpuformer_tpu.models.plainvit import (PlainVitConfig, init_plainvit,
                                                plainvit_forward)
    from pvpuformer_tpu.models.vit import ViTConfig
    from pvpuformer_tpu.models.fpn import NeckConfig
    from pvpuformer_tpu.models.two_way import TwoWayConfig
    from pvpuformer_tpu.models.seg_head import HeadConfig
    from pvpuformer_tpu.utils.serialization import flatten_tree
    from pvpuformer_tpu.utils.torch_ingest import convert_plainvit_checkpoint

    cfg = PlainVitConfig(
        backbone=ViTConfig(img_size=(64, 64), patch_size=(16, 16),
                           embed_dim=64, depth=4, num_heads=2),
        neck=NeckConfig(in_dim=64, out_dims=(16, 32, 48, 64),
                        img_size=(64, 64), hide_dim=64,
                        two_way=TwoWayConfig(depth=3, embedding_dim=64,
                                             num_heads=4, mlp_dim=64)),
        head=HeadConfig(in_channels=(16, 32, 48, 64), channels=32,
                        d_model=64, ed_loss=False))
    # reuse the VPU synthetic state dict generator and strip the DMA parts
    vcfg = tiny_cfg()
    sd = make_reference_vpu_sd(vcfg)
    # plainvit coord patch embed uses the same name
    ours = convert_plainvit_checkpoint(sd, cfg)
    want = init_plainvit(jax.random.key(0), cfg)
    assert set(flatten_tree(ours)) == set(flatten_tree(want))
    img = jnp.zeros((1, 64, 64, 4))
    pts = jnp.full((1, 12, 3), -1.0).at[0, 0].set(jnp.asarray([30.0, 30.0, 0]))
    out = plainvit_forward(ours, cfg, img, pts)
    assert np.isfinite(np.asarray(out["instances"])).all()


def test_orbax_checkpoint_roundtrip(tmp_path):
    from pvpuformer_tpu.utils.serialization import (save_checkpoint_orbax,
                                                    load_checkpoint_orbax)
    cfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), cfg)
    save_checkpoint_orbax(tmp_path / "ck", params, config=cfg, step=5,
                          extra={"epoch": 1})
    like = {"params": jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params)}
    state, cfg2, step, extra = load_checkpoint_orbax(tmp_path / "ck", like)
    assert cfg2 == cfg and step == 5 and extra["epoch"] == 1
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def make_reference_hrnet_sd(cfg, seed=0):
    """Synthetic RITM HRNetModel state dict (hrnet_ocr.py names)."""
    r = np.random.default_rng(seed)
    sd = {}

    def conv(name, i, o, k=3, bias=False):
        sd[f"{name}.weight"] = r.normal(0, 0.02, (o, i, k, k)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)
        sd[f"{name}.running_mean"] = r.normal(0, 0.1, (c,)).astype(np.float32)
        sd[f"{name}.running_var"] = r.uniform(0.5, 2.0, (c,)).astype(np.float32)

    def cb(cname, bname, i, o, k=3, bias=False):
        conv(cname, i, o, k, bias)
        bn(bname, o)

    # ISModel maps_transform (is_model.py:28-36)
    conv("maps_transform.0", 3, 16, k=1, bias=True)
    conv("maps_transform.2", 16, 64, k=3, bias=True)
    sd["maps_transform.3.scale"] = np.asarray([0.05], np.float32)

    fx = "feature_extractor."
    w = cfg.branch_widths
    blocks = cfg.blocks_per_module
    cb(f"{fx}conv1", f"{fx}bn1", 3, 64)
    cb(f"{fx}conv2", f"{fx}bn2", 64, 64)
    for j in range(blocks):
        p = f"{fx}layer1.{j}"
        cin = 64 if j == 0 else 256
        cb(f"{p}.conv1", f"{p}.bn1", cin, 64, k=1)
        cb(f"{p}.conv2", f"{p}.bn2", 64, 64, k=3)
        cb(f"{p}.conv3", f"{p}.bn3", 64, 256, k=1)
        if j == 0:
            cb(f"{p}.downsample.0", f"{p}.downsample.1", cin, 256, k=1)

    def transition(tname, prev, cur):
        for i, cw in enumerate(cur):
            base = f"{fx}{tname}.{i}"
            if i < len(prev):
                if prev[i] != cw:
                    cb(f"{base}.0", f"{base}.1", prev[i], cw)
            else:
                cb(f"{base}.0.0", f"{base}.0.1", prev[-1], cw)

    def stage(sname, widths, n_modules):
        for m in range(n_modules):
            p = f"{fx}{sname}.{m}"
            for b, bw in enumerate(widths):
                for j in range(blocks):
                    q = f"{p}.branches.{b}.{j}"
                    cb(f"{q}.conv1", f"{q}.bn1", bw, bw)
                    cb(f"{q}.conv2", f"{q}.bn2", bw, bw)
            nbr = len(widths)
            for i in range(nbr):
                for j in range(nbr):
                    f = f"{p}.fuse_layers.{i}.{j}"
                    if j > i:
                        cb(f"{f}.0", f"{f}.1", widths[j], widths[i], k=1)
                    elif j < i:
                        cin = widths[j]
                        for k in range(i - j):
                            cout = widths[i] if k == i - j - 1 else widths[j]
                            cb(f"{f}.{k}.0", f"{f}.{k}.1", cin, cout)
                            cin = cout

    transition("transition1", (256,), w[:2])
    stage("stage2", w[:2], cfg.num_modules[0])
    transition("transition2", w[:2], w[:3])
    stage("stage3", w[:3], cfg.num_modules[1])
    transition("transition3", w[:3], w)
    stage("stage4", w, cfg.num_modules[2])

    total = sum(w)
    mid, key = 2 * cfg.ocr_width, cfg.ocr_width
    cb(f"{fx}conv3x3_ocr.0", f"{fx}conv3x3_ocr.1", total, mid, bias=True)
    cb(f"{fx}aux_head.0", f"{fx}aux_head.1", total, total, k=1, bias=True)
    conv(f"{fx}aux_head.3", total, 1, k=1, bias=True)
    ob = f"{fx}ocr_distri_head.object_context_block"
    for name in ("f_pixel", "f_object"):
        cb(f"{ob}.{name}.0", f"{ob}.{name}.1.0", mid, key, k=1)
        cb(f"{ob}.{name}.2", f"{ob}.{name}.3.0", key, key, k=1)
    cb(f"{ob}.f_down.0", f"{ob}.f_down.1.0", mid, key, k=1)
    cb(f"{ob}.f_up.0", f"{ob}.f_up.1.0", key, mid, k=1)
    cb(f"{fx}ocr_distri_head.conv_bn_dropout.0",
       f"{fx}ocr_distri_head.conv_bn_dropout.1.0", 2 * mid, mid, k=1)
    conv(f"{fx}cls_head", mid, 1, k=1, bias=True)
    return sd


def test_hrnet_checkpoint_ingest():
    from pvpuformer_tpu.models.zoo.hrnet import (HRNetISConfig,
                                                 init_hrnet_is,
                                                 hrnet_is_forward)
    from pvpuformer_tpu.utils.serialization import flatten_tree
    from pvpuformer_tpu.utils.torch_ingest import convert_hrnet_checkpoint

    cfg = HRNetISConfig(width=8, small=True, ocr_width=16)
    sd = make_reference_hrnet_sd(cfg)
    ours = convert_hrnet_checkpoint(sd, cfg)
    want = init_hrnet_is(jax.random.key(0), cfg)

    f_ours = flatten_tree(ours)
    f_want = flatten_tree(want)
    missing = set(f_want) - set(f_ours)
    assert not missing, sorted(missing)[:6]
    for k in f_want:
        assert np.shape(f_ours[k]) == np.shape(np.asarray(f_want[k])), \
            (k, np.shape(f_ours[k]))
    # extra keys = torch conv biases before BN (applied faithfully)
    extra = set(f_ours) - set(f_want)
    assert all(k.endswith("/b") or k.endswith(".b") or "/conv/b" in k
               or k.endswith("b") for k in extra), sorted(extra)[:6]

    img = jnp.zeros((1, 64, 64, 4))
    pts = jnp.full((1, 8, 3), -1.0).at[0, 0].set(jnp.asarray([30.0, 30.0, 0]))
    out = hrnet_is_forward(ours, cfg, img, pts)
    assert np.isfinite(np.asarray(out["instances"])).all()


def test_mit_backbone_ingest():
    """mmseg mit-b* backbone weights -> zoo/segformer stages, with the
    stage-1 channel surgery for coord inputs (segformer.py:399-404)."""
    from pvpuformer_tpu.models.zoo.segformer import (SegformerISConfig,
                                                     init_segformer_is,
                                                     segformer_is_forward)
    from pvpuformer_tpu.utils.serialization import flatten_tree
    from pvpuformer_tpu.utils.torch_ingest import convert_mit_backbone

    cfg = SegformerISConfig(embed_dims=(16, 32, 48, 64), depths=(1, 2, 1, 1),
                            num_heads=(1, 2, 3, 4), head_channels=32)
    r = np.random.default_rng(0)
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = r.normal(0, 0.02, (o, i)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def ln(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    def conv(name, i, o, kk):
        sd[f"{name}.weight"] = r.normal(0, 0.02, (o, i, kk, kk)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    patch = [(7, 3), (3, 16), (3, 32), (3, 48)]
    for i, d in enumerate(cfg.embed_dims):
        kk, cin = patch[i]
        conv(f"layers.{i}.0.projection", cin, d, kk)
        ln(f"layers.{i}.0.norm", d)
        for j in range(cfg.depths[i]):
            b = f"layers.{i}.1.{j}"
            ln(f"{b}.norm1", d)
            sd[f"{b}.attn.attn.in_proj_weight"] = r.normal(
                0, 0.02, (3 * d, d)).astype(np.float32)
            sd[f"{b}.attn.attn.in_proj_bias"] = np.zeros((3 * d,), np.float32)
            lin(f"{b}.attn.attn.out_proj", d, d)
            if cfg.sr_ratios[i] > 1:
                conv(f"{b}.attn.sr", d, d, cfg.sr_ratios[i])
                ln(f"{b}.attn.norm", d)
            ln(f"{b}.norm2", d)
            hidden = int(d * cfg.mlp_ratio)
            conv(f"{b}.ffn.layers.0", d, hidden, 1)
            sd[f"{b}.ffn.layers.1.weight"] = r.normal(
                0, 0.02, (hidden, 1, 3, 3)).astype(np.float32)
            sd[f"{b}.ffn.layers.1.bias"] = np.zeros((hidden,), np.float32)
            conv(f"{b}.ffn.layers.4", hidden, d, 1)
        ln(f"layers.{i}.2", d)

    backbone = convert_mit_backbone(sd, cfg)
    want = init_segformer_is(jax.random.key(0), cfg)
    f_ours = flatten_tree(backbone["stages"])
    f_want = flatten_tree(want["stages"])
    assert set(f_ours) == set(f_want), (
        sorted(set(f_want) - set(f_ours))[:5],
        sorted(set(f_ours) - set(f_want))[:5])
    for kk_ in f_want:
        assert np.shape(f_ours[kk_]) == np.shape(np.asarray(f_want[kk_])), kk_

    params = dict(want)
    params["stages"] = backbone["stages"]
    img = jnp.zeros((1, 64, 64, 4))
    pts = jnp.full((1, 8, 3), -1.0).at[0, 0].set(jnp.asarray([30.0, 30.0, 0]))
    out = segformer_is_forward(params, cfg, img, pts)
    assert np.isfinite(np.asarray(out["instances"])).all()


def test_swin_backbone_ingest():
    """Official-layout Swin weights -> zoo/swin, with a torch oracle for one
    full block (validates qkv packing, rel-bias table, every transpose)."""
    import torch
    import torch.nn.functional as F
    from pvpuformer_tpu.models.zoo.swin import (SwinISConfig, init_swin_is,
                                                swin_is_forward, _block,
                                                _rel_index)
    from pvpuformer_tpu.utils.serialization import flatten_tree
    from pvpuformer_tpu.utils.torch_ingest import convert_swin_backbone

    cfg = SwinISConfig(embed_dim=16, depths=(1, 1), num_heads=(2, 4),
                       window=4, head_channels=16, patch_norm=True)
    r = np.random.default_rng(0)
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = r.normal(0, 0.05, (o, i)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = r.normal(0, 0.02, (o,)).astype(np.float32)

    def ln(name, c):
        sd[f"{name}.weight"] = r.normal(1, 0.05, (c,)).astype(np.float32)
        sd[f"{name}.bias"] = r.normal(0, 0.02, (c,)).astype(np.float32)

    sd["patch_embed.proj.weight"] = r.normal(
        0, 0.05, (16, 3, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros((16,), np.float32)
    ln("patch_embed.norm", 16)
    for i, d in enumerate(cfg.stage_dims):
        for j in range(cfg.depths[i]):
            b = f"layers.{i}.blocks.{j}"
            ln(f"{b}.norm1", d)
            lin(f"{b}.attn.qkv", d, 3 * d)
            lin(f"{b}.attn.proj", d, d)
            sd[f"{b}.attn.relative_position_bias_table"] = r.normal(
                0, 0.02, ((2 * cfg.window - 1) ** 2,
                          cfg.num_heads[i])).astype(np.float32)
            ln(f"{b}.norm2", d)
            lin(f"{b}.mlp.fc1", d, 4 * d)
            lin(f"{b}.mlp.fc2", 4 * d, d)
        ln(f"norm{i}", d)
        if i < len(cfg.depths) - 1:
            ln(f"layers.{i}.downsample.norm", 4 * d)
            lin(f"layers.{i}.downsample.reduction", 4 * d, 2 * d, bias=False)

    backbone = convert_swin_backbone(sd, cfg)
    want = init_swin_is(jax.random.key(0), cfg)
    keys = ("patch_embed", "patch_norm", "stages")
    f_ours = flatten_tree({k: backbone[k] for k in keys})
    f_want = flatten_tree({k: want[k] for k in keys})
    assert set(f_ours) == set(f_want), (
        sorted(set(f_want) - set(f_ours))[:5],
        sorted(set(f_ours) - set(f_want))[:5])
    for kk in f_want:
        assert np.shape(f_ours[kk]) == np.shape(np.asarray(f_want[kk])), kk

    # --- torch oracle: stage-0 block, one 4x4 window, no shift -----------
    d, heads, ww = 16, cfg.num_heads[0], cfg.window
    n = ww * ww
    x = r.normal(0, 1, (1, n, d)).astype(np.float32)
    b = "layers.0.blocks.0"
    t = {k: torch.tensor(v) for k, v in sd.items()}
    xt = torch.tensor(x)
    h = F.layer_norm(xt, (d,), t[f"{b}.norm1.weight"],
                     t[f"{b}.norm1.bias"], eps=1e-5)
    qkv = (h @ t[f"{b}.attn.qkv.weight"].T + t[f"{b}.attn.qkv.bias"])
    qkv = qkv.reshape(1, n, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
    q, kk_, v = qkv[0], qkv[1], qkv[2]
    attn = (q * (d // heads) ** -0.5) @ kk_.transpose(-2, -1)
    idx = torch.tensor(_rel_index(ww).reshape(-1).astype(np.int64))
    bias = t[f"{b}.attn.relative_position_bias_table"][idx]
    attn = attn + bias.view(n, n, heads).permute(2, 0, 1)[None]
    out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(1, n, d)
    out = out @ t[f"{b}.attn.proj.weight"].T + t[f"{b}.attn.proj.bias"]
    xt = xt + out
    h = F.layer_norm(xt, (d,), t[f"{b}.norm2.weight"],
                     t[f"{b}.norm2.bias"], eps=1e-5)
    h = F.gelu(h @ t[f"{b}.mlp.fc1.weight"].T + t[f"{b}.mlp.fc1.bias"],
               approximate="tanh")
    xt = xt + (h @ t[f"{b}.mlp.fc2.weight"].T + t[f"{b}.mlp.fc2.bias"])

    ours = _block(backbone["stages"][0]["blocks"][0], jnp.asarray(x),
                  (ww, ww), heads, ww, 0, 4.0)
    np.testing.assert_allclose(np.asarray(ours), xt.numpy(),
                               atol=2e-5, rtol=1e-4)

    # --- end-to-end forward with ingested backbone -----------------------
    params = dict(want)
    for k in keys:
        params[k] = backbone[k]
    img = jnp.zeros((1, 64, 64, 4))
    pts = jnp.full((1, 8, 3), -1.0).at[0, 0].set(jnp.asarray([30.0, 30.0, 0]))
    out2 = swin_is_forward(params, cfg, img, pts)
    assert np.isfinite(np.asarray(out2["instances"])).all()
