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
