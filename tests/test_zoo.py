"""Legacy backbone zoo: forward shapes, registry dispatch, interactive
sessions through the fused predictor."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pvpuformer_tpu.models import registry
from pvpuformer_tpu.models.zoo.segformer import SegformerISConfig
from pvpuformer_tpu.models.zoo.hrnet import HRNetISConfig
from pvpuformer_tpu.models.zoo.deeplab import DeeplabISConfig
from pvpuformer_tpu.models.zoo.swin import SwinISConfig
from pvpuformer_tpu.models.zoo.hrformer import HRFormerISConfig
from pvpuformer_tpu.models.zoo.common import frozen_bn, init_frozen_bn
from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig

TINY_CONFIGS = [
    SegformerISConfig(embed_dims=(16, 32, 48, 64), depths=(1, 1, 1, 1),
                      num_heads=(1, 2, 3, 4), head_channels=32),
    HRNetISConfig(width=8, small=True, ocr_width=16),
    DeeplabISConfig(ch=32),
    SwinISConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                 head_channels=16, window=4),
    HRFormerISConfig(width=8, num_heads=(1, 2, 4, 8), num_units=(1, 1, 1),
                     window=4, ocr_width=16),
]


def test_frozen_bn_matches_torch_eval_bn():
    import torch
    r = np.random.default_rng(0)
    x = r.normal(size=(2, 5, 5, 8)).astype(np.float32)
    p = init_frozen_bn(8)
    p = {"scale": jnp.asarray(r.normal(size=8).astype(np.float32)),
         "bias": jnp.asarray(r.normal(size=8).astype(np.float32)),
         "mean": jnp.asarray(r.normal(size=8).astype(np.float32)),
         "var": jnp.asarray(r.uniform(0.5, 2.0, 8).astype(np.float32))}
    ours = np.asarray(frozen_bn(p, jnp.asarray(x)))
    bn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(p["mean"])))
        bn.running_var.copy_(torch.from_numpy(np.asarray(p["var"])))
        ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


@pytest.mark.parametrize("cfg", TINY_CONFIGS,
                         ids=lambda c: type(c).__name__)
def test_zoo_forward_and_grad(cfg):
    init = registry.init_for(cfg)
    fwd = registry.forward_for(cfg)
    params = init(jax.random.key(0), cfg)
    img = jnp.zeros((2, 64, 64, 4))
    pts = jnp.full((2, 8, 3), -1.0).at[0, 0].set(jnp.asarray([30.0, 30.0, 0]))
    out = jax.jit(lambda p, i, q: fwd(p, cfg, i, q))(params, img, pts)
    assert out["instances"].shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out["instances"])).all()

    # trainable: gradient flows to at least 90% of leaves
    def loss(p):
        return jnp.mean(fwd(p, cfg, img, pts)["instances"] ** 2)
    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    nz = sum(bool(np.any(np.asarray(l))) for l in leaves)
    assert nz / len(leaves) > 0.7, f"{nz}/{len(leaves)} leaves got gradient"


@pytest.mark.slow
def test_zoo_interactive_session():
    cfg = HRNetISConfig(width=8, small=True, ocr_width=16)
    params = registry.init_for(cfg)(jax.random.key(0), cfg)
    pcfg = PredictorConfig(model=cfg, target_size=(64, 64), min_crop_size=32)
    pred = Predictor(params, pcfg)
    r = np.random.default_rng(0)
    image = (r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    gt = np.zeros((64, 64), np.float32)
    gt[16:48, 20:52] = 1.0
    pred.set_input(image, gt)
    assert np.isfinite(pred.next_click())
    assert np.isfinite(pred.run_clicks(2)).all()


def test_deeplab_resnet34_init_structure_matches_reference():
    """resnetv1b.py:154-165: a downsample projection exists only when
    stride != 1 or inplanes != planes*expansion — for resnet34 layer1
    (64ch in, 64ch out, stride 1) the residual is identity, so the
    init-produced tree must match convert_deeplab_checkpoint's (no 'down'
    in layer1 block 0; 'down' in block 0 of layers 2-4 only)."""
    from pvpuformer_tpu.models.zoo.deeplab import init_deeplab_is
    for backbone, l1_down in [("resnet34", False), ("resnet50", True)]:
        cfg = DeeplabISConfig(backbone=backbone, ch=32)
        params = init_deeplab_is(jax.random.key(0), cfg)
        assert ("down" in params["layer1"][0]) == l1_down, backbone
        for lname in ("layer2", "layer3", "layer4"):
            blocks = params[lname]
            assert "down" in blocks[0], (backbone, lname)
            assert all("down" not in b for b in blocks[1:]), (backbone, lname)


def test_zoo_config_checkpoint_roundtrip(tmp_path):
    from pvpuformer_tpu.utils.serialization import (save_checkpoint,
                                                    load_checkpoint)
    cfg = HRNetISConfig(width=8, small=True, ocr_width=16)
    params = registry.init_for(cfg)(jax.random.key(0), cfg)
    save_checkpoint(tmp_path / "z.npz", params, config=cfg)
    params2, cfg2, _, _ = load_checkpoint(tmp_path / "z.npz")
    assert cfg2 == cfg


def test_swin_unet_forward():
    from pvpuformer_tpu.models.zoo.swin_unet import (SwinUNetISConfig,
                                                     init_swin_unet_is,
                                                     swin_unet_is_forward)
    cfg = SwinUNetISConfig(embed_dim=16, depths=(1, 1, 1, 1),
                           num_heads=(1, 2, 4, 8), window=4)
    params = init_swin_unet_is(jax.random.key(0), cfg)
    img = jnp.zeros((1, 64, 64, 4))
    pts = jnp.full((1, 8, 3), -1.0).at[0, 0].set(jnp.asarray([30.0, 30.0, 0]))
    out = swin_unet_is_forward(params, cfg, img, pts)
    assert out["instances"].shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out["instances"])).all()


def test_clip_bpe_tokenizer(tmp_path):
    """BPETokenizer applies merges by rank and falls back per-character;
    get_tokenizer returns the byte fallback when no vocab file exists."""
    from pvpuformer_tpu.models.zoo.clip_text import (BPETokenizer,
                                                     get_tokenizer,
                                                     byte_tokenizer, BOS, EOS)
    merges = tmp_path / "merges.txt"
    merges.write_text("#version\na b</w>\nh e\nl l\n")
    tok = BPETokenizer(str(merges))
    # "ab" -> single merged token; "cd" -> c + d</w>
    ab = tok.encode("ab")
    assert len(ab) == 1 and ab[0] == tok.encoder["ab</w>"]
    cd = tok.encode("cd")
    assert cd == [tok.encoder["c"], tok.encoder["d</w>"]]
    # "hello" -> he + ll + o</w>
    hello = tok.encode("hello")
    assert hello == [tok.encoder["he"], tok.encoder["ll"],
                     tok.encoder["o</w>"]]
    arr = tok(["ab cd"], 8)
    assert arr.shape == (1, 8) and arr[0, 0] == BOS
    assert EOS in arr[0]
    # fallback path
    assert get_tokenizer(None) is byte_tokenizer
    assert get_tokenizer(str(tmp_path / "missing.txt")) is byte_tokenizer
    assert isinstance(get_tokenizer(str(merges)), BPETokenizer)


def test_clip_text_encoder():
    from pvpuformer_tpu.models.zoo.clip_text import (ClipTextConfig,
                                                     init_clip_text,
                                                     encode_text,
                                                     byte_tokenizer)
    cfg = ClipTextConfig(width=32, heads=2, layers=2, embed_dim=16,
                         context_length=32)
    params = init_clip_text(jax.random.key(0), cfg)
    toks = byte_tokenizer(["a cat", "the red ball"], 32)
    emb = encode_text(params, cfg, jnp.asarray(toks))
    assert emb.shape == (2, 16)
    assert np.isfinite(np.asarray(emb)).all()
    # different texts -> different embeddings; same text -> same
    emb2 = encode_text(params, cfg, jnp.asarray(byte_tokenizer(["a cat"], 32)))
    np.testing.assert_allclose(np.asarray(emb[0]), np.asarray(emb2[0]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))
