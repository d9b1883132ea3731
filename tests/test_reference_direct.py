"""Direct numerical parity against the ACTUAL reference implementation.

tests/oracles.py re-implements the cited reference formulas; these tests go
one step further: they import the reference's own torch modules (the
mmcv-free subset) from /root/reference, convert their randomly-initialized
weights with utils/torch_ingest, and require matching outputs. This catches
oracle drift — a bug copied into both our kernel and our oracle cannot hide
from the reference itself.

Skipped entirely when the reference tree is not mounted.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_path():
    """Make `isegm.*` importable, with faithful minimal stubs for the
    third-party packages this image lacks (see ref_stubs.py). Also pins
    matmul precision to 'highest' — JAX's DEFAULT precision does reduced-
    precision f32 matmuls (~2e-3, bf16-grade) even on CPU, which would
    drown the semantic differences these tests exist to catch."""
    import jax
    import ref_stubs
    ref_stubs.install()
    sys.path.insert(0, str(REF))
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield REF
    jax.config.update("jax_default_matmul_precision", old)
    sys.path.remove(str(REF))


def _sd(module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# TwoWayTransformer (DMA core)
# ---------------------------------------------------------------------------

def test_two_way_transformer_matches_reference(ref_path):
    from isegm.model.modeling.transformer import TwoWayTransformer

    import jax.numpy as jnp
    from pvpuformer_tpu.models.two_way import TwoWayConfig, two_way_forward
    from pvpuformer_tpu.utils.torch_ingest import _attn, _gn, _lin

    torch.manual_seed(0)
    depth, dim, heads, mlp = 3, 64, 4, 128
    ref = TwoWayTransformer(depth=depth, embedding_dim=dim, num_heads=heads,
                            mlp_dim=mlp, attention_downsample_rate=2,
                            return_intermediate=True).eval()

    b, n_q, h = 2, 6, 8          # image tokens 8x8 (square, per the
    q = torch.randn(b, n_q, dim)  # reference's h=w=sqrt(HW) assumption)
    img = torch.randn(b, h * h, dim)
    with torch.no_grad():
        ref_out = ref(q, img)
    assert len(ref_out) == depth

    sd = _sd(ref)
    layers = []
    for i in range(depth):
        p = f"layers.{i}"
        layers.append({
            "self_attn": _attn(sd, f"{p}.self_attn"),
            "norm1": _gn(sd, f"{p}.norm1"),
            "cross_t2i": _attn(sd, f"{p}.cross_attn_token_to_image"),
            "norm2": _gn(sd, f"{p}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{p}.mlp.lin1"),
                    "fc2": _lin(sd, f"{p}.mlp.lin2")},
            "norm3": _gn(sd, f"{p}.norm3"),
            "cross_i2t": _attn(sd, f"{p}.cross_attn_image_to_token"),
            "norm4": _gn(sd, f"{p}.norm4"),
        })
    params = {"layers": layers,
              "final_t2i": _attn(sd, "final_attn_token_to_image"),
              "norm_final": _gn(sd, "norm_final_attn")}

    cfg = TwoWayConfig(depth=depth, embedding_dim=dim, num_heads=heads,
                       mlp_dim=mlp, attention_downsample_rate=2)
    ours = two_way_forward(params, cfg, jnp.asarray(q.numpy()),
                           jnp.asarray(img.numpy()), (h, h))

    for i, ((rq, rk), (oq, ok)) in enumerate(zip(ref_out, ours)):
        np.testing.assert_allclose(np.asarray(oq), rq.numpy(),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"queries depth {i}")
        np.testing.assert_allclose(np.asarray(ok), rk.numpy(),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"keys depth {i}")


# ---------------------------------------------------------------------------
# MAE ViT backbone with window patchify
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_vit_backbone_matches_reference(ref_path):
    from isegm.model.modeling.models_vit import VisionTransformer

    import jax.numpy as jnp
    from pvpuformer_tpu.models.vit import ViTConfig, vit_backbone_forward
    from pvpuformer_tpu.utils.torch_ingest import convert_mae_vit

    torch.manual_seed(1)
    # 448^2 / patch 16 -> 28x28 grid, 2x2 windows of 224px; depth 12 ->
    # global block every 6th, exactly the shipped configuration's control
    # flow (models_vit.py:274-287) at toy width.
    ref = VisionTransformer(img_size=(448, 448), patch_size=(16, 16),
                            in_chans=3, embed_dim=64, depth=12,
                            num_heads=4).eval()
    with torch.no_grad():
        ref.pos_embed.normal_(0, 0.02)
    ref = ref.double()   # f64 on both sides: semantic, not float, parity

    x = torch.randn(2, 3, 448, 448, dtype=torch.float64)
    add = torch.randn(2, 28 * 28, 64, dtype=torch.float64)
    with torch.no_grad():
        ref_out = ref.forward_backbone(x, additional_features=add)

    cfg = ViTConfig(img_size=(448, 448), patch_size=(16, 16), embed_dim=64,
                    depth=12, num_heads=4)
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                              convert_mae_vit(_sd(ref), cfg))
        ours = vit_backbone_forward(params, cfg,
                                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                                    additional=jnp.asarray(add.numpy()))
        # not 1e-12: nn.sdpa keeps its softmax in f32 by design (TPU), so
        # f64 agreement bottoms out around 1e-6; 1e-5 still rules out any
        # semantic difference (the tanh-GELU bug this test caught was 2e-3)
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(),
                                   atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# CRIS-style TransformerDecoder (is_vitdetr_* experiment stack)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("image_to_token", [False, True])
def test_transformer_decoder_matches_reference(ref_path, image_to_token):
    # NB: image_to_token=True only runs with as_text=False in the reference
    # too — its txt_pos (length L) cannot broadcast onto the HW-long
    # threaded output (transformer.py:195).
    as_text = not image_to_token
    from isegm.model.modeling.transformer import TransformerDecoder

    import jax.numpy as jnp
    from pvpuformer_tpu.models.decoder import (DecoderConfig, decoder_forward)
    from pvpuformer_tpu.utils.torch_ingest import _gn, _lin

    torch.manual_seed(17)
    layers, d, heads, ffn = 2, 64, 4, 128
    ref = TransformerDecoder(num_layers=layers, d_model=d, nhead=heads,
                             dim_ffn=ffn, dropout=0.1,
                             return_intermediate=True).eval()

    b, hw, l = 2, 64, 5    # 8x8 image tokens (h=w=sqrt(HW) path)
    vis = torch.randn(b, hw, d)
    txt = torch.randn(b, l, d)
    with torch.no_grad():
        ref_out = ref(vis, txt, as_text=as_text, image_to_token=image_to_token)

    sd = _sd(ref)
    lp = []
    for i in range(layers):
        base = f"layers.{i}"
        def attn(name):
            return {"in_proj": {"w": sd[f"{base}.{name}.in_proj_weight"].T,
                                "b": sd[f"{base}.{name}.in_proj_bias"]},
                    "out": _lin(sd, f"{base}.{name}.out_proj")}
        lp.append({
            "self_attn": attn("self_attn"),
            "self_attn_norm": _gn(sd, f"{base}.self_attn_norm"),
            "cross_attn": attn("multihead_attn"),
            "cross_attn_norm": _gn(sd, f"{base}.cross_attn_norm"),
            "ffn": {"fc1": _lin(sd, f"{base}.ffn.0"),
                    "ln": _gn(sd, f"{base}.ffn.3"),
                    "fc2": _lin(sd, f"{base}.ffn.4")},
            "norm1": _gn(sd, f"{base}.norm1"),
            "norm2": _gn(sd, f"{base}.norm2"),
            "norm3": _gn(sd, f"{base}.norm3"),
        })
    params = {"layers": lp, "norm": _gn(sd, "norm.0")}

    cfg = DecoderConfig(num_layers=layers, d_model=d, nhead=heads,
                        dim_ffn=ffn, return_intermediate=True)
    ours = decoder_forward(params, cfg, jnp.asarray(vis.numpy()),
                           jnp.asarray(txt.numpy()), (8, 8), as_text=as_text,
                           image_to_token=image_to_token)
    assert len(ours) == len(ref_out) == layers
    for i, (o, rr) in enumerate(zip(ours, ref_out)):
        r = rr.numpy()
        if image_to_token:
            r = r.transpose(0, 2, 1)        # reference returns (B, D, HW)
        np.testing.assert_allclose(np.asarray(o), r, atol=2e-5, rtol=1e-4,
                                   err_msg=f"layer {i} (i2t={image_to_token})")


# ---------------------------------------------------------------------------
# FULL VPU model: reference torch forward vs ours with converted weights
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("prompt_type", [0, 1])
def test_full_vpu_model_matches_reference(ref_path, prompt_type):
    """End-to-end: VitMultiGaussianVector_ed_Model (the shipped model,
    instantiated exactly like models/iSegNet/vpu_base448_cocolvis.py:11-61
    but at 224 crop / depth 4) -> convert_vpu_checkpoint -> our vpu_forward.
    Validates model math AND the checkpoint converter in one shot, for both
    the click path (as_prompt_type=0) and the box path (=1: host cv2
    rectangle into the coord channel + GaussianVector_box PPuE vs our
    on-device rasterization + ppue_box)."""
    from isegm.model.is_vpu_model import VitMultiGaussianVector_ed_Model
    from isegm.model.modeling.transformer_helper.cross_entropy_loss import \
        CrossEntropyLoss

    import jax.numpy as jnp
    from pvpuformer_tpu.models.fpn import NeckConfig
    from pvpuformer_tpu.models.seg_head import HeadConfig
    from pvpuformer_tpu.models.vit import ViTConfig
    from pvpuformer_tpu.models.vpu import VPUConfig, vpu_forward
    from pvpuformer_tpu.utils.torch_ingest import convert_vpu_checkpoint

    torch.manual_seed(5)
    crop = (224, 224)
    backbone_params = dict(img_size=crop, patch_size=(16, 16), in_chans=3,
                           embed_dim=768, depth=4, num_heads=12)
    neck_params = dict(in_dim=768, out_dims=[128, 256, 512, 1024],
                       img_size=list(crop))
    head_params = dict(in_channels=[128, 256, 512, 1024], in_index=[0, 1, 2, 3],
                       dropout_ratio=0.1, num_classes=1,
                       loss_decode=CrossEntropyLoss(), align_corners=False,
                       upsample="x1", ed_loss=True, channels=256)
    ref = VitMultiGaussianVector_ed_Model(
        num_max_points=4, use_disks=True, norm_radius=5, with_prev_mask=True,
        backbone_params=backbone_params, neck_params=neck_params,
        head_params=head_params, random_split=False, residual=True,
        with_aux_output=True).eval()
    with torch.no_grad():
        ref.backbone.pos_embed.normal_(0, 0.02)

    rng = np.random.default_rng(6)
    image = torch.from_numpy(
        rng.uniform(0, 1, (1, 4, 224, 224)).astype(np.float32))
    pts = np.full((1, 8, 3), -1, np.float32)
    pts[0, 0] = (60, 100, 0)   # two positive clicks
    pts[0, 1] = (120, 47, 1)
    pts[0, 4] = (30, 200, 2)   # one negative click
    points = torch.from_numpy(pts)
    box = np.array([[112, 100, 80, 60, 0]], np.int64)   # [xc, yc, w, h, slot]
    prompts = (points, torch.from_numpy(box),
               (torch.zeros(1, 1, 1000, 2), torch.zeros(1, 1, 4)))
    with torch.no_grad():
        ref_out = ref(image, points, prompts=prompts,
                      as_prompt_type=prompt_type, edloss=True)

    cfg = VPUConfig(
        backbone=ViTConfig(img_size=crop, patch_size=(16, 16), embed_dim=768,
                           depth=4, num_heads=12),
        neck=NeckConfig(in_dim=768, out_dims=(128, 256, 512, 1024),
                        img_size=crop),
        head=HeadConfig(in_channels=(128, 256, 512, 1024), channels=256,
                        upsample="x1"),
        num_max_points=4)
    params = convert_vpu_checkpoint(_sd(ref), cfg)
    ours = vpu_forward(params, cfg,
                       jnp.asarray(image.numpy().transpose(0, 2, 3, 1)),
                       jnp.asarray(pts),
                       boxes=jnp.asarray(box, jnp.float32),
                       prompt_type=prompt_type)

    np.testing.assert_allclose(
        np.asarray(ours["instances"])[..., 0],
        ref_out["instances"].numpy()[:, 0], atol=2e-4,
        err_msg="seg logits")
    np.testing.assert_allclose(
        np.asarray(ours["instances_aux"]).transpose(0, 3, 1, 2),
        ref_out["instances_aux"].numpy(), atol=2e-4,
        err_msg="P2CL maps")


# ---------------------------------------------------------------------------
# PPuE click Gaussian vectors
# ---------------------------------------------------------------------------

class _Cfg(dict):
    __getattr__ = dict.__getitem__


def test_ppue_click_profiles_match_reference(ref_path):
    from isegm.model.ops import GaussianVector

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.ops.ppue import PPuEConfig, _click_vec

    ref = GaussianVector(_Cfg(input_shape=(448, 448), sigma=3,
                              input_over_output_stride=4,
                              upsampling_scale=4, heighten_peak=True))
    rng = np.random.default_rng(2)
    lmks = rng.integers(-5, 453, (2, 7, 2)).astype(np.float64)
    lmks[0, 0] = (447, 447)
    lmks[0, 1] = (0, 0)
    lmks[1, 0] = (-1, -1)      # padded/invalid slot
    lmks[1, 1] = (446, 2)
    vx, vy = ref.transform_lmks_to_vector(lmks)

    cfg = PPuEConfig(input_h=448, input_w=448, sigma=3.0, heighten_peak=True)
    v0, v1 = jax.vmap(jax.vmap(lambda p: _click_vec(cfg, p)))(
        jnp.asarray(lmks, jnp.float32))
    np.testing.assert_allclose(np.asarray(v0), vx.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), vy.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# DistMaps (GPU-path math)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_disks", [True, False])
def test_dist_maps_match_reference(ref_path, use_disks):
    from isegm.model.ops import DistMaps

    import jax.numpy as jnp
    from pvpuformer_tpu.ops.distmaps import dist_maps

    ref = DistMaps(norm_radius=5, spatial_scale=1.0, cpu_mode=False,
                   use_disks=use_disks)
    rng = np.random.default_rng(3)
    pts = rng.integers(0, 64, (2, 8, 3)).astype(np.float32)
    pts[:, :, 2] = np.arange(8)[None]
    pts[0, 2] = (-1, -1, -1)
    pts[1, 5:] = -1
    with torch.no_grad():
        ref_out = ref.get_coord_features(torch.from_numpy(pts), 2, 64, 48)

    ours = dist_maps(jnp.asarray(pts), 64, 48, norm_radius=5.0,
                     spatial_scale=1.0, use_disks=use_disks)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref_out.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# PlainVit (SimpleClick) full interactive model
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_full_plainvit_model_matches_reference(ref_path):
    """PlainVitModel (is_plainvit_model.py:59-95) vs our models/plainvit.py
    through convert_plainvit_checkpoint."""
    from isegm.model.is_plainvit_model import PlainVitModel
    from isegm.model.modeling.transformer_helper.cross_entropy_loss import \
        CrossEntropyLoss

    import jax.numpy as jnp
    from pvpuformer_tpu.models.fpn import NeckConfig
    from pvpuformer_tpu.models.plainvit import (PlainVitConfig,
                                                plainvit_forward)
    from pvpuformer_tpu.models.seg_head import HeadConfig
    from pvpuformer_tpu.models.vit import ViTConfig
    from pvpuformer_tpu.utils.torch_ingest import convert_plainvit_checkpoint

    torch.manual_seed(9)
    crop = (224, 224)
    ref = PlainVitModel(
        backbone_params=dict(img_size=crop, patch_size=(16, 16), in_chans=3,
                             embed_dim=768, depth=4, num_heads=12),
        neck_params=dict(in_dim=768, out_dims=[128, 256, 512, 1024]),
        head_params=dict(in_channels=[128, 256, 512, 1024],
                         in_index=[0, 1, 2, 3], dropout_ratio=0.1,
                         num_classes=1, loss_decode=CrossEntropyLoss(),
                         align_corners=False, upsample="x1", ed_loss=False,
                         channels=256),
        use_disks=True, norm_radius=5, with_prev_mask=True).eval()
    with torch.no_grad():
        ref.backbone.pos_embed.normal_(0, 0.02)

    rng = np.random.default_rng(10)
    image = torch.from_numpy(
        rng.uniform(0, 1, (1, 4, 224, 224)).astype(np.float32))
    pts = np.full((1, 8, 3), -1, np.float32)
    pts[0, 0] = (88, 111, 0)
    pts[0, 4] = (190, 30, 1)
    with torch.no_grad():
        ref_out = ref(image, torch.from_numpy(pts))

    cfg = PlainVitConfig(
        backbone=ViTConfig(img_size=crop, patch_size=(16, 16), embed_dim=768,
                           depth=4, num_heads=12),
        neck=NeckConfig(in_dim=768, out_dims=(128, 256, 512, 1024),
                        img_size=crop),
        head=HeadConfig(in_channels=(128, 256, 512, 1024), channels=256,
                        upsample="x1", ed_loss=False))
    params = convert_plainvit_checkpoint(_sd(ref), cfg)
    ours = plainvit_forward(params, cfg,
                            jnp.asarray(image.numpy().transpose(0, 2, 3, 1)),
                            jnp.asarray(pts))
    np.testing.assert_allclose(
        np.asarray(ours["instances"])[..., 0],
        ref_out["instances"].numpy()[:, 0], atol=2e-4)


# ---------------------------------------------------------------------------
# Swin backbone + SegFormer head full interactive model
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_full_swinformer_model_matches_reference(ref_path):
    """SwinformerModel (is_swinformer_model.py:5-21, swin_transformer.py
    backbone with shifted windows + relative position bias) vs our
    zoo/swin.py through convert_swin_backbone. The reference routes coord
    features through the SAME patch embed as RGB (swin_transformer.py:
    619-622); our separate coord embed is set to the converted RGB embed
    here, making the two mathematically identical."""
    from isegm.model.is_swinformer_model import SwinformerModel
    from isegm.model.modeling.transformer_helper.cross_entropy_loss import \
        CrossEntropyLoss

    import jax.numpy as jnp
    from pvpuformer_tpu.models.zoo.swin import SwinISConfig, swin_is_forward
    from pvpuformer_tpu.utils.torch_ingest import (_conv,
                                                   convert_swin_backbone)

    torch.manual_seed(11)
    depths, heads = [2, 2, 2], [3, 6, 12]
    ref = SwinformerModel(
        backbone_params=dict(embed_dim=48, depths=depths, num_heads=heads,
                             window_size=7, patch_norm=False, ape=False,
                             out_indices=(0, 1, 2), in_chans=3),
        head_params=dict(in_channels=[48, 96, 192], in_index=[0, 1, 2],
                         dropout_ratio=0.1, num_classes=1,
                         loss_decode=CrossEntropyLoss(), align_corners=False,
                         upsample="x1", ed_loss=False, channels=64),
        use_disks=True, norm_radius=5, with_prev_mask=True).eval()

    rng = np.random.default_rng(12)
    image = torch.from_numpy(
        rng.uniform(0, 1, (1, 4, 224, 224)).astype(np.float32))
    pts = np.full((1, 8, 3), -1, np.float32)
    pts[0, 0] = (100, 60, 0)
    pts[0, 4] = (30, 180, 1)
    with torch.no_grad():
        ref_out = ref(image, torch.from_numpy(pts))

    cfg = SwinISConfig(embed_dim=48, depths=(2, 2, 2), num_heads=(3, 6, 12),
                       window=7, head_channels=64, patch_norm=False)
    sd = _sd(ref)
    params = convert_swin_backbone(sd, cfg, prefix="backbone.")
    params["patch_embed_coords"] = dict(params["patch_embed"])  # shared embed
    params["head"] = {
        "convs": [_conv(sd, f"head.convs.{i}.conv") for i in range(3)],
        "fusion": _conv(sd, "head.fusion_conv.conv"),
        "conv_seg": _conv(sd, "head.conv_seg"),
    }
    ours = swin_is_forward(params, cfg,
                           jnp.asarray(image.numpy().transpose(0, 2, 3, 1)),
                           jnp.asarray(pts))
    np.testing.assert_allclose(
        np.asarray(ours["instances"])[..., 0],
        ref_out["instances"].numpy()[:, 0], atol=2e-4)


# ---------------------------------------------------------------------------
# HRNet+OCR full interactive model (RITM family)
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("small", [True, False])
def test_full_hrnet_model_matches_reference(ref_path, small):
    """HRNetModel (is_hrnet_model.py:9-40, hrnet_ocr.py, ocr.py) vs our
    zoo/hrnet.py through convert_hrnet_checkpoint — validates the multi-
    branch topology, OCR attention, frozen-BN conversion and the RITM
    maps_transform path."""
    from isegm.model.is_hrnet_model import HRNetModel

    import jax.numpy as jnp
    from pvpuformer_tpu.models.zoo.hrnet import (HRNetISConfig,
                                                 hrnet_is_forward)
    from pvpuformer_tpu.utils.torch_ingest import convert_hrnet_checkpoint

    torch.manual_seed(7)
    ref = HRNetModel(width=18, ocr_width=64, small=small, with_aux_output=True,
                     use_rgb_conv=True, use_leaky_relu=True,
                     use_disks=True, norm_radius=5, with_prev_mask=True).eval()
    with torch.no_grad():   # make BN stats non-trivial so conversion is tested
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    rng = np.random.default_rng(8)
    image = torch.from_numpy(
        rng.uniform(0, 1, (1, 4, 128, 128)).astype(np.float32))
    pts = np.full((1, 8, 3), -1, np.float32)
    pts[0, 0] = (40, 70, 0)
    pts[0, 4] = (100, 20, 1)
    with torch.no_grad():
        ref_out = ref(image, torch.from_numpy(pts))

    cfg = HRNetISConfig(width=18, small=small, ocr_width=64)
    params = convert_hrnet_checkpoint(_sd(ref), cfg)
    ours = hrnet_is_forward(params, cfg,
                            jnp.asarray(image.numpy().transpose(0, 2, 3, 1)),
                            jnp.asarray(pts))
    np.testing.assert_allclose(
        np.asarray(ours["instances"])[..., 0],
        ref_out["instances"].numpy()[:, 0], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ours["instances_aux"])[..., 0],
        ref_out["instances_aux"].numpy()[:, 0], atol=2e-4)


# ---------------------------------------------------------------------------
# DeepLabV3+ full interactive model (RITM family)
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["resnet50", "resnet34"])
def test_full_deeplab_model_matches_reference(ref_path, backbone):
    """DeeplabModel (is_deeplab_model.py:10-27: ResNetV1b-os8 + ASPP
    12/24/36 + SeparableConv heads) vs our zoo/deeplab.py through
    convert_deeplab_checkpoint."""
    # NB: DeeplabModel itself is unconstructable as shipped — it forwards
    # norm_layer= to ISModel.__init__, which doesn't accept it
    # (is_deeplab_model.py:14 vs is_model.py:10-13). We assemble its exact
    # components and replicate ISModel.forward (is_model.py:42-57) here.
    from isegm.model.modeling.basic_blocks import SepConvHead
    from isegm.model.modeling.deeplab_v3 import DeepLabV3Plus
    from isegm.model.ops import BatchImageNormalize, DistMaps, ScaleLayer

    import jax.numpy as jnp
    from pvpuformer_tpu.models.zoo.deeplab import (DeeplabISConfig,
                                                   deeplab_is_forward)
    from pvpuformer_tpu.utils.torch_ingest import convert_deeplab_checkpoint

    torch.manual_seed(15)
    fe = DeepLabV3Plus(backbone=backbone, ch=64, project_dropout=0.5)
    head = SepConvHead(1, in_channels=64, mid_channels=32, num_layers=2)
    maps_t = torch.nn.Sequential(          # is_model.py:28-36
        torch.nn.Conv2d(3, 16, 1),
        torch.nn.LeakyReLU(negative_slope=0.2),
        torch.nn.Conv2d(16, 64, 3, stride=2, padding=1),
        ScaleLayer(init_value=0.05, lr_mult=1))
    ref = torch.nn.ModuleDict({"feature_extractor": fe, "head": head,
                               "maps_transform": maps_t}).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    rng = np.random.default_rng(16)
    image = torch.from_numpy(
        rng.uniform(0, 1, (1, 4, 96, 96)).astype(np.float32))
    pts = np.full((1, 8, 3), -1, np.float32)
    pts[0, 0] = (30, 50, 0)
    pts[0, 4] = (80, 15, 1)
    points = torch.from_numpy(pts)
    with torch.no_grad():
        rgb = BatchImageNormalize([.485, .456, .406],
                                  [.229, .224, .225])(image[:, :3])
        prev = image[:, 3:]
        coords = DistMaps(norm_radius=5, spatial_scale=1.0,
                          use_disks=True)(rgb, points)
        coords = torch.cat((prev, coords), dim=1)
        feats = fe(rgb, maps_t(coords))[0]
        logits = head(feats)
        ref_out = {"instances": torch.nn.functional.interpolate(
            logits, size=rgb.size()[2:], mode="bilinear",
            align_corners=True)}

    cfg = DeeplabISConfig(backbone=backbone, ch=64)
    params = convert_deeplab_checkpoint(_sd(ref), cfg)
    ours = deeplab_is_forward(params, cfg,
                              jnp.asarray(image.numpy().transpose(0, 2, 3, 1)),
                              jnp.asarray(pts))
    np.testing.assert_allclose(
        np.asarray(ours["instances"])[..., 0],
        ref_out["instances"].numpy()[:, 0], atol=2e-4)


# ---------------------------------------------------------------------------
# SegFormer MiT backbone (official standalone implementation)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_mit_backbone_matches_reference(ref_path):
    """Official-layout MixVisionTransformer
    (segformer/mix_transformer.py:308-...) vs our zoo/segformer backbone:
    overlap patch embeds, spatial-reduction attention, MixFFN depthwise
    conv. (The mmseg-style copy at segformer.py:119-170 omits upstream's
    batch_first transpose around nn.MultiheadAttention and is degenerate
    under the pinned mmcv 1.6.2 — we implement the intended semantics,
    which this standalone impl shares; see PARITY.md deviation 8.)"""
    from functools import partial

    from isegm.model.modeling.segformer.mix_transformer import \
        MixVisionTransformer

    import jax.numpy as jnp
    from pvpuformer_tpu.models.zoo.segformer import (SegformerISConfig,
                                                     segformer_backbone)
    from pvpuformer_tpu.utils.torch_ingest import convert_mit_official

    torch.manual_seed(13)
    dims, heads, depths, srs = [16, 32, 64, 128], [1, 2, 4, 8], \
        [2, 2, 2, 2], [8, 4, 2, 1]
    ref = MixVisionTransformer(
        img_size=64, in_chans=6, embed_dims=dims, num_heads=heads,
        mlp_ratios=[4, 4, 4, 4], qkv_bias=True, depths=depths,
        sr_ratios=srs,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6)).eval()

    rng = np.random.default_rng(14)
    x = torch.from_numpy(rng.normal(size=(1, 6, 64, 64)).astype(np.float32))
    with torch.no_grad():
        ref_feats = ref.forward_features(x)

    cfg = SegformerISConfig(embed_dims=tuple(dims), depths=tuple(depths),
                            num_heads=tuple(heads), sr_ratios=tuple(srs))
    params = convert_mit_official(_sd(ref), cfg)
    ours = segformer_backbone(params, cfg,
                              jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for i, (of, rf) in enumerate(zip(ours, ref_feats)):
        np.testing.assert_allclose(np.asarray(of).transpose(0, 3, 1, 2),
                                   rf.numpy(), atol=2e-4,
                                   err_msg=f"stage {i}")

    # released mit_b*.pth are RGB-only: stage-1 conv must get the v3
    # coord-channel surgery (duplicate first coord_ch input channels)
    ref3 = MixVisionTransformer(img_size=64, in_chans=3, embed_dims=dims,
                                num_heads=heads, depths=depths,
                                sr_ratios=srs).eval()
    p3 = convert_mit_official(_sd(ref3), cfg)
    w = p3["stages"][0]["patch"]["w"]
    assert w.shape[2] == 6
    np.testing.assert_array_equal(w[..., 3:, :], w[..., :3, :])


# ---------------------------------------------------------------------------
# AdaptiveIoU training metric
# ---------------------------------------------------------------------------

def test_adaptive_iou_matches_reference(ref_path):
    """Threshold hill-climb + EMA trajectories vs the reference metric
    (metrics.py:29-101) over a sequence of random batches, including an
    all-empty-gt batch (skipped by both)."""
    from isegm.model.metrics import AdaptiveIoU as RefAdaptiveIoU

    from pvpuformer_tpu.engine.metrics import AdaptiveIoU

    ref = RefAdaptiveIoU()
    ours = AdaptiveIoU()
    rng = np.random.default_rng(21)
    for step in range(6):
        logits = rng.normal(size=(3, 1, 24, 32)).astype(np.float32) * 2
        gt = (rng.random((3, 1, 24, 32)) > 0.5).astype(np.float32)
        gt[rng.random(gt.shape) > 0.95] = -1
        if step == 3:
            gt = np.zeros_like(gt)          # all-empty batch -> skipped
        with torch.no_grad():
            ref.update(torch.from_numpy(logits), torch.from_numpy(gt))
        ours.update(logits.transpose(0, 2, 3, 1), gt.transpose(0, 2, 3, 1))
        np.testing.assert_allclose(ours.iou_thresh, ref._iou_thresh,
                                   rtol=1e-6, err_msg=f"thresh step {step}")
        np.testing.assert_allclose(ours._ema_iou, ref._ema_iou, rtol=1e-5,
                                   err_msg=f"ema step {step}")
    np.testing.assert_allclose(ours.get_epoch_value(), ref.get_epoch_value(),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# Layer-wise lr decay + MultiStepLR schedules
# ---------------------------------------------------------------------------

def test_layerwise_decay_matches_reference(ref_path):
    """Our vit_layer_id / layerwise_scales vs the reference's
    get_layer_id_for_vit / param_groups_lrd scale table (lr_decay.py:15-85)."""
    from isegm.utils.lr_decay import get_layer_id_for_vit

    from pvpuformer_tpu.engine.optimizer import vit_layer_id

    depth = 12
    num_layers = depth + 1
    names = (["cls_token", "pos_embed", "patch_embed.proj.weight"]
             + [f"blocks.{i}.attn.qkv.weight" for i in range(depth)]
             + [f"blocks.{i}.norm2.bias" for i in range(depth)]
             + ["fc_norm.weight"])
    for torch_name in names:
        ref_id = get_layer_id_for_vit(torch_name, num_layers)
        ours = vit_layer_id(torch_name, depth)
        assert ours == ref_id, (torch_name, ours, ref_id)


def test_multistep_lr_matches_torch(ref_path):
    import torch.optim as topt

    import jax.numpy as jnp
    from pvpuformer_tpu.engine.optimizer import multistep_lr

    opt = topt.SGD([torch.nn.Parameter(torch.zeros(1))], lr=5e-5)
    sched = topt.lr_scheduler.MultiStepLR(opt, milestones=[190, 210],
                                          gamma=0.1)
    ours = multistep_lr(5e-5, [190, 210], 0.1, steps_per_epoch=1)
    for epoch in range(230):
        ref_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(ours(jnp.asarray(epoch))), ref_lr,
                                   rtol=1e-6, err_msg=f"epoch {epoch}")
        opt.step()
        sched.step()


# ---------------------------------------------------------------------------
# Loss zoo
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# HRFormer (HRT): backbone and full OCR model vs the reference modules
# ---------------------------------------------------------------------------

def _randomize_bn_stats(model):
    """Give BN layers non-trivial running stats so frozen-BN conversion is
    actually exercised (fresh torch BN has mean 0 / var 1 = identity)."""
    for mod in model.modules():
        if isinstance(mod, (torch.nn.SyncBatchNorm, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)


def test_hrt_backbone_matches_reference(ref_path):
    """HighResolutionTransformer hrt_small (hrt_backbone.py:306-605) with
    ISA window attention (multihead_isa_attention.py), MlpDWBN FFN
    (ffn_block.py:106-179) and DW-separable fusion, at a non-multiple
    spatial size (exercises center padding + nearest/bilinear fuse)."""
    from isegm.model.modeling.hrformer_helper.hrt.hrt_backbone import \
        HighResolutionTransformer
    from isegm.model.modeling.hrformer_helper.hrt.hrt_config import \
        MODEL_CONFIGS

    import jax.numpy as jnp
    from pvpuformer_tpu.models.zoo.hrformer import (hrformer_small_config,
                                                    hrt_backbone_forward)
    from pvpuformer_tpu.utils.torch_ingest import convert_hrformer_checkpoint

    torch.manual_seed(1)
    ref = HighResolutionTransformer(MODEL_CONFIGS["hrt_small"],
                                    in_ch=6).eval()
    _randomize_bn_stats(ref)
    x = torch.randn(2, 6, 64, 96)
    with torch.no_grad():
        ys = ref(x)

    sd = {("backbone." + k): v.detach().numpy()
          for k, v in ref.state_dict().items()}
    cfg = hrformer_small_config()
    params = convert_hrformer_checkpoint(sd, cfg)
    ours = hrt_backbone_forward(params, cfg,
                                jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for i, (r, o) in enumerate(zip(ys, ours)):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=5e-5,
                                   err_msg=f"branch {i}")


@pytest.mark.slow
def test_full_hrformer_model_matches_reference(ref_path):
    """HRT_B_OCR_V3 (modeling/hrformer.py:55-139): hrt_base backbone +
    grouped-conv OCR head, end to end. The shipped HRFormerModel wrapper
    drops coord_features (is_hrformer_model.py:26-28, broken as shipped) so
    parity is tested at the 6-channel feature-extractor level — the same
    tensor our forward builds by concatenating rgb + coord channels."""
    from isegm.model.modeling.hrformer import HRT_B_OCR_V3

    import jax.numpy as jnp
    from pvpuformer_tpu.models.zoo.hrformer import (HRFormerISConfig,
                                                    hrt_backbone_forward,
                                                    _hrt_ocr)
    from pvpuformer_tpu.ops.resize import bilinear_resize
    from pvpuformer_tpu.utils.torch_ingest import convert_hrformer_checkpoint

    torch.manual_seed(2)
    ref = HRT_B_OCR_V3(num_classes=1, in_ch=6, bn_type="torchbn").eval()
    _randomize_bn_stats(ref)
    x = torch.randn(1, 6, 64, 64)
    with torch.no_grad():
        aux, out = ref(x)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = HRFormerISConfig()                       # hrt_base defaults
    params = convert_hrformer_checkpoint(sd, cfg)

    xs = hrt_backbone_forward(params, cfg,
                              jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    th, tw = xs[0].shape[1], xs[0].shape[2]
    feats = jnp.concatenate(
        [xs[0]] + [bilinear_resize(v, th, tw, align_corners=True)
                   for v in xs[1:]], axis=-1)
    logits, auxl = _hrt_ocr(params["ocr"], feats)
    ours_out = bilinear_resize(logits, 64, 64, align_corners=True)
    ours_aux = bilinear_resize(auxl, 64, 64, align_corners=True)
    np.testing.assert_allclose(np.asarray(ours_out)[..., 0],
                               out.numpy()[:, 0], atol=5e-5, err_msg="cls")
    np.testing.assert_allclose(np.asarray(ours_aux)[..., 0],
                               aux.numpy()[:, 0], atol=5e-5, err_msg="aux")


# ---------------------------------------------------------------------------
# CLIP: visual towers + text encoder vs the reference modules
# ---------------------------------------------------------------------------

def test_clip_modified_resnet_matches_reference(ref_path):
    """ModifiedResNet (clip.py:147-223): anti-aliased bottlenecks +
    AttentionPool2d with bicubic pos-embed resize (clip.py:80-144), at a
    non-native input size (96x64 vs trained 64) so the resize path runs."""
    from isegm.model.modeling.clip import ModifiedResNet

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.models.zoo.clip_text import (ClipVisualConfig,
                                                     encode_image_resnet)
    from pvpuformer_tpu.utils.torch_ingest import convert_clip_resnet

    torch.manual_seed(3)
    ref = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=32, heads=4,
                         input_resolution=64, width=16).eval()
    _randomize_bn_stats(ref)
    x = torch.randn(2, 3, 96, 64)
    with torch.no_grad():
        r2, r3, r4 = ref(x)

    cfg = ClipVisualConfig(layers=(1, 1, 1, 1), width=16, heads=4,
                           output_dim=32, input_resolution=64)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_clip_resnet(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            cfg))
    o2, o3, o4 = encode_image_resnet(params, cfg,
                                     jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for name, r, o in [("x2", r2, o2), ("x3", r3, o3), ("x4", r4, o4)]:
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=2e-5, err_msg=name)


def test_clip_vision_transformer_matches_reference(ref_path):
    """VisionTransformer (clip.py:286-332): returns projected grid tokens
    (cls dropped), QuickGELU MLP, fused torch MHA in_proj."""
    from isegm.model.modeling.clip import VisionTransformer

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.models.zoo.clip_text import (ClipViTConfig,
                                                     encode_image_vit)
    from pvpuformer_tpu.utils.torch_ingest import convert_clip_vit

    torch.manual_seed(4)
    ref = VisionTransformer(input_resolution=64, patch_size=16, width=32,
                            layers=2, heads=4, output_dim=24).eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        r = ref(x)
    cfg = ClipViTConfig(input_resolution=64, patch_size=16, width=32,
                        layers=2, heads=4, output_dim=24)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_clip_vit(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            cfg))
    ours = encode_image_vit(params, cfg,
                            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), r.numpy(), atol=2e-5)


def test_clip_text_encoder_matches_reference(ref_path):
    """CLIP.encode_text (clip.py:439-456): causal transformer + EOT-pooled
    projection, via the full CLIP module."""
    from isegm.model.modeling.clip import CLIP

    import jax
    import jax.numpy as jnp
    from pvpuformer_tpu.models.zoo.clip_text import (ClipTextConfig,
                                                     encode_text)
    from pvpuformer_tpu.utils.torch_ingest import convert_clip_text

    torch.manual_seed(5)
    ref = CLIP(embed_dim=24, image_resolution=64,
               vision_layers=(1, 1, 1, 1), vision_width=16,
               vision_patch_size=16, context_length=16, txt_length=16,
               vocab_size=100, transformer_width=32, transformer_heads=4,
               transformer_layers=2).eval()
    toks = torch.randint(1, 90, (3, 16))
    toks[:, 0] = 98
    toks[:, -1] = 99                       # EOT = max id per row
    with torch.no_grad():
        _, state = ref.encode_text(toks)

    cfg = ClipTextConfig(vocab_size=100, context_length=16, width=32,
                         heads=4, layers=2, embed_dim=24)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_clip_text(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            cfg))
    ours = encode_text(params, cfg, jnp.asarray(toks.numpy()))
    np.testing.assert_allclose(np.asarray(ours), state.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# PROTOCOL-level NoC parity: the reference's OWN evaluation loop
# (vpu_evaluation.evaluate_sample + Clicker + BasePredictor + ZoomIn,
# running the torch model) vs our fused evaluate path with converted
# weights, on identical synthetic samples. This is the end-to-end
# certification behind BASELINE.md's "NoC parity" row: identical click
# sequences AND identical per-click IoU curves imply identical NoC@k on
# any dataset.
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("net_limit", [None, 2])
def test_click_protocol_matches_reference_eval_loop(ref_path, net_limit):
    """End-to-end interactive protocol parity (vpu_evaluation.py:35-98,
    predictors/base.py:106-177, clicker.py:6-118, zoom_in.py:9-112 vs our
    predictor.click_scan + evaluation.evaluate_sample). as_prompt_type=0
    (the shipped protocol); with_flip=True; ZoomIn skip_clicks=-1,
    target 224 (the 'cvpr' eval mode scaled to the test crop).
    net_limit=2 additionally pins the --clicks-limit truncation
    (net_clicks_limit, base.py:200-205: only the first K clicks reach the
    network while the clicker keeps accumulating)."""
    from isegm.model.is_vpu_model import VitMultiGaussianVector_ed_Model
    from isegm.model.modeling.transformer_helper.cross_entropy_loss import \
        CrossEntropyLoss
    from isegm.inference.predictors.base import BasePredictor
    from isegm.inference.transforms import ZoomIn
    from isegm.inference.vpu_evaluation import evaluate_sample as ref_eval

    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
    from pvpuformer_tpu.models.fpn import NeckConfig
    from pvpuformer_tpu.models.seg_head import HeadConfig
    from pvpuformer_tpu.models.vit import ViTConfig
    from pvpuformer_tpu.models.vpu import VPUConfig
    from pvpuformer_tpu.utils.torch_ingest import convert_vpu_checkpoint

    torch.manual_seed(5)
    crop = (224, 224)
    ref_model = VitMultiGaussianVector_ed_Model(
        num_max_points=4, use_disks=True, norm_radius=5, with_prev_mask=True,
        backbone_params=dict(img_size=crop, patch_size=(16, 16), in_chans=3,
                             embed_dim=768, depth=4, num_heads=12),
        neck_params=dict(in_dim=768, out_dims=[128, 256, 512, 1024],
                         img_size=list(crop)),
        head_params=dict(in_channels=[128, 256, 512, 1024],
                         in_index=[0, 1, 2, 3], dropout_ratio=0.1,
                         num_classes=1, loss_decode=CrossEntropyLoss(),
                         align_corners=False, upsample="x1", ed_loss=True,
                         channels=256),
        random_split=False, residual=True, with_aux_output=True).eval()
    with torch.no_grad():
        ref_model.backbone.pos_embed.normal_(0, 0.02)

    cfg = VPUConfig(
        backbone=ViTConfig(img_size=crop, patch_size=(16, 16), embed_dim=768,
                           depth=4, num_heads=12),
        neck=NeckConfig(in_dim=768, out_dims=(128, 256, 512, 1024),
                        img_size=crop),
        head=HeadConfig(in_channels=(128, 256, 512, 1024), channels=256,
                        upsample="x1"),
        num_max_points=4)
    params = convert_vpu_checkpoint(_sd(ref_model), cfg)

    pcfg = PredictorConfig(model=cfg, target_size=crop, with_flip=True,
                           skip_clicks=-1, min_crop_size=200,
                           net_clicks_limit=net_limit)
    ours = Predictor(params, pcfg)

    max_clicks = 4
    for seed in range(3 if net_limit is None else 1):
        r = np.random.default_rng(seed)
        h, w = 96, 128
        image = (r.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        yy, xx = np.mgrid[:h, :w]
        cy, cx = r.integers(h // 4, 3 * h // 4), r.integers(w // 4, 3 * w // 4)
        ry, rx = r.integers(12, h // 3), r.integers(12, w // 3)
        gt = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0)
        gt = gt.astype(np.int32)

        zoom_in = ZoomIn(skip_clicks=-1, target_size=crop)
        ref_pred = BasePredictor(ref_model, "cpu", zoom_in=zoom_in,
                                 with_flip=True, net_clicks_limit=net_limit)
        ref_clicks, ref_ious, _ = ref_eval(image, gt, ref_pred,
                                           max_iou_thr=2.0,
                                           max_clicks=max_clicks)
        ref_seq = [(bool(c.is_positive), int(c.coords[0]), int(c.coords[1]))
                   for c in ref_clicks]

        ours.set_input(image, gt.astype(np.float32))
        our_ious = ours.run_clicks(max_clicks)
        pts = ours.clicks
        n = pts.shape[0] // 2
        our_seq = [(bool(i < n), int(pts[i, 0]), int(pts[i, 1]))
                   for i in np.argsort(pts[:, 2]) if pts[i, 2] >= 0]

        assert our_seq == ref_seq, f"click sequences diverge (seed {seed})"
        np.testing.assert_allclose(our_ious[:len(ref_ious)],
                                   np.asarray(ref_ious), atol=1e-6,
                                   err_msg=f"IoU curve (seed {seed})")


# ---------------------------------------------------------------------------
# PROMPT-protocol parity: the reference's OWN get_vqu_prediction loop in
# box/scribble mode (as_prompt_type=1/2) — both prompt protocols:
#   * as_multi_prompts=True  (_get_vqu_prediction_prompts, base.py:166-177):
#     get_next_promts boxes + extra error click through the PPuE box encoder;
#   * as_multi_prompts=False (_get_vqu_prediction_points, base.py:153-163):
#     get_next_promts_inference rewrites the click tensor with box-corner /
#     scribble-control pseudo-clicks and runs the plain click forward.
# Randomness is pinned identically on both sides: the reference's
# random.randint -> clamped lower bound (jitter offsets 0, first-candidate
# picks), np.random.randint -> 0, np.random.rand -> 0, and its trainer-side
# cv2.distanceTransform to the EXACT transform (maskSize=0 — the eval
# clicker's own semantics; the 5x5 chamfer approximation is a documented
# deviation, see prompt_sim.py docstring / PARITY.md); ours runs with
# PredictorConfig.deterministic_prompts=True. Asserts per click: identical
# prompt tensors (boxes + rewritten points, recomputed by our synthesis
# functions from the reference's own captured inputs), identical click
# sequences, identical IoU curves.
# ---------------------------------------------------------------------------

def _protocol_pair(num_max_points, crop=(224, 224)):
    """Tiny reference VPU + converted params (as the click-protocol test)."""
    from isegm.model.is_vpu_model import VitMultiGaussianVector_ed_Model
    from isegm.model.modeling.transformer_helper.cross_entropy_loss import \
        CrossEntropyLoss
    from pvpuformer_tpu.models.fpn import NeckConfig
    from pvpuformer_tpu.models.seg_head import HeadConfig
    from pvpuformer_tpu.models.vit import ViTConfig
    from pvpuformer_tpu.models.vpu import VPUConfig
    from pvpuformer_tpu.utils.torch_ingest import convert_vpu_checkpoint

    torch.manual_seed(5)
    ref_model = VitMultiGaussianVector_ed_Model(
        num_max_points=num_max_points, use_disks=True, norm_radius=5,
        with_prev_mask=True,
        backbone_params=dict(img_size=crop, patch_size=(16, 16), in_chans=3,
                             embed_dim=768, depth=4, num_heads=12),
        neck_params=dict(in_dim=768, out_dims=[128, 256, 512, 1024],
                         img_size=list(crop)),
        head_params=dict(in_channels=[128, 256, 512, 1024],
                         in_index=[0, 1, 2, 3], dropout_ratio=0.1,
                         num_classes=1, loss_decode=CrossEntropyLoss(),
                         align_corners=False, upsample="x1", ed_loss=True,
                         channels=256),
        random_split=False, residual=True, with_aux_output=True).eval()
    with torch.no_grad():
        ref_model.backbone.pos_embed.normal_(0, 0.02)
    cfg = VPUConfig(
        backbone=ViTConfig(img_size=crop, patch_size=(16, 16), embed_dim=768,
                           depth=4, num_heads=12),
        neck=NeckConfig(in_dim=768, out_dims=(128, 256, 512, 1024),
                        img_size=crop),
        head=HeadConfig(in_channels=(128, 256, 512, 1024), channels=256,
                        upsample="x1"),
        num_max_points=num_max_points)
    params = convert_vpu_checkpoint(_sd(ref_model), cfg)
    return ref_model, cfg, params


def _synth_sample(seed, h=96, w=128):
    r = np.random.default_rng(seed)
    image = (r.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    yy, xx = np.mgrid[:h, :w]
    cy, cx = r.integers(h // 4, 3 * h // 4), r.integers(w // 4, 3 * w // 4)
    ry, rx = r.integers(12, h // 3), r.integers(12, w // 3)
    gt = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0)
    return image, gt.astype(np.int32)


def _embed_half(pts: np.ndarray, m: int) -> np.ndarray:
    """(B, 2k, 3) -> (B, 2m, 3): each half padded to m with -1 rows (the
    reference's dynamic tensor embedded into a wider fixed layout; -1 rows
    and end-padding rows encode to the same not-a-point PPuE vector)."""
    b, twok, _ = pts.shape
    k = twok // 2
    out = np.full((b, 2 * m, 3), -1.0, np.float32)
    out[:, :k] = pts[:, :k]
    out[:, m:m + k] = pts[:, k:]
    return out


@pytest.mark.slow
@pytest.mark.parametrize("prompt_mode,as_multi", [(1, True), (1, False),
                                                  (2, False)])
def test_prompt_protocol_matches_reference_eval_loop(ref_path, prompt_mode,
                                                     as_multi, monkeypatch):
    import cv2
    import random as pyrandom
    import jax
    import jax.numpy as jnp
    from isegm.inference.clicker import Clicker
    from isegm.inference.predictors.base import BasePredictor
    from isegm.inference.predictors import base as ref_base
    from isegm.inference.transforms import ZoomIn
    from isegm.inference.utils import get_iou as ref_get_iou

    from pvpuformer_tpu.engine.prompt_sim import synth_boxes
    from pvpuformer_tpu.inference.predictor import (
        Predictor, PredictorConfig, _append_error_click, _rewrite_points_box,
        _rewrite_points_scribble)

    # --- pin every random draw identically on both sides ---
    monkeypatch.setattr(pyrandom, "randint", lambda a, b: min(max(a, 0), b))
    monkeypatch.setattr(np.random, "randint", lambda a, b=None, **k: 0)
    monkeypatch.setattr(np.random, "rand", lambda *a: 0.0)
    real_dt = cv2.distanceTransform
    monkeypatch.setattr(cv2, "distanceTransform",
                        lambda src, dtype, ms: real_dt(src, dtype, 0))

    nmp = 12                    # roomy half: N_dyn + scribble K=7 must fit
    crop = (224, 224)
    ref_model, cfg, params = _protocol_pair(nmp, crop)

    # --- capture the reference's own prompt-synthesis inputs/outputs ---
    records = []
    if as_multi:
        real_fn = ref_base.get_next_promts

        def wrap(prev, gt, points, **kw):
            out = real_fn(prev, gt, points, **kw)
            records.append((prev.detach().numpy().copy(),
                            gt.detach().numpy().copy(),
                            points.detach().numpy().copy(),
                            out[0].detach().numpy().copy(),
                            out[1].detach().numpy().copy()))
            return out
        monkeypatch.setattr(ref_base, "get_next_promts", wrap)
    else:
        real_fn = ref_base.get_next_promts_inference

        def wrap(prev, gt, points, **kw):
            out = real_fn(prev, gt, points, **kw)
            records.append((prev.detach().numpy().copy(),
                            gt.detach().numpy().copy(),
                            points.detach().numpy().copy(),
                            out[0].detach().numpy().copy()))
            return out
        monkeypatch.setattr(ref_base, "get_next_promts_inference", wrap)

    pcfg = PredictorConfig(model=cfg, target_size=crop, with_flip=True,
                           skip_clicks=-1, min_crop_size=200,
                           prompt_mode=prompt_mode, as_multi_prompts=as_multi,
                           deterministic_prompts=True)
    ours = Predictor(params, pcfg)

    max_clicks = 4
    for seed in range(2):
        del records[:]
        image, gt = _synth_sample(seed)

        # the reference's own eval round (vpu_evaluation.py:35-98 with the
        # prompt type switched on — its commented-out variants, 49-77)
        zoom_in = ZoomIn(skip_clicks=-1, target_size=crop)
        ref_pred = BasePredictor(ref_model, "cpu", zoom_in=zoom_in,
                                 with_flip=True)
        clicker = Clicker(gt_mask=gt)
        pred_mask = np.zeros_like(gt)
        ref_ious = []
        with torch.no_grad():
            ref_pred.set_input_image(image)
            for click_indx in range(max_clicks):
                clicker.make_next_click(pred_mask)
                probs, _ = ref_pred.get_vqu_prediction(
                    clicker, gt_mask=gt, as_prompt_type=prompt_mode,
                    click_indx=click_indx, as_multi_prompts=as_multi)
                pred_mask = probs > 0.49
                ref_ious.append(ref_get_iou(gt, pred_mask))
        ref_seq = [(bool(c.is_positive), int(c.coords[0]), int(c.coords[1]))
                   for c in clicker.clicks_list]

        ours.set_input(image, gt.astype(np.float32))
        our_ious = ours.run_clicks(max_clicks)
        pts = ours.clicks
        n = pts.shape[0] // 2
        our_seq = [(bool(i < n), int(pts[i, 0]), int(pts[i, 1]))
                   for i in np.argsort(pts[:, 2]) if pts[i, 2] >= 0]

        # --- per-click prompt tensors: our synthesis on the reference's own
        # captured (prev, gt, points) must reproduce its outputs exactly ---
        assert len(records) == max_clicks
        for ci, rec in enumerate(records):
            prev_j = jnp.asarray(rec[0][:, 0])
            gt_j = jnp.asarray(rec[1][:, 0])
            pts_in = rec[2].astype(np.float32)
            pts_j = jnp.asarray(pts_in)
            n_dyn = pts_in.shape[1] // 2
            key = jax.random.key(0)
            if as_multi:
                ref_pts_out, ref_boxes = rec[3], rec[4]
                gtb = gt_j > 0.5
                fn = gtb & (prev_j < 0.49)
                fp = (~gtb) & (prev_j > 0.49)
                boxes_ours = synth_boxes(gt_j, fn, fp, pts_j, key,
                                         as_allmask=False, jitter=False,
                                         n_dyn=n_dyn)
                np.testing.assert_array_equal(
                    np.asarray(boxes_ours), ref_boxes,
                    err_msg=f"boxes (seed {seed}, click {ci})")
                pts_ours = _append_error_click(prev_j, gt_j, pts_j,
                                               jnp.int32(n_dyn), key, True,
                                               0.49)
                np.testing.assert_array_equal(
                    np.asarray(pts_ours), rec[3].astype(np.float32),
                    err_msg=f"PPuE points (seed {seed}, click {ci})")
            else:
                ref_vpu = rec[3].astype(np.float32)
                mr = ref_vpu.shape[1] // 2
                m = n_dyn + 7
                padded = jnp.asarray(_embed_half(pts_in, m))
                gtb = gt_j > 0.5
                first = jnp.asarray(ci == 0)
                if prompt_mode == 1:
                    out = _rewrite_points_box(padded, gtb, key,
                                              jnp.int32(n_dyn), first, True)
                else:
                    out = _rewrite_points_scribble(padded, gtb, key,
                                                   jnp.int32(n_dyn), first,
                                                   True)
                np.testing.assert_array_equal(
                    np.asarray(out), _embed_half(ref_vpu, m),
                    err_msg=f"rewritten points (seed {seed}, click {ci})")

        assert our_seq == ref_seq, \
            f"click sequences diverge (seed {seed}, mode {prompt_mode}/{as_multi})"
        np.testing.assert_allclose(our_ious[:len(ref_ious)],
                                   np.asarray(ref_ious), atol=1e-6,
                                   err_msg=f"IoU curve (seed {seed})")


def _rand_pred_label(rng, shape=(3, 1, 17, 19), with_ignore=True):
    logits = rng.normal(size=shape).astype(np.float32) * 3
    label = (rng.random(shape) > 0.6).astype(np.float32)
    if with_ignore:
        label[rng.random(shape) > 0.9] = -1
    return logits, label


def test_losses_match_reference(ref_path):
    from isegm.model.losses import (DiceLoss, FocalLoss,
                                    NormalizedFocalLossSigmoid,
                                    SigmoidBinaryCrossEntropyLoss, SoftIoU)

    import jax.numpy as jnp
    from pvpuformer_tpu.engine import losses as L

    rng = np.random.default_rng(4)
    logits, label = _rand_pred_label(rng)
    tl, tt = torch.from_numpy(logits), torch.from_numpy(label)
    # ours are NHWC
    jl = jnp.asarray(logits.transpose(0, 2, 3, 1))
    jt = jnp.asarray(label.transpose(0, 2, 3, 1))

    with torch.no_grad():
        ref_nfl = NormalizedFocalLossSigmoid(alpha=0.5, gamma=2)(tl, tt)
        ref_focal = FocalLoss(alpha=0.25, gamma=2)(tl, tt)
        ref_siou = SoftIoU()(tl, tt)
        ref_bce = SigmoidBinaryCrossEntropyLoss()(tl, tt)
        # shipped config: use_sigmoid=True, naive_dice=True, per-sample
        ref_dice = DiceLoss(use_sigmoid=True, naive_dice=True,
                            reduction="none")(
            tl.flatten(1), (tt > 0.5).float().flatten(1))

    np.testing.assert_allclose(
        np.asarray(L.normalized_focal_loss(jl, jt, alpha=0.5, gamma=2.0)),
        ref_nfl.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(L.focal_loss(jl, jt)),
                               ref_focal.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(L.soft_iou_loss(jl, jt)),
                               ref_siou.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(L.sigmoid_bce_loss(jl, jt)),
                               ref_bce.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(L.dice_loss(jl, (jt > 0.5).astype(jnp.float32))),
        ref_dice.numpy(), atol=1e-5, rtol=1e-4)
