"""int8 PTQ serving path (nn.quantize_params / nn._linear_int8).

The quantization scheme is our TPU-native serving extension (the reference
has no quantized inference); correctness targets are therefore defined by
the scheme itself: symmetric per-output-channel weight scales, dynamic
per-token symmetric activation scales, int8 x int8 -> int32 contraction.
These tests pin (a) the arithmetic against a numpy oracle, (b) accuracy
bounds vs the f32 path, (c) structural safety of the tree transform, and
(d) the end-to-end predictor/decoder integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pvpuformer_tpu import nn
from test_models import tiny_cfg


def test_quantize_linear_matches_numpy_oracle():
    key = jax.random.key(0)
    w = jax.random.normal(key, (96, 64)) * 0.05
    b = jnp.linspace(-1, 1, 64)
    p = {"w": w, "b": b}
    q = nn.quantize_linear(p)
    assert q["w_q"].dtype == jnp.int8 and q["w_s"].shape == (64,)

    # numpy oracle of the full dynamic-quant forward
    x = np.asarray(jax.random.normal(jax.random.key(1), (5, 96)), np.float64)
    sx = np.maximum(np.abs(x).max(axis=-1, keepdims=True) / 127.0, 1e-12)
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    acc = xq @ np.asarray(q["w_q"], np.int32)
    want = acc * sx * np.asarray(q["w_s"]) + np.asarray(b)

    got = np.asarray(nn.linear(q, jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_linear_accuracy_vs_f32():
    kx, kw = jax.random.split(jax.random.key(2))
    p = nn.init_linear(kw, 256, 128)
    x = jax.random.normal(kx, (4, 17, 256))
    ref = np.asarray(nn.linear(p, x))
    got = np.asarray(nn.linear(nn.quantize_linear(p), x))
    # dynamic int8 keeps ~1% relative error at these scales
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).mean() / denom < 0.02


def test_quantize_params_structure_and_vpu_forward():
    from pvpuformer_tpu.models.vpu import init_vpu, vpu_forward

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    qparams = nn.quantize_params(params)

    # layer norms / pos embeds / convs untouched
    blk = qparams["backbone"]["blocks"][0]
    assert "scale" in blk["norm1"] and "w_q" in blk["attn"]["qkv"]
    assert "w_q" in blk["mlp"]["fc1"] and "w_q" in blk["mlp"]["fc2"]
    assert qparams["backbone"]["pos_embed"].dtype == params["backbone"]["pos_embed"].dtype
    # patch embeds quantized (their apply dispatches)
    assert "w_q" in qparams["backbone"]["patch_embed"]

    img = jax.random.uniform(jax.random.key(3), (1, 64, 64, 4))
    pts = jnp.full((1, 2 * mcfg.num_max_points, 3), -1.0)
    pts = pts.at[0, 0].set(jnp.asarray([32.0, 32.0, 0.0]))
    ref = np.asarray(vpu_forward(params, mcfg, img, pts,
                                 prompt_type=0)["instances"]).ravel()
    got = np.asarray(vpu_forward(qparams, mcfg, img, pts,
                                 prompt_type=0)["instances"]).ravel()
    cos = float(np.dot(ref, got) / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > 0.99, cos


def test_predictor_int8_end_to_end():
    from pvpuformer_tpu.inference.predictor import Predictor, PredictorConfig
    from pvpuformer_tpu.inference.datasets import SyntheticDataset

    from pvpuformer_tpu.models.vpu import init_vpu

    cfg = PredictorConfig(model=tiny_cfg(), target_size=(64, 64),
                          canvas_bucket=32)
    params = init_vpu(jax.random.key(0), cfg.model)
    s = SyntheticDataset(1, hw=(60, 90)).get_sample(0)

    pred = Predictor(params, cfg, int8=True)
    pred.set_input(s.image, s.gt_mask(0))
    curve = pred.run_clicks(3)
    assert curve.shape == (3,) and np.isfinite(curve).all()

    # first-click oracle placement is quantization-independent (EDT of the
    # gt mask, no network involved) — must match the f32 predictor exactly
    ref = Predictor(params, cfg)
    ref.set_input(s.image, s.gt_mask(0))
    ref.next_click()
    np.testing.assert_array_equal(np.asarray(pred.clicks[0]),
                                  np.asarray(ref.clicks[0]))


@pytest.mark.slow
def test_int8_protocol_click_loop_bound():
    """Protocol-level int8-vs-bf16 bound at the 768-dim certification scale
    (VERDICT r3 #1): run the FUSED click loop — the exact program bench.py
    times and scripts/evaluate.py NoBRS drives (reference protocol:
    /root/reference/scripts/evaluate_vpumodel.py:54-58) — under both paths
    on the depth-4/768 config of the reference-direct protocol tests, and
    bound the per-click IoU divergence.

    Measured envelope (scripts/gate_int8.py, 24 samples x 6 clicks):
    random-init max |dIoU| 0.00098, trained (60 steps) max 0.00381 with a
    0.0 click-sequence divergence rate; the bounds below give ~5x headroom.
    On random weights click sequences MAY diverge (probabilities hover at
    the threshold, so ~1e-3 numeric deltas can flip the EDT argmax); the
    protocol-level claim is that the IoU trajectories stay within the
    bound regardless, and that the first click (pure EDT, no network) is
    always identical."""
    from scripts.gate_int8 import protocol_cfg, run_sessions, synth_sample
    from pvpuformer_tpu.models.vpu import init_vpu

    mcfg = protocol_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    n_samples, n_clicks = 8, 4
    bf, seq_bf = run_sessions(params, mcfg, n_samples, n_clicks, int8=False)
    q, seq_q = run_sessions(params, mcfg, n_samples, n_clicks, int8=True)

    delta = np.abs(bf - q)
    assert delta.mean() < 0.005, delta.mean()
    assert delta.max() < 0.02, delta.max()
    # first click is EDT-of-gt only — quantization-independent by design
    for s in range(n_samples):
        assert seq_bf[s][0] == seq_q[s][0], (s, seq_bf[s][0], seq_q[s][0])
    # synth_sample is the generator the recorded gate envelope used
    img, gt = synth_sample(0)
    assert img.shape == (96, 128, 3) and gt.any()


@pytest.mark.slow
@pytest.mark.parametrize("dim", [1024, 1280])
def test_int8_protocol_click_loop_bound_large_widths(dim):
    """Extend the protocol-level int8 bound to the ViT-L/H quantization
    geometries (VERDICT r4 #5): the serving table recommends int8 hardest at
    the LARGE widths (1.44x at ViT-H), so the click-loop divergence bound
    must hold at those per-channel-scale dynamics too — 1024-dim/16-head
    (models_vit.py:311-314) and 1280-dim/16-head/p14 (models_vit.py:316-319)
    quantized linears, not just ViT-B's 768/12.

    Measured envelope (scripts/gate_int8.py --dim {1024,1280}, 24 samples x
    6 clicks, random-init + trained-60, 2026-08-21; BASELINE.md "int8
    accuracy gate"): max |dIoU| <= 0.0036 across all four runs, NoC@50/80
    deltas 0. Bounds below give ~5x headroom, same policy as the 768 test
    above."""
    from scripts.gate_int8 import protocol_cfg, run_sessions
    from pvpuformer_tpu.models.vpu import init_vpu

    mcfg = protocol_cfg(dim=dim)
    assert mcfg.backbone.embed_dim == dim
    params = init_vpu(jax.random.key(0), mcfg)
    n_samples, n_clicks = 4, 3
    bf, seq_bf = run_sessions(params, mcfg, n_samples, n_clicks, int8=False)
    q, seq_q = run_sessions(params, mcfg, n_samples, n_clicks, int8=True)

    delta = np.abs(bf - q)
    assert delta.mean() < 0.005, delta.mean()
    assert delta.max() < 0.02, delta.max()
    for s in range(n_samples):
        assert seq_bf[s][0] == seq_q[s][0], (s, seq_bf[s][0], seq_q[s][0])


def test_decoder_packed_in_proj_int8():
    from pvpuformer_tpu.models.decoder import (DecoderConfig, init_decoder,
                                               decoder_forward)

    cfg = DecoderConfig(num_layers=1, d_model=64, nhead=4, dim_ffn=128)
    params = init_decoder(jax.random.key(0), cfg)
    q = nn.quantize_params(params)
    vis = jax.random.normal(jax.random.key(1), (2, 16, 64))
    txt = jax.random.normal(jax.random.key(2), (2, 4, 64))
    ref = np.asarray(decoder_forward(params, cfg, vis, txt,
                                     grid_hw=(4, 4))).ravel()
    got = np.asarray(decoder_forward(q, cfg, vis, txt,
                                     grid_hw=(4, 4))).ravel()
    cos = float(np.dot(ref, got) / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > 0.98, cos
