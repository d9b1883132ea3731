import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pvpuformer_tpu.utils.profiling import device_time_per_call
from pvpuformer_tpu.models.vpu import vpu_base_config, init_vpu, prepare_input, coord_features, vpu_backbone_embed
from pvpuformer_tpu import nn as NN

mcfg = vpu_base_config(dtype=jnp.bfloat16)
params = NN.cast_params(init_vpu(jax.random.key(0), mcfg), jnp.bfloat16)
img = jnp.zeros((2,448,448,4), jnp.bfloat16)
pts = jnp.full((2,48,3), -1.0)
rgb, prev = prepare_input(mcfg, img)
coords = coord_features(mcfg, rgb, prev, pts)

def bb(c, params, rgb, coords):
    return vpu_backbone_embed(params, mcfg, rgb + c.astype(rgb.dtype), coords)
print("backbone sdpa:", round(device_time_per_call(bb, (params, rgb, coords)), 3), "ms", flush=True)

# swap sdpa for jax.nn.dot_product_attention
orig = NN.sdpa
def sdpa2(q, k, v, scale=None):
    return jax.nn.dot_product_attention(q, k, v)
NN.sdpa = sdpa2
import importlib
import pvpuformer_tpu.models.vit as V
importlib.reload(V)
import pvpuformer_tpu.models.vpu as M
importlib.reload(M)
params2 = NN.cast_params(M.init_vpu(jax.random.key(0), mcfg), jnp.bfloat16)
def bb2(c, params, rgb, coords):
    return M.vpu_backbone_embed(params, mcfg, rgb + c.astype(rgb.dtype), coords)
print("backbone jax dpa:", round(device_time_per_call(bb2, (params2, rgb, coords)), 3), "ms", flush=True)

# no-window variant (global attention all blocks)
NN.sdpa = orig
importlib.reload(V); importlib.reload(M)
import dataclasses
mcfg_g = dataclasses.replace(mcfg, backbone=dataclasses.replace(mcfg.backbone, window_pixels=448))
def bb3(c, params, rgb, coords):
    return M.vpu_backbone_embed(params, mcfg_g, rgb + c.astype(rgb.dtype), coords)
print("backbone global-only:", round(device_time_per_call(bb3, (params, rgb, coords)), 3), "ms", flush=True)
