import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pvpuformer_tpu.models.vit import ViTConfig, init_vit, block_forward, _patchify, _unpatchify
from pvpuformer_tpu.utils.profiling import device_time_per_call
from pvpuformer_tpu import nn as NN

cfg = ViTConfig()  # ViT-B 448
params = NN.cast_params(init_vit(jax.random.key(0), cfg), jnp.bfloat16)
r = np.random.default_rng(0)
x0 = jnp.asarray(r.normal(size=(2, 784, 768)), jnp.bfloat16)

def blocks_only(c, params, x):
    x = x + c.astype(x.dtype)
    nbpg = cfg.blocks_per_group
    is_p = False
    for i in range(1, 13):
        if i % nbpg:
            if not is_p:
                x = _patchify(x, cfg); is_p = True
        else:
            if is_p:
                x = _unpatchify(x, cfg); is_p = False
        x = block_forward(params["blocks"][i-1], x, 12, 1e-6)
    if is_p:
        x = _unpatchify(x, cfg)
    return x
print("12 real blocks (windowed):", round(device_time_per_call(blocks_only, (params, x0)), 3), "ms")

def one_distinct(c, params, x):
    x = _patchify(x + c.astype(x.dtype), cfg)
    for i in range(12):
        x = block_forward(params["blocks"][i], x, 12, 1e-6)
    return x
print("12 distinct blocks (all windowed):", round(device_time_per_call(one_distinct, (params, x0)), 3), "ms")
