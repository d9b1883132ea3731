import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
import pvpuformer_tpu.ops.edt as EDT
from pvpuformer_tpu.models.vpu import vpu_base_config, init_vpu
rng = np.random.default_rng(0)
image = (rng.uniform(size=(448,448,3))*255).astype(np.uint8)
gt = np.zeros((448,448), np.float32); gt[96:352,128:320]=1.0

for chunk in (32, 112, 448):
    # rebind the pair fn with a fixed chunk
    def pair(fn_mask, fp_mask, _c=chunk):
        d = jax.vmap(lambda m: EDT.squared_edt(m, chunk=_c))(jnp.stack([fn_mask, fp_mask]))
        return d[0], d[1]
    EDT.squared_edt_pair = pair
    import importlib
    import pvpuformer_tpu.inference.predictor as P
    importlib.reload(P)
    mcfg = vpu_base_config(dtype=jnp.bfloat16)
    params = init_vpu(jax.random.key(0), mcfg)
    pcfg = P.PredictorConfig(model=mcfg)
    state = P.init_session(image, gt, 24, (448,448))
    def scan_k(k):
        @jax.jit
        def g(params, st):
            def body(s, _):
                return P.click_step(params, pcfg, s)
            _, ious = jax.lax.scan(body, st, None, length=k)
            return ious
        np.asarray(g(params, state))
        ts=[]
        for _ in range(3):
            t0=time.perf_counter(); np.asarray(g(params, state)); ts.append(time.perf_counter()-t0)
        return min(ts)
    print(f"chunk={chunk:4d}: click_step {(scan_k(24)-scan_k(4))/20*1e3:.3f} ms", flush=True)
