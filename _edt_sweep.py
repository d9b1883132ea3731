import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pvpuformer_tpu.ops.edt import squared_edt
from pvpuformer_tpu.utils.profiling import device_time_per_call

m = jnp.zeros((448, 448), bool).at[100:300, 100:300].set(True)
for chunk in (16, 32, 64, 112, 224, 448):
    def edt(c, m):
        mm = m ^ (c > 1e30)
        a = squared_edt(mm, chunk=chunk)
        b = squared_edt(~mm, chunk=chunk)
        return jnp.max(a) + jnp.max(b)
    print(f"chunk={chunk:4d}: {device_time_per_call(edt, (m,)):7.3f} ms", flush=True)
