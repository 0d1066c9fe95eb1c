import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from scope_tpu.cache import init_cache
def timed(f, x, tag):
    _ = jax.device_get(f(x))
    t0 = time.perf_counter()
    for _ in range(8): r = f(x)
    _ = jax.device_get(r)
    dt = (time.perf_counter()-t0)/8*1e3
    print(f"{tag}: {dt:.2f} ms  ({x.nbytes/1e9/(dt/1e3):.0f} GB/s logical)", flush=True)
    return dt
f = jax.jit(lambda x: x.astype(jnp.int32).sum())
c = init_cache(16, 192, 8, 2944, 64, jnp.bfloat16, kv_dtype="int8")
timed(f, c.k, f"int8 [16,192,8,2944,64] {c.k.nbytes/1e9:.2f}GB")
del c
k2 = jnp.zeros((16,192,8,1472,128), jnp.int8)
timed(f, k2, "int8 [16,192,8,1472,128] same bytes")
del k2
k3 = jnp.zeros((16,192,8,2944,128), jnp.int8)
timed(f, k3, "int8 [16,192,8,2944,128] 2x bytes")
del k3
kb = jnp.zeros((16,64,8,2944,64), jnp.bfloat16)
timed(f, kb, "bf16 [16,64,8,2944,64]")
kb2 = jnp.zeros((16,64,8,1472,128), jnp.bfloat16)
timed(f, kb2, "bf16 [16,64,8,1472,128] same bytes")
