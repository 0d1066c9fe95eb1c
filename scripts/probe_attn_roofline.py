"""Is XLA decode attention at the HBM roofline at LARGE batch?

The r2 bisect measured 85% of peak at b64; the b192 hot step implies
~43% overall.  This times the grouped decode attention ALONE (one
jitted program scanning L attention passes over resident int8 buffers,
no weights, no appends) and compares to bytes/step / 819GB/s.

Run alone on the chip:  python scripts/probe_attn_roofline.py [batch]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from scope_tpu.models.llama import _grouped_decode_attention
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    dt_name = sys.argv[2] if len(sys.argv) > 2 else "int8"
    Hc, G, D, S, L = 8, 4, 64, 2816, 16
    if dt_name == "bf16":
        L = 8            # bf16 buffers are 2x; halve layers to fit HBM
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, Hc * G, 1, D), jnp.bfloat16)
    # One-layer generation + tile: full-size randint plans a 17.7GB
    # int32 intermediate at these shapes.
    k0 = jax.random.randint(key, (1, B, Hc, S, D), -127, 127, jnp.int8)

    @jax.jit
    def tile(x):
        t = jnp.broadcast_to(x, (L,) + x.shape[1:]) + \
            lax.iota(jnp.int8, L).reshape(L, 1, 1, 1, 1)
        if dt_name == "bf16":
            return t.astype(jnp.bfloat16)
        return t
    ck = tile(k0)
    cv = tile(k0 + jnp.int8(1))
    mask = jnp.ones((B, Hc, S), bool)

    @jax.jit
    def attn_l_layers(q, ck, cv, mask):
        # lax.scan over the layer axis serializes the per-layer logits/
        # probs temps (an unrolled loop plans all L layers' f32 temps
        # live at once -> compile-OOM; same lesson as cache.compact).
        def body(acc, kv):
            k_l, v_l = kv
            out, _ = _grouped_decode_attention(q, k_l, v_l, mask, G)
            return acc + out, 0
        acc0 = jnp.zeros((B, Hc * G, 1, D), jnp.bfloat16)
        acc, _ = lax.scan(body, acc0, (ck, cv))
        return acc

    r = attn_l_layers(q, ck, cv, mask)
    _ = jax.device_get(r)     # real fetch: block_until_ready mis-reports
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        r = attn_l_layers(q, ck, cv, mask)
    _ = jax.device_get(r)
    dt = (time.perf_counter() - t0) / reps
    itemsize = 2 if dt_name == "bf16" else 1
    kv_bytes = 2 * L * B * Hc * S * D * itemsize
    gbps = kv_bytes / dt / 1e9
    print(f"b{B}/{dt_name}: {dt*1e3:.2f} ms per {L}-layer attention "
          f"pass ({dt*1e3/L:.3f} ms/layer); KV bytes "
          f"{kv_bytes/1e9:.2f} GB -> {gbps:.0f} GB/s "
          f"({100*gbps/819:.0f}% of peak)", flush=True)


if __name__ == "__main__":
    main()
