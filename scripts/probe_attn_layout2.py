"""Decode-attention layout probe: [S, D] vs transposed [D, S] KV.

Hypothesis: head_dim=64 as the MINOR axis half-fills TPU 128-lane tiles
-> ~2x DMA amplification, matching the measured ~47%-of-peak decode
attention (probe_attn_roofline.py).  Storing K/V transposed ([.., D, S])
puts the long slot axis on the lanes: QK contracts d as a classic
matmul with full-lane rhs tiles, PV contracts s likewise.

Run alone: python scripts/probe_attn_layout2.py [batch] [dtype]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    dt_name = sys.argv[2] if len(sys.argv) > 2 else "int8"
    Hc, G, D, S, L = 8, 4, 64, 2816, 16
    if dt_name == "bf16":
        L = 8
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, Hc, G, D), jnp.bfloat16)
    k0 = jax.random.randint(key, (1, B, Hc, D, S), -127, 127, jnp.int8)

    @jax.jit
    def tile(x):
        t = jnp.broadcast_to(x, (L,) + x.shape[1:]) + \
            lax.iota(jnp.int8, L).reshape(L, 1, 1, 1, 1)
        return t.astype(jnp.bfloat16) if dt_name == "bf16" else t

    ckT = tile(k0)                       # [L, B, Hc, D, S]
    cvT = tile(k0 + jnp.int8(1))
    NEG = -1e30
    mask = jnp.ones((B, Hc, S), bool)

    @jax.jit
    def attn_T(q, ckT, cvT, mask):
        def body(acc, kv):
            kT, vT = kv                                  # [B,Hc,D,S]
            cd = q.dtype
            logits = jnp.einsum("bhgd,bhds->bhgs", q, kT.astype(cd),
                                preferred_element_type=jnp.float32)
            logits = jnp.where(mask[:, :, None, :], logits, NEG)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhgs,bhds->bhgd", probs.astype(cd),
                             vT.astype(cd))
            return acc + out, 0
        acc, _ = lax.scan(body, jnp.zeros((B, Hc, G, D), jnp.bfloat16),
                          (ckT, cvT))
        return acc

    r = attn_T(q, ckT, cvT, mask)
    _ = jax.device_get(r)
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        r = attn_T(q, ckT, cvT, mask)
    _ = jax.device_get(r)
    dt = (time.perf_counter() - t0) / reps
    itemsize = 2 if dt_name == "bf16" else 1
    kv_bytes = 2 * L * B * Hc * S * D * itemsize
    gbps = kv_bytes / dt / 1e9
    print(f"TRANSPOSED b{B}/{dt_name}: {dt*1e3:.2f} ms per {L}-layer "
          f"pass ({dt*1e3/L:.3f} ms/layer); {kv_bytes/1e9:.2f} GB -> "
          f"{gbps:.0f} GB/s ({100*gbps/819:.0f}% of peak)", flush=True)


if __name__ == "__main__":
    main()
