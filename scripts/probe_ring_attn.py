"""A/B the ring-fold decode attention against the deferred fold.

probe_fire_cost measured ring hot steps REGRESSING at b128 (58ms real vs
~20ms no-ring) while b64 improved — hypothesis: the 3-segment logits
concat in _ring_decode_attention breaks XLA's int8->bf16 convert fusion
into the cache einsums, materializing converted copies.  This times the
attention formulations alone on identical buffers, plus a merged-softmax
variant with no concat.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--ring", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scope_tpu.models.llama import (_deferred_decode_attention,
                                        _ring_decode_attention)
    from scope_tpu.ops.attention import NEG_INF
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    B, Hc, cap, D, L, G = args.batch, 8, 2752, 64, 16, 4
    R = args.ring
    key = jax.random.key(1)
    log(f"B={B} cap={cap} R={R}")

    ck = jnp.zeros((L, B, Hc, cap, D), jnp.int8)
    cv = jnp.zeros((L, B, Hc, cap, D), jnp.int8)
    rk = jnp.zeros((L, B, Hc, R, D), jnp.int8)
    rv = jnp.zeros((L, B, Hc, R, D), jnp.int8)
    q = jax.random.normal(key, (B, Hc * G, 1, D), jnp.bfloat16)
    kn = jnp.zeros((B, Hc, 1, D), jnp.int8)
    mask = jnp.ones((B, Hc, cap), bool)
    fill = jnp.asarray(R // 2, jnp.int32)

    def timeit(name, fn, *a, reps=args.reps):
        out = fn(*a)
        _ = jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        _ = jax.device_get(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        log(f"  {name:34s} {dt:9.2f} ms")
        return dt

    @jax.jit
    def deferred(ck, cv):
        tot = jnp.zeros((), jnp.float32)
        for l in range(L):
            o = _deferred_decode_attention(q, ck[l], cv[l], mask, kn, kn)
            tot = tot + o.astype(jnp.float32).sum()
        return tot

    @jax.jit
    def ring(ck, cv, rk, rv):
        tot = jnp.zeros((), jnp.float32)
        for l in range(L):
            o = _ring_decode_attention(q, ck[l], cv[l], mask, rk[l], rv[l],
                                       fill, kn, kn)
            tot = tot + o.astype(jnp.float32).sum()
        return tot

    def merged_ring_attn(q, cache_k, cache_v, mask, ring_k, ring_v, fill,
                         k_new, v_new):
        """No-concat ring fold: per-segment online-softmax merge."""
        B, Hq, _, D = q.shape
        Hc = cache_k.shape[1]
        R = ring_k.shape[2]
        scale = 1.0 / math.sqrt(D)
        qg = q.reshape(B, Hc, Hq // Hc, D)
        cd = q.dtype

        def seg(k, v, m):
            logits = jnp.einsum("bhgd,bhsd->bhgs", qg, k.astype(cd),
                                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(m[:, :, None, :], logits, NEG_INF)
            mx = logits.max(axis=-1, keepdims=True)
            e = jnp.exp(logits - mx)
            num = jnp.einsum("bhgs,bhsd->bhgd", e.astype(cd),
                             v.astype(cd)).astype(jnp.float32)
            return mx[..., 0], e.sum(-1), num

        m1, s1, n1 = seg(cache_k, cache_v, mask)
        rmask = jnp.broadcast_to((jnp.arange(R) < fill)[None, None, :],
                                 (B, Hc, R))
        m2, s2, n2 = seg(ring_k, ring_v, rmask)
        m3, s3, n3 = seg(k_new, v_new,
                         jnp.ones((B, Hc, 1), bool))
        m = jnp.maximum(jnp.maximum(m1, m2), m3)
        w1 = jnp.exp(m1 - m)[..., None]
        w2 = jnp.exp(m2 - m)[..., None]
        w3 = jnp.exp(m3 - m)[..., None]
        num = n1 * w1 + n2 * w2 + n3 * w3
        den = (s1 * w1[..., 0] + s2 * w2[..., 0]
               + s3 * w3[..., 0])[..., None]
        return (num / den).astype(q.dtype).reshape(B, Hq, 1, D)

    @jax.jit
    def merged(ck, cv, rk, rv):
        tot = jnp.zeros((), jnp.float32)
        for l in range(L):
            o = merged_ring_attn(q, ck[l], cv[l], mask, rk[l], rv[l],
                                 fill, kn, kn)
            tot = tot + o.astype(jnp.float32).sum()
        return tot

    timeit("deferred (no ring)", deferred, ck, cv)
    timeit("ring fold (concat)", ring, ck, cv, rk, rv)
    timeit("ring fold (merged softmax)", merged, ck, cv, rk, rv)


if __name__ == "__main__":
    main()
