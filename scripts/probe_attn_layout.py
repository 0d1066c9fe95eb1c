"""Isolate decode-attention read cost at b64/int8: stacked [L,...] cache
with per-layer slicing vs a list of per-layer arrays, and the ring fold.
Run alone."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    L, B, H, S, D = 16, 64, 8, 2688, 64
    G, R = 4, 64
    dt = jnp.int8

    q = jax.random.normal(jax.random.key(0), (B, H, G, D), jnp.bfloat16)
    length = jnp.full((B,), S - 100, jnp.int32)
    fill = jnp.int32(7)
    idx = jnp.arange(S)
    ridx = jnp.arange(R)

    def attn(k, v, mask):
        logits = jnp.einsum("bhgd,bhsd->bhgs", q, k.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        logits = jnp.where(mask[:, :, None, :], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhgs,bhsd->bhgd", probs.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16))

    def attn_ring(k, v, rk, rv, mask, rmask):
        lo = jnp.einsum("bhgd,bhsd->bhgs", q, k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        lo = jnp.where(mask[:, :, None, :], lo, -1e30)
        lr = jnp.einsum("bhgd,bhsd->bhgs", q, rk.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        lr = jnp.where(rmask[None, None, None, :], lr, -1e30)
        probs = jax.nn.softmax(jnp.concatenate([lo, lr], -1), -1)
        return (jnp.einsum("bhgs,bhsd->bhgd",
                           probs[..., :S].astype(jnp.bfloat16),
                           v.astype(jnp.bfloat16))
                + jnp.einsum("bhgs,bhsd->bhgd",
                             probs[..., S:].astype(jnp.bfloat16),
                             rv.astype(jnp.bfloat16)))

    @partial(jax.jit, donate_argnums=(0, 1))
    def f_stacked(k_all, v_all):
        mask = (idx[None, :] < length[:, None])[:, None, :]
        mask = jnp.broadcast_to(mask, (B, H, S))
        out = q * 0
        for l in range(L):
            out = out + attn(k_all[l], v_all[l], mask)
        return out.sum(), k_all, v_all

    @partial(jax.jit, donate_argnums=(0, 1))
    def f_list(ks, vs):
        mask = (idx[None, :] < length[:, None])[:, None, :]
        mask = jnp.broadcast_to(mask, (B, H, S))
        out = q * 0
        for l in range(L):
            out = out + attn(ks[l], vs[l], mask)
        return out.sum(), ks, vs

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def f_stacked_ring(k_all, v_all, rk, rv):
        mask = (idx[None, :] < length[:, None])[:, None, :]
        mask = jnp.broadcast_to(mask, (B, H, S))
        rmask = ridx < fill
        out = q * 0
        for l in range(L):
            out = out + attn_ring(k_all[l], v_all[l], rk[l], rv[l],
                                  mask, rmask)
        return out.sum(), k_all, v_all, rk, rv

    def timeit(name, fn, bufs, reps=24):
        outs = fn(*bufs)
        bufs = outs[1:]
        _ = jax.device_get(outs[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            outs = fn(*bufs)
            bufs = outs[1:]
        _ = jax.device_get(outs[0])
        log(f"[{name}] {(time.perf_counter() - t0) / reps * 1e3:.2f} ms")

    timeit("stacked_int8", f_stacked,
           (jnp.ones((L, B, H, S, D), dt), jnp.ones((L, B, H, S, D), dt)))
    timeit("list_int8", f_list,
           ([jnp.ones((B, H, S, D), dt) for _ in range(L)],
            [jnp.ones((B, H, S, D), dt) for _ in range(L)]))
    timeit("stacked_ring_int8", f_stacked_ring,
           (jnp.ones((L, B, H, S, D), dt), jnp.ones((L, B, H, S, D), dt),
            jnp.ones((L, B, H, R, D), dt), jnp.ones((L, B, H, R, D), dt)))


if __name__ == "__main__":
    main()
