"""Microbenchmark: XLA vs chunked-fused decode step on the real chip.

Times the host-scheduled hot decode step (compress_mode="off") of the
flagship 1B config at the headline operating point (h2o+jump compressed
cache), with the fused pallas decode-attention kernel on and off, across
chunk sizes.  Run alone — the chip is single-tenant.

Usage: python scripts/bench_decode_kernel.py [--steps 64] [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--cap", type=int, default=0,
                    help="attention bucket cap (0 = scope capacity)")
    ap.add_argument("--variants", type=str,
                    default="xla,fused",
                    help="comma list: xla,fused,xla_kvhead,fused_kvhead,"
                         "xla_floor")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec

    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)

    comp0 = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=(7950 - 256) // (512 - 256))

    def run(fused: bool, comp=comp0, cap_override: int = 0, note: str = ""):
        ecfg = EngineConfig(max_prompt_len=2048, max_new_tokens=7950,
                            dtype="bfloat16", uniform_lengths=True,
                            fused_decode_attention=fused)
        st = llama.derive_statics(spec, comp, ecfg)
        cap = cap_override or args.cap or st.capacity
        # Synthetic steady-state cache (skips the prefill compile; decode
        # throughput does not depend on cache *values*).
        from scope_tpu.cache import init_cache
        from scope_tpu.compression.schedulers import SchedState
        cache = init_cache(spec.num_layers, args.batch, st.cache_heads,
                           st.capacity, spec.head_dim,
                           jnp.dtype(ecfg.dtype))
        key = jax.random.key(1)
        cache = cache.replace(
            k=jax.random.normal(key, cache.k.shape, cache.k.dtype),
            v=jax.random.normal(key, cache.v.shape, cache.v.dtype),
            length=jnp.full_like(cache.length, cap - args.steps - 8),
            pvalid=jnp.full_like(cache.pvalid, cap - args.steps - 8),
            prompt_len=jnp.full((args.batch,), 2048, jnp.int32))
        state = SchedState.init()
        tl = jnp.full((args.batch,), 2048, jnp.int32)
        tok = jnp.zeros((args.batch,), jnp.int32) + 7
        log(f"  capacity {st.capacity}, attn cap {cap}")

        step = jax.jit(partial(llama.decode_step, spec, comp, ecfg,
                               compress_mode="off", attn_cap=cap),
                       donate_argnums=(3,))
        s = 0
        t0 = time.perf_counter()
        for _ in range(4):
            logits, cache, state = step(params, tok, tl + s, cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            s += 1
        _ = jax.device_get(tok)
        log(f"  compile+warmup: {time.perf_counter()-t0:.1f}s")
        times = []
        for _rep in range(2):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                logits, cache, state = step(params, tok, tl + s, cache,
                                            state)
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                s += 1
            _ = jax.device_get(tok)
            times.append((time.perf_counter() - t0) / args.steps)
        ms = max(times) * 1e3
        log(f"[{note or ('fused' if fused else 'xla')}] step: "
            f"{[f'{t*1e3:.2f}' for t in times]} ms "
            f"-> {args.batch/max(times):.1f} tok/s")
        return ms

    comp_kv = comp0.replace(evict_per_qhead=False)
    results = {}
    for v in args.variants.split(","):
        v = v.strip()
        if v == "xla":
            results[v] = run(False, note=v)
        elif v == "fused":
            results[v] = run(True, note=v)
        elif v == "xla_kvhead":
            results[v] = run(False, comp=comp_kv, note=v)
        elif v == "fused_kvhead":
            results[v] = run(True, comp=comp_kv, note=v)
        elif v == "xla_floor":
            # Near-zero KV traffic: isolates weights + per-op overhead.
            results[v] = run(False, cap_override=256, note=v)
        else:
            log(f"unknown variant {v}")
    log("== " + "  ".join(f"{k}={ms:.2f}ms" for k, ms in results.items()))


if __name__ == "__main__":
    main()
