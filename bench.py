"""Headline benchmark: steady-state decode throughput under SCOPE compression.

Measures decode tokens/s/chip on the flagship (Llama-3.2-1B-class shapes,
random bf16 weights — throughput is weight-independent) in the LongGenBench
K=60 operating regime (BASELINE.md): prompt ~2k, generation ~8k, so the
full-cache baseline decodes against a ~10k-token KV cache while SCOPE
(h2o prefill + jump decode scheduling, P=2048 W=512 r=256) holds ~2.6k slots
(~25% KV budget).

Prints ONE JSON line:
  {"metric": ..., "value": tokens/s, "unit": "tok/s/chip",
   "vs_baseline": speedup_over_full_cache}
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_state(spec, comp, ecfg, params, prompt_len, fake_len=None):
    import jax
    import jax.numpy as jnp
    from scope_tpu.models import llama

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, spec.vocab_size, (1, prompt_len)),
                       jnp.int32)
    tl = jnp.full((1,), prompt_len, jnp.int32)
    logits, cache, state = jax.jit(
        partial(llama.prefill, spec, comp, ecfg))(params, toks, tl)
    if fake_len is not None:
        # Simulate a late-generation full cache by advancing the length
        # bookkeeping (slot values don't affect throughput).
        cache = cache.replace(
            length=jnp.full_like(cache.length, fake_len))
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    return tok, tl, cache, state


def measure_decode(spec, comp, ecfg, params, prompt_len, steps=64,
                   warmup=4, fake_len=None, start_step=0):
    import jax
    import jax.numpy as jnp
    from scope_tpu.models import llama

    tok, tl, cache, state = build_state(spec, comp, ecfg, params, prompt_len,
                                        fake_len)
    step_fn = jax.jit(partial(llama.decode_step, spec, comp, ecfg),
                      donate_argnums=(3,))

    vbase = int(tl[0]) + start_step
    s = 0
    t_compile = time.perf_counter()
    for _ in range(warmup):
        logits, cache, state = step_fn(params, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        s += 1
    jax.block_until_ready(tok)
    log(f"  warmup+compile: {time.perf_counter() - t_compile:.1f}s")

    t0 = time.perf_counter()
    for _ in range(steps):
        logits, cache, state = step_fn(params, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        s += 1
    jax.block_until_ready(tok)
    dt = time.perf_counter() - t0
    return steps / dt


def main():
    import jax
    import jax.numpy as jnp
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec

    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)
    prompt_len = 2048

    # SCOPE: h2o prefill + jump decode schedule at the reference operating
    # point (BASELINE.md: P=2048, W=512, r=256, K=60 -> output 7950).
    comp_scope = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=(7950 - 256) // (512 - 256))
    ecfg_scope = EngineConfig(max_prompt_len=2048, max_new_tokens=7950,
                              dtype="bfloat16")
    log(f"scope cache capacity: {ecfg_scope.cache_capacity(comp_scope)}")
    tps_scope = measure_decode(spec, comp_scope, ecfg_scope, params,
                               prompt_len)
    log(f"scope decode: {tps_scope:.1f} tok/s")

    # Baseline: full cache (ALLKV, no decode compression) late in the same
    # generation — cache holds ~10k tokens.
    comp_full = CompressionConfig(method="allkv", decoding_metric="none")
    ecfg_full = EngineConfig(max_prompt_len=2048, max_new_tokens=8192,
                             dtype="bfloat16")
    cap_full = ecfg_full.cache_capacity(comp_full)
    fake_len = min(10000, cap_full - 200)
    log(f"full cache capacity: {cap_full}, simulated length {fake_len}")
    tps_full = measure_decode(spec, comp_full, ecfg_full, params,
                              prompt_len, fake_len=fake_len,
                              start_step=fake_len - prompt_len)
    log(f"full-cache decode: {tps_full:.1f} tok/s")

    result = {
        "metric": "decode_tok_per_s_1B_scope_h2o_jump_vs_fullcache_10k",
        "value": round(tps_scope, 2),
        "unit": "tok/s/chip",
        "vs_baseline": round(tps_scope / tps_full, 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
