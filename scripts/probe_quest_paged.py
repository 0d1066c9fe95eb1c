"""Measure the quest decode-region paging speed delta (VERDICT r4 #7).

quest + decoding_metric=none, 1B shapes, batch 4: simulate a
late-generation region of R decode tokens and compare the dense region
read (reference semantics) against the paged one
(comp.quest_decode_pages).  Accuracy gate: tests/test_quest_paged_decode
(planted-structure selection + exactness-while-fits + metadata rebuild).

Run alone — the chip is single-tenant.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(pages: int, region: int, batch=4, steps=32):
    import jax
    import jax.numpy as jnp

    import bench
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.engine.host_loop import HostScheduledDecoder
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec

    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)
    comp = CompressionConfig(method="quest", decoding_metric="none",
                             max_capacity_prompt=2048, window_size=8,
                             chunk_size=16, quest_decode_pages=pages,
                             evict_per_qhead=False)
    ecfg = EngineConfig(max_prompt_len=2048, max_new_tokens=8192,
                        dtype="bfloat16", uniform_lengths=True)
    tok, tl, cache, state = bench.build_state(spec, comp, ecfg, params,
                                              2048, batch=batch)
    # Simulate a late-generation region (throughput is value-free).
    cache = cache.replace(length=jnp.full_like(cache.length,
                                               2048 + region))
    dec = HostScheduledDecoder(spec, comp, ecfg)
    sched = dec.new_scheduler(2048)
    sched.lengths = [2048 + region] * spec.num_layers

    s = 0
    while s < 8:
        toks, cache, state = dec.step_auto(sched, params, tok, tl + s,
                                           cache, state)
        tok = toks[:, -1]
        s += toks.shape[1]
    _ = jax.device_get(tok)
    rates = []
    for _rep in range(2):
        n = 0
        t0 = time.perf_counter()
        while n < steps:
            toks, cache, state = dec.step_auto(sched, params, tok,
                                               tl + s, cache, state)
            tok = toks[:, -1]
            k = toks.shape[1]
            s += k
            n += k
        _ = jax.device_get(tok)
        rates.append((time.perf_counter() - t0) / n * 1e3)
    return max(rates)


def main():
    import jax
    from scope_tpu.utils import compile_cache
    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    for region in (2048, 6000):
        dense = measure(0, region)
        paged = measure(16, region)
        log(f"[quest b4 region={region}] dense {dense:.2f} ms/step, "
            f"paged(16) {paged:.2f} ms/step -> {dense/paged:.2f}x")
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
