"""Per-dispatch wall-time distribution through the host-scheduled loop:
where do ring configs lose time — hot steps, fires, or flushes?
Run alone (single-tenant chip)."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.ops import quant
    from scope_tpu.engine.host_loop import HostScheduledDecoder
    from scope_tpu.utils import compile_cache
    from bench import build_state

    compile_cache.enable()

    ring = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    chunks = tuple(int(x) for x in sys.argv[2].split(",")) \
        if len(sys.argv) > 2 and sys.argv[2] != "none" else ()
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    w8 = not (len(sys.argv) > 4 and sys.argv[4] == "bf16")
    lazy = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    log(f"devices: {jax.devices()} ring={ring} chunks={chunks} "
        f"batch={batch} w8={w8} lazy={lazy}")
    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)
    if w8:
        params = quant.quantize_layer_weights(params)
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=30, evict_per_qhead=False)
    ecfg = EngineConfig(
        max_prompt_len=2048, max_new_tokens=7950, dtype="bfloat16",
        uniform_lengths=True, kv_dtype="int8", decode_ring=ring,
        decode_chunk_sizes=chunks, lazy_evict=bool(lazy),
        lazy_slack=lazy or 256)
    tok, tl, cache, state = build_state(spec, comp, ecfg, params, 2048,
                                        batch=batch)
    dec = HostScheduledDecoder(spec, comp, ecfg)
    sched = dec.new_scheduler(2048)

    # Warm PAST THE FIRST FIRE (lands ~step 265 for W=512 r=256 delta=30)
    # so force/flush programs compile before timing; then one more period.
    sim = dec.new_scheduler(2048)
    ff = 0
    while ff < 100_000:
        p = sim.plan_step()
        ff += 1
        if (p.fire_any if hasattr(p, "fire_any") else p.fire):
            break
    n_warm = ff + comp.delta + 4
    log(f"first fire at step {ff}; warming {n_warm} steps")
    s = 0
    t0 = time.perf_counter()
    while s < n_warm:
        toks, cache, state = dec.step_auto(sched, params, tok, tl + s,
                                           cache, state)
        tok = toks[:, -1]
        s += toks.shape[1]
    _ = jax.device_get(tok)
    log(f"warmup+compile: {time.perf_counter() - t0:.1f}s")

    # Timed: per-dispatch wall, labeled by what the host planned
    # (hot / fire / compact).  Classification peeks the mirror state.
    events = []
    for _ in range(96):
        snap = sched._snapshot()
        will_fire = sched.plan_step().fire
        compacting = getattr(sched, "lazy", False) and \
            sched.needs_compact(headroom=1 + sched.ring_fill)
        sched._restore(snap)
        t0 = time.perf_counter()
        toks, cache, state = dec.step_auto(sched, params, tok, tl + s,
                                           cache, state)
        tok = toks[:, -1]
        k = toks.shape[1]
        _ = jax.device_get(tok[:1])     # force full sync each dispatch
        dt = time.perf_counter() - t0
        kind = ("compact+fire" if compacting and will_fire else
                "compact" if compacting else
                "fire" if will_fire else
                "chunk" if k > 1 else "hot")
        events.append((dt, k, kind))
        s += k
    total_t = sum(e[0] for e in events)
    total_k = sum(e[1] for e in events)
    log(f"aggregate: {total_t / total_k * 1e3:.2f} ms/step "
        f"({batch * total_k / total_t:.0f} tok/s)")
    by = {}
    for dt, k, kind in events:
        t, n, c = by.get(kind, (0.0, 0, 0))
        by[kind] = (t + dt, n + k, c + 1)
    for kind, (t, n, c) in sorted(by.items()):
        log(f"  [{kind:12s}] {c:3d} dispatches, {n:4d} tokens, "
            f"{t / c * 1e3:8.2f} ms/dispatch, {t / n * 1e3:7.2f} ms/token")
    for dt, k, kind in events[:40]:
        log(f"  {dt*1e3:8.2f} ms  k={k:3d}  {kind}")


if __name__ == "__main__":
    main()
