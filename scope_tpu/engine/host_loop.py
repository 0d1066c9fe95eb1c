"""Host-orchestrated decode loop.

The host mirrors the (deterministic) SCOPE gates/counters
(compression/host_sched.py) and dispatches per step either the
compression-free hot program or the unconditional-compress program —
no lax.cond, no top-k, and no conditional buffer traffic in the common
step.  Token-identical to the device-scheduled path
(tests/test_host_sched.py).
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scope_tpu.compression.host_sched import (HostScheduler,
                                              LayeredHostScheduler,
                                              host_schedulable,
                                              host_schedulable_layered)
from scope_tpu.compression.schedulers import static_keep_cap
from scope_tpu.config import CompressionConfig, EngineConfig, ModelSpec
from scope_tpu.models import llama


class HostScheduledDecoder:
    def __init__(self, spec: ModelSpec, comp: CompressionConfig,
                 ecfg: EngineConfig):
        self._layered = host_schedulable_layered(comp)
        self._quest = comp.method == "quest"
        if not (host_schedulable(comp) or self._layered):
            raise ValueError(
                f"{comp.method}+{comp.decoding_metric} needs the device "
                f"scheduler; use decode_step(compress_mode='cond')")
        self.spec, self.comp, self.ecfg = spec, comp, ecfg
        st = llama.derive_statics(spec, comp, ecfg)
        self._capacity = st.caps.capacity
        self._keep_cap = min(st.caps.keep_cap, st.caps.capacity)
        # Length buckets: hot steps attend over the smallest bucket that
        # covers the live cache length (free static-slice views), so the
        # growing-cache methods don't pay full-capacity attention early.
        buckets, b = [], 512
        while b < self._capacity:
            buckets.append(b)
            b *= 2
        buckets.append(self._capacity)
        self._buckets = buckets
        # Quest: the decode region gets its own bucket ladder (it grows
        # from 0 toward max_new_tokens; the un-bucketed path attends the
        # full max_new-wide region from step one).
        dcap = ecfg.max_new_tokens + 1
        dbuckets, b = [], 512
        while b < dcap:
            dbuckets.append(b)
            b *= 2
        dbuckets.append(dcap)
        self._dec_buckets = dbuckets
        self._step_fns = {}
        # Fire steps are rare; they always run at full capacity.
        self._step_force = jax.jit(
            partial(llama.decode_step, spec, comp, ecfg,
                    compress_mode="force"), donate_argnums=(3,))
        # Staging ring (ecfg.decode_ring): hot steps write the small ring
        # buffer; the host flushes before fires and when the ring fills.
        # Quest appends per layer inside its own path and never stages.
        self._ring = 0 if self._quest else ecfg.decode_ring
        self._flush_fns = {}
        # Lazy eviction: fires tombstone (decode_step's alive path); the
        # host dispatches cache.compact_lazy when phys slots run out.
        self._lazy = ecfg.lazy_evict and comp.decoding_metric != "none"
        if self._lazy and (self._layered or self._quest):
            raise ValueError("lazy_evict supports the layer-uniform "
                             "methods (h2o/snapkv/streamingllm/allkv)")
        if self._lazy and comp.decoding_metric in ("h2o", "slm"):
            # These metrics re-rank from slot 0 (no protected prefill
            # gap), which the lazy compactor's gap layout doesn't model;
            # slm additionally keeps positionally, not by score.
            # (pyramidinfer never reaches here: its method is layered
            # and the layered check above already rejected lazy.)
            raise ValueError("lazy_evict supports the fixed/linear/jump "
                             "metrics; run h2o/slm eager")
        self._compact_fn = None
        self._compact_gap = (0 if comp.method in ("allkv", "fullkv")
                             else comp.max_capacity_prompt)

    def _get_compact_fn(self):
        from scope_tpu.cache import compact_gather, compact_write
        if self._compact_fn is None:
            # Two dispatches: the gather must NOT be fused with the
            # write-back (gather-from-self + whole-buffer DUS makes XLA
            # plan a full cache copy beside the donated input — compile-
            # OOM at 1B b192 int8).  The gather call leaves the cache
            # undonated; the write is a pure DUS that aliases in place.
            self._compact_fn = (
                jax.jit(partial(compact_gather, gap=self._compact_gap)),
                jax.jit(partial(compact_write, gap=self._compact_gap),
                        donate_argnums=(0,)))
        return self._compact_fn

    def compact(self, sched, cache):
        """Dispatch the amortized lazy compaction; mirror it on the host."""
        gather_fn, write_fn = self._get_compact_fn()
        kblk, vblk, lns = gather_fn(cache)
        cache = write_fn(cache, kblk, vblk, lns)
        sched.compacted()
        return cache

    def flush(self, sched, cache, batch: int):
        """Flush staged ring tokens into the big cache (no-op when
        empty); resets the scheduler's fill mirror."""
        if not self._ring or sched.ring_fill == 0:
            return cache
        from scope_tpu.cache import flush_ring
        ur = batch == 1 or self.ecfg.uniform_lengths
        fn = self._flush_fns.get(ur)
        if fn is None:
            fn = jax.jit(partial(flush_ring, uniform_rows=ur,
                                 uniform_layers=not self._layered),
                         donate_argnums=(0,))
            self._flush_fns[ur] = fn
        cache = fn(cache)
        sched.ring_fill = 0
        return cache

    def _step_off(self, bucket: int, dec_bucket: Optional[int] = None):
        fn = self._step_fns.get((bucket, dec_bucket))
        if fn is None:
            fn = jax.jit(
                partial(llama.decode_step, self.spec, self.comp, self.ecfg,
                        compress_mode="off", attn_cap=bucket,
                        layer_uniform_lengths=not self._layered,
                        quest_dec_cap=dec_bucket),
                donate_argnums=(3,))
            self._step_fns[(bucket, dec_bucket)] = fn
        return fn

    def _step_chunk(self, bucket: int, n: int,
                    dec_bucket: Optional[int] = None):
        """Jitted n-step hot chunk (llama.decode_steps) at ``bucket``."""
        fn = self._step_fns.get((bucket, n, dec_bucket))
        if fn is None:
            fn = jax.jit(
                partial(llama.decode_steps, self.spec, self.comp,
                        self.ecfg, n_steps=n, attn_cap=bucket,
                        layer_uniform_lengths=not self._layered,
                        quest_dec_cap=dec_bucket),
                donate_argnums=(3,))
            self._step_fns[(bucket, n, dec_bucket)] = fn
        return fn

    def _dec_bucket_for(self, needed: int) -> Optional[int]:
        if not self._quest:
            return None
        if self.comp.quest_decode_pages > 0:
            # Paged decode region: attention reads SELD*chunk selected
            # tokens regardless of region length, and the dec_cap-wide
            # dense slice is dead code in the program — pin ONE bucket
            # so region growth never forces a multi-minute recompile at
            # each bucket crossing.
            return self._dec_buckets[0]
        for b in self._dec_buckets:
            if needed <= b:
                return b
        return self._dec_buckets[-1]

    def step_auto(self, sched, params, tok, vpos, cache, state):
        """Advance 1..max(chunk_sizes) decode steps, chunking fire-free
        runs into one program (ecfg.decode_chunk_sizes; empty = always
        per-step).  Returns (tokens [B, k] device array, cache, state);
        the LAST column is the next step's input token."""
        if self._lazy and sched.needs_compact(
                headroom=1 + sched.ring_fill):
            cache = self.flush(sched, cache, tok.shape[0])
            cache = self.compact(sched, cache)
        sizes = tuple(s for s in sorted(self.ecfg.decode_chunk_sizes,
                                        reverse=True) if s > 1)
        if sizes:
            run = sched.hot_run_length(sizes[0])
            if self._ring and run > 0:
                if self._ring - sched.ring_fill == 0:
                    cache = self.flush(sched, cache, tok.shape[0])
                run = min(run, self._ring - sched.ring_fill)
            for n in sizes:
                if n <= run:
                    bucket = self._bucket_for(
                        getattr(sched, "phys", sched.length) + n)
                    db = self._dec_bucket_for(sched.dec_len + n) \
                        if self._quest else None
                    toks, cache, state = self._step_chunk(bucket, n, db)(
                        params, tok, vpos, cache, state)
                    sched.advance_hot(n)
                    if self._ring:
                        sched.ring_fill += n
                    return toks, cache, state
        logits, cache, state = self.step(sched, params, tok, vpos, cache,
                                         state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return tok[:, None], cache, state

    def _bucket_for(self, needed: int) -> int:
        for b in self._buckets:
            if needed <= b:
                return b
        return self._capacity

    def new_scheduler(self, prompt_len: int,
                      prompt_pad: Optional[int] = None):
        comp = self.comp
        if self._layered:
            pad = prompt_pad if prompt_pad is not None else \
                self.ecfg.bucket_for(prompt_len)
            return LayeredHostScheduler(comp, self.spec.num_layers,
                                        prompt_len, pad, self._keep_cap,
                                        self._capacity)
        if self._quest:
            from scope_tpu.compression.host_sched import QuestHostScheduler
            return QuestHostScheduler(comp, self.spec.num_layers,
                                      prompt_len, self._keep_cap)
        if comp.method in ("fullkv", "allkv"):
            kept = prompt_len
        else:
            kept = min(comp.max_capacity_prompt, prompt_len)
        return HostScheduler(comp, self.spec.num_layers, prompt_len, kept,
                             self._keep_cap, lazy=self._lazy,
                             capacity=self._capacity)

    def step(self, sched, params, tok, vpos, cache, state):
        if self._lazy and sched.needs_compact(
                headroom=1 + sched.ring_fill):
            cache = self.flush(sched, cache, tok.shape[0])
            cache = self.compact(sched, cache)
        plan = sched.plan_step()
        B = tok.shape[0]
        layered = self._layered or self._quest
        fire = plan.fire_any if layered else plan.fire
        if self._ring:
            # Fires need a contiguous cache; a full ring must drain
            # before another hot step can stage.
            if fire or sched.ring_fill >= self._ring:
                cache = self.flush(sched, cache, B)
        if layered:
            if plan.fire_any:
                gate = jnp.asarray(np.broadcast_to(
                    np.asarray(plan.fire, bool)[:, None],
                    (self.spec.num_layers, B)))
                n_keep = jnp.asarray(np.broadcast_to(
                    np.asarray(plan.n_keep, np.int32)[:, None],
                    (self.spec.num_layers, B)))
                return self._step_force(params, tok, vpos, cache, state,
                                        force_n_keep=n_keep,
                                        force_row_gate=gate)
        elif plan.fire:
            n_keep = jnp.full((B,), plan.n_keep, jnp.int32)
            return self._step_force(params, tok, vpos, cache, state,
                                    force_n_keep=n_keep)
        bucket = self._bucket_for(getattr(sched, "phys", sched.length))
        db = self._dec_bucket_for(sched.dec_len) if self._quest else None
        out = self._step_off(bucket, db)(params, tok, vpos, cache, state)
        if self._ring:
            sched.ring_fill += 1
        return out


def host_generate(spec: ModelSpec, comp: CompressionConfig,
                  ecfg: EngineConfig, params, tokens: np.ndarray,
                  true_len: np.ndarray, max_new: int,
                  eos_ids: Tuple[int, ...] = ()) -> Tuple[np.ndarray, dict]:
    """Greedy generation with host scheduling (batch rows must share one
    prompt length — the host mirrors a single length stream)."""
    assert len(set(int(t) for t in true_len)) == 1, \
        "host scheduling assumes uniform prompt lengths"
    dec = HostScheduledDecoder(spec, comp, ecfg)
    prefill = jax.jit(partial(llama.prefill, spec, comp, ecfg))

    t0 = time.perf_counter()
    tokens_j = jnp.asarray(tokens, jnp.int32)
    tl = jnp.asarray(true_len, jnp.int32)
    logits, cache, state = prefill(params, tokens_j, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    timestamps = [time.perf_counter()]
    sched = dec.new_scheduler(int(true_len[0]),
                              prompt_pad=tokens.shape[1])
    eos = set(int(e) for e in eos_ids)

    out = [np.asarray(tok)]
    done = np.isin(out[0], list(eos)) if eos else np.zeros_like(out[0],
                                                                bool)
    s = 0
    # With ecfg.decode_chunk_sizes set, fire-free runs execute as one
    # multi-step program; tokens in a chunk share the chunk-end timestamp
    # (TPOT is then per-chunk-averaged, not per-token).
    while len(out) < max_new and not done.all():
        toks, cache, state = dec.step_auto(sched, params, tok, tl + s,
                                           cache, state)
        arr = np.asarray(toks)                      # [B, k]
        t_now = time.perf_counter()
        for j in range(arr.shape[1]):
            if len(out) >= max_new:
                break
            timestamps.append(t_now)
            out.append(arr[:, j])
            if eos:
                done |= np.isin(arr[:, j], list(eos))
            if done.all():
                break
        tok = toks[:, -1]
        s += arr.shape[1]
    gen = np.stack(out, axis=1)
    stats = {
        "ttft_s": timestamps[0] - t0,
        "tpot_s": [timestamps[i] - (timestamps[i - 1] if i else t0)
                   for i in range(len(timestamps))],
    }
    return gen, stats
