"""Greedy/ sampled generation loops over the compression-aware model.

Two paths, mirroring how the reference is *used* vs how it should perform:
- :func:`generate_scan` — the whole decode loop under one jit via
  ``lax.scan`` (throughput path; nothing touches the host).
- :class:`StreamingGenerator` — a host loop around jitted step functions
  that records per-token wall-clock timestamps, reproducing the reference's
  ``TimingStreamer`` TTFT/TPOT measurement (run_longgenbench.py:67-78,
  :244-249).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scope_tpu.compression.schedulers import SchedState
from scope_tpu.config import CompressionConfig, EngineConfig, ModelSpec
from scope_tpu.models import llama


class GenerateResult(NamedTuple):
    tokens: np.ndarray          # [B, max_new] generated ids (eos-padded)
    gen_lengths: np.ndarray     # [B] tokens up to and including eos
    ttft_s: float
    tpot_s: List[float]


def sample_logits(logits: jnp.ndarray, key=None, temperature: float = 0.0,
                  top_k: int = 0, top_p: float = 1.0) -> jnp.ndarray:
    """Greedy (temperature<=0) or temperature/top-k/top-p sampling.

    The reference only ever decodes greedily (do_sample=False,
    run_longgenbench.py:236); sampling is provided for engine completeness.
    logits: [B, V] -> [B] int32."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        kth = lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = -jnp.sort(-logits, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        # Keep tokens until cumulative mass exceeds top_p (always >= 1).
        cutoff_idx = jnp.sum(csum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits).astype(jnp.int32)


def sample_logits_rowwise(logits: jnp.ndarray, seeds: jnp.ndarray,
                          counters: jnp.ndarray, temperature: jnp.ndarray,
                          top_k: jnp.ndarray, top_p: jnp.ndarray,
                          max_top_k: int = 64,
                          any_unrestricted: bool = True) -> jnp.ndarray:
    """Per-ROW sampling params for continuous batching: each slot carries
    its own (temperature, top_k, top_p, seed); rows with temperature<=0
    decode greedily.

    Non-greedy rows sample among the row's ``max_top_k`` highest-logit
    candidates (a static bound so the per-row dynamic top_k/top_p masks
    stay shape-stable under jit); top_k values above ``max_top_k`` are
    clamped.  ``any_unrestricted`` (static): compile the exact
    full-vocabulary path for rows with top_k=0 & top_p>=1 — the host
    knows per-slot params, so callers whose rows all restrict pass False
    and skip the [B, V] categorical entirely.  logits: [B, V] -> [B]
    int32.
    """
    B = logits.shape[0]
    max_top_k = min(max_top_k, logits.shape[-1])
    lg = logits.astype(jnp.float32)
    greedy_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)

    vals, idx = lax.top_k(lg, max_top_k)              # [B, K] descending
    t = jnp.maximum(temperature, 1e-6)[:, None]
    v = vals / t
    j = jnp.arange(max_top_k)[None, :]
    k_eff = jnp.where(top_k > 0, jnp.minimum(top_k, max_top_k),
                      max_top_k)[:, None]
    v = jnp.where(j < k_eff, v, -jnp.inf)
    probs = jax.nn.softmax(v, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    # Keep candidates until cumulative mass exceeds top_p (always >= 1).
    cutoff = jnp.sum(csum < top_p[:, None], axis=-1, keepdims=True)
    v = jnp.where(j <= cutoff, v, -jnp.inf)

    def draw(seed, counter, row):
        key = jax.random.fold_in(jax.random.fold_in(
            jax.random.key(0), seed), counter)
        return jax.random.categorical(key, row)
    choice = jax.vmap(draw)(seeds, counters, v)       # [B] in [0, K)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    # Rows asking for UNRESTRICTED sampling (top_k==0 AND top_p>=1) get
    # exact full-vocabulary temperature sampling — categorical over the
    # whole [V] row is shape-stable without any top-k bound, so
    # "top_p=1.0" means the full vocab, matching every other serving
    # stack (the top_k path above only exists because per-row top_k/top_p
    # masks need a static candidate width).
    sampled = sampled.astype(jnp.int32)
    if any_unrestricted:
        full_tok = jax.vmap(draw)(seeds, counters, lg / t)
        unrestricted = (top_k <= 0) & (top_p >= 1.0)
        sampled = jnp.where(unrestricted, full_tok.astype(jnp.int32),
                            sampled)
    return jnp.where(temperature > 0.0, sampled,
                     greedy_tok)


@partial(jax.jit, static_argnums=(0, 1, 2, 6, 8))
def generate_scan(spec: ModelSpec, comp: CompressionConfig,
                  ecfg: EngineConfig, params, tokens: jnp.ndarray,
                  true_len: jnp.ndarray, max_new: int,
                  eos_id: int, eos_is_array: bool = False,
                  eos_ids: Optional[jnp.ndarray] = None):
    """Fully-jitted greedy generation.  tokens: [B, S_pad] right-padded.

    Returns (generated [B, max_new] int32, done_step [B] int32 index of the
    first eos or max_new)."""
    logits, cache, state = llama.prefill(spec, comp, ecfg, params, tokens,
                                         true_len)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def is_eos(t):
        if eos_is_array:
            return jnp.isin(t, eos_ids)
        return t == eos_id

    done0 = is_eos(tok0)

    def step(carry, s):
        tok, cache, state, done = carry
        vpos = true_len + s
        logits, cache, state = llama.decode_step(spec, comp, ecfg, params,
                                                 tok, vpos, cache, state)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, jnp.int32(eos_id), nxt)
        done_next = done | is_eos(nxt)
        return (nxt, cache, state, done_next), tok

    (last, _, _, _), toks = lax.scan(
        step, (tok0, cache, state, done0), jnp.arange(max_new - 1))
    generated = jnp.concatenate(
        [jnp.moveaxis(toks, 0, 1), last[:, None]], axis=1)  # [B, max_new]
    eos_mask = is_eos(generated)
    any_eos = jnp.any(eos_mask, axis=1)
    first_eos = jnp.argmax(eos_mask, axis=1)
    done_step = jnp.where(any_eos, first_eos + 1, max_new)
    return generated, done_step


class StreamingGenerator:
    """Host-side decode loop with per-token timing (reference TTFT/TPOT)."""

    def __init__(self, spec: ModelSpec, comp: CompressionConfig,
                 ecfg: EngineConfig, params, eos_ids: Tuple[int, ...]):
        self.spec, self.comp, self.ecfg = spec, comp, ecfg
        self.params = params
        self.eos_ids = set(int(e) for e in eos_ids)
        self._prefill = jax.jit(partial(llama.prefill, spec, comp, ecfg))
        # Host-orchestrated scheduling when the gates are deterministic:
        # the hot decode program then carries no compression machinery.
        # (metric "none" also benefits: length-bucketed attention.)
        from scope_tpu.compression.host_sched import (
            host_schedulable, host_schedulable_layered)
        self._host_dec = None
        if host_schedulable(comp) or host_schedulable_layered(comp):
            from scope_tpu.engine.host_loop import HostScheduledDecoder
            self._host_dec = HostScheduledDecoder(spec, comp, ecfg)
        self._decode = jax.jit(partial(llama.decode_step, spec, comp, ecfg))

    def generate(self, tokens: np.ndarray, true_len: np.ndarray,
                 max_new: int) -> GenerateResult:
        assert tokens.shape[0] == 1, "streaming path is per-request"
        t0 = time.perf_counter()
        tokens_j = jnp.asarray(tokens, jnp.int32)
        tl = jnp.asarray(true_len, jnp.int32)
        logits, cache, state = self._prefill(self.params, tokens_j, tl)
        tok = int(jax.device_get(jnp.argmax(logits, axis=-1))[0])
        timestamps = [time.perf_counter()]
        out = [tok]
        done = tok in self.eos_ids
        s = 0
        sched = (self._host_dec.new_scheduler(int(true_len[0]),
                                              prompt_pad=tokens.shape[1])
                 if self._host_dec is not None else None)
        while not done and len(out) < max_new:
            vpos = tl + s
            tok_arr = jnp.full((1,), tok, jnp.int32)
            if sched is not None:
                logits, cache, state = self._host_dec.step(
                    sched, self.params, tok_arr, vpos, cache, state)
            else:
                logits, cache, state = self._decode(
                    self.params, tok_arr, vpos, cache, state)
            tok = int(jax.device_get(jnp.argmax(logits, axis=-1))[0])
            timestamps.append(time.perf_counter())
            out.append(tok)
            done = tok in self.eos_ids
            s += 1
        ttft = timestamps[0] - t0
        tpot = [timestamps[i] - (timestamps[i - 1] if i else t0)
                for i in range(len(timestamps))]
        arr = np.full((1, max_new),
                      next(iter(self.eos_ids)) if self.eos_ids else 0,
                      np.int32)
        arr[0, :len(out)] = out
        return GenerateResult(tokens=arr,
                              gen_lengths=np.array([len(out)]),
                              ttft_s=ttft, tpot_s=tpot)
