"""Length-bucketed decode attention must not change any token."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.engine.host_loop import HostScheduledDecoder
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA

ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=600,
                    dtype="float32")


@pytest.mark.parametrize("method,metric", [
    ("fullkv", "none"),      # growing cache: crosses bucket boundaries
    ("h2o", "fixed"),
])
def test_bucketed_equals_full_capacity(method, metric):
    comp = CompressionConfig(
        method=method, decoding_metric=metric, max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)
    # fullkv capacity here is 128+600 -> 768, so generating ~450 steps
    # crosses the 512 bucket boundary.
    steps = 450 if method == "fullkv" else 60

    # Reference: plain device path (full capacity attention).
    logits, cache, state = llama.prefill(TINY_LLAMA, comp, ECFG, params,
                                         toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    ref = [int(tok[0])]
    step = jax.jit(lambda p, t, v, c, s: llama.decode_step(
        TINY_LLAMA, comp, ECFG, p, t, v, c, s))
    for s in range(steps):
        logits, cache, state = step(params, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        ref.append(int(tok[0]))

    # Bucketed host path.
    dec = HostScheduledDecoder(TINY_LLAMA, comp, ECFG)
    if method == "fullkv":
        assert len(dec._buckets) > 1  # bucketing is actually in play
    logits, cache, state = jax.jit(
        lambda p, t, l: llama.prefill(TINY_LLAMA, comp, ECFG, p, t, l)
    )(params, toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    sched = dec.new_scheduler(100)
    got = [int(tok[0])]
    buckets_seen = set()
    for s in range(steps):
        buckets_seen.add(dec._bucket_for(sched.length + 1))
        logits, cache, state = dec.step(sched, params, tok, tl + s, cache,
                                        state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        got.append(int(tok[0]))

    assert got == ref
    if method == "fullkv":
        assert len(buckets_seen) >= 2     # crossed a bucket boundary
