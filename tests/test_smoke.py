"""End-to-end smoke: tiny model, prefill + a few decode steps per method."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA

ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=64, dtype="float32")


def make_inputs(batch=1, true=100, pad=128, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, TINY_LLAMA.vocab_size, (batch, pad))
    toks[:, true:] = 0
    return jnp.asarray(toks, jnp.int32), jnp.full((batch,), true, jnp.int32)


@pytest.mark.parametrize("method,metric", [
    ("fullkv", "none"),
    ("allkv", "none"),
    ("allkv", "fixed"),
    ("h2o", "none"),
    ("h2o", "fixed"),
    ("h2o", "linear"),
    ("h2o", "jump"),
    ("h2o", "h2o"),
    ("snapkv", "fixed"),
    ("pyramidkv", "fixed"),
    ("pyramidkv", "pyramidinfer"),
    ("streamingllm", "fixed"),
    ("streamingllm", "slm"),
])
def test_prefill_decode_runs(method, metric):
    comp = CompressionConfig(
        method=method, decoding_metric=metric,
        max_capacity_prompt=64,
        window_size=32 if method == "streamingllm" else 8,
        decoding_window_size=32, decoding_recent_size=16, delta=3)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    toks, tl = make_inputs()
    logits, cache, state = jax.jit(
        lambda p, t, l: llama.prefill(TINY_LLAMA, comp, ECFG, p, t, l)
    )(params, toks, tl)
    assert logits.shape == (1, TINY_LLAMA.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()

    step = jax.jit(lambda p, t, v, c, s: llama.decode_step(
        TINY_LLAMA, comp, ECFG, p, t, v, c, s))
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    for s in range(40):
        logits, cache, state = step(params, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert np.isfinite(np.asarray(logits)).all()
    # Cache never overflows its static capacity.
    cap = ECFG.cache_capacity(comp)
    assert int(jnp.max(cache.length)) <= cap


def test_kvhead_eviction_mode():
    comp = CompressionConfig(method="h2o", decoding_metric="fixed",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3,
                             evict_per_qhead=False)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    toks, tl = make_inputs()
    logits, cache, state = llama.prefill(TINY_LLAMA, comp, ECFG, params,
                                         toks, tl)
    assert cache.k.shape[2] == TINY_LLAMA.num_kv_heads
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    for s in range(40):
        logits, cache, state = llama.decode_step(
            TINY_LLAMA, comp, ECFG, params, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert np.isfinite(np.asarray(logits)).all()
