"""Chunked prefill == monolithic prefill, token- and cache-identical.

The chunked path (models/chunked_prefill.py) stages roped K/V (and Q for
scoring methods) chunk by chunk, then compresses once in a finalize pass;
it must produce exactly the same compressed cache and last-token logits
as :func:`scope_tpu.models.llama.prefill` (reference semantics: the
compression runs once over the whole prompt, kv_utils.py:633-667).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.chunked_prefill import ChunkedPrefiller
from scope_tpu.models.registry import TINY_LLAMA, TINY_MISTRAL

ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=64, dtype="float32",
                    attn_backend="xla")


def make_inputs(batch, true_lens, pad=128, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(1, TINY_LLAMA.vocab_size, (batch, pad))
    for b, t in enumerate(true_lens):
        toks[b, t:] = 0
    return (jnp.asarray(toks, jnp.int32),
            jnp.asarray(true_lens, jnp.int32))


def comp_for(method):
    return CompressionConfig(
        method=method, decoding_metric="fixed",
        max_capacity_prompt=64,
        window_size=32 if method == "streamingllm" else 8,
        decoding_window_size=32, decoding_recent_size=16, delta=3)


def assert_same(ref, got, atol=2e-5):
    logits_r, cache_r, _ = ref
    logits_g, cache_g, _ = got
    np.testing.assert_allclose(np.asarray(logits_g), np.asarray(logits_r),
                               atol=atol, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cache_g.length),
                                  np.asarray(cache_r.length))
    np.testing.assert_array_equal(np.asarray(cache_g.pvalid),
                                  np.asarray(cache_r.pvalid))
    # Compare only live slots (dead slots may hold garbage from staging).
    k_r, k_g = np.asarray(cache_r.k), np.asarray(cache_g.k)
    v_r, v_g = np.asarray(cache_r.v), np.asarray(cache_g.v)
    lens = np.asarray(cache_r.length)                     # [L, B]
    L, B = lens.shape
    for l in range(L):
        for b in range(B):
            n = lens[l, b]
            np.testing.assert_allclose(k_g[l, b, :, :n], k_r[l, b, :, :n],
                                       atol=atol, rtol=1e-5)
            np.testing.assert_allclose(v_g[l, b, :, :n], v_r[l, b, :, :n],
                                       atol=atol, rtol=1e-5)


@pytest.mark.parametrize("method", [
    "fullkv", "allkv", "h2o", "snapkv", "pyramidkv", "streamingllm",
])
def test_chunked_matches_monolithic(method):
    comp = comp_for(method)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    toks, tl = make_inputs(1, [100])
    ref = jax.jit(lambda p, t, l: llama.prefill(
        TINY_LLAMA, comp, ECFG, p, t, l))(params, toks, tl)
    got = ChunkedPrefiller(TINY_LLAMA, comp, ECFG, chunk_size=32)(
        params, toks, tl)
    assert_same(ref, got)


def test_chunked_ragged_batch():
    comp = comp_for("h2o")
    params = llama.init_params(TINY_LLAMA, jax.random.key(1), jnp.float32)
    toks, tl = make_inputs(3, [100, 37, 64])
    ref = llama.prefill(TINY_LLAMA, comp, ECFG, params, toks, tl)
    got = ChunkedPrefiller(TINY_LLAMA, comp, ECFG, chunk_size=32)(
        params, toks, tl)
    assert_same(ref, got)


def test_chunked_quest_page_metadata():
    comp = CompressionConfig(method="quest", decoding_metric="fixed",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3,
                             chunk_size=16)
    params = llama.init_params(TINY_LLAMA, jax.random.key(2), jnp.float32)
    toks, tl = make_inputs(1, [100])
    ref = llama.prefill(TINY_LLAMA, comp, ECFG, params, toks, tl)
    got = ChunkedPrefiller(TINY_LLAMA, comp, ECFG, chunk_size=32)(
        params, toks, tl)
    assert_same(ref, got)
    np.testing.assert_allclose(np.asarray(got[1].page_min),
                               np.asarray(ref[1].page_min),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1].page_max),
                               np.asarray(ref[1].page_max),
                               atol=2e-5, rtol=1e-5)


def test_chunked_kvhead_mode_and_int8():
    comp = comp_for("h2o").replace(evict_per_qhead=False)
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=64,
                        dtype="float32", attn_backend="xla",
                        kv_dtype="int8")
    params = llama.init_params(TINY_LLAMA, jax.random.key(3), jnp.float32)
    toks, tl = make_inputs(2, [100, 80])
    ref = llama.prefill(TINY_LLAMA, comp, ecfg, params, toks, tl)
    got = ChunkedPrefiller(TINY_LLAMA, comp, ecfg, chunk_size=64)(
        params, toks, tl)
    assert_same(ref, got)
    np.testing.assert_allclose(np.asarray(got[1].k_scale),
                               np.asarray(ref[1].k_scale),
                               atol=2e-6, rtol=1e-5)


def test_chunked_sliding_window():
    comp = comp_for("fullkv")
    params = llama.init_params(TINY_MISTRAL, jax.random.key(4), jnp.float32)
    toks, tl = make_inputs(1, [100])
    ref = llama.prefill(TINY_MISTRAL, comp, ECFG, params, toks, tl)
    got = ChunkedPrefiller(TINY_MISTRAL, comp, ECFG, chunk_size=32)(
        params, toks, tl)
    assert_same(ref, got)


def test_chunked_decode_continues_identically():
    """Decoding from a chunked-prefill cache is step-identical to decoding
    from the monolithic cache."""
    comp = comp_for("h2o")
    params = llama.init_params(TINY_LLAMA, jax.random.key(5), jnp.float32)
    toks, tl = make_inputs(1, [100])
    l_r, c_r, s_r = llama.prefill(TINY_LLAMA, comp, ECFG, params, toks, tl)
    l_g, c_g, s_g = ChunkedPrefiller(TINY_LLAMA, comp, ECFG, chunk_size=32)(
        params, toks, tl)
    tok_r = jnp.argmax(l_r, -1).astype(jnp.int32)
    tok_g = jnp.argmax(l_g, -1).astype(jnp.int32)
    step = jax.jit(lambda p, t, v, c, s: llama.decode_step(
        TINY_LLAMA, comp, ECFG, p, t, v, c, s))
    for s in range(20):
        np.testing.assert_array_equal(np.asarray(tok_g), np.asarray(tok_r))
        l_r, c_r, s_r = step(params, tok_r, tl + s, c_r, s_r)
        l_g, c_g, s_g = step(params, tok_g, tl + s, c_g, s_g)
        tok_r = jnp.argmax(l_r, -1).astype(jnp.int32)
        tok_g = jnp.argmax(l_g, -1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(tok_g), np.asarray(tok_r))
