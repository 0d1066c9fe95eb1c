"""Headwise per-head budget tests (completed design; the reference left the
method unfinished — headwise_attention.py:168-177, llama_model.py:2328)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.compression.headwise import (HEADWISE_SKIP_LAYERS,
                                            coverage_budget)
from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA


def test_coverage_budget_matches_reference_formula():
    """score_cover_topk: 1 + #{sorted-desc cumsum <= gamma}
    (headwise_attention.py:10-15)."""
    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 32)).astype(np.float32)
    x = x / x.sum(-1, keepdims=True)
    got = np.asarray(coverage_budget(jnp.asarray(x), 0.9))
    for h in range(3):
        srt = np.sort(x[0, h])[::-1]
        expect = int(np.sum(np.cumsum(srt) <= 0.9) + 1)
        assert got[0, h] == expect


def test_skewed_heads_get_smaller_budgets():
    """A head whose mass concentrates on few keys must get a smaller
    budget than a uniform head."""
    S = 64
    peaked = np.full(S, 1e-6, np.float32)
    peaked[:2] = 0.5
    uniform = np.full(S, 1.0 / S, np.float32)
    probs = jnp.asarray(np.stack([peaked / peaked.sum(), uniform])[None])
    b = np.asarray(coverage_budget(probs, 0.95))
    assert b[0, 0] < b[0, 1]


def _run(comp, steps=20, seed=0):
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                        dtype="float32")
    params = llama.init_params(TINY_LLAMA, jax.random.key(1), jnp.float32)
    rng = np.random.default_rng(seed)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 120, jnp.int32)
    logits, cache, state = llama.prefill(TINY_LLAMA, comp, ecfg, params,
                                         toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for s in range(steps):
        logits, cache, state = llama.decode_step(
            TINY_LLAMA, comp, ecfg, params, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    return logits, cache


def test_headwise_end_to_end():
    comp = CompressionConfig(method="headwise", decoding_metric="none",
                             headwise_max_budget=64,
                             headwise_min_budget=16,
                             headwise_gamma=0.95)
    logits, cache = _run(comp)
    assert np.isfinite(np.asarray(logits)).all()
    pv = np.asarray(cache.pvalid)          # [L, B, H]
    # Budgets live in [min_budget, min(max_budget, true_len)].
    assert (pv >= 16).all() and (pv <= 64).all()
    # Reserved-gap layout: appends start at the gap boundary.
    assert (np.asarray(cache.length) >= 64).all()


def test_headwise_with_decode_compression():
    comp = CompressionConfig(method="headwise", decoding_metric="fixed",
                             headwise_max_budget=64,
                             headwise_min_budget=16,
                             decoding_window_size=16,
                             decoding_recent_size=8, delta=3)
    logits, cache = _run(comp, steps=30)
    assert np.isfinite(np.asarray(logits)).all()
    # Steady state: gap + W.
    assert int(np.asarray(cache.length).max()) <= 64 + 16 + 1


def test_headwise_skip_layers_keep_full():
    """Layers < HEADWISE_SKIP_LAYERS keep min(true_len, gap) per head."""
    spec = TINY_LLAMA.replace(num_layers=4, name="tiny-4l")
    comp = CompressionConfig(method="headwise", decoding_metric="none",
                             headwise_max_budget=64,
                             headwise_min_budget=16)
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=16,
                        dtype="float32")
    params = llama.init_params(spec, jax.random.key(2), jnp.float32)
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 120, jnp.int32)
    _, cache, _ = llama.prefill(spec, comp, ecfg, params, toks, tl)
    pv = np.asarray(cache.pvalid)
    for l in range(min(HEADWISE_SKIP_LAYERS, 4)):
        assert (pv[l] == 64).all()         # min(120, gap=64)
