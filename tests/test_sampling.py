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
