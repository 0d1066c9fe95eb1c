"""Golden tests: JAX prefill policies vs the NumPy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.compression.policies import compress_prefill
from scope_tpu.config import CompressionConfig
from scope_tpu.ops.attention import prefill_attention

from oracle import (h2o_prefill_scores, prefill_keep_order, pyramid_budget,
                    snapkv_prefill_scores, topk_desc)

B, H, D = 1, 4, 16
S_PAD = 128
TRUE = 128          # no padding: oracle works on exact lengths
P, W_OBS = 64, 8


def make_qkv(seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, S_PAD, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S_PAD, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S_PAD, D)).astype(np.float32)
    return q, k, v


def run_policy(comp, q, k, v, capacity=96):
    tl = jnp.full((B,), TRUE, jnp.int32)
    _, scores = prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tl,
        window_size=comp.window_size,
        need_colsum_all=comp.method in ("h2o", "pyramidkv"),
        need_colsum_window=comp.method == "snapkv")
    res = compress_prefill(comp, jnp.int32(0), 2, jnp.asarray(k),
                           jnp.asarray(v), jnp.asarray(q), scores, tl,
                           capacity)
    return res


def check_matches(res, k, keep_order, n_total):
    """Cache rows [0, n_total) must equal k[keep_order] row-for-row."""
    ck = np.asarray(res.cache_k)
    assert int(res.length[0]) == n_total
    for h in range(H):
        expect = k[0, h][keep_order[h]]
        np.testing.assert_allclose(ck[0, h, :n_total], expect, rtol=1e-5,
                                   atol=1e-5)


def test_h2o_prefill_matches_oracle():
    q, k, v = make_qkv()
    comp = CompressionConfig(method="h2o", max_capacity_prompt=P,
                             window_size=W_OBS)
    res = run_policy(comp, q, k, v)
    scores = h2o_prefill_scores(q[0], k[0], W_OBS)        # [H, S-w]
    keep = prefill_keep_order(scores, P - W_OBS, TRUE, W_OBS)
    check_matches(res, k, keep, P)


@pytest.mark.parametrize("pooling", ["maxpool", "avgpool"])
def test_snapkv_prefill_matches_oracle(pooling):
    q, k, v = make_qkv(1)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=P,
                             window_size=W_OBS, kernel_size=7,
                             pooling=pooling)
    res = run_policy(comp, q, k, v)
    scores = snapkv_prefill_scores(q[0], k[0], W_OBS, 7, pooling)
    keep = prefill_keep_order(scores, P - W_OBS, TRUE, W_OBS)
    check_matches(res, k, keep, P)


def test_streamingllm_prefill_positional():
    q, k, v = make_qkv(2)
    w = P // 2
    comp = CompressionConfig(method="streamingllm", max_capacity_prompt=P,
                             window_size=w)
    res = run_policy(comp, q, k, v)
    keep = np.broadcast_to(
        np.concatenate([np.arange(P - w), np.arange(TRUE - w, TRUE)]),
        (H, P))
    check_matches(res, k, keep, P)


@pytest.mark.parametrize("layer_idx", [0, 1])
def test_pyramidkv_prefill_matches_oracle(layer_idx):
    q, k, v = make_qkv(3)
    comp = CompressionConfig(method="pyramidkv", max_capacity_prompt=P,
                             window_size=W_OBS, beta=20)
    tl = jnp.full((B,), TRUE, jnp.int32)
    _, scores = prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tl,
        window_size=W_OBS, need_colsum_all=True)
    res = compress_prefill(comp, jnp.int32(layer_idx), 2, jnp.asarray(k),
                           jnp.asarray(v), jnp.asarray(q), scores, tl, 160)

    # TRUE >= 2*(P-w) -> deep branch with per-layer pyramid budget.
    assert TRUE >= (P - W_OBS) * 2
    budget = pyramid_budget(P, W_OBS, 20, TRUE, 2, layer_idx)
    sc = h2o_prefill_scores(q[0], k[0], W_OBS)
    keep = prefill_keep_order(sc, budget, TRUE, W_OBS)
    check_matches(res, k, keep, budget + W_OBS)


def test_no_compression_below_budget():
    """q_len < P keeps everything (kv_utils.py:644-645)."""
    q, k, v = make_qkv(4)
    comp = CompressionConfig(method="h2o", max_capacity_prompt=P,
                             window_size=W_OBS)
    short = 48
    tl = jnp.full((B,), short, jnp.int32)
    _, scores = prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tl,
        window_size=W_OBS, need_colsum_all=True)
    res = compress_prefill(comp, jnp.int32(0), 2, jnp.asarray(k),
                           jnp.asarray(v), jnp.asarray(q), scores, tl, 96)
    assert int(res.length[0]) == short
    np.testing.assert_allclose(np.asarray(res.cache_k)[0, :, :short],
                               k[0, :, :short], rtol=1e-6)


def test_padding_invariance():
    """Scores/eviction must ignore right-padding."""
    q, k, v = make_qkv(5)
    true = 100
    comp = CompressionConfig(method="h2o", max_capacity_prompt=P,
                             window_size=W_OBS)
    tl = jnp.full((B,), true, jnp.int32)
    _, scores = prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tl,
        window_size=W_OBS, need_colsum_all=True)
    res = compress_prefill(comp, jnp.int32(0), 2, jnp.asarray(k),
                           jnp.asarray(v), jnp.asarray(q), scores, tl, 96)
    sc = h2o_prefill_scores(q[0, :, :true], k[0, :, :true], W_OBS)
    keep = prefill_keep_order(sc, P - W_OBS, true, W_OBS)
    check_matches(res, k, keep, P)
