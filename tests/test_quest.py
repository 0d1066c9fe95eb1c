"""Quest page-selection correctness tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.compression.quest import _page_scores, build_page_metadata
from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA

B, H, D = 1, 2, 8
CHUNK = 16


def test_sign_trick_equivalence():
    """Precomputed page min/max reproduces the reference's per-step
    amax(key * sign) page scores exactly (kv_utils.py:1296-1335)."""
    rng = np.random.default_rng(0)
    S = 64
    NP = S // CHUNK
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    q = rng.standard_normal((B, H, 1, D)).astype(np.float32)

    # Reference formulation.
    sign = np.where(q > 0, 1.0, -1.0)                      # [B,H,1,D]
    max_key = k * sign                                      # [B,H,S,D]
    chunk_max = max_key.reshape(B, H, NP, CHUNK, D).max(axis=3)
    ref = np.einsum("bhqd,bhpd->bhqp", np.abs(q), chunk_max)[:, :, 0, :]

    # Ours: min/max metadata + where(q>0, max, min).
    pmin = k.reshape(B, H, NP, CHUNK, D).min(axis=3)
    pmax = k.reshape(B, H, NP, CHUNK, D).max(axis=3)
    ours = np.asarray(_page_scores(jnp.asarray(q),
                                   jnp.asarray(pmin), jnp.asarray(pmax)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_page_metadata_masks_padding():
    from scope_tpu.cache import KVCache
    rng = np.random.default_rng(1)
    cap = 64
    plen = 40                                  # partial last page (page 2)
    k = rng.standard_normal((1, B, H, cap, D)).astype(np.float32)
    cache = KVCache(k=jnp.asarray(k), v=jnp.asarray(k),
                    length=jnp.full((1, B), plen, jnp.int32),
                    pvalid=jnp.full((1, B, H), plen, jnp.int32),
                    prefill_gap=0,
                    prompt_len=jnp.full((B,), plen, jnp.int32))
    comp = CompressionConfig(method="quest", chunk_size=CHUNK)
    cache = build_page_metadata(comp, cache, jnp.full((B,), plen, jnp.int32))
    pmin = np.asarray(cache.page_min)[0]
    pmax = np.asarray(cache.page_max)[0]
    # Page 2 covers slots 32..47 but only 32..39 are real.
    real = k[0, :, :, 32:40]
    np.testing.assert_allclose(pmin[:, :, 2], real.min(axis=2), rtol=1e-6)
    np.testing.assert_allclose(pmax[:, :, 2], real.max(axis=2), rtol=1e-6)


def test_quest_full_coverage_matches_dense():
    """When the page budget covers the whole prompt, Quest attention must
    equal full-cache attention (every page selected)."""
    plen, pad = 96, 128
    ecfg = EngineConfig(max_prompt_len=pad, max_new_tokens=16,
                        dtype="float32")
    params = llama.init_params(TINY_LLAMA, jax.random.key(3), jnp.float32)
    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, 512, (1, pad)), jnp.int32)
    tl = jnp.full((1,), plen, jnp.int32)

    outs = {}
    for method, kw in [
        ("fullkv", {}),
        ("quest", dict(max_capacity_prompt=112, chunk_size=CHUNK,
                       quest_skip_layers=0)),
    ]:
        comp = CompressionConfig(method=method, decoding_metric="none", **kw)
        logits, cache, state = llama.prefill(TINY_LLAMA, comp, ecfg, params,
                                             toks, tl)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq = [int(tok[0])]
        for s in range(8):
            logits, cache, state = llama.decode_step(
                TINY_LLAMA, comp, ecfg, params, tok, tl + s, cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            seq.append(int(tok[0]))
        outs[method] = seq
    assert outs["quest"] == outs["fullkv"]


def test_quest_restricted_budget_changes_attention():
    """With a small page budget the selection must actually restrict
    attention (guards against silently attending the full cache, which is
    what the reference accidentally does — llama_model.py:2208-2217)."""
    plen, pad = 96, 128
    ecfg = EngineConfig(max_prompt_len=pad, max_new_tokens=16,
                        dtype="float32")
    params = llama.init_params(TINY_LLAMA, jax.random.key(3), jnp.float32)
    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, 512, (1, pad)), jnp.int32)
    tl = jnp.full((1,), plen, jnp.int32)

    logits_by = {}
    for P in (32, 112):
        comp = CompressionConfig(method="quest", decoding_metric="none",
                                 max_capacity_prompt=P, chunk_size=CHUNK,
                                 quest_skip_layers=0)
        logits, cache, state = llama.prefill(TINY_LLAMA, comp, ecfg, params,
                                             toks, tl)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        logits, _, _ = llama.decode_step(TINY_LLAMA, comp, ecfg, params,
                                         tok, tl, cache, state)
        logits_by[P] = np.asarray(logits)
    assert not np.allclose(logits_by[32], logits_by[112], atol=1e-6)


def test_int8_page_selection_matches_dequant():
    """Page ordering from int8 min/max metadata with the K scale folded
    into q equals the ordering from dequantized keys with the raw q
    (positive per-channel scales commute with the page min/max)."""
    from scope_tpu.ops import quant
    rng = np.random.default_rng(4)
    S = 64
    NP = S // CHUNK
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 2.0, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    ks = quant.calibrate(k)
    ki = quant.quantize(k, ks)
    kd = quant.dequantize(ki, ks, dtype=jnp.float32)

    pmin_d = kd.reshape(B, H, NP, CHUNK, D).min(axis=3)
    pmax_d = kd.reshape(B, H, NP, CHUNK, D).max(axis=3)
    ref = np.asarray(_page_scores(q, pmin_d, pmax_d))

    pmin_i = ki.reshape(B, H, NP, CHUNK, D).min(axis=3)
    pmax_i = ki.reshape(B, H, NP, CHUNK, D).max(axis=3)
    q_eff = q * ks[:, :, None, :]
    got = np.asarray(_page_scores(q_eff, pmin_i.astype(jnp.float32),
                                  pmax_i.astype(jnp.float32)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["none", "fixed"])
def test_int8_quest_decode_close_to_fp(metric):
    """Quest with an int8 cache tracks the full-precision quest path:
    int8 page metadata, folded scales, compression gathers on int8."""
    comp = CompressionConfig(method="quest", decoding_metric=metric,
                             max_capacity_prompt=48, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3,
                             chunk_size=CHUNK, quest_skip_layers=1)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(1, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)
    ecfg_fp = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                           dtype="float32")
    ecfg_q = ecfg_fp.replace(kv_dtype="int8")

    def gen(ecfg):
        logits, cache, state = llama.prefill(TINY_LLAMA, comp, ecfg,
                                             params, toks, tl)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq, logit_list = [int(tok[0])], []
        for s in range(20):
            logits, cache, state = llama.decode_step(
                TINY_LLAMA, comp, ecfg, params, tok, tl + s, cache, state)
            logit_list.append(np.asarray(logits[0]))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            seq.append(int(tok[0]))
        return seq, logit_list, cache

    seq_fp, logits_fp, _ = gen(ecfg_fp)
    seq_q, logits_q, cache_q = gen(ecfg_q)
    assert cache_q.k.dtype == jnp.int8
    assert cache_q.page_min.dtype == jnp.int8
    for i in range(3):
        cos = np.dot(logits_fp[i].ravel(), logits_q[i].ravel()) / (
            np.linalg.norm(logits_fp[i]) * np.linalg.norm(logits_q[i]))
        assert cos > 0.999, (i, cos)
    agree = sum(a == b for a, b in zip(seq_fp, seq_q)) / len(seq_fp)
    assert agree >= 0.4, (agree, seq_fp, seq_q)
