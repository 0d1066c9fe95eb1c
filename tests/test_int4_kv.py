"""Packed int4 KV cache: packing/quantization math, zero-point folding
algebra, and end-to-end decode/serving quality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA
from scope_tpu.ops import quant


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 16, (3, 5, 8, 16)), jnp.uint8)
    packed = quant.pack4(codes)
    assert packed.dtype == jnp.uint8 and packed.shape[-1] == 8
    out = quant.unpack4(packed, jnp.uint8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


def test_quant4_error_bound():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 32, 8)) * 3.0 + 1.0,
                    jnp.float32)
    s, o = quant.calibrate4(x)
    xi = quant.quantize4(x, s, o)
    xd = quant.dequantize4(xi, s, o, dtype=jnp.float32)
    step = np.asarray(s)[..., None, :]
    assert np.all(np.abs(np.asarray(xd) - np.asarray(x))
                  <= 0.51 * np.broadcast_to(step, x.shape))


def test_quant4_masked_calibration_ignores_junk():
    x = np.zeros((1, 1, 4, 2), np.float32)
    x[0, 0, :2] = [[1.0, -1.0], [3.0, -2.0]]
    x[0, 0, 2:] = 1e6                       # junk slots, masked out
    valid = jnp.asarray([[[True, True, False, False]]])
    s, o = quant.calibrate4(jnp.asarray(x), valid=valid)
    # Range reflects only valid slots (with MARGIN4 headroom).
    assert float(s[0, 0, 0]) < 1.0 and float(o[0, 0, 0]) < 1.0
    # Junk values saturate instead of poisoning the scale.
    xi = quant.quantize4(jnp.asarray(x), s, o)
    codes = quant.unpack4(xi, jnp.uint8)
    assert int(jnp.max(codes[0, 0, 2:])) == 15


def test_int4_zero_point_folding_algebra():
    """Attention on (int4 codes, folded scale/offset) must equal
    attention on the dequantized values: the K offset is a per-row
    constant in the logits (softmax-invariant) and the V offset adds
    exactly once because probabilities sum to 1."""
    from scope_tpu.cache import slot_mask
    from scope_tpu.ops.attention import decode_attention
    rng = np.random.default_rng(3)
    B, H, S, D = 2, 4, 64, 16
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 2.0 + 0.7,
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)) - 0.3, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    length = jnp.asarray([40, 64], jnp.int32)
    mask = slot_mask(length, jnp.broadcast_to(length[:, None], (B, H)),
                     0, S)
    ks, ko = quant.calibrate4(k, valid=mask[:, :, :])
    vs, vo = quant.calibrate4(v, valid=mask[:, :, :])
    ki = quant.quantize4(k, ks, ko)
    vi = quant.quantize4(v, vs, vo)
    # Reference: full-precision attention over the DEQUANTIZED values.
    kd = quant.dequantize4(ki, ks, ko, dtype=jnp.float32)
    vd = quant.dequantize4(vi, vs, vo, dtype=jnp.float32)
    out_ref, probs_ref = decode_attention(q, kd, vd, mask)
    # Int4 path: fold K scale into q; scale+offset fold on the output.
    q_eff = q * ks[:, :, None, :]
    out_q, probs_q = decode_attention(q_eff, ki, vi, mask)
    out_q = out_q * vs[:, :, None, :] + vo[:, :, None, :]
    np.testing.assert_allclose(np.asarray(probs_q), np.asarray(probs_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)


def _generate(comp, ecfg, params, toks, tl, steps, forced=None):
    """Greedy decode, or teacher-forced when ``forced`` token array is
    given — forcing keeps the fed inputs IDENTICAL between the quantized
    and full-precision runs, so per-step logits stay comparable (greedy
    streams legitimately diverge once 4-bit noise flips one argmax,
    after which logits of different inputs tell nothing)."""
    logits, cache, state = llama.prefill(TINY_LLAMA, comp, ecfg, params,
                                         toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    seq, logit_list = [int(tok[0])], []
    for s in range(steps):
        if forced is not None:
            tok = jnp.asarray(forced[s:s + 1], jnp.int32)
        logits, cache, state = llama.decode_step(
            TINY_LLAMA, comp, ecfg, params, tok, tl + s, cache, state)
        logit_list.append(np.asarray(logits[0]))
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq.append(int(tok[0]))
    return seq, logit_list, cache


def _cos(a, b):
    return np.dot(a.ravel(), b.ravel()) / (
        np.linalg.norm(a) * np.linalg.norm(b))


@pytest.mark.parametrize("method,metric", [("h2o", "fixed"),
                                           ("allkv", "none")])
def test_int4_decode_close_to_fp(method, metric):
    comp = CompressionConfig(method=method, decoding_metric=metric,
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)
    ecfg_fp = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                           dtype="float32")
    ecfg_q = ecfg_fp.replace(kv_dtype="int4")

    forced = rng.integers(1, 512, 24).astype(np.int32)
    _, logits_fp, _ = _generate(comp, ecfg_fp, params, toks, tl, 24,
                                forced=forced)
    _, logits_q, cache_q = _generate(comp, ecfg_q, params, toks, tl, 24,
                                     forced=forced)
    assert cache_q.k.dtype == jnp.uint8
    assert cache_q.k.shape[-1] == TINY_LLAMA.head_dim // 2
    # Teacher-forced inputs keep the streams aligned; 4-bit on RANDOM
    # weights is the worst case (no channel structure), so the bar is
    # directional tracking, not equality — real-checkpoint quality is
    # assessed by accuracy runs.
    for i in range(24):
        c = _cos(logits_fp[i], logits_q[i])
        assert c > 0.95, (i, c)


def test_int4_quest_decode_runs():
    """Quest + int4: page metadata over unpacked codes; generation runs
    and early logits track full precision."""
    comp = CompressionConfig(method="quest", decoding_metric="none",
                             max_capacity_prompt=64, window_size=8,
                             chunk_size=8, quest_skip_layers=1)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)
    ecfg_fp = EngineConfig(max_prompt_len=128, max_new_tokens=16,
                           dtype="float32")
    ecfg_q = ecfg_fp.replace(kv_dtype="int4")
    forced = rng.integers(1, 512, 8).astype(np.int32)
    _, logits_fp, _ = _generate(comp, ecfg_fp, params, toks, tl, 8,
                                forced=forced)
    _, logits_q, cache_q = _generate(comp, ecfg_q, params, toks, tl, 8,
                                     forced=forced)
    assert cache_q.page_min.dtype == jnp.uint8
    # Page selection is DISCRETE: close page scores can legitimately pick
    # different pages under 4-bit codes, so the bar is directional only.
    for i in range(8):
        c = _cos(logits_fp[i], logits_q[i])
        assert c > 0.8, (i, c)


def test_int4_serving_headline_matches_single_stream():
    """Serving with the int4 production stack (kvhead eviction, ring,
    chunks, pipelining) is token-identical to dedicated generation."""
    import dataclasses
    from scope_tpu.engine.serving import ServingEngine
    from scope_tpu.engine.generate import generate_scan
    comp = CompressionConfig(method="h2o", decoding_metric="jump",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3,
                             evict_per_qhead=False)
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                        dtype="float32", kv_dtype="int4")
    ecfg_s = dataclasses.replace(ecfg, decode_ring=8,
                                 decode_chunk_sizes=(4, 2))
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    eng = ServingEngine(TINY_LLAMA, comp, ecfg_s, params, max_slots=2)
    assert eng.cache.k.dtype == jnp.uint8
    assert eng.cache.ring_k.dtype == jnp.uint8
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 512, n).astype(np.int32)
               for n in (100, 90, 80)]
    ids = [eng.submit(p, 20) for p in prompts]
    results = eng.run()
    for p, rid in zip(prompts, ids):
        toks = np.zeros((1, 128), np.int32)
        toks[0, :len(p)] = p
        gen, _ = generate_scan(TINY_LLAMA, comp, ecfg, params,
                               jnp.asarray(toks),
                               jnp.array([len(p)], jnp.int32), 20, -1)
        np.testing.assert_array_equal(np.asarray(gen[0]),
                                      np.array(results[rid]))


def test_int4_chunked_prefill_matches_monolithic():
    """Chunked prefill produces the same int4 cache and first token as
    llama.prefill."""
    from scope_tpu.models.chunked_prefill import ChunkedPrefiller
    comp = CompressionConfig(method="h2o", decoding_metric="fixed",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                        dtype="float32", kv_dtype="int4")
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(1, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)
    logits_m, cache_m, _ = llama.prefill(TINY_LLAMA, comp, ecfg, params,
                                         toks, tl)
    cp = ChunkedPrefiller(TINY_LLAMA, comp, ecfg, chunk_size=32)
    st = cp.start(toks, tl)
    while cp.advance(params, st):
        pass
    logits_c, cache_c, _ = cp.finish(params, st)
    # Compare the DEQUANTIZED valid region only: slots beyond length hold
    # path-dependent junk (different gather sources), which masked
    # calibration ignores but a raw buffer compare would trip on.
    km = quant.dequantize4(cache_m.k, cache_m.k_scale, cache_m.k_off,
                           dtype=jnp.float32)
    kc = quant.dequantize4(cache_c.k, cache_c.k_scale, cache_c.k_off,
                           dtype=jnp.float32)
    n = int(cache_m.length[0, 0])
    assert n == int(cache_c.length[0, 0])
    # Monolithic vs chunked f32 arithmetic differs by ulps, which can
    # flip values sitting exactly on a code boundary by one code — allow
    # one quantization step per channel.
    step = np.asarray(cache_m.k_scale)[:, :, :, None, :]
    diff = np.abs(np.asarray(km[:, :, :, :n]) - np.asarray(kc[:, :, :, :n]))
    assert np.all(diff <= 1.01 * np.broadcast_to(step, km.shape)
                  [:, :, :, :n]), float(diff.max())
    assert int(jnp.argmax(logits_m, -1)[0]) == int(
        jnp.argmax(logits_c, -1)[0])
