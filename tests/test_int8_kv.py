"""Int8 KV cache: quantization math + end-to-end decode quality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA
from scope_tpu.ops import quant


def test_quant_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 32, 8)) * 3.0, jnp.float32)
    s = quant.calibrate(x)
    xi = quant.quantize(x, s)
    xd = quant.dequantize(xi, s, dtype=jnp.float32)
    err = np.max(np.abs(np.asarray(xd) - np.asarray(x)))
    # Error bounded by half a quantization step (per channel).
    step = np.asarray(s)[..., None, :]
    assert np.all(np.abs(np.asarray(xd) - np.asarray(x))
                  <= 0.51 * np.broadcast_to(step, x.shape))
    assert err > 0  # actually quantized


def test_quant_clips_out_of_range():
    x = jnp.asarray([[1.0], [2.0]], jnp.float32)[None]
    s = quant.calibrate(x)                 # from max 2.0
    y = quant.quantize(jnp.full_like(x, 100.0), s)
    assert int(jnp.max(y)) == 127          # saturates, no wraparound


def _generate(comp, ecfg, params, toks, tl, steps):
    logits, cache, state = llama.prefill(TINY_LLAMA, comp, ecfg, params,
                                         toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    seq, logit_list = [int(tok[0])], []
    for s in range(steps):
        logits, cache, state = llama.decode_step(
            TINY_LLAMA, comp, ecfg, params, tok, tl + s, cache, state)
        logit_list.append(np.asarray(logits[0]))
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq.append(int(tok[0]))
    return seq, logit_list, cache


@pytest.mark.parametrize("method,metric", [("h2o", "fixed"),
                                           ("allkv", "none")])
def test_int8_decode_close_to_fp(method, metric):
    """Int8 cache decode must track the full-precision path closely:
    near-identical first-step logits and mostly-matching greedy tokens,
    with compression gathers running on int8 values."""
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
    ecfg_q = ecfg_fp.replace(kv_dtype="int8")

    seq_fp, logits_fp, _ = _generate(comp, ecfg_fp, params, toks, tl, 24)
    seq_q, logits_q, cache_q = _generate(comp, ecfg_q, params, toks, tl,
                                         24)
    assert cache_q.k.dtype == jnp.int8
    # Early decode steps: logits nearly identical (same prefill; cache
    # quantization is the only difference).  Long-horizon greedy tokens
    # on RANDOM weights legitimately diverge once an eviction choice
    # flips, so token agreement is only sanity-checked loosely.
    for i in range(3):
        cos = np.dot(logits_fp[i].ravel(), logits_q[i].ravel()) / (
            np.linalg.norm(logits_fp[i]) * np.linalg.norm(logits_q[i]))
        assert cos > 0.999, (i, cos)
    agree = sum(a == b for a, b in zip(seq_fp, seq_q)) / len(seq_fp)
    assert agree >= 0.4, (agree, seq_fp, seq_q)


def test_int8_scale_folding_algebra():
    """decode attention on (int8 values, folded scales) must equal the
    full-precision attention on the dequantized values (same masks)."""
    from scope_tpu.cache import slot_mask
    from scope_tpu.ops.attention import decode_attention
    rng = np.random.default_rng(3)
    B, H, S, D = 2, 4, 64, 16
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 2.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    ks, vs = quant.calibrate(k), quant.calibrate(v)
    ki, vi = quant.quantize(k, ks), quant.quantize(v, vs)
    length = jnp.asarray([40, 64], jnp.int32)
    mask = slot_mask(length, jnp.broadcast_to(length[:, None], (B, H)),
                     0, S)
    # Reference: full-precision attention over the DEQUANTIZED values.
    kd = quant.dequantize(ki, ks, dtype=jnp.float32)
    vd = quant.dequantize(vi, vs, dtype=jnp.float32)
    out_ref, probs_ref = decode_attention(q, kd, vd, mask)
    # Int8 path: fold K scale into q, V scale into the output.
    q_eff = q * ks[:, :, None, :]
    out_q, probs_q = decode_attention(q_eff, ki, vi, mask)
    out_q = out_q * vs[:, :, None, :]
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs_q), np.asarray(probs_ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_serving_roundtrip():
    """Serving engine with int8 cache completes requests (scales follow
    row inserts)."""
    from scope_tpu.engine.serving import ServingEngine
    comp = CompressionConfig(method="h2o", decoding_metric="fixed",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                        dtype="float32", kv_dtype="int8")
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    eng = ServingEngine(TINY_LLAMA, comp, ecfg, params, max_slots=2)
    rng = np.random.default_rng(1)
    ids = [eng.submit(rng.integers(1, 512, 90).astype(np.int32), 8)
           for _ in range(3)]
    res = eng.run()
    assert all(len(res[i]) == 8 for i in ids)
