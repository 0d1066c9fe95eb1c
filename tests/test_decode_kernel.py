"""Fused decode-attention kernel parity vs the XLA path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.cache import slot_mask
from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA
from scope_tpu.ops.attention import decode_attention
from scope_tpu.ops.pallas.decode_attn import fused_decode_attention

B, H, D = 2, 4, 64
CAP = 256


def make(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, CAP, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, CAP, D)), jnp.float32)
    return q, k, v


def test_fused_matches_xla():
    q, k, v = make()
    length = jnp.asarray([100, 200], jnp.int32)
    pvalid = jnp.broadcast_to(length[:, None], (B, H))
    mask = slot_mask(length, pvalid, 0, CAP)
    out_x, probs_x = decode_attention(q, k, v, mask)
    out_p, probs_p = fused_decode_attention(q, k, v, length, pvalid,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                               np.asarray(out_x[:, :, 0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs_p[:, :, 0]),
                               np.asarray(probs_x), rtol=2e-5, atol=2e-5)
    # Invalid slots carry zero probability.
    assert float(np.abs(np.asarray(probs_p)[0, :, 0, 100:]).max()) == 0.0


def test_fused_grouped_rows():
    """R>1 rows per cache head (GQA kv-head mode)."""
    rng = np.random.default_rng(1)
    R = 2
    q = jnp.asarray(rng.standard_normal((B, H, R, D)), jnp.float32)
    _, k, v = make(1)
    length = jnp.asarray([128, 256], jnp.int32)
    pvalid = jnp.broadcast_to(length[:, None], (B, H))
    out_p, probs_p = fused_decode_attention(q, k, v, length, pvalid,
                                            interpret=True)
    # Row-wise check against the single-row XLA path.
    mask = slot_mask(length, pvalid, 0, CAP)
    for r in range(R):
        out_x, probs_x = decode_attention(q[:, :, r:r + 1], k, v, mask)
        np.testing.assert_allclose(np.asarray(out_p[:, :, r]),
                                   np.asarray(out_x[:, :, 0]),
                                   rtol=2e-5, atol=2e-5)


def test_fused_headwise_gap_layout():
    """Per-head pvalid with a reserved prefill segment."""
    q, k, v = make(2)
    gap = 128
    length = jnp.asarray([gap + 20, gap + 40], jnp.int32)
    rng = np.random.default_rng(3)
    pvalid = jnp.asarray(rng.integers(16, gap, (B, H)), jnp.int32)
    mask = slot_mask(length, pvalid, gap, CAP)
    out_x, probs_x = decode_attention(q, k, v, mask)
    out_p, probs_p = fused_decode_attention(q, k, v, length, pvalid,
                                            prefill_gap=gap,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                               np.asarray(out_x[:, :, 0]),
                               rtol=2e-5, atol=2e-5)


def test_fused_sliding_window():
    q, k, v = make(4)
    length = jnp.asarray([200, 200], jnp.int32)
    pvalid = jnp.broadcast_to(length[:, None], (B, H))
    win = 64
    mask = slot_mask(length, pvalid, 0, CAP)
    idx = jnp.arange(CAP)
    vpos = length - 1
    mask = mask & (idx[None, None, :] > (vpos[:, None, None] - win))
    out_x, _ = decode_attention(q, k, v, mask)
    out_p, _ = fused_decode_attention(q, k, v, length, pvalid, window=win,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                               np.asarray(out_x[:, :, 0]),
                               rtol=2e-5, atol=2e-5)


def test_chunked_multi_chunk_matches_xla():
    """n_chunks > 1 exercises the online-softmax accumulation and the
    clamped fetch of dead tail chunks."""
    q, k, v = make(5)
    for lens in ([100, 200], [1, 256], [64, 65]):
        length = jnp.asarray(lens, jnp.int32)
        pvalid = jnp.broadcast_to(length[:, None], (B, H))
        mask = slot_mask(length, pvalid, 0, CAP)
        out_x, probs_x = decode_attention(q, k, v, mask)
        out_p, probs_p = fused_decode_attention(q, k, v, length, pvalid,
                                                chunk=64, interpret=True)
        np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                                   np.asarray(out_x[:, :, 0]),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(probs_p[:, :, 0]),
                                   np.asarray(probs_x), rtol=2e-5,
                                   atol=2e-5)


def test_chunked_no_probs():
    q, k, v = make(6)
    length = jnp.asarray([100, 200], jnp.int32)
    pvalid = jnp.broadcast_to(length[:, None], (B, H))
    mask = slot_mask(length, pvalid, 0, CAP)
    out_x, _ = decode_attention(q, k, v, mask)
    out_p, probs_p = fused_decode_attention(q, k, v, length, pvalid,
                                            chunk=64, need_probs=False,
                                            interpret=True)
    assert probs_p is None
    np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                               np.asarray(out_x[:, :, 0]),
                               rtol=2e-5, atol=2e-5)


def test_chunked_gap_layout_multi_chunk():
    q, k, v = make(7)
    gap = 128
    length = jnp.asarray([gap + 20, gap + 90], jnp.int32)
    rng = np.random.default_rng(8)
    pvalid = jnp.asarray(rng.integers(16, gap, (B, H)), jnp.int32)
    mask = slot_mask(length, pvalid, gap, CAP)
    out_x, probs_x = decode_attention(q, k, v, mask)
    out_p, probs_p = fused_decode_attention(q, k, v, length, pvalid,
                                            prefill_gap=gap, chunk=64,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                               np.asarray(out_x[:, :, 0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs_p[:, :, 0]),
                               np.asarray(probs_x), rtol=2e-5, atol=2e-5)


def test_new_token_folding_matches_appended_cache():
    """Deferred-append mode: folding the un-appended k/v token in-kernel
    equals attending the cache with the token already appended."""
    rng = np.random.default_rng(9)
    q, k, v = make(9)
    k_new = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    length = jnp.asarray([100, 200], jnp.int32)
    # Reference: cache with the token appended at slot `length`.
    k_app = k.at[0, :, 100].set(k_new[0, :, 0]).at[1, :, 200].set(
        k_new[1, :, 0])
    v_app = v.at[0, :, 100].set(v_new[0, :, 0]).at[1, :, 200].set(
        v_new[1, :, 0])
    pvalid = jnp.broadcast_to(length[:, None], (B, H))
    mask = slot_mask(length + 1, pvalid, 0, CAP)
    out_x, _ = decode_attention(q, k_app, v_app, mask)
    out_p, pr = fused_decode_attention(q, k, v, length, pvalid,
                                       need_probs=False, new_k=k_new,
                                       new_v=v_new, chunk=64,
                                       interpret=True)
    assert pr is None
    np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                               np.asarray(out_x[:, :, 0]),
                               rtol=2e-5, atol=2e-5)


def test_new_token_folding_sliding_window():
    rng = np.random.default_rng(10)
    q, k, v = make(10)
    k_new = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    length = jnp.asarray([200, 128], jnp.int32)
    win = 64
    k_app = k.at[0, :, 200].set(k_new[0, :, 0]).at[1, :, 128].set(
        k_new[1, :, 0])
    v_app = v.at[0, :, 200].set(v_new[0, :, 0]).at[1, :, 128].set(
        v_new[1, :, 0])
    pvalid = jnp.broadcast_to(length[:, None], (B, H))
    mask = slot_mask(length + 1, pvalid, 0, CAP)
    idx = jnp.arange(CAP)
    mask = mask & (idx[None, None, :] > (length[:, None, None] - win))
    out_x, _ = decode_attention(q, k_app, v_app, mask)
    out_p, _ = fused_decode_attention(q, k, v, length, pvalid,
                                      window=win, need_probs=False,
                                      new_k=k_new, new_v=v_new, chunk=64,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                               np.asarray(out_x[:, :, 0]),
                               rtol=2e-5, atol=2e-5)


def test_model_uses_fused_kernel_identically():
    """End-to-end: pallas_interpret backend == xla backend tokens."""
    comp = CompressionConfig(method="h2o", decoding_metric="fixed",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)
    seqs = {}
    for backend in ("xla", "pallas_interpret"):
        ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                            dtype="float32", attn_backend=backend,
                            fused_decode_attention=True)
        logits, cache, state = llama.prefill(TINY_LLAMA, comp, ecfg,
                                             params, toks, tl)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq = [int(tok[0])]
        for s in range(20):
            logits, cache, state = llama.decode_step(
                TINY_LLAMA, comp, ecfg, params, tok, tl + s, cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            seq.append(int(tok[0]))
        seqs[backend] = seq
    assert seqs["xla"] == seqs["pallas_interpret"]


def test_fused_int8_cache_matches_dequant_xla():
    """Int8 cache tiles dequant in-register; kernel == XLA on the
    dequantized cache (scales are folded outside the kernel, so inside
    it the int8 ints ARE the values)."""
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((B, H, 2, D)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, (B, H, CAP, D)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (B, H, CAP, D)), jnp.int8)
    length = jnp.asarray([100, 200], jnp.int32)
    pvalid = jnp.broadcast_to(length[:, None], (B, H))
    mask = slot_mask(length, pvalid, 0, CAP)
    kf, vf = k8.astype(jnp.float32), v8.astype(jnp.float32)
    out_x, probs_x = decode_attention(q[:, :, :1], kf, vf, mask)
    out_p, probs_p = fused_decode_attention(q, k8, v8, length, pvalid,
                                            chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                               np.asarray(out_x[:, :, 0]),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(probs_p[:, :, 0]),
                               np.asarray(probs_x), rtol=2e-4, atol=2e-5)


def test_fused_int8_new_token_folding():
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, (B, H, CAP, D)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (B, H, CAP, D)), jnp.int8)
    kn = jnp.asarray(rng.integers(-127, 128, (B, H, 1, D)), jnp.int8)
    vn = jnp.asarray(rng.integers(-127, 128, (B, H, 1, D)), jnp.int8)
    length = jnp.asarray([100, 200], jnp.int32)
    k_app = k8.at[0, :, 100].set(kn[0, :, 0]).at[1, :, 200].set(kn[1, :, 0])
    v_app = v8.at[0, :, 100].set(vn[0, :, 0]).at[1, :, 200].set(vn[1, :, 0])
    pvalid = jnp.broadcast_to(length[:, None], (B, H))
    mask = slot_mask(length + 1, pvalid, 0, CAP)
    out_x, _ = decode_attention(q, k_app.astype(jnp.float32),
                                v_app.astype(jnp.float32), mask)
    out_p, pr = fused_decode_attention(q, k8, v8, length, pvalid,
                                       need_probs=False, new_k=kn,
                                       new_v=vn, chunk=128, interpret=True)
    assert pr is None
    np.testing.assert_allclose(np.asarray(out_p[:, :, 0]),
                               np.asarray(out_x[:, :, 0]),
                               rtol=2e-4, atol=2e-3)


def test_model_fused_int8_matches_xla_int8():
    """End-to-end with kv_dtype=int8: pallas_interpret == xla tokens."""
    comp = CompressionConfig(method="h2o", decoding_metric="fixed",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3,
                             evict_per_qhead=False)
    params = llama.init_params(TINY_LLAMA, jax.random.key(2), jnp.float32)
    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)
    seqs = {}
    for backend in ("xla", "pallas_interpret"):
        ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                            dtype="float32", attn_backend=backend,
                            kv_dtype="int8",
                            fused_decode_attention=True)
        logits, cache, state = llama.prefill(TINY_LLAMA, comp, ecfg,
                                             params, toks, tl)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq = [int(tok[0])]
        for s in range(20):
            logits, cache, state = llama.decode_step(
                TINY_LLAMA, comp, ecfg, params, tok, tl + s, cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            seq.append(int(tok[0]))
        seqs[backend] = seq
    assert seqs["xla"] == seqs["pallas_interpret"]
