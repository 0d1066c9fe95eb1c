"""Sequence-parallel ring prefill == monolithic prefill attention.

Runs on the virtual 8-device CPU mesh (conftest).  The ring pass must
reproduce the XLA path's outputs AND the SCOPE eviction scores exactly
(same masks, including the reference's trailing w x w scoring quirk),
so a sequence-sharded prefill picks identical eviction sets.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.ops.attention import prefill_attention
from scope_tpu.ops.ring_attention import sp_prefill_attention
from scope_tpu.parallel.sharding import make_mesh

B, H, D = 2, 4, 16
W = 8


def mk(S, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("n_seq,S,lens", [
    (4, 128, (128, 100)),
    (8, 128, (77, 128)),
    (2, 64, (50, 64)),
])
def test_ring_matches_monolithic(n_seq, S, lens):
    if len(jax.devices()) < n_seq:
        pytest.skip("needs virtual devices")
    mesh = make_mesh(n_data=n_seq, n_model=1,
                     devices=jax.devices()[:n_seq])
    q, k, v = mk(S)
    tl = jnp.asarray(lens, jnp.int32)

    ref_out, ref_sc = prefill_attention(
        q, k, v, tl, window_size=W, need_colsum_all=True,
        need_colsum_window=True, backend="xla")
    out, sc = sp_prefill_attention(
        mesh, q, k, v, tl, seq_axis="data", window_size=W,
        need_colsum_all=True, need_colsum_window=True)

    # Padded query rows are normalized garbage in both paths; compare
    # real rows only.
    for b, ln in enumerate(lens):
        np.testing.assert_allclose(np.asarray(out)[b, :, :ln],
                                   np.asarray(ref_out)[b, :, :ln],
                                   rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sc.colsum_all),
                               np.asarray(ref_sc.colsum_all),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sc.colsum_window),
                               np.asarray(ref_sc.colsum_window),
                               rtol=2e-5, atol=2e-5)


def test_ring_sliding_window_matches():
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    q, k, v = mk(128, seed=3)
    tl = jnp.asarray((128, 90), jnp.int32)
    ref_out, _ = prefill_attention(
        q, k, v, tl, window_size=W, sliding_window=48, backend="xla")
    out, _ = sp_prefill_attention(
        mesh, q, k, v, tl, seq_axis="data", window_size=W,
        sliding_window=48)
    for b, ln in enumerate((128, 90)):
        np.testing.assert_allclose(np.asarray(out)[b, :, :ln],
                                   np.asarray(ref_out)[b, :, :ln],
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("method", ["h2o", "snapkv", "fullkv"])
def test_model_sp_prefill_matches_monolithic(method):
    """llama.prefill(sp_mesh=...) — sequence-parallel end to end: same
    compressed cache contents, lengths, and first generated token."""
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import TINY_LLAMA
    from functools import partial

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    comp = CompressionConfig(
        method=method, decoding_metric="jump", max_capacity_prompt=64,
        window_size=W, decoding_window_size=32, decoding_recent_size=16,
        delta=3)
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                       dtype="float32")
    params = llama.init_params(TINY_LLAMA, jax.random.key(2), jnp.float32)
    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, 512, (2, 128)), jnp.int32)
    tl = jnp.asarray((100, 128), jnp.int32)

    ref_logits, ref_cache, _ = llama.prefill(TINY_LLAMA, comp, ecfg,
                                             params, toks, tl)
    sp_logits, sp_cache, _ = jax.jit(partial(
        llama.prefill, TINY_LLAMA, comp, ecfg, sp_mesh=mesh))(
            params, toks, tl)
    np.testing.assert_array_equal(np.asarray(ref_cache.length),
                                  np.asarray(sp_cache.length))
    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits), rtol=2e-4,
                               atol=2e-4)
    assert (np.argmax(np.asarray(sp_logits), -1)
            == np.argmax(np.asarray(ref_logits), -1)).all()
    # Same eviction sets: compare kept cache contents where valid.
    ln = np.asarray(ref_cache.length)
    kr = np.asarray(ref_cache.k)
    ks = np.asarray(sp_cache.k)
    for l in range(kr.shape[0]):
        for b in range(kr.shape[1]):
            np.testing.assert_allclose(ks[l, b, :, :ln[l, b]],
                                       kr[l, b, :, :ln[l, b]],
                                       rtol=2e-4, atol=2e-4)
