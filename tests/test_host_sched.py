"""Host-orchestrated scheduling must be token-identical to the
device-scheduler (lax.cond) path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.compression.host_sched import HostScheduler, host_schedulable
from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.engine.host_loop import HostScheduledDecoder, host_generate
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA

ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=48, dtype="float32")
STEPS = 40


def device_path(comp, params, toks, tl, steps):
    logits, cache, state = llama.prefill(TINY_LLAMA, comp, ECFG, params,
                                         toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    seq = [np.asarray(tok)]
    for s in range(steps):
        logits, cache, state = llama.decode_step(
            TINY_LLAMA, comp, ECFG, params, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq.append(np.asarray(tok))
    return np.stack(seq, 1), cache


def host_path(comp, params, toks, tl, steps):
    dec = HostScheduledDecoder(TINY_LLAMA, comp, ECFG)
    # jit so cache.prompt_len is a fresh buffer — the decoder donates the
    # cache, and an unjitted prefill would alias prompt_len to `tl`.
    logits, cache, state = jax.jit(
        lambda p, t, l: llama.prefill(TINY_LLAMA, comp, ECFG, p, t, l)
    )(params, toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    sched = dec.new_scheduler(int(tl[0]))
    seq = [np.asarray(tok)]
    for s in range(steps):
        logits, cache, state = dec.step(sched, params, tok, tl + s, cache,
                                        state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seq.append(np.asarray(tok))
    return np.stack(seq, 1), cache, sched


@pytest.mark.parametrize("method,metric", [
    ("h2o", "fixed"),
    ("h2o", "linear"),
    ("h2o", "jump"),
    ("snapkv", "jump"),
    ("allkv", "fixed"),
    ("streamingllm", "linear"),
])
def test_host_equals_device(method, metric):
    comp = CompressionConfig(
        method=method, decoding_metric=metric, max_capacity_prompt=64,
        window_size=32 if method == "streamingllm" else 8,
        decoding_window_size=32, decoding_recent_size=16, delta=3)
    assert host_schedulable(comp)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)

    dev_seq, dev_cache = device_path(comp, params, toks, tl, STEPS)
    host_seq, host_cache, sched = host_path(comp, params, toks, tl, STEPS)

    np.testing.assert_array_equal(dev_seq, host_seq)
    np.testing.assert_array_equal(np.asarray(dev_cache.length),
                                  np.asarray(host_cache.length))
    # The host's length mirror tracks the device bookkeeping exactly.
    assert sched.length == int(host_cache.length[0, 0])


def test_host_generate_end_to_end():
    comp = CompressionConfig(method="h2o", decoding_metric="jump",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    params = llama.init_params(TINY_LLAMA, jax.random.key(1), jnp.float32)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 512, (2, 128)).astype(np.int32)
    tl = np.full((2,), 100, np.int32)
    gen, stats = host_generate(TINY_LLAMA, comp, ECFG, params, toks, tl,
                               16, eos_ids=())
    assert gen.shape == (2, 16)
    assert len(stats["tpot_s"]) == 16


def chunked_path(comp, params, toks, tl, steps, chunk_sizes, ring=0):
    import dataclasses
    ecfg = dataclasses.replace(ECFG, decode_chunk_sizes=chunk_sizes,
                               decode_ring=ring)
    dec = HostScheduledDecoder(TINY_LLAMA, comp, ecfg)
    logits, cache, state = jax.jit(
        lambda p, t, l: llama.prefill(TINY_LLAMA, comp, ecfg, p, t, l)
    )(params, toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    sched = dec.new_scheduler(int(tl[0]))
    seq = [np.asarray(tok)]
    s = 0
    while len(seq) <= steps:
        toks_out, cache, state = dec.step_auto(sched, params, tok, tl + s,
                                               cache, state)
        arr = np.asarray(toks_out)
        for j in range(arr.shape[1]):
            if len(seq) <= steps:
                seq.append(arr[:, j])
        tok = toks_out[:, -1]
        s += arr.shape[1]
    return np.stack(seq, 1), cache, sched


@pytest.mark.parametrize("method,metric", [
    ("h2o", "jump"),
    ("h2o", "fixed"),
    ("snapkv", "linear"),
    ("fullkv", "none"),
    ("pyramidkv", "jump"),
])
def test_chunked_equals_per_step(method, metric):
    """Multi-step hot chunks (llama.decode_steps via step_auto) must be
    token- and length-identical to per-step host dispatch."""
    comp = CompressionConfig(
        method=method, decoding_metric=metric, max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3, beta=4)
    params = llama.init_params(TINY_LLAMA, jax.random.key(3), jnp.float32)
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)

    ref_seq, ref_cache, _ = host_path(comp, params, toks, tl, STEPS)
    chk_seq, chk_cache, sched = chunked_path(comp, params, toks, tl, STEPS,
                                             (8, 4, 2))
    np.testing.assert_array_equal(ref_seq, chk_seq)
    # Chunked dispatch may legitimately run a few extra steps past STEPS
    # inside the final chunk, so lengths are compared via the mirror.
    assert sched.length == int(chk_cache.length.max())


@pytest.mark.parametrize("method,metric,chunks", [
    ("h2o", "jump", ()),
    ("h2o", "jump", (4, 2)),
    ("h2o", "fixed", ()),
    ("snapkv", "linear", (4, 2)),
    ("fullkv", "none", (4, 2)),
    ("pyramidkv", "jump", ()),
])
def test_ring_equals_per_step(method, metric, chunks):
    """The staging ring (hot steps write a small ring buffer; flushes
    every R steps / before fires) must be token-identical to direct
    appends, per-step and chunked."""
    comp = CompressionConfig(
        method=method, decoding_metric=metric, max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3, beta=4)
    params = llama.init_params(TINY_LLAMA, jax.random.key(4), jnp.float32)
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)

    ref_seq, ref_cache, _ = host_path(comp, params, toks, tl, STEPS)
    rng_seq, rng_cache, sched = chunked_path(comp, params, toks, tl,
                                             STEPS, chunks, ring=8)
    np.testing.assert_array_equal(ref_seq, rng_seq)
    # Device length lags the virtual mirror by the staged fill.
    assert (sched.length - sched.ring_fill
            == int(rng_cache.length.max()))
    assert int(rng_cache.ring_fill) == sched.ring_fill


def test_ring_int8_kv_equals_direct():
    """Headline serving combo: int8 KV cache + staging ring must match
    the int8 direct-append path token-for-token."""
    import dataclasses
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3, evict_per_qhead=False)
    params = llama.init_params(TINY_LLAMA, jax.random.key(6), jnp.float32)
    rng = np.random.default_rng(6)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)
    ecfg8 = dataclasses.replace(ECFG, kv_dtype="int8")

    def run(ring):
        ecfg = dataclasses.replace(ecfg8, decode_ring=ring)
        dec = HostScheduledDecoder(TINY_LLAMA, comp, ecfg)
        logits, cache, state = jax.jit(
            lambda p, t, l: llama.prefill(TINY_LLAMA, comp, ecfg, p, t, l)
        )(params, toks, tl)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        sched = dec.new_scheduler(int(tl[0]))
        seq = [np.asarray(tok)]
        for s in range(STEPS):
            logits, cache, state = dec.step(sched, params, tok, tl + s,
                                            cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            seq.append(np.asarray(tok))
        return np.stack(seq, 1)

    np.testing.assert_array_equal(run(0), run(8))


def test_ring_flush_restores_cache_contents():
    """After a manual flush, the ring-mode cache contents equal the
    direct-append cache (same slots, same values)."""
    from scope_tpu.cache import flush_ring
    comp = CompressionConfig(
        method="h2o", decoding_metric="none", max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3)
    params = llama.init_params(TINY_LLAMA, jax.random.key(5), jnp.float32)
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(0, 512, (2, 128)), jnp.int32)
    tl = jnp.full((2,), 100, jnp.int32)

    ref_seq, ref_cache, _ = host_path(comp, params, toks, tl, 6)
    rng_seq, rng_cache, sched = chunked_path(comp, params, toks, tl, 6,
                                             (), ring=8)
    np.testing.assert_array_equal(ref_seq, rng_seq)
    flushed = flush_ring(rng_cache, uniform_rows=False)
    n = int(ref_cache.length[0, 0])
    # Ring vs direct programs fuse differently, so the staged k/v carry
    # ~1e-6 f32 rounding differences; structure must match exactly.
    np.testing.assert_allclose(np.asarray(flushed.k[:, :, :, :n]),
                               np.asarray(ref_cache.k[:, :, :, :n]),
                               atol=5e-6, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(flushed.length),
                                  np.asarray(ref_cache.length))


def test_hot_run_length_peek_restores():
    comp = CompressionConfig(method="h2o", decoding_metric="jump",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    a = HostScheduler(comp, 4, 100, 64, 16)
    b = HostScheduler(comp, 4, 100, 64, 16)
    for _ in range(60):
        n = a.hot_run_length(8)
        assert a._snapshot() == b._snapshot()
        if n > 0:
            a.advance_hot(n)
            for _ in range(n):
                assert not b.plan_step().fire
        else:
            assert b.plan_step().fire == a.plan_step().fire


def test_not_host_schedulable():
    # headwise keeps device-side gates (per-head budgets + no length
    # mirror); quest is host-schedulable since round 3 (test_quest_host).
    comp = CompressionConfig(method="headwise", decoding_metric="fixed",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    assert not host_schedulable(comp)
    with pytest.raises(ValueError):
        HostScheduledDecoder(TINY_LLAMA, comp, ECFG)


@pytest.mark.parametrize("metric", ["fixed", "linear", "jump", "none",
                                    "pyramidinfer"])
def test_pyramidkv_layered_host_equals_device(metric):
    """PyramidKV: per-layer budgets give per-layer lengths/fire steps —
    the layered host mirror must match the device path token-for-token
    AND length-for-length per layer."""
    comp = CompressionConfig(method="pyramidkv", decoding_metric=metric,
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3, beta=4)
    params = llama.init_params(TINY_LLAMA, jax.random.key(2), jnp.float32)
    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)

    dev_seq, dev_cache = device_path(comp, params, toks, tl, STEPS)
    host_seq, host_cache, sched = host_path(comp, params, toks, tl, STEPS)

    np.testing.assert_array_equal(dev_seq, host_seq)
    np.testing.assert_array_equal(np.asarray(dev_cache.length),
                                  np.asarray(host_cache.length))
    np.testing.assert_array_equal(
        np.asarray(host_cache.length)[:, 0], np.asarray(sched.lengths))
