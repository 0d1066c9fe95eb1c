"""Quest host scheduling: token- and length-identical to the device path.

Quest's decode gates are deterministic given lengths (the data-dependent
part is WHICH pages/slots are kept, never WHEN compression fires —
kv_utils.py:1389-1474), so the host can mirror its counters like the
other methods'.  The quirk mirrored exactly: skip layers neither compress
nor advance the shared counters (kv_utils.py:1277-1278), so jump waves
span two consecutive steps (host_sched.QuestHostScheduler).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.compression.host_sched import host_schedulable
from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.engine.host_loop import HostScheduledDecoder, host_generate
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA

ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=48, dtype="float32")
STEPS = 40


def quest_comp(metric):
    # skip=1: layer 0 dense, layer 1 paged (TINY_LLAMA has 2 layers).
    return CompressionConfig(
        method="quest", decoding_metric=metric, max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3, chunk_size=16, quest_skip_layers=1)


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


def host_path(comp, params, toks, tl, steps, chunks=()):
    ecfg = ECFG.replace(decode_chunk_sizes=tuple(chunks))
    dec = HostScheduledDecoder(TINY_LLAMA, comp, ecfg)
    logits, cache, state = jax.jit(
        lambda p, t, l: llama.prefill(TINY_LLAMA, comp, ecfg, p, t, l)
    )(params, toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    sched = dec.new_scheduler(int(tl[0]))
    seq = [np.asarray(tok)]
    s = 0
    while len(seq) < steps + 1:
        toks_out, cache, state = dec.step_auto(sched, params, tok, tl + s,
                                               cache, state)
        arr = np.asarray(toks_out)
        for j in range(arr.shape[1]):
            if len(seq) < steps + 1:
                seq.append(arr[:, j])
        tok = toks_out[:, -1]
        s += arr.shape[1]
    return np.stack(seq, 1), cache, sched


@pytest.mark.parametrize("metric", ["fixed", "linear", "jump"])
def test_quest_host_equals_device(metric):
    comp = quest_comp(metric)
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
    # Host per-layer length mirrors == device bookkeeping.
    np.testing.assert_array_equal(
        np.asarray(host_cache.length)[:, 0], np.asarray(sched.lengths))


@pytest.mark.parametrize("metric", ["linear", "jump"])
def test_quest_chunked_equals_per_step(metric):
    comp = quest_comp(metric)
    params = llama.init_params(TINY_LLAMA, jax.random.key(1), jnp.float32)
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 100, jnp.int32)

    seq_a, cache_a, _ = host_path(comp, params, toks, tl, STEPS)
    seq_b, cache_b, _ = host_path(comp, params, toks, tl, STEPS,
                                  chunks=(8, 4, 2))
    np.testing.assert_array_equal(seq_a, seq_b)
    np.testing.assert_array_equal(np.asarray(cache_a.length),
                                  np.asarray(cache_b.length))


def test_quest_jump_wave_spans_two_steps():
    """The mirrored reference quirk: with skip layers excluded from the
    counters, one wave cannot cover all L jump_layer increments in one
    step — the tail re-fires on the next step."""
    comp = quest_comp("jump")
    from scope_tpu.compression.host_sched import QuestHostScheduler
    sched = QuestHostScheduler(comp, num_layers=4, prompt_len=100,
                               keep_cap=64)
    fire_steps = []
    for step in range(200):
        plan = sched.plan_step()
        if plan.fire_any:
            fire_steps.append((step, tuple(plan.fire)))
    assert fire_steps, "no wave fired in 200 steps"
    # Waves come in consecutive-step pairs: layers 1..3 then layer-tail.
    s0, f0 = fire_steps[0]
    s1, f1 = fire_steps[1]
    assert s1 == s0 + 1
    assert f0 != f1
    assert not f0[0] and not f1[0]          # skip layer never fires


def test_quest_host_generate_runs():
    comp = quest_comp("jump")
    params = llama.init_params(TINY_LLAMA, jax.random.key(2), jnp.float32)
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 512, (2, 128)).astype(np.int32)
    tl = np.full((2,), 100, np.int64)
    gen, stats = host_generate(TINY_LLAMA, comp, ECFG, params, toks, tl, 24)
    assert gen.shape == (2, 24)
    assert np.isfinite(stats["ttft_s"])
