"""Pipeline-parallel decode == single-device decode, token for token."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA
from scope_tpu.parallel.pipeline import make_pp_mesh, pp_decode_step

SPEC = TINY_LLAMA.replace(num_layers=4)
COMP = CompressionConfig(method="fullkv", decoding_metric="none",
                         evict_per_qhead=False)
ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=32,
                    dtype="float32")


def _setup(batch):
    params = llama.init_params(SPEC, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 512, (batch, 128)), jnp.int32)
    tl = jnp.full((batch,), 100, jnp.int32)
    logits, cache, state = llama.prefill(SPEC, COMP, ECFG, params, toks,
                                         tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    return params, tok, tl, cache, state


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (2, 4)])
def test_pp_decode_matches_single_device(n_stages, n_micro):
    if len(jax.devices()) < n_stages:
        pytest.skip("needs virtual devices")
    batch = 4
    params, tok, tl, cache, state = _setup(batch)

    # Single-device reference.
    ref_tok = tok
    ref_cache = cache
    ref_seq = []
    for s in range(6):
        logits, ref_cache, state = llama.decode_step(
            SPEC, COMP, ECFG, params, ref_tok, tl + s, ref_cache, state)
        ref_tok = jnp.argmax(logits, -1).astype(jnp.int32)
        ref_seq.append(np.asarray(ref_tok))

    # Pipeline-parallel: same cache buffers, stage-sharded.
    mesh = make_pp_mesh(n_stages, jax.devices()[:n_stages])
    ck, cv = cache.k, cache.v
    length = cache.length[0]                      # [B] layer-uniform
    pp_tok = tok
    pp_seq = []
    for s in range(6):
        logits, ck, cv, length = pp_decode_step(
            mesh, SPEC, params, pp_tok, tl + s, ck, cv, length,
            n_micro=n_micro)
        pp_tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pp_seq.append(np.asarray(pp_tok))

    np.testing.assert_array_equal(np.stack(ref_seq), np.stack(pp_seq))
    np.testing.assert_array_equal(
        np.asarray(ref_cache.length)[0], np.asarray(length))


def test_pp_decode_with_h2o_jump_fire_matches_single_device():
    """SCOPE fires compose with stage sharding (VERDICT r3 #6): the
    host-planned force program runs per stage (layer-local rewrite) and
    stays token-identical to the single-device host-scheduled path
    through a jump wave."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    comp = CompressionConfig(method="h2o", decoding_metric="jump",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=16,
                             decoding_recent_size=8, delta=2,
                             evict_per_qhead=False)
    batch, steps = 4, 16
    params = llama.init_params(SPEC, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, 512, (batch, 128)), jnp.int32)
    tl = jnp.full((batch,), 100, jnp.int32)
    # Jit the prefill (as the engine does): eager prefill stores the tl
    # buffer itself as cache.prompt_len, and the host-loop's donated
    # decode would delete tl out from under the test loop.
    from functools import partial
    logits0, cache, state = jax.jit(partial(llama.prefill, SPEC, comp,
                                            ECFG))(params, toks, tl)
    tok0 = jnp.argmax(logits0, -1).astype(jnp.int32)
    ck0 = np.asarray(cache.k)          # decode donates the cache buffers
    cv0 = np.asarray(cache.v)

    from scope_tpu.engine.host_loop import HostScheduledDecoder
    from scope_tpu.models.llama import derive_statics
    dec = HostScheduledDecoder(SPEC, comp, ECFG)
    caps = derive_statics(SPEC, comp, ECFG).caps

    # Single-device host-scheduled reference.
    sched_ref = dec.new_scheduler(100)
    ref_tok, ref_cache, ref_state = tok0, cache, state
    ref_seq = []
    for s in range(steps):
        logits, ref_cache, ref_state = dec.step(
            sched_ref, params, ref_tok, tl + s, ref_cache, ref_state)
        ref_tok = jnp.argmax(logits, -1).astype(jnp.int32)
        ref_seq.append(np.asarray(ref_tok))

    # Pipeline-parallel with the same host mirror driving fires.
    mesh = make_pp_mesh(2, jax.devices()[:2])
    sched_pp = dec.new_scheduler(100)
    ck, cv = jnp.asarray(ck0), jnp.asarray(cv0)
    length = jnp.full((batch,), sched_pp.length, jnp.int32)
    pp_tok = tok0
    pp_seq, fired = [], False
    for s in range(steps):
        plan = sched_pp.plan_step()
        if plan.fire:
            fired = True
            logits, ck, cv, length = pp_decode_step(
                mesh, SPEC, params, pp_tok, tl + s, ck, cv, length,
                n_micro=2, comp=comp, caps=caps,
                force_n_keep=jnp.full((batch,), plan.n_keep, jnp.int32))
        else:
            logits, ck, cv, length = pp_decode_step(
                mesh, SPEC, params, pp_tok, tl + s, ck, cv, length,
                n_micro=2)
        pp_tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pp_seq.append(np.asarray(pp_tok))

    assert fired, "test window never crossed a jump wave"
    np.testing.assert_array_equal(np.stack(ref_seq), np.stack(pp_seq))
    assert int(length[0]) == sched_pp.length == sched_ref.length


def test_pp_allkv_fire_uses_recorded_prompt_len():
    """allkv fires through PP protect the RECORDED prompt segment (not
    max_capacity_prompt) — pp_decode_step takes prompt_len and matches
    the single-device host-scheduled path token-for-token."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    comp = CompressionConfig(method="allkv", decoding_metric="fixed",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=16,
                             decoding_recent_size=8,
                             evict_per_qhead=False)
    batch, steps, plen = 4, 20, 100
    params = llama.init_params(SPEC, jax.random.key(2), jnp.float32)
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(0, 512, (batch, 128)), jnp.int32)
    tl = jnp.full((batch,), plen, jnp.int32)
    from functools import partial
    logits0, cache, state = jax.jit(partial(llama.prefill, SPEC, comp,
                                            ECFG))(params, toks, tl)
    tok0 = jnp.argmax(logits0, -1).astype(jnp.int32)
    ck0, cv0 = np.asarray(cache.k), np.asarray(cache.v)

    from scope_tpu.engine.host_loop import HostScheduledDecoder
    from scope_tpu.models.llama import derive_statics
    dec = HostScheduledDecoder(SPEC, comp, ECFG)
    caps = derive_statics(SPEC, comp, ECFG).caps

    sched_ref = dec.new_scheduler(plen)
    ref_tok, ref_cache, ref_state = tok0, cache, state
    ref_seq = []
    for s in range(steps):
        logits, ref_cache, ref_state = dec.step(
            sched_ref, params, ref_tok, tl + s, ref_cache, ref_state)
        ref_tok = jnp.argmax(logits, -1).astype(jnp.int32)
        ref_seq.append(np.asarray(ref_tok))

    mesh = make_pp_mesh(2, jax.devices()[:2])
    sched_pp = dec.new_scheduler(plen)
    ck, cv = jnp.asarray(ck0), jnp.asarray(cv0)
    length = jnp.full((batch,), plen, jnp.int32)
    pp_tok, pp_seq, fired = tok0, [], False
    for s in range(steps):
        plan = sched_pp.plan_step()
        if plan.fire:
            fired = True
            logits, ck, cv, length = pp_decode_step(
                mesh, SPEC, params, pp_tok, tl + s, ck, cv, length,
                n_micro=2, comp=comp, caps=caps, prompt_len=tl,
                force_n_keep=jnp.full((batch,), plan.n_keep, jnp.int32))
        else:
            logits, ck, cv, length = pp_decode_step(
                mesh, SPEC, params, pp_tok, tl + s, ck, cv, length,
                n_micro=2)
        pp_tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pp_seq.append(np.asarray(pp_tok))

    assert fired, "allkv fixed never fired in the window"
    np.testing.assert_array_equal(np.stack(ref_seq), np.stack(pp_seq))
    assert int(length[0]) == sched_pp.length == sched_ref.length


def _drive_pair(comp, ecfg, steps=16, seed=3, plen=100, batch=4,
                lazy=False):
    """Single-device host-scheduled decode vs PP (2 stages), same host
    mirror; returns (ref_seq, pp_seq, ref_len, pp_len, fired)."""
    from functools import partial

    from scope_tpu.engine.host_loop import HostScheduledDecoder
    from scope_tpu.models.llama import derive_statics

    params = llama.init_params(SPEC, jax.random.key(seed), jnp.float32)
    rng = np.random.default_rng(seed)
    toks = jnp.asarray(rng.integers(0, 512, (batch, 128)), jnp.int32)
    tl = jnp.full((batch,), plen, jnp.int32)
    logits0, cache, state = jax.jit(partial(llama.prefill, SPEC, comp,
                                            ecfg))(params, toks, tl)
    tok0 = jnp.argmax(logits0, -1).astype(jnp.int32)
    # The single-device loop DONATES the cache pytree (host_loop jits);
    # copy everything the PP side needs before the first ref step.
    ck0, cv0 = np.asarray(cache.k), np.asarray(cache.v)
    ks = jnp.asarray(np.asarray(cache.k_scale))
    vs = jnp.asarray(np.asarray(cache.v_scale))
    al0 = np.asarray(cache.alive) if cache.alive is not None else None

    dec = HostScheduledDecoder(SPEC, comp, ecfg)
    caps = derive_statics(SPEC, comp, ecfg).caps

    sched_ref = dec.new_scheduler(plen)
    ref_tok, ref_cache, ref_state = tok0, cache, state
    ref_seq = []
    for s in range(steps):
        logits, ref_cache, ref_state = dec.step(
            sched_ref, params, ref_tok, tl + s, ref_cache, ref_state)
        ref_tok = jnp.argmax(logits, -1).astype(jnp.int32)
        ref_seq.append(np.asarray(ref_tok))

    mesh = make_pp_mesh(2, jax.devices()[:2])
    sched_pp = dec.new_scheduler(plen)
    ck, cv = jnp.asarray(ck0), jnp.asarray(cv0)
    alive = jnp.asarray(al0) if lazy else None
    length = jnp.full((batch,), sched_pp.length, jnp.int32)
    pp_tok, pp_seq, fired, compacted = tok0, [], False, 0
    for s in range(steps):
        if lazy and sched_pp.needs_compact(headroom=1):
            # Mirror dec.step's trigger: compaction only runs on a FULL
            # buffer (the over-count of still-True tail slots is bounded
            # by the headroom — cache.compact_gather's contract).
            from scope_tpu.parallel.pipeline import pp_compact_lazy
            ck, cv, alive, length = pp_compact_lazy(
                mesh, ck, cv, alive, length,
                gap=comp.max_capacity_prompt)
            sched_pp.compacted()
            compacted += 1
        plan = sched_pp.plan_step()
        kw = dict(n_micro=2, k_scale=ks, v_scale=vs)
        if lazy:
            kw["alive"] = alive
        if plan.fire:
            fired = True
            kw.update(comp=comp, caps=caps,
                      force_n_keep=jnp.full((batch,), plan.n_keep,
                                            jnp.int32))
        out = pp_decode_step(mesh, SPEC, params, pp_tok, tl + s, ck, cv,
                             length, **kw)
        if lazy:
            logits, ck, cv, alive, length = out
        else:
            logits, ck, cv, length = out
        pp_tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pp_seq.append(np.asarray(pp_tok))
    return (ref_seq, pp_seq, sched_ref, sched_pp, fired, compacted,
            (mesh, params, ck, cv, alive, length, pp_tok, tl, ks, vs))


def test_pp_int8_fire_matches_single_device():
    """PP at the production cache format (VERDICT r4 #5): int8 KV codes
    + per-channel scales through a jump-wave fire, token-identical to
    the single-device host-scheduled int8 path."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    comp = CompressionConfig(method="h2o", decoding_metric="jump",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=16,
                             decoding_recent_size=8, delta=2,
                             evict_per_qhead=False)
    ecfg = ECFG.replace(kv_dtype="int8", uniform_lengths=True)
    ref_seq, pp_seq, sref, spp, fired, _, _ = _drive_pair(comp, ecfg)
    assert fired, "window never crossed a jump wave"
    np.testing.assert_array_equal(np.stack(ref_seq), np.stack(pp_seq))
    assert sref.length == spp.length


def test_pp_lazy_int8_fire_and_compact_match_single_device():
    """PP lazy eviction (tombstone fires + pp_compact_lazy) on an int8
    cache: token-identical to the single-device lazy path through fire
    waves AND through the full-buffer compaction (both sides compact on
    the same host-mirrored trigger)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    comp = CompressionConfig(method="h2o", decoding_metric="jump",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=16,
                             decoding_recent_size=8, delta=2,
                             evict_per_qhead=False)
    # Tiny lazy_slack => capacity 128; phys crosses it mid-run, so the
    # compaction path is actually exercised (compact only runs on a
    # full buffer — the tail over-count is bounded by headroom).
    ecfg = ECFG.replace(kv_dtype="int8", uniform_lengths=True,
                        lazy_evict=True, lazy_slack=8)
    (ref_seq, pp_seq, sref, spp, fired, compacted,
     pp_state) = _drive_pair(comp, ecfg, steps=70, lazy=True)
    assert fired, "window never crossed a jump wave"
    assert compacted >= 1, "window never crossed a compaction"
    np.testing.assert_array_equal(np.stack(ref_seq), np.stack(pp_seq))
    assert sref.length == spp.length          # live lengths agree
    assert sref.phys == spp.phys
    length = pp_state[5]
    assert int(length[0]) == spp.phys
