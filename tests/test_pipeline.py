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
