"""Step-by-step golden tests: JAX decode schedulers vs the NumPy oracle.

Each test simulates a decode stream: tokens are appended one per step, the
scheduler fires per its gates, and after every step the JAX slotted cache
must contain exactly the token ids the oracle's dynamic cache holds, in the
same physical order.  Token identity is encoded in the K/V values so the
content check is exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.cache import append_token
from scope_tpu.compression.schedulers import (DecodeCaps, SchedState,
                                              decode_schedule,
                                              static_keep_cap)
from scope_tpu.config import CompressionConfig

from oracle import ScopeDecodeOracle

B, H, D = 1, 2, 8
P, W, R = 16, 8, 4
DELTA = 2
STEPS = 40
CAPACITY = 64


def tok_val(t):
    """Encode token id t in a [D] vector."""
    v = np.zeros(D, np.float32)
    v[0] = t
    return v


def run_stream(method, metric, num_layers=1, steps=STEPS, seed=0):
    comp = CompressionConfig(
        method=method, decoding_metric=metric, max_capacity_prompt=P,
        window_size=4, decoding_window_size=W, decoding_recent_size=R,
        delta=DELTA)
    caps = DecodeCaps(keep_cap=static_keep_cap(comp, steps),
                      capacity=CAPACITY)
    rng = np.random.default_rng(seed)

    # Prefill: P tokens 0..P-1 already in the cache.
    ck = np.zeros((B, H, CAPACITY, D), np.float32)
    for t in range(P):
        ck[0, :, t] = tok_val(t)
    cv = ck.copy()
    ck, cv = jnp.asarray(ck), jnp.asarray(cv)
    length = jnp.full((B,), P, jnp.int32)
    prompt_len = jnp.full((B,), P, jnp.int32)
    state = SchedState.init()

    oracles = [ScopeDecodeOracle(metric, P, W, R, DELTA, num_layers,
                                 layer_idx=l) for l in range(num_layers)]
    # Single shared counter state across layers (reference class attrs).
    for o in oracles[1:]:
        o.__dict__ = oracles[0].__dict__  # share counters exactly

    ocache = [[list(range(P)) for _ in range(H)] for _ in range(num_layers)]
    probs_of = {t: rng.random(H).astype(np.float32) for t in range(P)}

    step_fn = jax.jit(
        lambda st, k, v, ln, pr, li: decode_schedule(
            comp, caps, st, k, v, ln, pr, prompt_len, li, num_layers),
        static_argnums=())

    caches = [(ck, cv, length) for _ in range(num_layers)]
    for s in range(steps):
        t = 1000 + s
        probs_of[t] = rng.random(H).astype(np.float32)
        for l in range(num_layers):
            ck, cv, length = caches[l]
            new = jnp.asarray(tok_val(t))[None, None, None, :]
            new = jnp.broadcast_to(new, (B, H, 1, D))
            ck, cv, length = append_token(ck, cv, new, new, length)
            for h in range(H):
                ocache[l][h].append(t)

            # Build the probs array the JAX side will see: score of slot j
            # = probs_of[token at slot j].
            k_np = np.asarray(ck)
            ln = int(length[0])
            probs = np.zeros((B, H, CAPACITY), np.float32)
            for h in range(H):
                for j in range(ln):
                    probs[0, h, j] = probs_of[int(k_np[0, h, j, 0])][h]

            ck, cv, length, state = step_fn(
                state, ck, cv, length, jnp.asarray(probs),
                jnp.int32(l))
            caches[l] = (ck, cv, length)
            ocache[l] = oracles[l](ocache[l], probs_of)

        for l in range(num_layers):
            ck, cv, length = caches[l]
            k_np = np.asarray(ck)
            ln = int(length[0])
            assert ln == len(ocache[l][0]), \
                f"step {s} layer {l}: len {ln} != oracle {len(ocache[l][0])}"
            for h in range(H):
                got = [int(round(float(k_np[0, h, j, 0])))
                       for j in range(ln)]
                assert got == ocache[l][h], \
                    f"step {s} layer {l} head {h}:\n got {got}\n exp {ocache[l][h]}"
    return caches


@pytest.mark.parametrize("metric", ["fixed", "linear", "jump", "h2o", "slm"])
def test_h2o_decode_metrics_match_oracle(metric):
    run_stream("h2o", metric)


def test_multilayer_counters_match_oracle():
    """linear/jump counters increment per layer call (kv_utils.py:733-734);
    with L=2 the W(t) growth halves per step."""
    run_stream("h2o", "linear", num_layers=2, steps=30)
    run_stream("h2o", "jump", num_layers=2, steps=30)


def test_fixed_steady_state_cache_size():
    caches = run_stream("h2o", "fixed")
    _, _, length = caches[0]
    assert int(length[0]) == P + W  # steady state (SURVEY.md §2.2)


def test_allkv_uses_recorded_prompt_len():
    """ALLKV gates on the recorded true prompt length, not config P
    (kv_utils.py:1047, :1070)."""
    comp = CompressionConfig(method="allkv", decoding_metric="fixed",
                             max_capacity_prompt=P,
                             decoding_window_size=W,
                             decoding_recent_size=R, delta=DELTA)
    caps = DecodeCaps(keep_cap=static_keep_cap(comp, STEPS),
                      capacity=CAPACITY)
    true_prompt = 24   # != P
    ck = np.zeros((B, H, CAPACITY, D), np.float32)
    for t in range(true_prompt):
        ck[0, :, t] = tok_val(t)
    cv = ck.copy()
    ck, cv = jnp.asarray(ck), jnp.asarray(cv)
    length = jnp.full((B,), true_prompt, jnp.int32)
    prompt_len = jnp.full((B,), true_prompt, jnp.int32)
    state = SchedState.init()
    rng = np.random.default_rng(0)
    for s in range(W + 4):
        t = 1000 + s
        new = jnp.broadcast_to(jnp.asarray(tok_val(t))[None, None, None, :],
                               (B, H, 1, D))
        ck, cv, length, = append_token(ck, cv, new, new, length)
        probs = jnp.asarray(rng.random((B, H, CAPACITY)).astype(np.float32))
        ck, cv, length, state = decode_schedule(
            comp, caps, state, ck, cv, length, probs, prompt_len,
            jnp.int32(0), 1)
    # Steady state: recorded prompt + W.
    assert int(length[0]) == true_prompt + W
    # Prefill slots preserved verbatim.
    k_np = np.asarray(ck)
    for j in range(true_prompt):
        assert int(round(float(k_np[0, 0, j, 0]))) == j
