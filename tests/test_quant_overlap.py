"""Quantization-accuracy proxy (VERDICT r4 Missing #1 / Next #2).

test_int8_kv / test_int4_kv pin the exact scale-folding algebra; these
tests measure the EFFECT of quantization error on compression decisions:
eviction scores are computed from the quantized cache (reference anchor
kv_utils.py:647-658), so int8/int4 can change which tokens survive a
fire.  The proxy is self-relative (random weights — the comparison needs
no checkpoint): same seeds, same teacher-forced stream, kv dtype the
only variable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.bench.quant_proxy import measure_quant_overlap
from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA

SPEC = TINY_LLAMA.replace(num_layers=2)
COMP = CompressionConfig(
    method="h2o", decoding_metric="jump", max_capacity_prompt=64,
    window_size=8, decoding_window_size=32, decoding_recent_size=16,
    delta=4, evict_per_qhead=False)
ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=256,
                    dtype="float32", uniform_lengths=True,
                    lazy_evict=True, lazy_slack=256)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(SPEC, jax.random.key(0), jnp.float32)


def test_bf16_self_overlap_is_exact(params):
    """Control: the harness run against bfloat16 itself must report
    perfect overlap and agreement (same program, same seeds)."""
    res = measure_quant_overlap(SPEC, COMP, ECFG, params, 96,
                                kv_dtypes=("bfloat16",))
    assert res["bfloat16"]["kept_overlap"] == 1.0
    assert res["bfloat16"]["greedy_agree"] == 1.0


def test_int8_keeps_the_same_tokens(params):
    """int8 per-channel quantization error must barely move the kept
    set: the scores are column-sums of softmax probabilities, and the
    per-channel scales preserve ranking to ~1e-2 relative error.

    greedy_agree is REPORTED, not asserted: on random weights the logit
    margins are noise, so a single near-tie argmax flip cascades into
    permanent divergence regardless of how faithful the cache is — on a
    real checkpoint (margins >> quant noise) the same metric is
    meaningful, which is why the bench logs it for the headline config."""
    res = measure_quant_overlap(SPEC, COMP, ECFG, params, 96,
                                kv_dtypes=("int8",), extra_steps=12)
    assert res["int8"]["kept_overlap"] >= 0.9, res
    assert 0.0 <= res["int8"]["greedy_agree"] <= 1.0


def test_int4_overlap_reported_and_bounded(params):
    """int4 is the capacity tool (8B headline config): its coarser codes
    may flip borderline keeps, but the kept set must remain substantially
    the bf16 one — this is the gate for selling int4 as safe."""
    res = measure_quant_overlap(SPEC, COMP, ECFG, params, 96,
                                kv_dtypes=("int4",), extra_steps=12)
    assert res["int4"]["kept_overlap"] >= 0.75, res
    assert 0.0 <= res["int4"]["greedy_agree"] <= 1.0


def test_fires_actually_happened(params):
    """The window must cover at least one fire wave, or the overlap is
    trivially 1.0 (nothing evicted in the decode region)."""
    from functools import partial

    from scope_tpu.bench.quant_proxy import _decode_run, _first_fire
    from scope_tpu.engine.host_loop import HostScheduledDecoder

    ecfg = ECFG.replace(kv_dtype="bfloat16")
    dec = HostScheduledDecoder(SPEC, COMP, ecfg)
    ff = _first_fire(dec, 96)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, SPEC.vocab_size, (1, 96)),
                       jnp.int32)
    tl = jnp.full((1,), 96, jnp.int32)
    alive, phys, _ = _decode_run(SPEC, COMP, ecfg, params, toks, tl,
                                 ff + COMP.delta + 2, None)
    # Some decode-region slots must be tombstoned (evicted).
    P = COMP.max_capacity_prompt
    assert not alive[:, :, :, P:phys].all()
