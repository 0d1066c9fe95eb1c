"""Weight-only int8 (per-output-channel) tests.

The contract: wdot(x, quantized) == dot(x, dequantized_weight) exactly
(the scale factors out of the matmul column), and end-to-end generation
with int8 weights stays close to bf16 generation (same argmax on
well-separated logits) while halving the stored weight bytes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.models import llama
from scope_tpu.models.registry import TINY_LLAMA
from scope_tpu.ops import quant
from scope_tpu.ops.common import wdot

ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=32, dtype="float32")


def test_wdot_matches_dequantized_matmul():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 16, 24)), jnp.float32)
    params = {"layers": {"wqkv": w, "wo": w, "w_gate": w, "w_up": w,
                         "w_down": w}}
    qp = quant.quantize_layer_weights(params)
    x = jnp.asarray(rng.normal(size=(5, 16)), jnp.float32)
    for l in range(3):
        p = {n: a[l] for n, a in qp["layers"].items()}
        got = wdot(x, p, "wqkv")
        wd = (p["wqkv"].astype(jnp.float32)
              * p["wqkv_scale"][None, :])
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(jnp.dot(x, wd)),
                                   rtol=1e-5, atol=1e-5)


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(2, 32, 48)), jnp.float32)
    qp = quant.quantize_layer_weights({"layers": {"wqkv": w, "wo": w,
                                                  "w_gate": w, "w_up": w,
                                                  "w_down": w}})
    deq = (qp["layers"]["wqkv"].astype(jnp.float32)
           * qp["layers"]["wqkv_scale"][:, None, :])
    err = np.abs(np.asarray(deq - w))
    step = np.asarray(qp["layers"]["wqkv_scale"])[:, None, :]
    assert (err <= 0.5 * step + 1e-7).all()


def test_wdot_bf16_passthrough_unchanged():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(8, 12)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(wdot(x, {"wo": w}, "wo"), np.float32),
        np.asarray(jnp.dot(x, w), np.float32))


@pytest.mark.parametrize("method,metric", [("h2o", "jump"),
                                           ("fullkv", "none")])
def test_generation_with_int8_weights_runs(method, metric):
    comp = CompressionConfig(method=method, decoding_metric=metric,
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    qparams = quant.quantize_layer_weights(params)
    assert qparams["layers"]["wqkv"].dtype == jnp.int8
    rng = np.random.default_rng(3)
    toks = np.zeros((1, 128), np.int32)
    toks[0, :100] = rng.integers(1, 512, 100)
    tl = jnp.array([100], jnp.int32)
    from scope_tpu.engine.generate import generate_scan
    gen_q, _ = generate_scan(TINY_LLAMA, comp, ECFG, qparams,
                             jnp.asarray(toks), tl, 16, -1)
    gen_f, _ = generate_scan(TINY_LLAMA, comp, ECFG, params,
                             jnp.asarray(toks), tl, 16, -1)
    gq, gf = np.asarray(gen_q), np.asarray(gen_f)
    assert np.isfinite(gq).all() and gq.shape == (1, 16)
    # Tiny random model: quantization noise may flip ties late in the
    # sequence, but the first tokens (sharpest logits) must agree.
    np.testing.assert_array_equal(gq[0, :4], gf[0, :4])


def _tied_spec():
    import dataclasses
    return dataclasses.replace(TINY_LLAMA, tie_word_embeddings=True)


def test_lm_head_t_bf16_exact():
    """Pre-materialized lm_head (bf16) gives bitwise-identical logits to
    the tied embed.T path."""
    spec = _tied_spec()
    params = llama.init_params(spec, jax.random.key(3), jnp.float32)
    assert "lm_head" not in params
    h = jnp.asarray(np.random.default_rng(4).normal(size=(3, 64)),
                    jnp.float32)
    ref = llama._lm_logits(spec, params, h)
    pt = quant.materialize_lm_head(params, int8=False)
    got = llama._lm_logits(spec, pt, h)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_lm_head_t_untied_noop():
    params = llama.init_params(TINY_LLAMA, jax.random.key(3), jnp.float32)
    assert quant.materialize_lm_head(params) is params


def test_lm_head_t_int8_close_and_scale_foldable():
    spec = _tied_spec()
    params = llama.init_params(spec, jax.random.key(5), jnp.float32)
    h = jnp.asarray(np.random.default_rng(6).normal(size=(3, 64)),
                    jnp.float32)
    ref = np.asarray(llama._lm_logits(spec, params, h))
    pt = quant.materialize_lm_head(params, int8=True)
    assert pt["lm_head_t"].dtype == jnp.int8
    got = np.asarray(llama._lm_logits(spec, pt, h))
    # Per-input-channel scales: error bounded by sum_e |h_e| * s_e / 2.
    bound = (np.abs(np.asarray(h))
             @ np.asarray(pt["lm_head_t_scale"])) * 0.5 + 1e-5
    assert (np.abs(got - ref) <= bound[:, None]).all()


def test_int8_weight_sharding_specs():
    from scope_tpu.parallel.sharding import param_pspecs
    params = llama.init_params(TINY_LLAMA, jax.random.key(1), jnp.float32)
    qparams = quant.quantize_layer_weights(params)
    specs = param_pspecs(qparams)
    for n in quant.WEIGHT_NAMES:
        assert n + "_scale" in specs["layers"]
