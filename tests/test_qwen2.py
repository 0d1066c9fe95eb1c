"""Qwen2 (qkv-bias) parity vs HF transformers.

Beyond-reference model family: the reference only patches Llama and
Mistral (monkeypatch.py:16-102); Qwen2 differs by fused-qkv bias
(Qwen2Attention hardcodes bias=True for q/k/v, bias=False for o_proj).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.engine.generate import generate_scan
from scope_tpu.models import llama
from scope_tpu.models.loader import (params_from_torch_model,
                                     spec_from_hf_config)
from scope_tpu.models.registry import TINY_QWEN2

S_PAD = 128
TRUE_LEN = 100
MAX_NEW = 12


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.Qwen2Config(
        vocab_size=TINY_QWEN2.vocab_size,
        hidden_size=TINY_QWEN2.hidden_size,
        intermediate_size=TINY_QWEN2.intermediate_size,
        num_hidden_layers=TINY_QWEN2.num_layers,
        num_attention_heads=TINY_QWEN2.num_heads,
        num_key_value_heads=TINY_QWEN2.num_kv_heads,
        head_dim=TINY_QWEN2.head_dim,
        rope_theta=TINY_QWEN2.rope_theta,
        rms_norm_eps=TINY_QWEN2.rms_norm_eps,
        max_position_embeddings=TINY_QWEN2.max_position_embeddings,
        tie_word_embeddings=False,
        use_sliding_window=False,
        attn_implementation="eager",
    )
    model = transformers.Qwen2ForCausalLM(cfg)
    # transformers zero-inits biases; randomize them so the bias path is
    # actually exercised by the parity checks below.
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0.0, 0.05)
    model.eval()
    return model


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(11)
    return rng.integers(1, TINY_QWEN2.vocab_size,
                        (1, TRUE_LEN)).astype(np.int64)


def test_spec_from_qwen2_config(hf_model):
    spec = spec_from_hf_config(hf_model.config.to_dict(), "tiny-qwen2")
    assert spec.arch == "qwen2"
    assert spec.attention_bias       # inferred from model_type
    assert spec.sliding_window is None  # use_sliding_window=False


def test_qwen2_bias_actually_loaded(hf_model):
    params = params_from_torch_model(TINY_QWEN2, hf_model, jnp.float32)
    b = params["layers"]["bqkv"]
    L = TINY_QWEN2.num_layers
    Hkv, D = TINY_QWEN2.num_kv_heads, TINY_QWEN2.head_dim
    G = TINY_QWEN2.num_kv_groups
    assert b.shape == (L, Hkv * (G + 2) * D)
    assert float(jnp.abs(b).max()) > 0   # HF inits biases nonzero? zeros ok
    # Check the grouping: reassemble q bias and compare against HF.
    sd = hf_model.state_dict()
    hf_bq = sd["model.layers.0.self_attn.q_proj.bias"].numpy()
    ours = np.asarray(b[0]).reshape(Hkv, G + 2, D)[:, :G].reshape(-1)
    np.testing.assert_allclose(ours, hf_bq, rtol=1e-6, atol=1e-6)


def test_qwen2_prefill_logits_match(hf_model, inputs):
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(inputs)).logits[0, -1].numpy()
    params = params_from_torch_model(TINY_QWEN2, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=MAX_NEW,
                        dtype="float32")
    comp = CompressionConfig(method="fullkv", decoding_metric="none")
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    logits, _, _ = llama.prefill(TINY_QWEN2, comp, ecfg, params,
                                 jnp.asarray(toks),
                                 jnp.array([TRUE_LEN], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits[0]), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_qwen2_greedy_token_parity(hf_model, inputs):
    with torch.no_grad():
        out = hf_model.generate(torch.from_numpy(inputs),
                                max_new_tokens=MAX_NEW, num_beams=1,
                                do_sample=False, min_new_tokens=MAX_NEW,
                                pad_token_id=0)
    hf_tokens = out[0, TRUE_LEN:].numpy()
    params = params_from_torch_model(TINY_QWEN2, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=MAX_NEW,
                        dtype="float32")
    comp = CompressionConfig(method="fullkv", decoding_metric="none")
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    gen, _ = generate_scan(TINY_QWEN2, comp, ecfg, params,
                           jnp.asarray(toks),
                           jnp.array([TRUE_LEN], jnp.int32), MAX_NEW,
                           eos_id=-1)
    np.testing.assert_array_equal(np.asarray(gen[0]), hf_tokens)


def test_qwen2_compression_methods_run(hf_model, inputs):
    params = params_from_torch_model(TINY_QWEN2, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=32,
                        dtype="float32")
    comp = CompressionConfig(method="h2o", decoding_metric="jump",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    tl = jnp.array([TRUE_LEN], jnp.int32)
    logits, cache, state = llama.prefill(TINY_QWEN2, comp, ecfg, params,
                                         jnp.asarray(toks), tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for s in range(20):
        logits, cache, state = llama.decode_step(TINY_QWEN2, comp, ecfg,
                                                 params, tok, tl + s, cache,
                                                 state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    assert np.isfinite(np.asarray(logits)).all()


def test_qwen2_int8_weights_keep_bias():
    """quantize_layer_weights must leave bqkv untouched and bias must be
    added AFTER the int8 scale (wdot scales the product, then qkv_flat
    adds the bias)."""
    import jax

    from scope_tpu.ops import quant

    params = llama.init_params(TINY_QWEN2, jax.random.key(0), jnp.float32)
    h = jax.random.normal(jax.random.key(1), (2, 3, TINY_QWEN2.hidden_size),
                          jnp.float32)
    p0 = {k: v[0] for k, v in params["layers"].items()}
    ref = llama.qkv_flat(p0, h)
    qp = quant.quantize_layer_weights(params)
    assert qp["layers"]["bqkv"].dtype == jnp.float32
    q0 = {k: v[0] for k, v in qp["layers"].items()}
    got = llama.qkv_flat(q0, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)
