"""Numerics parity vs HuggingFace transformers (torch CPU oracle).

SURVEY.md §7 step 1 exit test: full-cache (no compression) generation must
match the reference runtime token-for-token under greedy decoding.  The
reference's runtime *is* HF transformers (run_longgenbench.py:231-242), so
agreement with a random-weight HF Llama is the strongest single-chip
correctness signal available without model weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig
from scope_tpu.engine.generate import generate_scan
from scope_tpu.models import llama
from scope_tpu.models.loader import params_from_torch_model, spec_from_hf_config
from scope_tpu.models.registry import TINY_LLAMA

S_PAD = 64
TRUE_LEN = 33
MAX_NEW = 24


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=TINY_LLAMA.vocab_size,
        hidden_size=TINY_LLAMA.hidden_size,
        intermediate_size=TINY_LLAMA.intermediate_size,
        num_hidden_layers=TINY_LLAMA.num_layers,
        num_attention_heads=TINY_LLAMA.num_heads,
        num_key_value_heads=TINY_LLAMA.num_kv_heads,
        rope_theta=TINY_LLAMA.rope_theta,
        rms_norm_eps=TINY_LLAMA.rms_norm_eps,
        max_position_embeddings=TINY_LLAMA.max_position_embeddings,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(42)
    toks = rng.integers(1, TINY_LLAMA.vocab_size, (1, TRUE_LEN))
    return toks.astype(np.int64)


def test_spec_from_hf_config(hf_model):
    spec = spec_from_hf_config(hf_model.config.to_dict(), "tiny")
    assert spec.num_layers == TINY_LLAMA.num_layers
    assert spec.num_kv_heads == TINY_LLAMA.num_kv_heads
    assert spec.head_dim == TINY_LLAMA.head_dim


def test_prefill_logits_match(hf_model, inputs):
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(inputs)).logits[0, -1].numpy()

    params = params_from_torch_model(TINY_LLAMA, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=MAX_NEW,
                        dtype="float32")
    comp = CompressionConfig(method="fullkv", decoding_metric="none")
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    logits, cache, _ = llama.prefill(
        TINY_LLAMA, comp, ecfg, params, jnp.asarray(toks),
        jnp.array([TRUE_LEN], jnp.int32))
    ours = np.asarray(logits[0])
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("method", ["fullkv", "allkv"])
def test_greedy_generation_token_parity(hf_model, inputs, method):
    with torch.no_grad():
        out = hf_model.generate(
            torch.from_numpy(inputs), max_new_tokens=MAX_NEW,
            num_beams=1, do_sample=False,
            min_new_tokens=MAX_NEW,  # disable early eos for determinism
            pad_token_id=0)
    hf_tokens = out[0, TRUE_LEN:].numpy()

    params = params_from_torch_model(TINY_LLAMA, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=MAX_NEW,
                        dtype="float32")
    comp = CompressionConfig(method=method, decoding_metric="none")
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    gen, _ = generate_scan(TINY_LLAMA, comp, ecfg, params,
                           jnp.asarray(toks),
                           jnp.array([TRUE_LEN], jnp.int32),
                           MAX_NEW, eos_id=-1)
    ours = np.asarray(gen[0])
    np.testing.assert_array_equal(ours, hf_tokens)


def test_gqa_expansion_matches_hf_semantics(hf_model, inputs):
    """Parity-mode cache (expanded heads) and kv-head mode produce the same
    attention output when no eviction fires."""
    params = params_from_torch_model(TINY_LLAMA, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=MAX_NEW,
                        dtype="float32")
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    outs = []
    for per_q in (True, False):
        comp = CompressionConfig(method="fullkv", decoding_metric="none",
                                 evict_per_qhead=per_q)
        gen, _ = generate_scan(TINY_LLAMA, comp, ecfg, params,
                               jnp.asarray(toks),
                               jnp.array([TRUE_LEN], jnp.int32),
                               MAX_NEW, eos_id=-1)
        outs.append(np.asarray(gen[0]))
    np.testing.assert_array_equal(outs[0], outs[1])
