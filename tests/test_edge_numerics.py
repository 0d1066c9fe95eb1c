"""Edge coverage: llama3 rope scaling vs HF, bf16 path, eos handling."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig, ModelSpec
from scope_tpu.engine.generate import generate_scan
from scope_tpu.models import llama
from scope_tpu.models.loader import params_from_torch_model
from scope_tpu.models.registry import TINY_LLAMA

SCALED = ModelSpec(
    name="tiny-llama31", vocab_size=512, hidden_size=64,
    intermediate_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, rope_theta=10000.0, rms_norm_eps=1e-5,
    max_position_embeddings=4096, rope_scaling=(8.0, 1.0, 4.0, 128))


def test_llama3_rope_scaling_matches_hf():
    """Llama-3.1-style rope scaling (ops/common.rope_inv_freq) vs HF."""
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=4096,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 128},
        tie_word_embeddings=False, attn_implementation="eager")
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    rng = np.random.default_rng(0)
    # Long enough that low/medium/high-frequency bands all matter.
    ids = rng.integers(1, 512, (1, 300)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits[0, -1].numpy()

    params = params_from_torch_model(SCALED, model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=384, max_new_tokens=8,
                        dtype="float32")
    comp = CompressionConfig(method="fullkv", decoding_metric="none")
    toks = np.zeros((1, 384), np.int32)
    toks[0, :300] = ids[0]
    logits, _, _ = llama.prefill(SCALED, comp, ecfg, params,
                                 jnp.asarray(toks),
                                 jnp.array([300], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits[0]), hf_logits,
                               rtol=5e-4, atol=5e-4)


def test_bf16_generation_finite_and_close_to_f32():
    params32 = llama.init_params(TINY_LLAMA, jax.random.key(0),
                                 jnp.float32)
    params16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params32)
    comp = CompressionConfig(method="h2o", decoding_metric="jump",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, 512, (1, 128)), jnp.int32)
    tl = jnp.array([100], jnp.int32)
    outs = {}
    for dtype, params in (("float32", params32), ("bfloat16", params16)):
        ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=24,
                            dtype=dtype)
        gen, _ = generate_scan(TINY_LLAMA, comp, ecfg, params, toks, tl,
                               24, -1)
        outs[dtype] = np.asarray(gen[0])
    # bf16 vs f32 greedy paths can diverge after a while on a random
    # model; require agreement on an early prefix and finiteness.
    assert (outs["float32"][:4] == outs["bfloat16"][:4]).all()


def test_generate_scan_eos_stops():
    """After eos the output is padded with eos and done_step records it."""
    params = llama.init_params(TINY_LLAMA, jax.random.key(2), jnp.float32)
    comp = CompressionConfig(method="fullkv", decoding_metric="none")
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=16,
                        dtype="float32")
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(1, 512, (1, 128)), jnp.int32)
    tl = jnp.array([64], jnp.int32)
    gen, done = generate_scan(TINY_LLAMA, comp, ecfg, params, toks, tl,
                              16, -1)
    # Re-run with the 3rd generated token declared as eos.
    eos = int(np.asarray(gen)[0, 2])
    gen2, done2 = generate_scan(TINY_LLAMA, comp, ecfg, params, toks, tl,
                                16, eos)
    g = np.asarray(gen2)[0]
    d = int(done2[0])
    assert d == 3
    assert (g[3:] == eos).all()          # padded after stopping
    np.testing.assert_array_equal(g[:3], np.asarray(gen)[0, :3])
