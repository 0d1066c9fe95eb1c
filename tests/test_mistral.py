"""Mistral sliding-window attention parity vs HF transformers."""

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
from scope_tpu.models.registry import TINY_MISTRAL

S_PAD = 128
TRUE_LEN = 100       # > sliding_window=64 so the window actually bites
MAX_NEW = 12


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.MistralConfig(
        vocab_size=TINY_MISTRAL.vocab_size,
        hidden_size=TINY_MISTRAL.hidden_size,
        intermediate_size=TINY_MISTRAL.intermediate_size,
        num_hidden_layers=TINY_MISTRAL.num_layers,
        num_attention_heads=TINY_MISTRAL.num_heads,
        num_key_value_heads=TINY_MISTRAL.num_kv_heads,
        head_dim=TINY_MISTRAL.head_dim,
        rope_theta=TINY_MISTRAL.rope_theta,
        rms_norm_eps=TINY_MISTRAL.rms_norm_eps,
        sliding_window=TINY_MISTRAL.sliding_window,
        max_position_embeddings=TINY_MISTRAL.max_position_embeddings,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = transformers.MistralForCausalLM(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(7)
    return rng.integers(1, TINY_MISTRAL.vocab_size,
                        (1, TRUE_LEN)).astype(np.int64)


def test_spec_from_mistral_config(hf_model):
    spec = spec_from_hf_config(hf_model.config.to_dict(), "tiny-mistral")
    assert spec.sliding_window == TINY_MISTRAL.sliding_window
    assert spec.arch == "mistral"


def test_mistral_prefill_logits_match(hf_model, inputs):
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(inputs)).logits[0, -1].numpy()
    params = params_from_torch_model(TINY_MISTRAL, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=MAX_NEW,
                        dtype="float32")
    comp = CompressionConfig(method="fullkv", decoding_metric="none")
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    logits, _, _ = llama.prefill(TINY_MISTRAL, comp, ecfg, params,
                                 jnp.asarray(toks),
                                 jnp.array([TRUE_LEN], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits[0]), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_mistral_greedy_token_parity(hf_model, inputs):
    with torch.no_grad():
        out = hf_model.generate(torch.from_numpy(inputs),
                                max_new_tokens=MAX_NEW, num_beams=1,
                                do_sample=False, min_new_tokens=MAX_NEW,
                                pad_token_id=0)
    hf_tokens = out[0, TRUE_LEN:].numpy()
    params = params_from_torch_model(TINY_MISTRAL, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=MAX_NEW,
                        dtype="float32")
    comp = CompressionConfig(method="fullkv", decoding_metric="none")
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    gen, _ = generate_scan(TINY_MISTRAL, comp, ecfg, params,
                           jnp.asarray(toks),
                           jnp.array([TRUE_LEN], jnp.int32), MAX_NEW,
                           eos_id=-1)
    np.testing.assert_array_equal(np.asarray(gen[0]), hf_tokens)


def test_sliding_window_actually_masks(hf_model, inputs):
    """Removing the window changes the logits (TRUE_LEN > window)."""
    params = params_from_torch_model(TINY_MISTRAL, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=MAX_NEW,
                        dtype="float32")
    comp = CompressionConfig(method="fullkv", decoding_metric="none")
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    tl = jnp.array([TRUE_LEN], jnp.int32)
    logits_win, _, _ = llama.prefill(TINY_MISTRAL, comp, ecfg, params,
                                     jnp.asarray(toks), tl)
    no_win = TINY_MISTRAL.replace(sliding_window=None, name="nw")
    logits_nw, _, _ = llama.prefill(no_win, comp, ecfg, params,
                                    jnp.asarray(toks), tl)
    assert not np.allclose(np.asarray(logits_win), np.asarray(logits_nw),
                           atol=1e-5)


def test_mistral_compression_methods_run(hf_model, inputs):
    params = params_from_torch_model(TINY_MISTRAL, hf_model, jnp.float32)
    ecfg = EngineConfig(max_prompt_len=S_PAD, max_new_tokens=32,
                        dtype="float32")
    comp = CompressionConfig(method="snapkv", decoding_metric="jump",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    toks = np.zeros((1, S_PAD), np.int32)
    toks[0, :TRUE_LEN] = inputs[0]
    tl = jnp.array([TRUE_LEN], jnp.int32)
    logits, cache, state = llama.prefill(TINY_MISTRAL, comp, ecfg, params,
                                         jnp.asarray(toks), tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for s in range(20):
        logits, cache, state = llama.decode_step(TINY_MISTRAL, comp, ecfg,
                                                 params, tok, tl + s, cache,
                                                 state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    assert np.isfinite(np.asarray(logits)).all()


def test_mistral_decode_window_parity_flag():
    """comp.mistral_window_parity reproduces the reference's decode-phase
    positional cache slicing (mistral_model.py:246-269): once the virtual
    length exceeds the window, the cache is pinned to the last window-1
    physical slots (+1 appended) each step, regardless of compression."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import TINY_MISTRAL

    # Window (40) below the steady compressed size (P+W = 48) so the
    # positional slicing actually bites during decode.
    spec = TINY_MISTRAL.replace(sliding_window=40)
    comp = CompressionConfig(
        method="h2o", decoding_metric="fixed", max_capacity_prompt=32,
        window_size=8, decoding_window_size=16, decoding_recent_size=8,
        delta=3, mistral_window_parity=True)
    ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=48,
                        dtype="float32")
    params = llama.init_params(spec, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 512, (1, 128)), jnp.int32)
    tl = jnp.full((1,), 40, jnp.int32)

    logits, cache, state = llama.prefill(spec, comp, ecfg, params, toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    lengths = []
    for s in range(24):
        logits, cache, state = llama.decode_step(
            spec, comp, ecfg, params, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        lengths.append(int(cache.length[0, 0]))
        assert np.isfinite(np.asarray(logits)).all()
    # Parity mode pins the post-append length at the window; the
    # un-sliced run grows to the compressed steady state P+W = 48.
    assert max(lengths) <= spec.sliding_window
    assert lengths[-1] == spec.sliding_window

    comp_off = comp.replace(mistral_window_parity=False)
    logits, cache, state = llama.prefill(spec, comp_off, ecfg, params,
                                         toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for s in range(24):
        logits, cache, state = llama.decode_step(
            spec, comp_off, ecfg, params, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    assert int(cache.length[0, 0]) > spec.sliding_window
