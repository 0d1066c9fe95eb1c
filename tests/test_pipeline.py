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
