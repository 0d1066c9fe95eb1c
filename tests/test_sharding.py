"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scope_tpu.config import CompressionConfig, EngineConfig, ModelSpec
from scope_tpu.models import llama
from scope_tpu.parallel.sharding import (MODEL_AXIS, cache_pspecs, make_mesh,
                                         param_pspecs, shard_cache,
                                         shard_params)

SPEC8 = ModelSpec(
    name="tiny-8h", vocab_size=512, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=8, num_kv_heads=8, head_dim=16,
    rope_theta=10000.0, rms_norm_eps=1e-5, max_position_embeddings=2048)

ECFG = EngineConfig(max_prompt_len=128, max_new_tokens=32, dtype="float32")


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=2, n_model=4)


def _setup(comp, batch=2, seed=0):
    params = llama.init_params(SPEC8, jax.random.key(seed), jnp.float32)
    rng = np.random.default_rng(seed)
    toks = jnp.asarray(rng.integers(0, 512, (batch, 128)), jnp.int32)
    tl = jnp.full((batch,), 100, jnp.int32)
    return params, toks, tl


@pytest.mark.parametrize("method,metric", [
    ("h2o", "fixed"), ("allkv", "jump"), ("snapkv", "linear")])
def test_sharded_generation_matches_single_device(mesh, method, metric):
    comp = CompressionConfig(
        method=method, decoding_metric=metric, max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3)
    params, toks, tl = _setup(comp)

    # Single-device reference run.
    logits, cache, state = llama.prefill(SPEC8, comp, ECFG, params, toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    ref_seq = [np.asarray(tok)]
    for s in range(10):
        logits, cache, state = llama.decode_step(SPEC8, comp, ECFG, params,
                                                 tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        ref_seq.append(np.asarray(tok))

    # Sharded run: params/cache placed over the (data, model) mesh.
    sp = shard_params(params, mesh)
    logits, cache, state = jax.jit(
        lambda p, t, l: llama.prefill(SPEC8, comp, ECFG, p, t, l))(sp, toks,
                                                                   tl)
    cache = shard_cache(cache, mesh)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    got_seq = [np.asarray(tok)]
    step = jax.jit(lambda p, t, v, c, s: llama.decode_step(
        SPEC8, comp, ECFG, p, t, v, c, s))
    for s in range(10):
        logits, cache, state = step(sp, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        got_seq.append(np.asarray(tok))

    np.testing.assert_array_equal(np.stack(ref_seq), np.stack(got_seq))


def test_sharded_qkv_bias_matches_single_device(mesh):
    """Qwen2-style fused qkv bias shards on the same F axis as wqkv and
    keeps sharded generation exactly equal to the single-device run."""
    spec = SPEC8.replace(name="tiny-8h-bias", attention_bias=True)
    comp = CompressionConfig(
        method="h2o", decoding_metric="fixed", max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3)
    params = llama.init_params(spec, jax.random.key(5), jnp.float32)
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(0, 512, (2, 128)), jnp.int32)
    tl = jnp.full((2,), 100, jnp.int32)

    logits, cache, state = llama.prefill(spec, comp, ECFG, params, toks, tl)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    ref_seq = [np.asarray(tok)]
    for s in range(8):
        logits, cache, state = llama.decode_step(spec, comp, ECFG, params,
                                                 tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        ref_seq.append(np.asarray(tok))

    sp = shard_params(params, mesh)
    group_w = (spec.num_kv_groups + 2) * spec.head_dim
    bshape = sp["layers"]["bqkv"].sharding.shard_shape(
        sp["layers"]["bqkv"].shape)
    assert bshape[-1] == spec.num_kv_heads // 4 * group_w
    logits, cache, state = jax.jit(
        lambda p, t, l: llama.prefill(spec, comp, ECFG, p, t, l))(sp, toks,
                                                                  tl)
    cache = shard_cache(cache, mesh)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    got_seq = [np.asarray(tok)]
    step = jax.jit(lambda p, t, v, c, s: llama.decode_step(
        spec, comp, ECFG, p, t, v, c, s))
    for s in range(8):
        logits, cache, state = step(sp, tok, tl + s, cache, state)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        got_seq.append(np.asarray(tok))
    np.testing.assert_array_equal(np.stack(ref_seq), np.stack(got_seq))


def test_param_sharding_layout(mesh):
    params = llama.init_params(SPEC8, jax.random.key(0), jnp.float32)
    sp = shard_params(params, mesh)
    # wqkv F axis split over 'model' (4-way): columns are grouped by kv
    # head, so each shard owns whole kv-head groups (local q/k/v split).
    shard_shape = sp["layers"]["wqkv"].sharding.shard_shape(
        sp["layers"]["wqkv"].shape)
    group_w = (SPEC8.num_kv_groups + 2) * SPEC8.head_dim
    assert shard_shape[-1] == SPEC8.num_kv_heads // 4 * group_w
    # norms replicated.
    assert sp["final_norm"].sharding.is_fully_replicated


def test_cache_sharding_layout(mesh):
    comp = CompressionConfig(method="h2o", decoding_metric="fixed",
                             max_capacity_prompt=64, window_size=8,
                             decoding_window_size=32,
                             decoding_recent_size=16, delta=3)
    params, toks, tl = _setup(comp)
    _, cache, _ = llama.prefill(SPEC8, comp, ECFG, params, toks, tl)
    sc = shard_cache(cache, mesh)
    shard_shape = sc.k.sharding.shard_shape(sc.k.shape)
    assert shard_shape[1] == 1          # batch 2 over data=2
    assert shard_shape[2] == 2          # 8 heads over model=4


def test_sharded_serving_matches_unsharded():
    """ServingEngine over a TP mesh (heads on 'model', slots replicated)
    produces exactly the single-device engine's tokens — admissions,
    pipelined fetches, ring flushes and fires included."""
    import dataclasses
    from scope_tpu.engine.serving import ServingEngine
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tp_mesh = make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3)
    ecfg = dataclasses.replace(ECFG, decode_ring=8,
                               decode_chunk_sizes=(4, 2))
    params = llama.init_params(SPEC8, jax.random.key(3), jnp.float32)
    rng = np.random.default_rng(17)
    prompts = [rng.integers(1, 512, n).astype(np.int32)
               for n in (100, 77, 120, 90)]

    def run(mesh):
        eng = ServingEngine(SPEC8, comp, ecfg, params, max_slots=2,
                            mesh=mesh)
        ids = [eng.submit(p, 12) for p in prompts]
        return ids, eng.run()

    ids_ref, res_ref = run(None)
    ids_tp, res_tp = run(tp_mesh)
    for rr, rt in zip(ids_ref, ids_tp):
        np.testing.assert_array_equal(np.array(res_ref[rr]),
                                      np.array(res_tp[rt]))


def test_dp_tp_serving_matches_unsharded():
    """ServingEngine over a 2x4 DP x TP mesh: the slot pool (cache batch
    dim) shards over 'data' and heads over 'model'; admissions write into
    data-sharded rows.  Tokens identical to the single-device engine."""
    import dataclasses
    from scope_tpu.engine.serving import ServingEngine
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=64,
        window_size=8, decoding_window_size=32, decoding_recent_size=16,
        delta=3)
    params = llama.init_params(SPEC8, jax.random.key(3), jnp.float32)
    rng = np.random.default_rng(19)
    prompts = [rng.integers(1, 512, n).astype(np.int32)
               for n in (100, 77, 120, 90, 88, 105)]

    def run(mesh_):
        eng = ServingEngine(SPEC8, comp, ECFG, params, max_slots=4,
                            mesh=mesh_)
        ids = [eng.submit(p, 12) for p in prompts]
        return ids, eng.run()

    ids_ref, res_ref = run(None)
    ids_dp, res_dp = run(mesh)
    for rr, rd in zip(ids_ref, ids_dp):
        np.testing.assert_array_equal(np.array(res_ref[rr]),
                                      np.array(res_dp[rd]))


def test_scaling_curve_harness_runs():
    """scripts/scaling_curve.py (BASELINE north-star #3 harness) must run
    its full chip ladder on the virtual mesh: mesh construction, DP x TP
    sharding, prefill + donated decode steps at every width."""
    import io
    import os
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import scaling_curve

    buf = io.StringIO()
    with redirect_stdout(buf):
        scaling_curve.main(["--tiny", "--steps", "2"])          # DP-first
        scaling_curve.main(["--tiny", "--steps", "2", "--tp", "2"])
    out = buf.getvalue()
    assert "chips=  1" in out and "chips=  8" in out
    assert "mesh=8x1" in out          # DP fills first by default
    assert "mesh=4x2" in out          # --tp carves the model axis
    assert "tok_s" in out
