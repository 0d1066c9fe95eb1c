"""Test harness: force CPU with an 8-device virtual mesh so sharding tests
run without TPU hardware (SURVEY.md §4).

Note: in the axon-tunneled environment the JAX_PLATFORMS env var is ignored
by the plugin; ``jax.config.update`` is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

# Compile-heavy tests (>~5s each on CPU; ~10 of the suite's 14 minutes).
# Default runs skip them via ``-m "not slow"``; CI-green discipline means
# the FULL suite before committing engine/model changes.  Keyed by
# (file stem, test function) so parametrized cases inherit the marker.
_SLOW = {
    ("test_decode_kernel", "test_model_uses_fused_kernel_identically"),
    ("test_decode_kernel", "test_model_fused_int8_matches_xla_int8"),
    ("test_int4_kv", "test_int4_decode_close_to_fp"),
    ("test_int4_kv", "test_int4_serving_headline_matches_single_stream"),
    ("test_int4_kv", "test_int4_quest_decode_runs"),
    ("test_int4_kv", "test_int4_chunked_prefill_matches_monolithic"),
    ("test_int8_kv", "test_int8_decode_close_to_fp"),
    ("test_smoke", "test_kvhead_eviction_mode"),
    ("test_host_sched", "test_host_equals_device"),
    ("test_host_sched", "test_pyramidkv_layered_host_equals_device"),
    ("test_host_sched", "test_chunked_equals_per_step"),
    ("test_host_sched", "test_ring_equals_per_step"),
    ("test_host_sched", "test_ring_int8_kv_equals_direct"),
    ("test_serving", "test_serving_pipeline_depths_match"),
    ("test_serving", "test_serving_quest_matches_single_stream"),
    ("test_serving", "test_serving_chunked_decode_matches"),
    ("test_serving", "test_serving_ring_matches"),
    ("test_serving", "test_serving_chunked_admission_matches"),
    ("test_sharding", "test_sharded_generation_matches_single_device"),
    ("test_sharding", "test_sharded_serving_matches_unsharded"),
    ("test_sharding", "test_sharded_qkv_bias_matches_single_device"),
    ("test_sharding", "test_scaling_curve_harness_runs"),
    ("test_qwen2", "test_qwen2_compression_methods_run"),
    ("test_mistral", "test_mistral_compression_methods_run"),
    ("test_headwise", "test_headwise_with_decode_compression"),
    ("test_edge_numerics", "test_llama3_rope_scaling_matches_hf"),
    ("test_quest", "test_int8_quest_decode_close_to_fp"),
    ("test_quest_host", "test_quest_host_equals_device"),
    ("test_quest_host", "test_quest_chunked_equals_per_step"),
    ("test_serving", "test_serving_quest_chunked_dispatch_matches"),
    ("test_sampling", "test_serving_per_request_sampling"),
    ("test_pipeline", "test_pp_decode_matches_single_device"),
    ("test_pipeline", "test_pp_decode_with_h2o_jump_fire_matches_single_device"),
    ("test_pipeline", "test_pp_allkv_fire_uses_recorded_prompt_len"),
    ("test_serving", "test_serving_method_specific_metrics_match_single_stream"),
    ("test_lazy_evict", "test_lazy_matches_eager_tokens_and_live_counts"),
    ("test_lazy_evict", "test_lazy_compaction_mid_run"),
    ("test_elastic", "test_run_recovers_from_injected_failure"),
    ("test_serving", "test_serving_lazy_compaction_matches"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        stem = os.path.basename(item.fspath.strpath).rsplit(".", 1)[0] \
            if hasattr(item, "fspath") else ""
        name = item.name.split("[", 1)[0]
        if (stem, name) in _SLOW:
            item.add_marker(pytest.mark.slow)
