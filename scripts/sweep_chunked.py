"""A/B chunked hot-step dispatch vs per-step in the REAL decode loop.

Measures steady-state decode throughput of the serving config (h2o+jump,
per-KV-head eviction, int8 KV) with decode_chunk_sizes disabled vs
enabled, across batches.  Run alone — the chip is single-tenant.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, measure_decode  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 192])
    ap.add_argument("--kv_dtype", default="int8")
    ap.add_argument("--qhead", action="store_true")
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--chunks", nargs="+",
                    default=["none", "8,4,2", "16,8,4,2"],
                    help="comma-separated chunk-size lists; 'none' = "
                         "per-step dispatch")
    ap.add_argument("--weight_dtype", default="",
                    help="'int8' = weight-only int8 layer weights")
    ap.add_argument("--ring", type=int, default=0,
                    help="staging-ring size R (0 = off)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)
    if args.weight_dtype == "int8":
        from scope_tpu.ops import quant
        params = quant.quantize_layer_weights(params)
        log("layer weights quantized to int8 (per-output-channel)")
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=(7950 - 256) // (512 - 256), evict_per_qhead=args.qhead)

    results = {}
    for chunk_spec in args.chunks:
        sizes = (() if chunk_spec == "none"
                 else tuple(int(x) for x in chunk_spec.split(",")))
        for b in args.batches:
            ecfg = EngineConfig(
                max_prompt_len=2048, max_new_tokens=7950, dtype="bfloat16",
                uniform_lengths=True, kv_dtype=args.kv_dtype,
                decode_chunk_sizes=sizes, decode_ring=args.ring)
            try:
                tps = measure_decode(spec, comp, ecfg, params, 2048,
                                     steps=args.steps, batch=b)
                results[(chunk_spec, b)] = tps
                log(f"[chunks={chunk_spec} b={b} kv={args.kv_dtype} "
                    f"qhead={args.qhead}] {tps:.1f} tok/s")
            except Exception as e:
                log(f"[chunks={chunk_spec} b={b}] FAILED: {e}")
    log("== summary ==")
    for (cs, b), tps in sorted(results.items()):
        log(f"  chunks={cs:10s} b={b:4d}: {tps:9.1f} tok/s")


if __name__ == "__main__":
    main()
