"""Serving-engine throughput on the real chip: pipeline depth A/B.

Measures END-TO-END engine throughput (admission prefills + decode +
token fetches + host scheduling) for the production config (h2o+jump,
per-KV-head eviction, int8 KV, int8 weights, staging ring, chunked hot
dispatch) — the number a deployment actually sees, unlike bench.py's
pure-decode loop.  Run alone: the chip is single-tenant.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--requests", type=int, default=96)
    ap.add_argument("--prompt", type=int, default=2048)
    ap.add_argument("--max_new", type=int, default=256)
    ap.add_argument("--depths", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--chunks", default="16,8,4,2")
    ap.add_argument("--ring", type=int, default=64)
    ap.add_argument("--kv_dtype", default="int8")
    ap.add_argument("--weight_dtype", default="int8")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.engine.serving import ServingEngine
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
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=(7950 - 256) // (512 - 256), evict_per_qhead=False)
    sizes = (() if args.chunks in ("", "none")
             else tuple(int(x) for x in args.chunks.split(",")))
    ecfg = EngineConfig(max_prompt_len=2048, max_new_tokens=7950,
                        dtype="bfloat16", kv_dtype=args.kv_dtype,
                        decode_chunk_sizes=sizes, decode_ring=args.ring)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, spec.vocab_size, args.prompt)
               .astype(np.int32) for _ in range(args.requests)]

    results = {}
    for depth in args.depths:
        eng = ServingEngine(spec, comp, ecfg, params,
                            max_slots=args.slots, pipeline_depth=depth)
        for p in prompts:
            eng.submit(p, args.max_new)
        t0 = time.perf_counter()
        res = eng.run()
        wall = time.perf_counter() - t0
        n_tok = sum(len(v) for v in res.values())
        tps = n_tok / wall
        results[depth] = tps
        log(f"[depth={depth} slots={args.slots} chunks={args.chunks} "
            f"ring={args.ring}] {n_tok} tokens in {wall:.1f}s = "
            f"{tps:.1f} tok/s (incl. prefills + compile on first run)")
    log("== summary ==")
    for depth, tps in sorted(results.items()):
        log(f"  depth={depth}: {tps:9.1f} tok/s")


if __name__ == "__main__":
    main()
