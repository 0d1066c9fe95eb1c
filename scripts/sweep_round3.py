"""Round-3 headline sweep: lazy (tombstone) eviction at serving shapes.

Fires cost ~675ms at b192 in eager mode (latency-bound row-DMA gather,
scripts/probe_gather.py); lazy_evict replaces them with an alive-mask
update + amortized compaction.  Measured with the exact
bench.measure_decode methodology (fire-inclusive, warmed past the first
wave).  Weights are int8-quantized once.  Run alone on the chip.

Usage: python scripts/sweep_round3.py [config_index ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, run_scope_only  # noqa: E402

# (batch, kv_dtype, ring, chunks, lazy_slack)
CONFIGS = [
    (192, "int8", 0, (), 256),          # 0: lazy headline candidate
    (192, "int8", 0, (8,), 256),        # 1: + chunked dispatch
    (192, "int8", 0, (), 0),            # 2: eager control (r2 headline+w8)
    (160, "int8", 0, (), 256),          # 3: smaller-batch fallback
    (192, "int8", 64, (), 256),         # 4: + staging ring
    (128, "int8", 0, (8,), 256),        # 5
    (256, "int4", 0, (), 256),          # 6: int4 at scale
    (224, "int8", 0, (), 256),          # 7: push batch under lazy
    (384, "int4", 0, (), 256),          # 8
    (192, "int8", 64, (8,), 256),       # 9: ring + chunks + lazy
    (160, "int8", 64, (), 256),         # 10: ring at reduced batch
    (128, "int8", 64, (), 256),         # 11
    (160, "int8", 0, (), 256),          # 12: no-ring control at b160
    (192, "int8", 0, (16, 8), 256),     # 13: deeper in-chunk staging
    (192, "int8", 0, (24, 16, 8), 256), # 14: chunk ~ fire period
    (224, "int8", 0, (16, 8), 256),     # 15: knee recheck with staging
    (192, "int8", 0, (32, 16, 8), 256), # 16: even deeper staging
    (192, "int4", 0, (16, 8), 256),     # 17: int4 KV + staged chunks
    (256, "int8", 0, (16, 8), 256),     # 18: batch push with staging
    (160, "int8", 0, (16, 8), 256),     # 19: knee recheck (down)
]


def main():
    import jax
    import jax.numpy as jnp
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.ops import quant
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = quant.quantize_layer_weights(
        llama.init_params(spec, jax.random.key(0), jnp.bfloat16))

    picks = [int(a) for a in sys.argv[1:]] or range(len(CONFIGS))
    results = {}
    for i in picks:
        b, kv, ring, chunks, lazy = CONFIGS[i]
        tag = f"b{b}/{kv}/w8/ring={ring}/chunks={chunks}/lazy={lazy}"
        try:
            tps = run_scope_only(spec, params, b, kv_dtype=kv,
                                 evict_per_qhead=False, weights_int8=False,
                                 ring=ring, chunks=chunks, lazy=lazy)
            results[tag] = tps
        except Exception as e:
            log(f"[{tag}] FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:200]}")
            results[tag] = None
    log("==== sweep results ====")
    for tag, tps in results.items():
        log(f"  {tag}: {tps if tps is None else f'{tps:.1f} tok/s'}")


if __name__ == "__main__":
    main()
