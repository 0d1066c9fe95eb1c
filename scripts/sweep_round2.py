"""Round-2 headline sweep: serving config (kvhead eviction) with the
staging ring + weight-only int8 + chunked dispatch + int4 KV, measured
with the exact bench.measure_decode methodology.  Run alone on the chip.

Usage: python scripts/sweep_round2.py [config_index ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, run_scope_only  # noqa: E402

# (batch, kv_dtype, ring, chunks).  Weights are ALWAYS int8-quantized
# once in main() (pre-quantizing frees the bf16 tree; passing
# weights_int8=True per-run would keep both trees alive and OOM).
CONFIGS = [
    (192, "int8", 64, ()),
    (256, "int8", 64, ()),
    (192, "int8", 64, (8,)),
    (256, "int4", 64, ()),
    (384, "int4", 64, ()),
    (128, "int8", 64, ()),
]


def main():
    import jax
    import jax.numpy as jnp
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)
    # Quantize ONCE and rebind so the bf16 weight tree is freed — keeping
    # both trees alive (2.5GB + 1.3GB) OOMs the b192 ring configs.
    from scope_tpu.ops import quant
    params = quant.quantize_layer_weights(params)

    picks = [int(a) for a in sys.argv[1:]] or range(len(CONFIGS))
    results = {}
    for i in picks:
        b, kv, ring, chunks = CONFIGS[i]
        tag = f"b{b}/{kv}/w8/ring={ring}/chunks={chunks}"
        try:
            tps = run_scope_only(spec, params, b, kv_dtype=kv,
                                 evict_per_qhead=False, weights_int8=False,
                                 ring=ring, chunks=chunks)
            results[tag] = tps
        except Exception as e:
            log(f"[{tag}] FAILED: {type(e).__name__}: {e}")
            results[tag] = None
    log("==== sweep results ====")
    for tag, tps in results.items():
        log(f"  {tag}: {tps if tps is None else f'{tps:.1f} tok/s'}")


if __name__ == "__main__":
    main()
