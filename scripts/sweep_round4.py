"""Round-4 sweep: packed-int4 KV after the nibble-plane einsum fix.

Round 3 measured int4 decode at 52.6ms/step at b192 (unpack-concat
defeated operand fusion); quant.qk_einsum/pv_einsum contract per nibble
plane and measured 29.8ms/step (6413 tok/s) — 1.13x the int8 step time
at HALF the cache bytes.  This sweep probes whether the reclaimed HBM
buys throughput at bigger batches (int4's capacity lever turning into
a speed lever).  Run alone on the chip.

Usage: python scripts/sweep_round4.py [config_index ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, run_scope_only  # noqa: E402

# (batch, kv_dtype, ring, chunks, lazy_slack)
CONFIGS = [
    (256, "int4", 0, (16, 8), 256),     # 0: batch push with int4 room
    (320, "int4", 0, (16, 8), 256),     # 1
    (384, "int4", 0, (16, 8), 256),     # 2: 2x the int8 knee
    (224, "int4", 0, (16, 8), 256),     # 3: knee fine-scan
    (256, "int8", 0, (16, 8), 256),     # 4: int8 control at b256
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
    for i in picks:
        b, kv, ring, chunks, lazy = CONFIGS[i]
        log(f"=== config {i}: b{b} kv={kv} ring={ring} chunks={chunks} "
            f"lazy={lazy} ===")
        try:
            run_scope_only(spec, params, b, kv_dtype=kv, ring=ring,
                           chunks=chunks, lazy=lazy,
                           evict_per_qhead=False, weights_int8=False)
        except Exception as e:
            import traceback
            log(f"config {i} failed: {type(e).__name__}: {e}")
            log(traceback.format_exc(limit=3))


if __name__ == "__main__":
    main()
