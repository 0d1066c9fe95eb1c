"""8B batch push with int4 KV after the nibble-plane fix.

int4 decode now costs ~1.13x the int8 step (sweep_round4) at HALF the
cache bytes — at 8B shapes that headroom may buy a bigger batch than
int8's b24 and a net throughput win.  Run alone on the chip.

Usage: python scripts/probe_8b_batch.py [config_index ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import fake_params_int8, log, run_scope_only  # noqa: E402

CONFIGS = [
    (32, "int4"),
    (48, "int4"),
    (32, "int8"),
    (24, "int4"),
    # appended: b48 int4 won the first probe (1433.7 tok/s); push batch
    (64, "int4"),
    (56, "int4"),
    (96, "int4"),
    (60, "int4"),
    (62, "int4"),
]


def main():
    import jax
    from scope_tpu.models.registry import get_spec
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3-8b")
    params = fake_params_int8(spec)
    picks = [int(a) for a in sys.argv[1:]] or range(len(CONFIGS))
    for i in picks:
        b, kv = CONFIGS[i]
        log(f"=== 8B config {i}: b{b} kv={kv} lazy chunks=(16,8) ===")
        try:
            run_scope_only(spec, params, b, kv_dtype=kv,
                           evict_per_qhead=False, lazy=256,
                           chunks=(16, 8), prefill_batch=4)
        except Exception as e:
            import traceback
            log(f"8B config {i} failed: {type(e).__name__}: {e}")
            log(traceback.format_exc(limit=3))


if __name__ == "__main__":
    main()
