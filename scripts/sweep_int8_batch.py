"""Sweep decode throughput over batch x kv_dtype on the real chip.

ROADMAP #1: int8 KV halves the cache, so larger serving batches fit HBM
(b32 scope cache ~ 8 x 0.35GB extra vs bf16).  Measures h2o+jump steady
state decode at each (batch, kv_dtype) and reports tok/s/chip.

Usage: python scripts/sweep_int8_batch.py [batches...]  (default 8 16 24 32)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import bench  # noqa: E402  (repo-root bench.py helpers)


def main():
    import jax
    import jax.numpy as jnp
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kvhead = "--kvhead" in sys.argv[1:]     # per-KV-head eviction mode
    dtypes = ([d.split("=", 1)[1].split(",")
               for d in sys.argv[1:] if d.startswith("--kv=")]
              or [["int8", "bfloat16"]])[0]
    batches = [int(a) for a in args] or [8, 16, 24, 32]
    bench.log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)

    results = {}
    for kv in dtypes:
        for b in batches:
            key = f"b{b}/{kv}" + ("/kvhead" if kvhead else "")
            try:
                tps = bench.run_scope_only(spec, params, b, kv_dtype=kv,
                                           evict_per_qhead=not kvhead)
                results[key] = round(tps, 1)
            except Exception as e:  # OOM etc.
                bench.log(f"{key} FAILED: {type(e).__name__}: {e}")
                results[key] = None
                break  # larger batches will also fail
    bench.log("==== sweep results (tok/s/chip) ====")
    for k, v in results.items():
        bench.log(f"  {k}: {v}")


if __name__ == "__main__":
    main()
