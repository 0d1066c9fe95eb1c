"""Per-step wall times across a full fire cycle in ring vs non-ring
host-scheduled decode (b64, kvhead, int8 kv, int8 weights).  Run alone."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_state, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.engine.host_loop import HostScheduledDecoder
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.ops import quant

    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = quant.quantize_layer_weights(
        llama.init_params(spec, jax.random.key(0), jnp.bfloat16))
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=(7950 - 256) // (512 - 256), evict_per_qhead=False)

    for ring in (64, 0):
        ecfg = EngineConfig(
            max_prompt_len=2048, max_new_tokens=7950, dtype="bfloat16",
            uniform_lengths=True, kv_dtype="int8", decode_ring=ring)
        tok, tl, cache, state = build_state(spec, comp, ecfg, params,
                                            2048, batch=64)
        dec = HostScheduledDecoder(spec, comp, ecfg)
        sched = dec.new_scheduler(2048)
        s = 0
        # Warm every program: run 2*delta steps.
        for _ in range(64):
            logits, cache, state = dec.step(sched, params, tok, tl + s,
                                            cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            s += 1
        _ = jax.device_get(tok)
        times = []
        for i in range(40):
            t0 = time.perf_counter()
            logits, cache, state = dec.step(sched, params, tok, tl + s,
                                            cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            _ = jax.device_get(tok)        # sync EVERY step
            times.append(time.perf_counter() - t0)
            s += 1
        ms = [f"{t*1e3:.1f}" for t in times]
        log(f"[ring={ring}] per-step ms: {ms}")
        log(f"[ring={ring}] mean {np.mean(times)*1e3:.2f} "
            f"max {np.max(times)*1e3:.1f} "
            f"min {np.min(times)*1e3:.2f}")


if __name__ == "__main__":
    main()
