"""Compile the ring vs non-ring hot decode step on TPU and report where
the memory/copies go (optimized-HLO grep + memory analysis).  Run alone.
"""

from __future__ import annotations

import os
import re
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.ops import quant
    from bench import build_state

    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = quant.quantize_layer_weights(
        llama.init_params(spec, jax.random.key(0), jnp.bfloat16))
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=(7950 - 256) // (512 - 256), evict_per_qhead=False)

    for ring in (0, 64):
        ecfg = EngineConfig(
            max_prompt_len=2048, max_new_tokens=7950, dtype="bfloat16",
            uniform_lengths=True, kv_dtype="int8", decode_ring=ring)
        tok, tl, cache, state = build_state(spec, comp, ecfg, params,
                                            2048, batch=64)
        fn = jax.jit(partial(llama.decode_step, spec, comp, ecfg,
                             compress_mode="off"),
                     donate_argnums=(3,))
        lowered = fn.lower(params, tok, tl, cache, state)
        compiled = lowered.compile()
        try:
            ma = compiled.memory_analysis()
            log(f"[ring={ring}] mem: argsMB="
                f"{ma.argument_size_in_bytes/2**20:.0f} "
                f"outMB={ma.output_size_in_bytes/2**20:.0f} "
                f"tempMB={ma.temp_size_in_bytes/2**20:.0f} "
                f"aliasMB={ma.alias_size_in_bytes/2**20:.0f}")
        except Exception as e:
            log(f"[ring={ring}] memory_analysis failed: {e}")
        try:
            txt = compiled.as_text()
        except Exception as e:
            log(f"[ring={ring}] as_text failed: {e}")
            continue
        with open(f"/tmp/hlo_ring{ring}.txt", "w") as f:
            f.write(txt)
        ops = {}
        for line in txt.splitlines():
            m = re.match(
                r"\s*\S+ = \(?([a-z0-9]+)\[([\d,]+)\][^=]*? "
                r"([\w-]+)\(", line)
            if not m:
                continue
            dt, shape, op = m.groups()
            if op == "parameter":
                continue
            dims = [int(x) for x in shape.split(",") if x]
            size = np.prod(dims) * (1 if dt in ("s8", "u8", "pred") else
                                    2 if dt in ("bf16", "f16") else 4)
            if size >= 64 * 2**20:
                key = (op, dt, shape)
                ops[key] = ops.get(key, 0) + 1
        log(f"[ring={ring}] non-parameter ops producing >=64MB tensors:")
        for (op, dt, shape), cnt in sorted(ops.items()):
            log(f"    {cnt:3d} x {op} {dt}[{shape}]")

        # Time the hot step (steady state, no fires: compress_mode off).
        import time
        import jax as _jax
        s = 0
        for _ in range(4):
            logits, cache, state = fn(params, tok, tl + s, cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            s += 1
        _ = _jax.device_get(tok)
        times = []
        for _rep in range(2):
            t0 = time.perf_counter()
            for _ in range(32):
                logits, cache, state = fn(params, tok, tl + s, cache,
                                          state)
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                s += 1
            _ = _jax.device_get(tok)
            times.append((time.perf_counter() - t0) / 32)
        log(f"[ring={ring}] hot step: "
            f"{[f'{t*1e3:.2f}ms' for t in times]}")


if __name__ == "__main__":
    main()
