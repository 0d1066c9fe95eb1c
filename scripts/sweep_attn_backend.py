"""A/B the decode-attention backend in the REAL decode step on TPU.

Compares steady-state decode throughput of the XLA einsum path vs the
fused pallas kernel (ops/pallas/decode_attn.py) at the serving config
(kvhead eviction + int8 KV), across batches.  Run alone — the chip is
single-tenant.
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
    ap.add_argument("--qhead", action="store_true",
                    help="parity mode (GQA-expanded cache) instead of "
                         "per-KV-head eviction")
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--backends", nargs="+",
                    default=["xla", "pallas", "pallas_ak"],
                    help="xla | pallas (fused attn kernel) | pallas_ak "
                         "(fused attn + in-place append kernel) | xla_ak "
                         "(XLA attention + in-place append kernel only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec

    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=(7950 - 256) // (512 - 256), evict_per_qhead=args.qhead)

    results = {}
    for backend in args.backends:
        for b in args.batches:
            ecfg = EngineConfig(
                max_prompt_len=2048, max_new_tokens=7950, dtype="bfloat16",
                uniform_lengths=True, kv_dtype=args.kv_dtype,
                attn_backend="xla" if backend == "xla" else "pallas",
                fused_decode_attention=backend.startswith("pallas"),
                append_kernel=backend.endswith("_ak"))
            # xla_ak: attn_backend must be "pallas" to enable the append
            # kernel gate, but fused attention stays off so attention runs
            # the XLA einsum path — isolates the append kernel's effect.
            try:
                tps = measure_decode(spec, comp, ecfg, params, 2048,
                                     steps=args.steps, batch=b)
                results[(backend, b)] = tps
                log(f"[{backend} b={b} kv={args.kv_dtype} "
                    f"qhead={args.qhead}] {tps:.1f} tok/s")
            except Exception as e:
                log(f"[{backend} b={b}] FAILED: {e}")
    log("== summary ==")
    for (backend, b), tps in sorted(results.items()):
        log(f"  {backend:8s} b={b:4d}: {tps:9.1f} tok/s "
            f"({tps / b * 1e3:.0f}us/tok-row)")


if __name__ == "__main__":
    main()
