"""Decode-throughput scaling curve over a device mesh (BASELINE.md
north-star #3: tok/s at 1 chip / 1 host / N hosts).

For each chip count n in the ladder this builds a DP x TP mesh over the
first n devices, shards weights (heads over 'model') + the KV cache and
batch (over 'data'), and measures the SCOPE h2o+jump decode step.  On a
real multi-chip slice it prints the measured curve; this environment
exposes ONE physical chip, so the multi-chip rows are compile+execute
validated on a virtual CPU mesh instead (--virtual N, same code path
the driver's dryrun exercises) — the script is the harness, ready for
hardware.

Usage:
  python scripts/scaling_curve.py                 # real devices ladder
  python scripts/scaling_curve.py --virtual 8     # 8 virtual CPU devices
  python scripts/scaling_curve.py --spec llama-3-8b --batch-per-chip 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices (validation mode)")
    p.add_argument("--spec", type=str, default="llama-3.2-1b")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model shapes (fast validation)")
    p.add_argument("--tp", type=int, default=1,
                   help="model-axis (head) shard width; DP takes the "
                        "rest of each chip count")
    p.add_argument("--batch-per-chip", type=int, default=8,
                   help="DP batch rows per data-axis shard")
    p.add_argument("--prompt", type=int, default=2048)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args(argv)

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.virtual}").strip()
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import TINY_LLAMA, get_spec
    from scope_tpu.parallel.sharding import (make_mesh, shard_cache,
                                             shard_params)

    if args.tiny or args.virtual:
        spec = TINY_LLAMA
        comp = CompressionConfig(
            method="h2o", decoding_metric="jump", max_capacity_prompt=64,
            window_size=8, decoding_window_size=32,
            decoding_recent_size=16, delta=3, evict_per_qhead=False)
        ecfg = EngineConfig(max_prompt_len=128, max_new_tokens=64,
                            dtype="float32")
        prompt = 100
    else:
        spec = get_spec(args.spec)
        comp = CompressionConfig(
            method="h2o", decoding_metric="jump",
            max_capacity_prompt=2048, window_size=8,
            decoding_window_size=512, decoding_recent_size=256,
            delta=30, evict_per_qhead=False)
        ecfg = EngineConfig(max_prompt_len=2048, max_new_tokens=7950,
                            dtype=args.dtype, uniform_lengths=True)
        prompt = args.prompt

    devs = jax.devices()
    ladder = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    print(f"devices: {len(devs)} x {devs[0].platform}; ladder {ladder}")
    rows = []
    for n in ladder:
        # DP fills first: every added chip adds KV capacity AND batch
        # reach (decode is bandwidth-bound; TP splits heads without
        # growing the servable batch).  --tp forces a model-axis width
        # for configs whose weights+cache need head sharding.
        n_model = min(args.tp, spec.num_kv_heads, n)
        while n % n_model:
            n_model -= 1
        n_data = n // n_model
        mesh = make_mesh(n_data=n_data, n_model=n_model,
                         devices=devs[:n])
        batch = args.batch_per_chip * n_data if not args.virtual \
            else max(n_data, 2)
        params = shard_params(
            llama.init_params(spec, jax.random.key(0),
                              jnp.dtype(ecfg.dtype)), mesh)
        # Bounded-sub-batch prefill + cache tiling (bench.build_state):
        # a single full-batch prefill materializes the whole unsharded
        # cache before shard_cache and OOMs long before decode does
        # (CLAUDE.md).
        from bench import build_state
        tok, tl, cache, state = build_state(spec, comp, ecfg, params,
                                            prompt, batch=batch,
                                            prefill_batch=8)
        cache = shard_cache(cache, mesh)
        step = jax.jit(partial(llama.decode_step, spec, comp, ecfg),
                       donate_argnums=(3,))
        # Warm PAST the first jump fire (deterministic host mirror) —
        # a fire-free window overstates steady state and lets the
        # cond's fire branch compile mid-timing (CLAUDE.md).
        from scope_tpu.compression.host_sched import HostScheduler
        from scope_tpu.compression.schedulers import static_keep_cap
        sim = HostScheduler(comp, spec.num_layers, prompt,
                            min(comp.max_capacity_prompt, prompt),
                            static_keep_cap(comp, ecfg.max_new_tokens))
        ff = 0
        while ff < ecfg.max_new_tokens and not sim.plan_step().fire:
            ff += 1
        warm = min(ff + comp.delta + 2, ecfg.max_new_tokens - 1)
        steps = max(args.steps, 2 * comp.delta)
        for s in range(warm):
            logits, cache, state = step(params, tok, tl + s, cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        _ = jax.device_get(tok)
        t0 = time.perf_counter()
        for s in range(steps):
            logits, cache, state = step(params, tok, tl + warm + s,
                                        cache, state)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        _ = jax.device_get(tok)
        dt = time.perf_counter() - t0
        tps = batch * steps / dt
        rows.append((n, n_data, n_model, batch, tps))
        print(f"chips={n:3d} mesh={n_data}x{n_model} batch={batch:4d} "
              f"decode {tps:9.1f} tok/s  ({tps / n:8.1f} tok/s/chip)")
    print("\nchips,dp,tp,batch,tok_s")
    for r in rows:
        print(",".join(str(x) for x in r[:4]) + f",{r[4]:.1f}")


if __name__ == "__main__":
    main()
