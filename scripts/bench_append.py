"""Microbench: pallas in-place append kernel vs XLA dynamic_update_slice.

Measures just the append mechanism on realistic buffers (1B-scale cache),
inside a jitted step that also does a token of fake compute so timings
include realistic scheduling.  Run alone (single-tenant chip).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from scope_tpu.ops.pallas.append import append_tokens

    log(f"devices: {jax.devices()}")
    L, B, H, S, D = 16, args.batch, 32, 2688, 64
    key = jax.random.key(0)
    k = jax.random.normal(key, (L, B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (L, B, H, S, D), jnp.bfloat16)

    def run(name, fn):
        ck, cv = k + 0, v + 0   # fresh buffers (donation consumes them)
        ln = jnp.int32(100)
        tok = jax.random.normal(key, (L, B, H, 1, D), jnp.bfloat16)
        jfn = jax.jit(fn, donate_argnums=(0, 1))
        t0 = time.perf_counter()
        for _ in range(4):
            ck, cv, ln = jfn(ck, cv, tok, ln)
        _ = jax.device_get(ln)
        log(f"  [{name}] compile {time.perf_counter()-t0:.1f}s")
        times = []
        for _rep in range(2):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                ck, cv, ln = jfn(ck, cv, tok, ln)
            _ = jax.device_get(ln)
            times.append((time.perf_counter() - t0) / args.steps)
        log(f"[{name}] {[f'{t*1e6:.0f}us' for t in times]}")
        return max(times)

    def xla_per_layer(ck, cv, tok, ln):
        for l in range(L):
            start = (l, 0, 0, ln, 0)
            ck = lax.dynamic_update_slice(ck, tok[l][None], start)
            cv = lax.dynamic_update_slice(cv, tok[l][None], start)
        return ck, cv, ln + 1

    def xla_once(ck, cv, tok, ln):
        start = (0, 0, 0, ln, 0)
        ck = lax.dynamic_update_slice(ck, tok, start)
        cv = lax.dynamic_update_slice(cv, tok, start)
        return ck, cv, ln + 1

    def pallas_once(ck, cv, tok, ln):
        ck, cv = append_tokens(ck, cv, tok, tok, ln)
        return ck, cv, ln + 1

    def noop(ck, cv, tok, ln):
        return ck, cv, ln + 1

    r = {}
    r["noop"] = run("noop", noop)
    r["pallas"] = run("pallas", pallas_once)
    r["xla_once"] = run("xla_once", xla_once)
    r["xla_per_layer"] = run("xla_per_layer", xla_per_layer)
    log("== " + "  ".join(f"{k_}={v_*1e6:.0f}us" for k_, v_ in r.items()))


if __name__ == "__main__":
    main()
