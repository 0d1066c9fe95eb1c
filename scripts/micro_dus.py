"""Micro-experiment: what does a DUS on a big buffer cost per step
(a) as one jitted call per step, (b) inside a lax.scan body, (c) writing
a small ring instead?  Isolates the runtime/XLA copy behavior that makes
cache appends expensive (see scripts/bisect_step.py).  Run alone.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    log(f"devices: {jax.devices()}")
    # ~1.1GB int8 buffer, the b64 serving-cache shape.
    shape = (16, 64, 8, 2688, 64)
    k = jnp.zeros(shape, jnp.int8)
    tok = jnp.ones((16, 64, 8, 1, 64), jnp.int8)

    def once(buf, ln):
        return lax.dynamic_update_slice(buf, tok, (0, 0, 0, ln, 0))

    @partial(jax.jit, donate_argnums=(0,))
    def step1(buf, ln):
        return once(buf, ln), ln + 1

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def stepn(buf, ln, n):
        def body(c, _):
            b, l = c
            return (once(b, l), l + 1), ()
        (buf, ln), _ = lax.scan(body, (buf, ln), None, length=n)
        return buf, ln

    ring = jnp.zeros((16, 64, 8, 64, 64), jnp.int8)

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def stepn_ring(rbuf, ln, n):
        def body(c, _):
            b, l = c
            b = lax.dynamic_update_slice(b, tok, (0, 0, 0, l % 64, 0))
            return (b, l + 1), ()
        (rbuf, ln), _ = lax.scan(body, (rbuf, ln), None, length=n)
        return rbuf, ln

    def bench(name, fn, state, reps=32):
        s, ln = state
        for _ in range(3):
            s, ln = fn(s, ln)
        _ = jax.device_get(ln)
        t0 = time.perf_counter()
        for _ in range(reps):
            s, ln = fn(s, ln)
        _ = jax.device_get(ln)
        dt = (time.perf_counter() - t0) / reps
        log(f"[{name}] {dt*1e3:.2f} ms/call")
        return dt

    ln0 = jnp.int32(128)
    bench("dus_per_call", step1, (k, ln0))
    k = jnp.zeros(shape, jnp.int8)
    d8 = bench("dus_scan8", partial(stepn, n=8), (k, ln0))
    log(f"  -> {d8*1e3/8:.2f} ms/step inside scan8")
    k = jnp.zeros(shape, jnp.int8)
    d32 = bench("dus_scan32", partial(stepn, n=32), (k, ln0), reps=8)
    log(f"  -> {d32*1e3/32:.2f} ms/step inside scan32")
    d8r = bench("ring_scan8", partial(stepn_ring, n=8), (ring, ln0))
    log(f"  -> {d8r*1e3/8:.2f} ms/step ring scan8")


if __name__ == "__main__":
    main()
