"""Measure eviction-rewrite primitives: gather variants + alive-mask ops.

The fire step's take_along_axis runs at ~4GB/s effective (latency-bound
row DMA: 105ms for k alone at b96, scripts/probe_force.py) — this probe
times the candidate replacements:

  base       take_along_axis, random indices        (the current rewrite)
  sorted     lax.gather with indices_are_sorted     (compaction pattern)
  rowshared  per-row indices shared across heads
  scatter    alive-mask update: zeros.at[topk_idx].set(True)
  threshold  alive-mask via score >= kth-value       (no scatter at all)

Run alone — the chip is single-tenant.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    B, Hc, cap, D, L = args.batch, 8, 2752, 64, 16
    blkW = 522
    length = 2700
    key = jax.random.key(1)
    log(f"B={B} Hc={Hc} cap={cap} blkW={blkW}")

    ck = jnp.zeros((L, B, Hc, cap, D), jnp.int8)
    src_np = np.sort(np.random.default_rng(0).integers(
        0, length, (B, Hc, blkW)), axis=-1).astype(np.int32)
    src_sorted = jnp.asarray(src_np)
    src_rand = jnp.asarray(
        np.random.default_rng(1).permutation(src_np, axis=-1)
        if hasattr(np.random.default_rng(1), "permutation")
        else src_np)
    topk_idx = jnp.asarray(np.random.default_rng(2).integers(
        0, length, (B, Hc, 266)).astype(np.int32))
    scores = jax.random.normal(key, (B, Hc, cap), jnp.float32)

    def timeit(name, fn, *a, reps=args.reps):
        out = fn(*a)
        _ = jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        small = [x for x in leaves if x.size < 1_000_000]
        _ = jax.device_get(small[0] if small else leaves[0][..., :1])
        dt = (time.perf_counter() - t0) / reps * 1e3
        log(f"  {name:32s} {dt:9.2f} ms")
        return dt

    def mk_gather(idx, sorted_flag):
        @jax.jit
        def f(ck):
            tot = jnp.zeros((), jnp.int32)
            for l in range(L):
                g = jnp.take_along_axis(
                    ck[l], idx[..., None], axis=2,
                    mode="clip")
                tot = tot + g[..., 0, 0].astype(jnp.int32).sum()
            return tot
        return f

    @jax.jit
    def gather_sorted_lax(ck):
        # lax.gather with indices_are_sorted: dims match take_along_axis
        # over axis 2 with a trailing full-D slice.
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(3,),
            collapsed_slice_dims=(2,),
            start_index_map=(2,),
            operand_batching_dims=(0, 1),
            start_indices_batching_dims=(0, 1))
        tot = jnp.zeros((), jnp.int32)
        for l in range(L):
            g = lax.gather(ck[l], src_sorted[..., None], dnums,
                           slice_sizes=(1, 1, 1, D),
                           indices_are_sorted=True, unique_indices=False,
                           mode=lax.GatherScatterMode.CLIP)
            tot = tot + g[..., 0, 0].astype(jnp.int32).sum()
        return tot

    @jax.jit
    def scatter_alive(alive):
        # Fire-step alive update: kill the region, resurrect the top-k.
        outs = []
        for l in range(L):
            a = alive[l]
            d = jnp.arange(cap)
            region = (d[None, None, :] >= 2048) & (d[None, None, :]
                                                   < length - 256)
            a = a & ~region
            b_ix = jnp.broadcast_to(jnp.arange(B)[:, None, None],
                                    topk_idx.shape)
            h_ix = jnp.broadcast_to(jnp.arange(Hc)[None, :, None],
                                    topk_idx.shape)
            a = a.at[b_ix, h_ix, topk_idx].set(True, mode="drop")
            outs.append(a[..., :1])
        return jnp.stack(outs)

    @jax.jit
    def threshold_alive(alive):
        # No scatter: keep = score >= kth largest (ties may overshoot).
        outs = []
        for l in range(L):
            vals = lax.top_k(scores, 266)[0]
            thr = vals[..., -1:]
            keep = scores >= thr
            d = jnp.arange(cap)
            region = (d[None, None, :] >= 2048) & (d[None, None, :]
                                                   < length - 256)
            a = jnp.where(region, keep, alive[l])
            outs.append(a[..., :1])
        return jnp.stack(outs)

    alive = jnp.ones((L, B, Hc, cap), bool)
    timeit("gather random idx", mk_gather(src_rand, False), ck)
    timeit("gather sorted idx (TAA)", mk_gather(src_sorted, False), ck)
    timeit("gather sorted idx (lax flag)", gather_sorted_lax, ck)
    timeit("scatter alive at topk", scatter_alive, alive)
    timeit("threshold alive (incl topk)", threshold_alive, alive)


if __name__ == "__main__":
    main()
