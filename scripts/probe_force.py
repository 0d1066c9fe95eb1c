"""Decompose the fire (force) step cost at serving shapes.

BENCH_r02/probe_fire_cost measured ~675ms per fire at b192/int8/kvhead —
~40% of steady-state throughput at delta=30.  This times each candidate
mechanism as its own jitted program on realistic buffers:

  probs     per-layer decode attention probs materialization  [B,H,S] f32
  topk      lax.top_k(keep_cap) over masked scores            x L layers
  approx    lax.approx_max_k same shapes
  gather    take_along_axis of the keep block                 x L layers
  dus       block write-back dynamic_update_slice             x L layers
  force     the real decode_step(compress_mode="force")
  hot       the real decode_step(compress_mode="off") at full bucket
  flush     cache.flush_ring on ring=64 buffers

Timing: chained async dispatches ending in ONE device_get (CLAUDE.md).
Run alone — the chip is single-tenant.
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
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--ring", type=int, default=0)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from scope_tpu.cache import init_cache, flush_ring
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.ops import quant
    from scope_tpu.ops.attention import NEG_INF
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = quant.quantize_layer_weights(
        llama.init_params(spec, jax.random.key(0), jnp.bfloat16))
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=30, evict_per_qhead=False)
    ecfg = EngineConfig(max_prompt_len=2048, max_new_tokens=7950,
                        dtype="bfloat16", uniform_lengths=True,
                        kv_dtype="int8", decode_ring=args.ring)
    st = llama.derive_statics(spec, comp, ecfg)
    cap = st.capacity
    B = args.batch
    L, D = spec.num_layers, spec.head_dim
    Hc = st.cache_heads
    G = spec.num_kv_groups
    keep_cap = min(st.caps.keep_cap, cap)
    r = comp.decoding_recent_size
    blkW = min(keep_cap + r, cap)
    length = 2700
    log(f"B={B} Hc={Hc} cap={cap} keep_cap={keep_cap} blkW={blkW} "
        f"length={length}")

    key = jax.random.key(1)

    def fresh_cache():
        # Build arrays directly — init_cache's zero buffers + the randint
        # outputs coexisting is itself enough to OOM HBM at these shapes.
        from scope_tpu.cache import KVCache
        # Zeros-filled: jnp.tile/randint outputs get 2x-PADDED layouts at
        # D=64 (measured: probe dumps showed s8[..,64] at 2.0x expansion)
        # while jnp.zeros buffers read at unpadded speed
        # (scripts/probe_layout.py).  Gather/DUS timing is value-
        # independent; top_k on uniform scores is measured separately.
        kk = jnp.zeros((L, B, Hc, cap, D), jnp.int8)
        vv = jnp.zeros((L, B, Hc, cap, D), jnp.int8)
        sshape = (L, B, Hc, D)
        return KVCache(
            k=kk, v=vv,
            length=jnp.full((L, B), length, jnp.int32),
            pvalid=jnp.zeros((L, B, Hc), jnp.int32),
            prompt_len=jnp.full((B,), 2048, jnp.int32),
            k_scale=jnp.ones(sshape, jnp.float32),
            v_scale=jnp.ones(sshape, jnp.float32),
            ring_k=(jnp.zeros((L, B, Hc, args.ring, D), jnp.int8)
                    if args.ring else None),
            ring_v=(jnp.zeros((L, B, Hc, args.ring, D), jnp.int8)
                    if args.ring else None),
            ring_fill=(jnp.asarray(args.ring, jnp.int32)
                       if args.ring else None))

    def timeit(name, fn, *a, reps=args.reps, donate_idx=None):
        """fn must return something small or the cache (refed freshly)."""
        out = fn(*a)
        _ = jax.block_until_ready(out)
        outs = []
        t0 = time.perf_counter()
        for _ in range(reps):
            outs = fn(*a)
        leaves = jax.tree_util.tree_leaves(outs)
        small = [x for x in leaves if x.size < 1_000_000]
        _ = jax.device_get(small[0] if small else leaves[0][..., :1])
        dt = (time.perf_counter() - t0) / reps * 1e3
        log(f"  {name:28s} {dt:9.2f} ms")
        return dt

    # --- raw-piece programs (operate on the stacked cache, return small)
    q = jax.random.normal(key, (B, Hc, G, D), jnp.bfloat16)

    @jax.jit
    def probs_only(ck):
        tot = jnp.zeros((), jnp.float32)
        for l in range(L):
            logits = jnp.einsum("bhgd,bhsd->bhgs", q,
                                ck[l].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits, axis=-1).sum(axis=2)   # [B,H,S]
            tot = tot + p.sum()
        return tot

    def mk_scores(ck, l):
        logits = jnp.einsum("bhgd,bhsd->bhgs", q,
                            ck[l].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        return jax.nn.softmax(logits, axis=-1).sum(axis=2)

    @jax.jit
    def topk_only(ck):
        tot = jnp.zeros((), jnp.int32)
        for l in range(L):
            sc = mk_scores(ck, l)
            idx = lax.top_k(sc, keep_cap)[1]
            tot = tot + idx[..., 0].sum()
        return tot

    @jax.jit
    def approx_only(ck):
        tot = jnp.zeros((), jnp.int32)
        for l in range(L):
            sc = mk_scores(ck, l)
            _, idx = lax.approx_max_k(sc, keep_cap)
            tot = tot + idx[..., 0].sum()
        return tot

    src0 = jax.random.randint(key, (B, Hc, blkW), 0, length)

    @jax.jit
    def gather_only(ck, cv):
        tot = jnp.zeros((), jnp.int32)
        for l in range(L):
            kblk = jnp.take_along_axis(ck[l], src0[..., None], axis=2)
            vblk = jnp.take_along_axis(cv[l], src0[..., None], axis=2)
            tot = tot + kblk[..., 0, 0].astype(jnp.int32).sum() \
                + vblk[..., 0, 0].astype(jnp.int32).sum()
        return tot

    @jax.jit
    def gather_k_only(ck):
        tot = jnp.zeros((), jnp.int32)
        for l in range(L):
            kblk = jnp.take_along_axis(ck[l], src0[..., None], axis=2)
            tot = tot + kblk[..., 0, 0].astype(jnp.int32).sum()
        return tot

    @jax.jit
    def gather_bf16(ck):
        tot = jnp.zeros((), jnp.float32)
        for l in range(L):
            kb = ck[l].astype(jnp.bfloat16)
            kblk = jnp.take_along_axis(kb, src0[..., None], axis=2)
            tot = tot + kblk[..., 0, 0].astype(jnp.float32).sum()
        return tot

    src_row = src0[:, :1]                       # per-ROW shared indices

    @jax.jit
    def gather_rowshared(ck):
        tot = jnp.zeros((), jnp.int32)
        for l in range(L):
            kblk = jnp.take_along_axis(
                ck[l], jnp.broadcast_to(src_row, (B, Hc, blkW))[..., None],
                axis=2)
            tot = tot + kblk[..., 0, 0].astype(jnp.int32).sum()
        return tot

    @jax.jit
    def gather_onehot(ck):
        # dest = onehot(src) @ cache as an MXU dot, chunked over blkW.
        tot = jnp.zeros((), jnp.float32)
        CH = 128
        for l in range(L):
            kb = ck[l].astype(jnp.bfloat16)
            for c0 in range(0, blkW, CH):
                oh = jax.nn.one_hot(src0[:, :, c0:c0 + CH], cap,
                                    dtype=jnp.bfloat16)     # [B,H,CH,S]
                blk = jnp.einsum("bhcs,bhsd->bhcd", oh, kb)
                tot = tot + blk[..., 0, 0].astype(jnp.float32).sum()
        return tot

    @partial(jax.jit, donate_argnums=(0, 1))
    def dus_only(ck, cv, kblk, vblk):
        for l in range(L):
            ck = lax.dynamic_update_slice(ck, kblk[None, :, :, :],
                                          (l, 0, 0, 2048, 0))
            cv = lax.dynamic_update_slice(cv, vblk[None, :, :, :],
                                          (l, 0, 0, 2048, 0))
        return ck, cv

    @partial(jax.jit, donate_argnums=(0, 1))
    def gather_dus(ck, cv):
        for l in range(L):
            kblk = jnp.take_along_axis(ck[l], src0[..., None], axis=2)
            vblk = jnp.take_along_axis(cv[l], src0[..., None], axis=2)
            ck = lax.dynamic_update_slice(ck, kblk[None], (l, 0, 0, 2048, 0))
            cv = lax.dynamic_update_slice(cv, vblk[None], (l, 0, 0, 2048, 0))
        return ck, cv

    c = fresh_cache()
    sections = (args.only.split(",") if args.only else
                ["probs", "topk", "approx", "gathers", "dus", "steps"])
    if "probs" in sections:
        timeit("probs (L layers)", probs_only, c.k)
    if "topk" in sections:
        timeit("probs+topk", topk_only, c.k)
    if "approx" in sections:
        timeit("probs+approx_max_k", approx_only, c.k)
    if "gathers" in sections:
        timeit("gather k (int8)", gather_k_only, c.k)
        timeit("gather k+v (int8)", gather_only, c.k, c.v)
        timeit("gather k (bf16 convert)", gather_bf16, c.k)
        timeit("gather k (row-shared idx)", gather_rowshared, c.k)
        timeit("gather k (one-hot MXU)", gather_onehot, c.k)
    if "dus" not in sections and "steps" not in sections:
        return

    kblk = jax.random.randint(key, (B, Hc, blkW, D), -127, 127, jnp.int8)
    vblk = kblk

    if "dus" in sections:
        def run_dus():
            nonlocal c
            ck, cv = dus_only(c.k, c.v, kblk, vblk)
            c = c.replace(k=ck, v=cv)
            return ck[0, 0, 0, 0]
        timeit("dus writeback (donated)", run_dus, reps=4)

        def run_gather_dus():
            nonlocal c
            ck, cv = gather_dus(c.k, c.v)
            c = c.replace(k=ck, v=cv)
            return ck[0, 0, 0, 0]
        timeit("gather+dus (donated)", run_gather_dus, reps=4)
    if "steps" not in sections:
        return

    # --- real step programs
    tok = jnp.zeros((B,), jnp.int32)
    vpos = jnp.full((B,), 4000, jnp.int32)
    state = llama.init_sched_state(comp, B) if hasattr(
        llama, "init_sched_state") else None
    from scope_tpu.compression.schedulers import SchedState
    state = SchedState.init()

    step_off = jax.jit(partial(llama.decode_step, spec, comp, ecfg,
                               compress_mode="off", attn_cap=cap),
                       donate_argnums=(3,))
    step_force = jax.jit(partial(llama.decode_step, spec, comp, ecfg,
                                 compress_mode="force"), donate_argnums=(3,))

    c = fresh_cache()

    def run_off():
        nonlocal c, state
        logits, c, state = step_off(params, tok, vpos, c, state)
        return logits[0, :4]
    timeit("hot step (off, full cap)", run_off)

    nk = jnp.full((B,), keep_cap, jnp.int32)

    def run_force():
        nonlocal c, state
        logits, c, state = step_force(params, tok, vpos, c, state,
                                      force_n_keep=nk)
        c = c.replace(length=jnp.full((L, B), length, jnp.int32))
        return logits[0, :4]
    timeit("force step (fire)", run_force, reps=4)

    if args.ring:
        fl = jax.jit(partial(flush_ring, uniform_rows=True,
                             uniform_layers=True), donate_argnums=(0,))

        def run_flush():
            nonlocal c
            c = fl(c)
            c = c.replace(ring_fill=jnp.asarray(args.ring, jnp.int32),
                          length=jnp.full((L, B), length, jnp.int32))
            return c.k[0, 0, 0, 0]
        timeit("flush_ring (donated)", run_flush, reps=4)


if __name__ == "__main__":
    main()
