"""Bisect the decode step's time: weights-only vs +append vs +attention.

Builds stripped-down jitted step programs sharing the real weight set and
cache buffers, so the difference between variants isolates one mechanism:
  base      embed + per-layer (norms, q/k/v proj, rope, o_proj, MLP) + lm
  append    base + per-layer cache append (2 dynamic_update_slice)
  attn      base + per-layer decode attention reads (no append)
  full      append + attn  (== the real hot step, compress_mode="off")
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
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--kvhead", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="int8 cache buffers (attention reads convert "
                         "in the einsum; isolates convert-fusion cost)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from scope_tpu.cache import init_cache, slot_mask
    from scope_tpu.config import CompressionConfig, EngineConfig
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.ops.common import (apply_rope, repeat_kv, rms_norm,
                                      rope_cos_sin, rope_inv_freq, swiglu)

    log(f"devices: {jax.devices()}")
    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)
    # Materialized unfused projection weights (A/B vs the fused layout).
    lw = params["layers"]
    Lq, Eq = lw["wqkv"].shape[:2]
    Gq = spec.num_kv_groups
    w5 = lw["wqkv"].reshape(Lq, Eq, spec.num_kv_heads, Gq + 2,
                            spec.head_dim)
    lw["wq2"] = w5[..., :Gq, :].reshape(Lq, Eq, -1)
    lw["wk2"] = w5[..., Gq, :].reshape(Lq, Eq, -1)
    lw["wv2"] = w5[..., Gq + 1, :].reshape(Lq, Eq, -1)
    comp = CompressionConfig(
        method="h2o", decoding_metric="jump", max_capacity_prompt=2048,
        window_size=8, decoding_window_size=512, decoding_recent_size=256,
        delta=30, evict_per_qhead=not args.kvhead)
    ecfg = EngineConfig(max_prompt_len=2048, max_new_tokens=7950,
                        dtype="bfloat16", uniform_lengths=True)
    st = llama.derive_statics(spec, comp, ecfg)
    cap = st.capacity
    B = args.batch
    L, Hq, Hkv, D = (spec.num_layers, spec.num_heads, spec.num_kv_heads,
                     spec.head_dim)
    Hc, G = st.cache_heads, spec.num_kv_groups
    dtype = jnp.bfloat16

    cache_dtype = jnp.int8 if args.int8 else dtype

    def make_cache():
        c = init_cache(L, B, Hc, cap, D, dtype,
                       kv_dtype="int8" if args.int8 else str(dtype))
        key = jax.random.key(1)
        if args.int8:
            # Distinct buffers: k/v aliasing one array breaks donation.
            c = c.replace(
                k=jax.random.randint(key, c.k.shape, -127, 128, jnp.int8),
                v=jax.random.randint(jax.random.key(2), c.v.shape,
                                     -127, 128, jnp.int8))
        else:
            c = c.replace(k=jax.random.normal(key, c.k.shape, dtype),
                          v=jax.random.normal(key, c.v.shape, dtype))
        return c.replace(
            length=jnp.full_like(c.length, cap - args.steps * 3 - 8),
            pvalid=jnp.full_like(c.pvalid, cap - args.steps * 3 - 8))

    def make_cache_sm():
        """Slot-major layout candidate: [L, B, S, H, D]."""
        key = jax.random.key(1)
        shape = (L, B, cap, Hc, D)
        return dict(
            k=jax.random.normal(key, shape, dtype),
            v=jax.random.normal(key, shape, dtype),
            length=jnp.full((L, B), cap - args.steps * 3 - 8, jnp.int32))

    def step_sm(params, token, vpos, cache, *, do_append, do_attn,
                append_once=False):
        """Slot-major cache variant of the hot step."""
        inv_freq = rope_inv_freq(D, spec.rope_theta, spec.rope_scaling)
        cos, sin = rope_cos_sin(vpos[:, None], inv_freq)
        x = jnp.take(params["embed"], token[:, None], axis=0).astype(dtype)
        lp = params["layers"]
        ck_all, cv_all = cache["k"], cache["v"]
        len_all = cache["length"]
        import math as _m
        scale = 1.0 / _m.sqrt(D)
        kv_idx = jnp.arange(cap)
        staged = []
        for l in range(L):
            p = {n: a[l] for n, a in lp.items()}
            h = rms_norm(x, p["ln_attn"], spec.rms_norm_eps)
            qkv = jnp.dot(h, p["wqkv"]).reshape(B, 1, Hkv, G + 2, D)
            q = qkv[:, :, :, :G].reshape(B, 1, Hq, D).transpose(0, 2, 1, 3)
            k = qkv[:, :, :, G].transpose(0, 2, 1, 3)
            v = qkv[:, :, :, G + 1].transpose(0, 2, 1, 3)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if Hc == Hq:
                k = repeat_kv(k, G)
                v = repeat_kv(v, G)
            # [B, Hc, 1, D] -> slot-major token [B, 1, Hc, D]
            k_t = k.transpose(0, 2, 1, 3)
            v_t = v.transpose(0, 2, 1, 3)
            length = len_all[l]
            if append_once:
                staged.append((k_t, v_t))
            elif do_append:
                start = (l, 0, length[0], 0, 0)
                ck_all = lax.dynamic_update_slice(ck_all, k_t[None], start)
                cv_all = lax.dynamic_update_slice(cv_all, v_t[None], start)
                length = length + 1
                len_all = len_all.at[l].set(length)
            if do_attn:
                ck_v, cv_v = ck_all[l], cv_all[l]      # [B, S, Hc, D]
                qg = q.reshape(B, Hc, Hq // Hc, D)
                logits = jnp.einsum("bhgd,bshd->bhgs", qg, ck_v,
                                    preferred_element_type=jnp.float32
                                    ) * scale
                mask = kv_idx[None, :] < length[:, None]      # [B, S]
                logits = jnp.where(mask[:, None, None, :], logits, -1e30)
                probs = jax.nn.softmax(logits, axis=-1)
                out = jnp.einsum("bhgs,bshd->bhgd",
                                 probs.astype(cv_v.dtype), cv_v)
                out = out.reshape(B, Hq, 1, D)
            else:
                out = q + jnp.mean(k, 1, keepdims=True) \
                    + jnp.mean(v, 1, keepdims=True)
            out = out.transpose(0, 2, 1, 3).reshape(B, 1, Hq * D)
            x = x + jnp.dot(out, p["wo"])
            h2 = rms_norm(x, p["ln_mlp"], spec.rms_norm_eps)
            x = x + swiglu(h2, p["w_gate"], p["w_up"], p["w_down"])
        if append_once:
            ks = jnp.stack([a for a, _ in staged])   # [L, B, 1, Hc, D]
            vs = jnp.stack([b_ for _, b_ in staged])
            start = (0, 0, len_all[0, 0], 0, 0)
            ck_all = lax.dynamic_update_slice(ck_all, ks, start)
            cv_all = lax.dynamic_update_slice(cv_all, vs, start)
            len_all = len_all + 1
        cache = dict(k=ck_all, v=cv_all, length=len_all)
        x = rms_norm(x, params["final_norm"], spec.rms_norm_eps)
        logits = jnp.dot(x[:, 0], params["embed"].T)
        return logits, cache

    def step(params, token, vpos, cache, *, do_append, do_attn,
             append_once=False, unfused=False, append_mode="big",
             attn_variant="dequant"):
        inv_freq = rope_inv_freq(D, spec.rope_theta, spec.rope_scaling)
        cos, sin = rope_cos_sin(vpos[:, None], inv_freq)
        x = jnp.take(params["embed"], token[:, None], axis=0).astype(dtype)
        lp = params["layers"]
        ck_all, cv_all, len_all = cache.k, cache.v, cache.length
        ring_k = jnp.zeros((L, B, Hc, 64, D), cache_dtype)
        ring_v = jnp.zeros((L, B, Hc, 64, D), cache_dtype)
        import math as _m
        scale = 1.0 / _m.sqrt(D)
        staged = []
        for l in range(L):
            p = {n: a[l] for n, a in lp.items()}
            h = rms_norm(x, p["ln_attn"], spec.rms_norm_eps)
            if unfused:
                q = jnp.dot(h, p["wq2"]).reshape(B, 1, Hq, D
                                                 ).transpose(0, 2, 1, 3)
                k = jnp.dot(h, p["wk2"]).reshape(B, 1, Hkv, D
                                                 ).transpose(0, 2, 1, 3)
                v = jnp.dot(h, p["wv2"]).reshape(B, 1, Hkv, D
                                                 ).transpose(0, 2, 1, 3)
            else:
                qkv = jnp.dot(h, p["wqkv"]).reshape(B, 1, Hkv, G + 2, D)
                q = qkv[:, :, :, :G].reshape(B, 1, Hq, D
                                             ).transpose(0, 2, 1, 3)
                k = qkv[:, :, :, G].transpose(0, 2, 1, 3)
                v = qkv[:, :, :, G + 1].transpose(0, 2, 1, 3)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if Hc == Hq:
                k = repeat_kv(k, G)
                v = repeat_kv(v, G)
            if args.int8:
                k = jnp.clip(jnp.round(k.astype(jnp.float32) * 32.0),
                             -127, 127).astype(jnp.int8)
                v = jnp.clip(jnp.round(v.astype(jnp.float32) * 32.0),
                             -127, 127).astype(jnp.int8)
            length = len_all[l]
            if append_once:
                staged.append((k, v))
            elif do_append and append_mode == "small":
                # Same op count/shapes but a tiny (64-slot) ring target.
                start = (l, 0, 0, length[0] % 64, 0)
                ring_k = lax.dynamic_update_slice(ring_k, k[None], start)
                ring_v = lax.dynamic_update_slice(ring_v, v[None], start)
                length = length + 1
                len_all = len_all.at[l].set(length)
            elif do_append and append_mode == "static":
                # Static start index: discriminates dynamic-index cost.
                start = (l, 0, 0, 128 + (l % 7), 0)
                ck_all = lax.dynamic_update_slice(ck_all, k[None], start)
                cv_all = lax.dynamic_update_slice(cv_all, v[None], start)
                length = length + 1
                len_all = len_all.at[l].set(length)
            elif do_append:
                start = (l, 0, 0, length[0], 0)
                ck_all = lax.dynamic_update_slice(ck_all, k[None], start)
                cv_all = lax.dynamic_update_slice(cv_all, v[None], start)
                length = length + 1
                len_all = len_all.at[l].set(length)
            if do_attn:
                ck_v, cv_v = ck_all[l], cv_all[l]
                mask = slot_mask(length, cache.pvalid[l], 0, cap)
                qg = q.reshape(B, Hc, Hq // Hc, D)
                if attn_variant == "int8dot" and args.int8:
                    # Quantize q per (row, head) to int8 and run a native
                    # int8 x int8 -> int32 MXU dot; rescale after.  Tests
                    # whether the int8->bf16 cache convert is what costs.
                    qf = qg.astype(jnp.float32)
                    qs = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.
                    qi = jnp.clip(jnp.round(qf / qs), -127, 127
                                  ).astype(jnp.int8)
                    li = jnp.einsum("bhgd,bhsd->bhgs", qi, ck_v,
                                    preferred_element_type=jnp.int32)
                    logits = li.astype(jnp.float32) * (qs * scale)
                elif attn_variant == "qk_bf16dot" and args.int8:
                    # Convert ONLY k inline (what XLA does today) but keep
                    # the value matmul int8-direct via quantized probs.
                    logits = jnp.einsum(
                        "bhgd,bhsd->bhgs", qg, ck_v.astype(dtype),
                        preferred_element_type=jnp.float32) * scale
                else:
                    logits = jnp.einsum("bhgd,bhsd->bhgs", qg,
                                        ck_v.astype(dtype),
                                        preferred_element_type=jnp.float32
                                        ) * scale
                logits = jnp.where(mask[:, :, None, :], logits,
                                   -1e30)
                if attn_variant == "nosoftmax":
                    probs = logits * (1.0 / cap)
                else:
                    probs = jax.nn.softmax(logits, axis=-1)
                if attn_variant in ("int8dot", "qk_bf16dot") and args.int8:
                    # probs quantized to uint-ish int8 (probs in [0,1]).
                    pi = jnp.clip(jnp.round(probs * 127.), 0, 127
                                  ).astype(jnp.int8)
                    oi = jnp.einsum("bhgs,bhsd->bhgd", pi, cv_v,
                                    preferred_element_type=jnp.int32)
                    out = (oi.astype(jnp.float32) / 127.).astype(dtype)
                else:
                    out = jnp.einsum("bhgs,bhsd->bhgd",
                                     probs.astype(dtype),
                                     cv_v.astype(dtype))
                out = out.reshape(B, Hq, 1, D)
            else:
                # Keep q/k/v live without touching the cache.
                out = q + jnp.mean(k, 1, keepdims=True).astype(q.dtype) \
                    + jnp.mean(v, 1, keepdims=True).astype(q.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(B, 1, Hq * D)
            x = x + jnp.dot(out, p["wo"])
            h2 = rms_norm(x, p["ln_mlp"], spec.rms_norm_eps)
            x = x + swiglu(h2, p["w_gate"], p["w_up"], p["w_down"])
        if append_once:
            ks = jnp.stack([k for k, _ in staged])   # [L, B, Hc, 1, D]
            vs = jnp.stack([v for _, v in staged])
            start = (0, 0, 0, len_all[0, 0], 0)
            ck_all = lax.dynamic_update_slice(ck_all, ks, start)
            cv_all = lax.dynamic_update_slice(cv_all, vs, start)
            len_all = len_all + 1
        if append_mode == "small":
            # Keep the rings live so DCE can't drop the writes.
            x = x + ring_k[0, :, 0, :1, 0].astype(x.dtype) * 0                 + ring_v[0, :, 0, :1, 0].astype(x.dtype) * 0
        cache = cache.replace(k=ck_all, v=cv_all, length=len_all)
        x = rms_norm(x, params["final_norm"], spec.rms_norm_eps)
        logits = jnp.dot(x[:, 0], params["embed"].T)
        return logits, cache

    def measure(name, do_append, do_attn, append_once=False,
                unfused=False, append_mode="big", attn_variant="dequant"):
        cache = make_cache()
        fn = jax.jit(partial(step, do_append=do_append, do_attn=do_attn,
                             append_once=append_once, unfused=unfused,
                             append_mode=append_mode,
                             attn_variant=attn_variant),
                     donate_argnums=(3,))
        tok = jnp.zeros((B,), jnp.int32) + 7
        vpos = jnp.full((B,), 4000, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(4):
            logits, cache = fn(params, tok, vpos, cache)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        _ = jax.device_get(tok)
        log(f"  [{name}] compile+warmup {time.perf_counter()-t0:.1f}s")
        times = []
        for _rep in range(2):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                logits, cache = fn(params, tok, vpos, cache)
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
            _ = jax.device_get(tok)
            times.append((time.perf_counter() - t0) / args.steps)
        ms = max(times) * 1e3
        log(f"[{name}] {[f'{t*1e3:.2f}' for t in times]} ms")
        return ms

    def measure_sm(name, do_append, do_attn, append_once=False):
        cache = make_cache_sm()
        fn = jax.jit(partial(step_sm, do_append=do_append,
                             do_attn=do_attn, append_once=append_once),
                     donate_argnums=(3,))
        tok = jnp.zeros((B,), jnp.int32) + 7
        vpos = jnp.full((B,), 4000, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(4):
            logits, cache = fn(params, tok, vpos, cache)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        _ = jax.device_get(tok)
        log(f"  [{name}] compile+warmup {time.perf_counter()-t0:.1f}s")
        times = []
        for _rep in range(2):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                logits, cache = fn(params, tok, vpos, cache)
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
            _ = jax.device_get(tok)
            times.append((time.perf_counter() - t0) / args.steps)
        ms = max(times) * 1e3
        log(f"[{name}] {[f'{t*1e3:.2f}' for t in times]} ms")
        return ms

    r = {}
    r["base"] = measure("base", False, False)
    r["append"] = measure("append", True, False)
    r["append_once"] = measure("append_once", False, False,
                               append_once=True)
    r["attn_only"] = measure("attn_only", False, True)
    r["full"] = measure("full", True, True)
    if args.int8:
        r["attn_nosm"] = measure("attn_nosm", False, True,
                                 attn_variant="nosoftmax")
        r["attn_i8dot"] = measure("attn_i8dot", False, True,
                                  attn_variant="int8dot")
        r["attn_i8v"] = measure("attn_i8v", False, True,
                                attn_variant="qk_bf16dot")
    else:
        r["append_small"] = measure("append_small", True, False,
                                    append_mode="small")
        r["append_static"] = measure("append_static", True, False,
                                     append_mode="static")
    log(f"== kvhead={args.kvhead} int8={args.int8} B={B} cap={cap} "
        f"Hc={Hc}: "
        + "  ".join(f"{k}={v:.2f}ms" for k, v in r.items()))
    log(f"   append cost {r['append']-r['base']:.2f}ms; "
        f"attn cost {r['attn_only']-r['base']:.2f}ms")


if __name__ == "__main__":
    main()
