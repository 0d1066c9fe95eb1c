"""Llama-family decoder in pure JAX with SCOPE compression integrated.

Replaces the reference's 17+15 monkeypatched HF attention forwards
(llama_model.py, mistral_model.py) with ONE attention implementation whose
compression hooks are functional transforms; method dispatch happens at
trace time from the typed config instead of via monkeypatching
(monkeypatch.py:16-102).

Semantics preserved from the reference forward (llama_model.py:495-643):
- RoPE is applied before caching; evicted caches keep original phases.
- GQA expansion happens before the cache update in parity mode
  (repeat_kv at llama_model.py:566-567), so eviction is per query head.
- Prefill attention runs over the full uncompressed keys; only the stored
  cache is compressed (llama_model.py:579-582 vs :602-611).
- Decode attention runs over the appended, not-yet-compressed cache; the
  compressed result is what the next step sees (llama_model.py:591-611).
- Softmax upcasts to float32 (llama_model.py:609).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from scope_tpu.cache import KVCache, append_token, init_cache, slot_mask
from scope_tpu.compression.policies import compress_prefill
from scope_tpu.compression.schedulers import (DecodeCaps, SchedState,
                                              decode_schedule,
                                              static_keep_cap)
from scope_tpu.config import CompressionConfig, EngineConfig, ModelSpec
from scope_tpu.ops.attention import (decode_attention, prefill_attention)
from scope_tpu.ops.common import (apply_rope, mlp, repeat_kv, rms_norm,
                                  rope_cos_sin, rope_inv_freq, wdot)
from scope_tpu.ops.quant import to_compute as _tc
from scope_tpu.ops.quant import pv_einsum as _pv
from scope_tpu.ops.quant import qk_einsum as _qk

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# parameters
# --------------------------------------------------------------------------

def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.bfloat16
                ) -> Params:
    """Random init with HF-like scales (for tests/benchmarks)."""
    L, E = spec.num_layers, spec.hidden_size
    Hq, Hkv, D = spec.num_heads, spec.num_kv_heads, spec.head_dim
    I = spec.intermediate_size
    keys = jax.random.split(key, 10)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32)
                * (1.0 / math.sqrt(fan_in))).astype(dtype)

    G = spec.num_kv_groups
    params = {
        "embed": dense(keys[0], (spec.vocab_size, E), E),
        "final_norm": jnp.ones((E,), dtype),
        "layers": {
            "ln_attn": jnp.ones((L, E), dtype),
            "ln_mlp": jnp.ones((L, E), dtype),
            # Fused q/k/v as ONE flat [E, F] matmul (a >2-D weight makes
            # XLA:TPU lower the dot catastrophically — measured 3ms/step
            # slower at 1B).  Columns are grouped BY KV HEAD (each kv
            # head's G query heads, then its k, then its v), so TP
            # sharding of the F axis splits on whole kv-head groups and
            # every shard's q/k/v slice stays local.
            "wqkv": dense(keys[1], (L, E, Hkv * (G + 2) * D), E),
            "wo": dense(keys[4], (L, Hq * D, E), Hq * D),
            "w_gate": dense(keys[5], (L, E, I), E),
            "w_up": dense(keys[6], (L, E, I), E),
            "w_down": dense(keys[7], (L, I, E), I),
        },
    }
    if spec.attention_bias:
        # Qwen2-style qkv bias, fused in the same kv-head-grouped column
        # layout as wqkv so TP shards slice weight and bias together.
        params["layers"]["bqkv"] = dense(
            keys[9], (L, Hkv * (G + 2) * D), Hkv * (G + 2) * D)
    if not spec.tie_word_embeddings:
        params["lm_head"] = dense(keys[8], (E, spec.vocab_size), E)
    return params


def qkv_flat(p, h: jnp.ndarray) -> jnp.ndarray:
    """Fused qkv projection [..., Hkv*(G+2)*D] with optional Qwen2 bias."""
    out = wdot(h, p, "wqkv")
    if "bqkv" in p:
        out = out + p["bqkv"].astype(out.dtype)
    return out


def _lm_logits(spec: ModelSpec, params: Params, h: jnp.ndarray) -> jnp.ndarray:
    if "lm_head_t" in params:
        # Pre-materialized matmul-orientation head (quant.
        # materialize_lm_head): avoids XLA re-materializing embed.T
        # (525MB at 1B) every decode step.  Int8 carries a per-INPUT-
        # channel scale folded into h (argmax-safe).
        wt = params["lm_head_t"]
        if wt.dtype == jnp.int8:
            h = h * params["lm_head_t_scale"].astype(h.dtype)
            return jnp.dot(h, wt.astype(h.dtype))
        return jnp.dot(h, wt)
    if spec.tie_word_embeddings:
        # Contract on embed's hidden axis directly — `embed.T` as a jnp
        # op makes XLA:TPU materialize the full transposed [V, E] matrix
        # (525MB bf16 at 1B) EVERY decode step (seen in optimized HLO).
        return lax.dot_general(h, params["embed"],
                               (((h.ndim - 1,), (1,)), ((), ())))
    return jnp.dot(h, params["lm_head"])


# --------------------------------------------------------------------------
# shapes / derived statics
# --------------------------------------------------------------------------

class ModelStatics(NamedTuple):
    cache_heads: int          # H stored in the cache
    capacity: int
    caps: DecodeCaps


def derive_statics(spec: ModelSpec, comp: CompressionConfig,
                   ecfg: EngineConfig) -> ModelStatics:
    cache_heads = spec.num_heads if comp.evict_per_qhead else spec.num_kv_heads
    capacity = ecfg.cache_capacity(comp)
    caps = DecodeCaps(keep_cap=static_keep_cap(comp, ecfg.max_new_tokens),
                      capacity=capacity)
    # Physical slot count: the staging ring flushes a full R-slot block
    # at the flushed length (cache.flush_ring), so the buffer carries R
    # slots of slack past the logical capacity the schedulers see.
    return ModelStatics(cache_heads, capacity + ecfg.decode_ring, caps)


def _group_scores(scores: Optional[jnp.ndarray], groups: int):
    """Aggregate per-query-head scores to per-KV-head (sum over group)."""
    if scores is None:
        return None
    B, Hq, S = scores.shape
    return scores.reshape(B, Hq // groups, groups, S).sum(axis=2)


def layer_qkv(spec: ModelSpec, p, x: jnp.ndarray, cos, sin):
    """Input norm + fused qkv projection + RoPE for one layer.

    x: [B, S, E].  Returns (q [B,Hq,S,D], k [B,Hkv,S,D], v [B,Hkv,S,D]),
    roped, NOT GQA-expanded.
    """
    B, S = x.shape[:2]
    Hq, Hkv, D = spec.num_heads, spec.num_kv_heads, spec.head_dim
    G = spec.num_kv_groups
    h = rms_norm(x, p["ln_attn"], spec.rms_norm_eps)
    qkv = qkv_flat(p, h).reshape(B, S, Hkv, G + 2, D)
    q = qkv[:, :, :, :G].reshape(B, S, Hq, D).transpose(0, 2, 1, 3)
    k = qkv[:, :, :, G].transpose(0, 2, 1, 3)
    v = qkv[:, :, :, G + 1].transpose(0, 2, 1, 3)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def layer_post(spec: ModelSpec, p, x: jnp.ndarray, out: jnp.ndarray):
    """Output projection + residual + MLP block.  out: [B, Hq, S, D]."""
    B, S = x.shape[:2]
    out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
    x = x + wdot(out, p, "wo")
    h2 = rms_norm(x, p["ln_mlp"], spec.rms_norm_eps)
    return x + mlp(h2, p)


# --------------------------------------------------------------------------
# prefill
# --------------------------------------------------------------------------

def prefill(spec: ModelSpec, comp: CompressionConfig, ecfg: EngineConfig,
            params: Params, tokens: jnp.ndarray, true_len: jnp.ndarray,
            sp_mesh=None, sp_axis: str = "data"
            ) -> Tuple[jnp.ndarray, KVCache, SchedState]:
    """Process the (right-padded) prompt; returns (last-token logits [B, V],
    compressed cache, fresh scheduler state).

    sp_mesh: sequence-parallel prefill — each layer's O(S^2) attention +
    eviction scoring runs as ring attention with the prompt's sequence
    axis sharded over ``sp_axis`` (ops/ring_attention.py; exact-equal to
    the monolithic path).  Close it over statically, e.g.
    jit(partial(llama.prefill, spec, comp, ecfg, sp_mesh=mesh))."""
    st = derive_statics(spec, comp, ecfg)
    B, S = tokens.shape
    L = spec.num_layers
    Hq, Hkv, D = spec.num_heads, spec.num_kv_heads, spec.head_dim
    G = spec.num_kv_groups
    dtype = jnp.dtype(ecfg.dtype)

    need_all = comp.method in ("h2o", "pyramidkv")
    need_win = comp.method == "snapkv"

    inv_freq = rope_inv_freq(D, spec.rope_theta, spec.rope_scaling)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    cos, sin = rope_cos_sin(positions, inv_freq)

    x = jnp.take(params["embed"], tokens, axis=0).astype(dtype)
    lp = params["layers"]

    def layer(x, p, layer_idx):
        q, k, v = layer_qkv(spec, p, x, cos, sin)
        k_full = repeat_kv(k, G)
        v_full = repeat_kv(v, G)
        if sp_mesh is not None:
            from scope_tpu.ops.ring_attention import sp_prefill_attention
            out, scores = sp_prefill_attention(
                sp_mesh, q, k_full, v_full, true_len, seq_axis=sp_axis,
                window_size=comp.window_size,
                need_colsum_all=need_all, need_colsum_window=need_win,
                sliding_window=spec.sliding_window)
        else:
            out, scores = prefill_attention(
                q, k_full, v_full, true_len,
                window_size=comp.window_size,
                need_colsum_all=need_all, need_colsum_window=need_win,
                sliding_window=spec.sliding_window,
                softmax_f32=ecfg.softmax_f32,
                backend=ecfg.resolve_attn_backend(S))
        x = layer_post(spec, p, x, out)

        if comp.evict_per_qhead:
            ck, cv, cq = k_full, v_full, q
            sc = scores
        else:
            ck, cv = k, v
            cq = q
            sc = scores._replace(
                colsum_all=_group_scores(scores.colsum_all, G),
                colsum_window=_group_scores(scores.colsum_window, G))
        res = compress_prefill(comp, layer_idx, L, ck, cv, cq, sc,
                               true_len, st.capacity)
        return x, res

    gap = comp.headwise_max_budget if comp.method == "headwise" else 0

    def body(carry, xs):
        x = carry
        p, layer_idx = xs
        x, res = layer(x, p, layer_idx)
        # Quantize (int8/int4) inside the scan so the full-precision
        # cache of ALL layers is never live at once (memory 2x at
        # prefill); no-op passthrough for bf16.
        from scope_tpu.ops import quant
        ck, cv, ks, vs, ko, vo = quant.quantize_prefill_layer(
            ecfg.kv_dtype, res.cache_k, res.cache_v, res.length,
            res.pvalid, gap)
        return x, (ck, cv, res.length, res.pvalid, ks, vs, ko, vo)

    x, (cks, cvs, lens, pvalids, ks_scale, vs_scale, k_off, v_off) = \
        lax.scan(body, x, (lp, jnp.arange(L)))

    if ecfg.kv_dtype not in ("int8", "int4"):
        ks_scale = vs_scale = None
    if ecfg.kv_dtype != "int4":
        k_off = v_off = None
    cache = KVCache(k=cks, v=cvs, length=lens, pvalid=pvalids,
                    prefill_gap=gap, prompt_len=true_len,
                    page_min=None, page_max=None,
                    k_scale=ks_scale, v_scale=vs_scale,
                    k_off=k_off, v_off=v_off)
    if ecfg.decode_ring:
        rshape = (L, B, st.cache_heads, ecfg.decode_ring, cks.shape[-1])
        cache = cache.replace(
            ring_k=jnp.zeros(rshape, cks.dtype),
            ring_v=jnp.zeros(rshape, cvs.dtype),
            ring_fill=jnp.zeros((), jnp.int32))
    if ecfg.lazy_evict and comp.decoding_metric != "none":
        cache = cache.replace(alive=jnp.ones(
            (L, B, st.cache_heads, st.capacity), bool))
    if comp.method == "quest":
        from scope_tpu.compression.quest import build_page_metadata
        cache = build_page_metadata(comp, cache, true_len)

    x = rms_norm(x, params["final_norm"], spec.rms_norm_eps)
    # Logits at the last real token of each row.
    last = jnp.clip(true_len - 1, 0, S - 1)
    h_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = _lm_logits(spec, params, h_last)
    return logits, cache, SchedState.init()


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

def decode_step(spec: ModelSpec, comp: CompressionConfig, ecfg: EngineConfig,
                params: Params, token: jnp.ndarray, vpos: jnp.ndarray,
                cache: KVCache, state: SchedState,
                compress_mode: str = "cond",
                force_n_keep: Optional[jnp.ndarray] = None,
                force_row_gate: Optional[jnp.ndarray] = None,
                attn_cap: Optional[int] = None,
                layer_uniform_lengths: bool = True,
                quest_dec_cap: Optional[int] = None
                ) -> Tuple[jnp.ndarray, KVCache, SchedState]:
    """One decode step.  token: [B] int32 (the token being fed); vpos: [B]
    its virtual position (true_len + step).  Returns next-token logits.

    quest_dec_cap (static): host-bucketed view width for quest's decode
    region (it grows from 0, so early steps need not attend the full
    max_new_tokens-wide slice); None = the full region.  attn_cap bounds
    quest's dense-layer full-cache view the same way it buckets the other
    methods' attention.

    compress_mode (static): "cond" = device-side gates via lax.cond (the
    self-contained path used by generate_scan); "off" = no compression
    logic at all; "force" = unconditional compression keeping
    ``force_n_keep`` tokens.  "off"/"force" implement host-orchestrated
    scheduling (compression/host_sched.py) — the gates are deterministic,
    so the host dispatches the right program and the hot step carries no
    conditional machinery.

    The layer loop is python-unrolled and the cache is updated IN PLACE on
    the stacked [L, ...] buffers (static layer index appends; the gather
    rewrite only touches the stacked buffer when a scheduler actually
    fires).  A lax.scan formulation slices each layer's 2x~100MB cache in
    and out every step — measured ~5GB/step of pure copy traffic on TPU.
    """
    from scope_tpu.compression.schedulers import (compress_layer,
                                                  schedule_decision)
    st = derive_statics(spec, comp, ecfg)
    if attn_cap is not None:
        if attn_cap > st.capacity:
            attn_cap = st.capacity
        st = st._replace(caps=st.caps._replace(capacity=attn_cap))
    cap_eff = attn_cap or st.capacity
    B = token.shape[0]
    L = spec.num_layers
    Hq, Hkv, D = spec.num_heads, spec.num_kv_heads, spec.head_dim
    Hc = st.cache_heads
    G = spec.num_kv_groups
    dtype = jnp.dtype(ecfg.dtype)

    inv_freq = rope_inv_freq(D, spec.rope_theta, spec.rope_scaling)
    cos, sin = rope_cos_sin(vpos[:, None], inv_freq)     # [B,1,D]

    x = jnp.take(params["embed"], token[:, None], axis=0).astype(dtype)
    lp = params["layers"]
    quest = comp.method == "quest"

    if (cache.alive is not None and compress_mode == "cond"
            and comp.decoding_metric != "none"):
        raise ValueError(
            "lazy_evict caches need host scheduling (compress_mode "
            "off/force) — the device-cond rewrite would bypass the "
            "alive mask; use HostScheduledDecoder/ServingEngine")
    ck_all, cv_all = cache.k, cache.v
    len_all, pv_all = cache.length, cache.pvalid
    alive_all = cache.alive
    pm_all, pM_all = cache.page_min, cache.page_max
    b_idx = jnp.arange(B)[:, None]
    h_idx = jnp.arange(Hc)[None, :]

    # Hot-step fast path: don't append per layer (each in-place
    # dynamic_update_slice costs ~30us of fixed op overhead on TPU —
    # ~1ms/step at 1B scale).  Instead attention folds the step's own
    # k/v token explicitly, the layer k/v are staged, and the write
    # lands all layers' tokens at the end of the step: ONE stacked
    # dynamic_update_slice when rows share a length, B per-row writes
    # otherwise (still far fewer ops than 2L per-layer scatters).
    # Requires layer-uniform lengths (one slice start per row); pyramidkv
    # host scheduling passes layer_uniform_lengths=False.
    use_ring = (cache.ring_k is not None and compress_mode == "off"
                and not quest and cache.prefill_gap == 0)
    defer_append = use_ring or (
        compress_mode == "off" and not quest
        and cache.prefill_gap == 0 and layer_uniform_lengths)
    int8_kv = ecfg.kv_dtype == "int8"
    int4_kv = ecfg.kv_dtype == "int4"
    staged = []

    for l in range(L):
        p = {name: arr[l] for name, arr in lp.items()}
        h = rms_norm(x, p["ln_attn"], spec.rms_norm_eps)
        qkv = qkv_flat(p, h).reshape(B, 1, Hkv, G + 2, D)
        q = qkv[:, :, :, :G].reshape(B, 1, Hq, D).transpose(0, 2, 1, 3)
        k = qkv[:, :, :, G].transpose(0, 2, 1, 3)
        v = qkv[:, :, :, G + 1].transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if comp.evict_per_qhead:
            k = repeat_kv(k, G)
            v = repeat_kv(v, G)
        if int8_kv or int4_kv:
            # Store the token quantized; fold the per-channel K scale
            # into q (q.k = sum_d (q_d * s_d) * kint_d) so attention
            # reads int8 (or packed-int4) bytes with no per-slot dequant.
            # int4's K offset adds a slot-independent constant to every
            # logit, which softmax cancels — no further K-side work.
            from scope_tpu.ops import quant
            ks_l, vs_l = cache.k_scale[l], cache.v_scale[l]  # [B,Hc,D]
            if int4_kv:
                ko_l, vo_l = cache.k_off[l], cache.v_off[l]
                k = quant.quantize4(k, ks_l, ko_l)
                v = quant.quantize4(v, vs_l, vo_l)
            else:
                k = quant.quantize(k, ks_l)
                v = quant.quantize(v, vs_l)
            q = quant.fold_q_scale(q, ks_l)

        length = len_all[l]
        if (comp.mistral_window_parity and spec.sliding_window
                and comp.method not in ("fullkv", "allkv")
                and not quest):
            # Reference Mistral decode slicing (mistral_model.py:246-269):
            # once the VIRTUAL length exceeds the window, keep only the
            # last window-1 PHYSICAL slots before appending — positional
            # in slot space, oblivious to what compression left there
            # (the reproduced degraded semantics; see models/mistral.py).
            Wsl = spec.sliding_window
            gate = (vpos + 1) > Wsl                            # [B]
            shift = jnp.where(gate,
                              jnp.maximum(length - (Wsl - 1), 0), 0)
            keepW = min(Wsl - 1, ck_all.shape[3])

            def shift_row(c_l, s):
                return lax.dynamic_slice_in_dim(c_l, s, keepW, axis=1)
            kw = jax.vmap(shift_row)(ck_all[l], shift)  # [B,Hc,keepW,D]
            vw = jax.vmap(shift_row)(cv_all[l], shift)
            ck_all = lax.dynamic_update_slice(ck_all, kw[None],
                                              (l, 0, 0, 0, 0))
            cv_all = lax.dynamic_update_slice(cv_all, vw[None],
                                              (l, 0, 0, 0, 0))
            length = jnp.where(gate, jnp.minimum(length, Wsl - 1),
                               length)
            len_all = len_all.at[l].set(length)

        # In-place append at (l, b, :, length[b], :) on the stacked buffer.
        # B==1 fast path: one dynamic_update_slice (a general scatter is
        # slow on TPU); multi-row batches fall back to scatter.
        if defer_append:
            staged.append((k, v))
        elif B == 1 or ecfg.uniform_lengths:
            start = (l, 0, 0, length[0], 0)
            ck_all = lax.dynamic_update_slice(ck_all, k[None], start)
            cv_all = lax.dynamic_update_slice(cv_all, v[None], start)
        else:
            ck_all = ck_all.at[l, b_idx, h_idx, length[:, None], :].set(
                k[:, :, 0, :])
            cv_all = cv_all.at[l, b_idx, h_idx, length[:, None], :].set(
                v[:, :, 0, :])
        if not defer_append:
            length = length + 1
            len_all = len_all.at[l].set(length)

        pvalid = pv_all[l]
        ck_v = ck_all[l][:, :, :cap_eff]
        cv_v = cv_all[l][:, :, :cap_eff]
        win = (spec.sliding_window
               if (spec.sliding_window is not None
                   and comp.method in ("fullkv", "allkv")) else 0)
        # Eviction scores are only consumed on steps that may compress;
        # hot host-scheduled steps skip materialising them entirely.
        # (Decode attention itself is XLA: two hand-written pallas decode
        # kernels were measured and removed — see the kernel verdict note
        # in config.py; XLA's einsum path is at the HBM roofline here.)
        need_probs = (comp.decoding_metric != "none"
                      and compress_mode != "off")
        mask = slot_mask(length, pvalid, cache.prefill_gap, cap_eff)
        if alive_all is not None:
            # Lazy eviction: tombstoned slots attend as NEG_INF —
            # the logit multiset equals the compacted cache's, so
            # the probabilities (and eviction scores) are identical.
            mask = mask & alive_all[l][:, :, :cap_eff]
        if win:
            # Mistral sliding window; only meaningful while slot index
            # == token position (see models/mistral.py).
            idx = jnp.arange(cap_eff)
            mask = mask & (idx[None, None, :]
                           > (vpos[:, None, None] - win))

        if quest:
            from scope_tpu.compression.quest import quest_decode_stacked
            fg = fk = None
            if compress_mode == "force":
                fg = (jnp.ones((B,), bool) if force_row_gate is None
                      else (force_row_gate[l]
                            if force_row_gate.ndim == 2 else force_row_gate))
                fk = (force_n_keep[l] if force_n_keep.ndim == 2
                      else force_n_keep)
            out, ck_all, cv_all, len_all, state = quest_decode_stacked(
                comp, st.caps, state, q, ck_all, cv_all, len_all, l,
                cache.prompt_len, pm_all, pM_all, L,
                dec_cap=min(quest_dec_cap or ecfg.max_new_tokens + 1,
                            ecfg.max_new_tokens + 1),
                softmax_f32=ecfg.softmax_f32,
                groups=1 if comp.evict_per_qhead else G,
                compress_mode=compress_mode, force_row_gate=fg,
                force_n_keep=fk,
                tot_cap=attn_cap or 0)
            if comp.quest_decode_pages > 0:
                # Paged decode region: fold this step's appended token
                # into its page's min/max metadata (quest.py).
                from scope_tpu.compression.quest import (
                    update_decode_page_metadata)
                pm_all, pM_all = update_decode_page_metadata(
                    comp, ck_all, pm_all, pM_all, len_all, l,
                    uniform_rows=(B == 1 or ecfg.uniform_lengths))
            if int8_kv or int4_kv:
                # Quest computed attention on quantized values with the K
                # scale already folded into q; fold the V scale (and
                # int4's V offset) into the output.
                out = quant.fold_out_scale(out, vs_l,
                                           vo_l if int4_kv else None)
        else:
            if use_ring:
                out = _ring_decode_attention(
                    q, ck_v, cv_v, mask, cache.ring_k[l], cache.ring_v[l],
                    cache.ring_fill, k, v, softmax_f32=ecfg.softmax_f32)
                probs = None
            elif defer_append:
                out = _deferred_decode_attention(
                    q, ck_v, cv_v, mask, k, v,
                    softmax_f32=ecfg.softmax_f32)
                probs = None
            elif comp.evict_per_qhead:
                out, probs = decode_attention(q, ck_v, cv_v, mask,
                                              softmax_f32=ecfg.softmax_f32)
            else:
                out, probs = _grouped_decode_attention(
                    q, ck_v, cv_v, mask, G,
                    softmax_f32=ecfg.softmax_f32)
            if int8_kv or int4_kv:
                # Per-channel V scale (+ int4 V offset) folds into the
                # attention output (quant.fold_out_scale).
                out = quant.fold_out_scale(out, vs_l,
                                           vo_l if int4_kv else None)
            if comp.decoding_metric != "none" and compress_mode == "force":
                from scope_tpu.compression.schedulers import (block_map,
                                                              block_width,
                                                              force_pseg)
                pseg, positional = force_pseg(comp, B, cache.prompt_len)
                # force_row_gate / force_n_keep: [B] (uniform layers) or
                # [L, B] (per-layer fire masks — pyramidkv budgets).
                if force_row_gate is None:
                    row_gate = jnp.ones((B,), bool)
                elif force_row_gate.ndim == 2:
                    row_gate = force_row_gate[l]
                else:
                    row_gate = force_row_gate
                nk = (force_n_keep[l] if force_n_keep.ndim == 2
                      else force_n_keep)
                if alive_all is not None:
                    # LAZY fire: tombstone instead of rewriting (shared
                    # helper — scripts/probe_gather.py for the why;
                    # physical length is untouched, the host mirrors the
                    # live count and schedules cache.compact_lazy).
                    from scope_tpu.compression.schedulers import (
                        lazy_tombstone_fire)
                    new_al = lazy_tombstone_fire(
                        comp, st.caps, probs,
                        alive_all[l][:, :, :cap_eff], length, pseg, nk,
                        row_gate)
                    alive_all = lax.dynamic_update_slice(
                        alive_all, new_al[None], (l, 0, 0, 0))
                    out = out.transpose(0, 2, 1, 3).reshape(B, 1, Hq * D)
                    x = x + wdot(out, p, "wo")
                    h2 = rms_norm(x, p["ln_mlp"], spec.rms_norm_eps)
                    x = x + mlp(h2, p)
                    continue
                src_blk, new_len = block_map(
                    comp, st.caps, probs, length, pseg, nk,
                    row_gate, positional)
                blkW = block_width(comp, st.caps)
                srcc = jnp.clip(jnp.broadcast_to(src_blk, (B, Hc, blkW)),
                                0, cap_eff - 1)[..., None]
                kblk = jnp.take_along_axis(ck_v, srcc, axis=2)
                vblk = jnp.take_along_axis(cv_v, srcc, axis=2)
                if (B == 1 or ecfg.uniform_lengths
                        or comp.method not in ("allkv", "quest")):
                    start = (l, 0, 0, pseg[0], 0)
                    ck_all = lax.dynamic_update_slice(ck_all, kblk[None],
                                                      start)
                    cv_all = lax.dynamic_update_slice(cv_all, vblk[None],
                                                      start)
                else:
                    for b in range(B):   # per-row pseg (allkv batches)
                        sb = (l, b, 0, pseg[b], 0)
                        ck_all = lax.dynamic_update_slice(
                            ck_all, kblk[b][None, None], sb)
                        cv_all = lax.dynamic_update_slice(
                            cv_all, vblk[b][None, None], sb)
                len_all = len_all.at[l].set(new_len)
            elif (comp.decoding_metric != "none"
                    and compress_mode == "cond"):
                from scope_tpu.compression.schedulers import (
                    block_rewrite_cond, block_width)
                row_gate, n_keep, pseg, positional, state = \
                    schedule_decision(comp, st.caps, state, length,
                                      cache.prompt_len, jnp.int32(l), L)
                kblk, vblk, new_len = block_rewrite_cond(
                    comp, st.caps, probs, ck_v, cv_v, length,
                    pseg, n_keep, row_gate, positional, Hc)
                if (B == 1 or ecfg.uniform_lengths
                        or comp.method not in ("allkv", "quest")):
                    # pseg is batch-uniform: one contiguous write.
                    start = (l, 0, 0, pseg[0], 0)
                    ck_all = lax.dynamic_update_slice(ck_all, kblk[None],
                                                      start)
                    cv_all = lax.dynamic_update_slice(cv_all, vblk[None],
                                                      start)
                else:
                    for b in range(B):   # per-row offsets (allkv batches)
                        sb = (l, b, 0, pseg[b], 0)
                        ck_all = lax.dynamic_update_slice(
                            ck_all, kblk[b][None, None], sb)
                        cv_all = lax.dynamic_update_slice(
                            cv_all, vblk[b][None, None], sb)
                len_all = len_all.at[l].set(new_len)

        out = out.transpose(0, 2, 1, 3).reshape(B, 1, Hq * D)
        x = x + wdot(out, p, "wo")
        h2 = rms_norm(x, p["ln_mlp"], spec.rms_norm_eps)
        x = x + mlp(h2, p)

    if use_ring:
        # Stage the step's tokens in the small ring buffer; the big k/v
        # buffers are NOT touched (cache.length unchanged — virtual
        # length is length + ring_fill, flushed by cache.flush_ring).
        ks = jnp.stack([kk for kk, _ in staged])      # [L, B, Hc, 1, D]
        vs = jnp.stack([vv for _, vv in staged])
        start = (0, 0, 0, cache.ring_fill, 0)
        rk = lax.dynamic_update_slice(cache.ring_k, ks, start)
        rv = lax.dynamic_update_slice(cache.ring_v, vs, start)
        cache = cache.replace(ring_k=rk, ring_v=rv,
                              ring_fill=cache.ring_fill + 1)
    elif defer_append:
        ks = jnp.stack([kk for kk, _ in staged])      # [L, B, Hc, 1, D]
        vs = jnp.stack([vv for _, vv in staged])
        # (A pallas in-place append kernel was tried here and removed:
        # the runtime copies aliased buffers at jit boundaries, so every
        # formulation cost a near-full-buffer copy — the staging ring is
        # the fix; see the kernel verdict note in config.py.)
        if B == 1 or ecfg.uniform_lengths:
            start = (0, 0, 0, len_all[0, 0], 0)
            ck_all = lax.dynamic_update_slice(ck_all, ks, start)
            cv_all = lax.dynamic_update_slice(cv_all, vs, start)
        else:
            for b in range(B):
                sb = (0, b, 0, len_all[0, b], 0)
                ck_all = lax.dynamic_update_slice(
                    ck_all, ks[:, b:b + 1], sb)
                cv_all = lax.dynamic_update_slice(
                    cv_all, vs[:, b:b + 1], sb)
        len_all = len_all + 1

    cache = cache.replace(k=ck_all, v=cv_all, length=len_all, pvalid=pv_all,
                          alive=alive_all, page_min=pm_all,
                          page_max=pM_all)
    x = rms_norm(x, params["final_norm"], spec.rms_norm_eps)
    logits = _lm_logits(spec, params, x[:, 0])
    return logits, cache, state


def decode_steps(spec: ModelSpec, comp: CompressionConfig,
                 ecfg: EngineConfig, params: Params, token: jnp.ndarray,
                 vpos: jnp.ndarray, cache: KVCache, state: SchedState,
                 n_steps: int, attn_cap: Optional[int] = None,
                 layer_uniform_lengths: bool = True,
                 quest_dec_cap: Optional[int] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache, SchedState]:
    """Run ``n_steps`` greedy HOT decode steps in ONE jitted program.

    Per-step jit calls pay a fixed per-call cost on the big cache buffers
    (the donated k/v copy through the runtime plus transport overhead —
    measured ~0.9ms at 1B b4 bf16 and ~4.5ms at b64 int8, i.e. it scales
    with buffer size like a full copy, see scripts/bisect_step.py).  A
    ``lax.scan`` over steps keeps the cache as the loop carry, so the
    in-place appends stay inside one executable and that cost is paid
    once per CHUNK instead of once per token.

    Only valid for steps where no compression fires (compress_mode="off"
    semantics); the host scheduler plans fire-free runs
    (HostScheduler.hot_run_length).  token: [B] the input token; returns
    (tokens [B, n_steps] generated greedily — the last one is the next
    step's input token — plus cache, state).

    IN-CHUNK STAGING: a dynamic_update_slice on the big cache buffers
    costs a near-full-buffer copy per scan iteration on this hardware
    (CLAUDE.md; ~13ms/step at 1B b192 int8), so the chunk stages each
    step's k/v in a chunk-local scratch ring (attention folds
    cache|scratch|token — the same fold as the persistent staging ring)
    and lands ALL n tokens with ONE stacked write at the end of the
    program: the copy is paid once per chunk instead of once per token,
    with no persistent ring buffers, no flush dispatches, and no host
    fill bookkeeping.
    """
    staged = (cache.ring_k is None and comp.method != "quest"
              and cache.prefill_gap == 0 and n_steps > 1)
    if staged:
        L, B = cache.length.shape
        rshape = (L, B, cache.k.shape[2], n_steps, cache.k.shape[-1])
        cache = cache.replace(
            ring_k=jnp.zeros(rshape, cache.k.dtype),
            ring_v=jnp.zeros(rshape, cache.v.dtype),
            ring_fill=jnp.zeros((), jnp.int32))

    def body(carry, _):
        tok, vp, cache, state = carry
        logits, cache, state = decode_step(
            spec, comp, ecfg, params, tok, vp, cache, state,
            compress_mode="off", attn_cap=attn_cap,
            layer_uniform_lengths=layer_uniform_lengths,
            quest_dec_cap=quest_dec_cap)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (nxt, vp + 1, cache, state), nxt

    (tok, vpos, cache, state), toks = lax.scan(
        body, (token, vpos, cache, state), None, length=n_steps)
    if staged:
        from scope_tpu.cache import flush_ring
        cache = flush_ring(
            cache,
            uniform_rows=(cache.length.shape[1] == 1
                          or ecfg.uniform_lengths),
            uniform_layers=layer_uniform_lengths)
        cache = cache.replace(ring_k=None, ring_v=None, ring_fill=None)
    return jnp.moveaxis(toks, 0, 1), cache, state


def _ring_decode_attention(q, cache_k, cache_v, mask, ring_k, ring_v,
                           fill, k_new, v_new, *, softmax_f32=True):
    """Decode attention over [flushed cache | staged ring | this token].

    q: [B, Hq, 1, D]; cache: [B, Hc, S, D] (slots < length valid via
    ``mask``); ring: [B, Hc, R, D] with slots < ``fill`` valid (these are
    the last ``fill`` decode tokens, not yet flushed); k_new/v_new
    [B, Hc, 1, D] is this step's token.  One softmax over the concatenated
    logits — identical math to attending the fully-appended cache.
    """
    from scope_tpu.ops.attention import NEG_INF
    B, Hq, _, D = q.shape
    Hc = cache_k.shape[1]
    R = ring_k.shape[2]
    scale = 1.0 / math.sqrt(D)
    qg = q.reshape(B, Hc, Hq // Hc, D)
    cd = (q.dtype if jnp.issubdtype(cache_k.dtype, jnp.integer)
          else cache_k.dtype)

    # Per-segment online-softmax merge instead of concatenating logits:
    # the 3-way concat made XLA materialize the big converted cache
    # slices as HLO temps per layer (observed: 264MB s8 temps x L at
    # b192 -> compile OOM) instead of fusing the int8->bf16 convert into
    # the einsums.  Mathematically identical (same softmax, different
    # association).
    def seg(kseg, vseg, m):
        logits = _qk("bhgd,bhsd->bhgs", qg, kseg, cd,
                     jnp.float32) * scale
        logits = jnp.where(m[:, :, None, :], logits, NEG_INF)
        mx = logits.max(axis=-1)                          # [B,Hc,G]
        e = jnp.exp(logits - mx[..., None])
        num = _pv("bhgs,bhsd->bhgd", e.astype(cd),
                  vseg, cd).astype(jnp.float32)
        return mx, e.sum(-1), num

    m1, s1, n1 = seg(cache_k, cache_v, mask)
    rmask = jnp.broadcast_to((jnp.arange(R) < fill)[None, None, :],
                             (B, Hc, R))
    m2, s2, n2 = seg(ring_k, ring_v, rmask)
    m3, s3, n3 = seg(k_new, v_new, jnp.ones((B, Hc, 1), bool))
    m = jnp.maximum(jnp.maximum(m1, m2), m3)
    w1, w2, w3 = (jnp.exp(m1 - m), jnp.exp(m2 - m), jnp.exp(m3 - m))
    num = n1 * w1[..., None] + n2 * w2[..., None] + n3 * w3[..., None]
    den = s1 * w1 + s2 * w2 + s3 * w3
    out = (num / den[..., None]).astype(q.dtype)
    return out.reshape(B, Hq, 1, D)


def _deferred_decode_attention(q, cache_k, cache_v, mask, k_new, v_new, *,
                               softmax_f32=True):
    """Decode attention over the cache PLUS the step's un-appended token.

    q: [B, Hq, 1, D]; cache: [B, Hc, S, D]; k_new/v_new: [B, Hc, 1, D].
    Works for both the GQA-expanded (Hc == Hq) and kv-head (Hc == Hkv)
    cache layouts; no eviction scores (hot-step path only)."""
    from scope_tpu.ops.attention import NEG_INF
    B, Hq, _, D = q.shape
    Hc = cache_k.shape[1]
    scale = 1.0 / math.sqrt(D)
    acc = jnp.float32 if softmax_f32 else q.dtype
    qg = q.reshape(B, Hc, Hq // Hc, D)
    cd = (q.dtype if jnp.issubdtype(cache_k.dtype, jnp.integer)
          else cache_k.dtype)
    logits = _qk("bhgd,bhsd->bhgs", qg, cache_k, cd, acc) * scale
    logits = jnp.where(mask[:, :, None, :], logits, NEG_INF)
    l_new = jnp.einsum("bhgd,bhsd->bhgs", qg, _tc(k_new, cd),
                       preferred_element_type=acc) * scale
    probs = jax.nn.softmax(
        jnp.concatenate([logits, l_new], axis=-1).astype(jnp.float32),
        axis=-1)
    out = (_pv("bhgs,bhsd->bhgd", probs[..., :-1].astype(cd),
               cache_v, cd)
           + probs[..., -1:].astype(cd) * _tc(v_new, cd))
    return out.reshape(B, Hq, 1, D)


def _grouped_decode_attention(q, cache_k, cache_v, mask, groups, *,
                              softmax_f32=True):
    """GQA decode attention without expanding the cache (kv-head layout).

    q: [B, Hq, 1, D]; cache: [B, Hkv, S, D]; mask: [B, Hkv, S].
    Returns (out [B, Hq, 1, D], probs-per-kv-head [B, Hkv, S], summed over
    the query-head group for use as eviction scores).
    """
    from scope_tpu.ops.attention import NEG_INF
    B, Hq, _, D = q.shape
    Hkv = cache_k.shape[1]
    scale = 1.0 / math.sqrt(D)
    acc = jnp.float32 if softmax_f32 else q.dtype
    qg = q.reshape(B, Hkv, Hq // Hkv, D)
    cd = (q.dtype if jnp.issubdtype(cache_k.dtype, jnp.integer)
          else cache_k.dtype)
    logits = _qk("bhgd,bhsd->bhgs", qg, cache_k, cd, acc) * scale
    logits = jnp.where(mask[:, :, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = _pv("bhgs,bhsd->bhgd", probs.astype(cd), cache_v, cd)
    out = out.reshape(B, Hq, 1, D)
    return out, probs.sum(axis=2)
