"""Prefill-phase KV compression policies as pure functional transforms.

Each policy turns (full prefill K/V, eviction scores, true prompt length)
into a destination->source index map plus new length bookkeeping; a single
``take_along_axis`` gather then writes the compacted cache.  This replaces
the reference's per-method ``update_kv`` tensor surgery
(kv_utils.py: PyramidKV :141, SnapKV :430, H2O :633, StreamingLLM :850,
ALLKV :1038, Quest :1231) with jit-stable static shapes.

Score semantics are reproduced exactly (including quirks); see
scope_tpu/ops/attention.py for how the scores are accumulated.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from scope_tpu.config import CompressionConfig
from scope_tpu.ops.attention import NEG_INF, PrefillScores, pool_scores


class PrefillResult(NamedTuple):
    cache_k: jnp.ndarray     # [B, H, capacity, D]
    cache_v: jnp.ndarray     # [B, H, capacity, D]
    length: jnp.ndarray      # [B] int32 physical length
    pvalid: jnp.ndarray      # [B, H] int32 per-head valid prefill count


def _gather_to_capacity(k, v, src_map, capacity):
    """k/v [B,H,S_pad,D], src_map [B,H,capacity] -> [B,H,capacity,D]."""
    idx = src_map[..., None]
    return (jnp.take_along_axis(k, idx, axis=2),
            jnp.take_along_axis(v, idx, axis=2))


def _pad_to_capacity(x: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Zero-pad (or trim) the slot axis of [B,H,S,D] to capacity."""
    S = x.shape[2]
    if S == capacity:
        return x
    if S < capacity:
        pad = [(0, 0), (0, 0), (0, capacity - S), (0, 0)]
        return jnp.pad(x, pad)
    raise ValueError(
        f"prefill length {S} exceeds cache capacity {capacity}; increase "
        f"EngineConfig.max_prompt_len / cache_capacity")


def _topk_tail_map(scores: jnp.ndarray, n_keep_static: int,
                   n_keep_dyn: jnp.ndarray, tail_start: jnp.ndarray,
                   tail_len: int, capacity: int):
    """Build dest->src map: [top-n_keep_dyn by score | tail window | junk].

    scores: [B, H, S_pad] float32, -inf at ineligible keys.
    n_keep_dyn: broadcastable to [B, H] (traced).
    tail_start: [B] int32 = true_len - tail_len.
    Returns (src_map [B, H, capacity] int32, new_len = n_keep_dyn+tail_len).
    """
    B, H, _ = scores.shape
    topk_idx = lax.top_k(scores, n_keep_static)[1]           # [B,H,K]
    d = jnp.arange(capacity)                                  # [cap]
    nk = jnp.broadcast_to(jnp.asarray(n_keep_dyn), (B, H))[..., None]
    in_keep = d[None, None, :] < nk
    in_tail = (d[None, None, :] >= nk) & (d[None, None, :] < nk + tail_len)
    keep_pos = jnp.clip(d, 0, n_keep_static - 1)
    src_keep = jnp.take_along_axis(
        topk_idx, jnp.broadcast_to(keep_pos, (B, H, capacity)), axis=-1)
    src_tail = tail_start[:, None, None] + (d[None, None, :] - nk)
    src = jnp.where(in_keep, src_keep,
                    jnp.where(in_tail, src_tail, 0)).astype(jnp.int32)
    src = jnp.clip(src, 0, scores.shape[-1] - 1)
    return src, (nk[..., 0] + tail_len)


def _identity_or(src_map, new_len_c, gate_no_compress, true_len, capacity):
    """Select identity (no compression) per batch row where gate holds."""
    d = jnp.arange(capacity, dtype=jnp.int32)
    g = gate_no_compress[:, None, None]
    src = jnp.where(g, d[None, None, :], src_map)
    new_len = jnp.where(gate_no_compress[:, None], true_len[:, None],
                        new_len_c)
    return src, new_len


def compress_prefill(comp: CompressionConfig, layer_idx, num_layers: int,
                     k: jnp.ndarray, v: jnp.ndarray, q: jnp.ndarray,
                     scores: PrefillScores, true_len: jnp.ndarray,
                     capacity: int) -> PrefillResult:
    """Dispatch on comp.method (trace-time).  k/v/q: [B,H,S_pad,D] roped,
    GQA-expanded (parity mode) or per-KV-head with group-aggregated scores.
    """
    B, H, S_pad, D = k.shape
    method = comp.method

    if method in ("fullkv", "allkv", "quest"):
        # No prefill eviction (kv_utils.py:1038-1053, :1231-1256).
        ck = _pad_to_capacity(k, capacity)
        cv = _pad_to_capacity(v, capacity)
        pv = jnp.broadcast_to(true_len[:, None], (B, H))
        return PrefillResult(ck, cv, true_len, pv)

    if method == "headwise":
        from scope_tpu.compression.headwise import headwise_prefill_map
        src, pvalid = headwise_prefill_map(comp, q, k, true_len, capacity,
                                           layer_idx)
        ck, cv = _gather_to_capacity(k, v, src, capacity)
        # Decode tokens append at the reserved-segment boundary, uniformly
        # across heads (per-head validity lives in pvalid).
        gap = comp.headwise_max_budget
        length = jnp.full_like(true_len, gap)
        return PrefillResult(ck, cv, length, pvalid)

    P = comp.max_capacity_prompt
    w = comp.window_size
    if S_pad <= P:
        # Statically impossible to hit the compression branch
        # (q_len < max_capacity_prompt always; kv_utils.py:644-645).
        ck = _pad_to_capacity(k, capacity)
        cv = _pad_to_capacity(v, capacity)
        pv = jnp.broadcast_to(true_len[:, None], (B, H))
        return PrefillResult(ck, cv, true_len, pv)

    kv_idx = jnp.arange(S_pad)
    region = kv_idx[None, :] < (true_len - w)[:, None]        # [B, S_pad]
    tail_start = true_len - w

    if method == "h2o":
        # Cumulative attention over all queries (kv_utils.py:647-658).
        s = jnp.where(region[:, None, :], scores.colsum_all, NEG_INF)
        src, new_len = _topk_tail_map(s, P - w, P - w, tail_start, w,
                                      capacity)
    elif method == "snapkv":
        # Observation-window colsum + 1D pooling (kv_utils.py:440-456).
        s0 = jnp.where(region[:, None, :], scores.colsum_window, 0.0)
        s = pool_scores(s0, comp.kernel_size, comp.pooling)
        s = jnp.where(region[:, None, :], s, NEG_INF)
        src, new_len = _topk_tail_map(s, P - w, P - w, tail_start, w,
                                      capacity)
    elif method == "streamingllm":
        # Positional: first P-w sinks + last w (kv_utils.py:857-869).
        # Expressed as top-k of -index so it reuses the same map builder.
        s = jnp.where(region[:, None, :],
                      -kv_idx[None, None, :].astype(jnp.float32), NEG_INF)
        n_keep = jnp.minimum(P - w, true_len - w)[:, None]
        src, new_len = _topk_tail_map(s, P - w, n_keep, tail_start, w,
                                      capacity)
    elif method == "pyramidkv":
        # PyramidInfer-mode budgets (kv_utils.py:150-160) with the
        # full-query scoring variant active in the reference (:166, :177).
        min_num = (P - w) // comp.beta
        max_num = (P - w) * 2 - min_num
        q_len = true_len                                       # [B]
        over = max_num >= q_len - w
        max_num_d = jnp.where(over, q_len - w, max_num)        # [B]
        steps = (max_num_d - jnp.where(over, (P - w) * 2 - max_num_d,
                                       min_num)) // num_layers
        budget_l = max_num_d - layer_idx * steps               # [B]
        # Branch select (kv_utils.py:162-225): mid branch keeps top-P
        # (note: P, not P-w — reference quirk), deep branch keeps budget_l.
        mid = q_len < (P - w) * 2                              # [B]
        n_keep = jnp.where(mid, P, budget_l)
        n_keep = jnp.clip(n_keep, 0, true_len - w)[:, None]    # [B,1]
        k_static = min(2 * (P - w), S_pad)
        s = jnp.where(region[:, None, :], scores.colsum_all, NEG_INF)
        src, new_len = _topk_tail_map(s, k_static, n_keep, tail_start, w,
                                      capacity)
    else:
        raise ValueError(f"unknown prefill method {method!r}")

    gate = true_len < P                                        # [B]
    src, new_len = _identity_or(src, new_len, gate, true_len, capacity)
    ck, cv = _gather_to_capacity(k, v, src, capacity)
    length = new_len[:, 0]
    return PrefillResult(ck, cv, length, new_len)
