"""Headwise: per-head adaptive prefill budgets from attention coverage.

The reference left this unfinished (headwise_attention.py computes budgets
but returns them instead of attention; llama_model.py:2328 has an operator-
precedence bug and :2336 calls a method that does not exist).  This module
implements the documented intent (FlexPrefill-style, SURVEY.md §2.2):

- budget_h = #tokens whose sorted last-query attention mass reaches
  coverage gamma (score_cover_topk, headwise_attention.py:10-15), clamped
  to [min_budget, min(max_budget, true_len)] (:81).
- eviction keeps the top-budget_h tokens per head by last-query attention
  (the commented-out mask construction at llama_model.py:2367-2380).
- layers < skip_layers are not compressed (llama_model.py:2328 intent:
  "第1、2层不适用压缩方法"), up to the reserved-segment cap.

Cache layout: the prefill segment is a reserved ``gap`` of
``headwise_max_budget`` slots; head h keeps its tokens compacted in
[0, budget_h) and decode tokens append at ``gap`` uniformly across heads
(see scope_tpu.cache.slot_mask).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from scope_tpu.config import CompressionConfig
from scope_tpu.ops.attention import NEG_INF

HEADWISE_SKIP_LAYERS = 3   # reference intent: layers 0..2 uncompressed


def coverage_budget(probs: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """probs: [B, H, S] last-query attention row -> [B, H] int32 budget:
    1 + #{sorted-desc cumsum <= gamma} (headwise_attention.py:10-15)."""
    sorted_desc = -jnp.sort(-probs, axis=-1)
    csum = jnp.cumsum(sorted_desc, axis=-1)
    return (jnp.sum(csum <= gamma, axis=-1) + 1).astype(jnp.int32)


def headwise_prefill_map(comp: CompressionConfig, q: jnp.ndarray,
                         k: jnp.ndarray, true_len: jnp.ndarray,
                         capacity: int, layer_idx) -> Tuple[jnp.ndarray,
                                                            jnp.ndarray]:
    """Build the per-head dest->src map for headwise prefill eviction.

    q/k: [B, H, S_pad, D] (roped).  Returns (src_map [B, H, capacity],
    pvalid [B, H] per-head kept count)."""
    B, H, S, D = q.shape
    gap = comp.headwise_max_budget
    scale = 1.0 / math.sqrt(D)
    kv_idx = jnp.arange(S)
    real = kv_idx[None, :] < true_len[:, None]                  # [B,S]

    # Last real query row per batch (block_size=1 in the reference).
    last = jnp.clip(true_len - 1, 0, S - 1)
    q_last = jnp.take_along_axis(q, last[:, None, None, None], axis=2)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q_last, k,
                        preferred_element_type=jnp.float32)[:, :, 0] * scale
    logits = jnp.where(real[:, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)                     # [B,H,S]

    budget = coverage_budget(probs, comp.headwise_gamma)
    budget = jnp.clip(budget, comp.headwise_min_budget, gap)
    budget = jnp.minimum(budget, true_len[:, None])
    # Early layers: keep everything that fits in the reserved segment.
    full = jnp.minimum(true_len[:, None], gap)
    budget = jnp.where(layer_idx < HEADWISE_SKIP_LAYERS, full, budget)

    k_static = min(gap, S)
    scores = jnp.where(real[:, None, :], probs, NEG_INF)
    topk_idx = lax.top_k(scores, k_static)[1]                   # [B,H,ks]

    d = jnp.arange(capacity, dtype=jnp.int32)
    in_keep = d[None, None, :] < budget[:, :, None]
    pos = jnp.clip(d, 0, k_static - 1)
    src_keep = jnp.take_along_axis(
        topk_idx, jnp.broadcast_to(pos, (B, H, capacity)), axis=-1)
    src = jnp.where(in_keep, src_keep, 0)
    src = jnp.clip(src, 0, S - 1).astype(jnp.int32)
    return src, budget
