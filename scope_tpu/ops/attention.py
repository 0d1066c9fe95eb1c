"""Attention paths: chunked prefill with fused eviction-score accumulation,
and masked decode attention over the static slotted cache.

Design notes (vs the reference):
- The reference materialises the full S x S attention matrix during prefill
  scoring (kv_utils.py:647-658) and recomputes a separate 1 x S attention for
  decode scoring (kv_utils.py:708-711) on top of the attention compute
  itself.  Here prefill is chunked over query blocks (memory O(block x S))
  and the *same* logits block feeds both the causal attention softmax and
  the scoring softmax; decode computes its probabilities once and reuses
  them as scores.
- Score semantics reproduce the reference exactly, including its quirk of
  applying a causal mask only to the trailing ``w x w`` block of the scoring
  softmax (kv_utils.py:648-654): earlier queries attend to *future* keys in
  the score pass.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


class PrefillScores(NamedTuple):
    """Per-key accumulated eviction scores from the prefill pass."""

    # Column sums of the full-query scoring softmax (H2O / PyramidInfer
    # semantics, kv_utils.py:647-658). float32 [B, H, S].
    colsum_all: Optional[jnp.ndarray]
    # Column sums over only the last-w query rows (SnapKV semantics,
    # kv_utils.py:440-450). float32 [B, H, S].
    colsum_window: Optional[jnp.ndarray]


def prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    true_len: jnp.ndarray,
    *,
    window_size: int,
    need_colsum_all: bool = False,
    need_colsum_window: bool = False,
    sliding_window: Optional[int] = None,
    q_block: int = 256,
    softmax_f32: bool = True,
    backend: str = "xla",
) -> Tuple[jnp.ndarray, PrefillScores]:
    """Causal attention over the full (uncompressed) prompt + score capture.

    q, k, v: [B, H, S, D] (roped, GQA-expanded). true_len: [B] int32 count of
    real (non-pad) tokens; prompts are right-padded to S.
    backend: "xla" (chunked lax.scan), "pallas" (fused TPU kernel), or
    "pallas_interpret" (kernel in interpreter mode, for CPU tests).
    Returns (out [B, H, S, D], PrefillScores).
    """
    if backend in ("pallas", "pallas_interpret"):
        from scope_tpu.ops.pallas.flash_prefill import (colsum_scores,
                                                        flash_prefill)
        interp = backend == "pallas_interpret"
        out, m2, l2 = flash_prefill(
            q, k, v, true_len, window_size=window_size,
            need_scores=need_colsum_all, sliding_window=sliding_window,
            interpret=interp)
        colsum_all = None
        if need_colsum_all:
            colsum_all = colsum_scores(q, k, true_len, m2, l2,
                                       window_size=window_size,
                                       interpret=interp)
        colsum_window = None
        if need_colsum_window:
            colsum_window = _window_colsum(q, k, true_len, window_size,
                                           1.0 / math.sqrt(q.shape[-1]))
        return out, PrefillScores(colsum_all=colsum_all,
                                  colsum_window=colsum_window)
    B, H, S, D = q.shape
    scale = 1.0 / math.sqrt(D)
    q_block = min(q_block, S)
    while S % q_block:
        q_block //= 2
    n_blocks = S // q_block
    w = window_size

    kv_idx = jnp.arange(S)
    key_real = kv_idx[None, :] < true_len[:, None]            # [B, S]
    acc_dtype = jnp.float32 if softmax_f32 else q.dtype

    def block(carry, qb_idx):
        colsum_all = carry
        q_start = qb_idx * q_block
        q_blk = lax.dynamic_slice_in_dim(q, q_start, q_block, axis=2)
        q_idx = q_start + jnp.arange(q_block)                 # [qb]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q_blk, k,
                            preferred_element_type=acc_dtype) * scale

        # ---- causal attention softmax (the model's output path) ----
        causal = kv_idx[None, :] <= q_idx[:, None]            # [qb, S]
        attn_mask = causal[None, :, :] & key_real[:, None, :]  # [B, qb, S]
        if sliding_window is not None:
            in_window = kv_idx[None, :] > q_idx[:, None] - sliding_window
            attn_mask = attn_mask & in_window[None, :, :]
        attn_logits = jnp.where(attn_mask[:, None, :, :], logits, NEG_INF)
        probs = jax.nn.softmax(attn_logits.astype(jnp.float32), axis=-1)
        out_blk = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)

        # ---- scoring softmax (reference quirk: only the trailing w x w
        # block is causally masked; kv_utils.py:648-654) ----
        if need_colsum_all:
            tl = true_len[:, None, None]                      # [B,1,1]
            in_tail = ((q_idx[None, :, None] >= tl - w)
                       & (kv_idx[None, None, :] >= tl - w)
                       & (kv_idx[None, None, :] > q_idx[None, :, None]))
            score_mask = key_real[:, None, :] & ~in_tail      # [B, qb, S]
            s_logits = jnp.where(score_mask[:, None, :, :], logits, NEG_INF)
            s_probs = jax.nn.softmax(s_logits.astype(jnp.float32), axis=-1)
            # Rows at pad positions contribute nothing.
            row_real = (q_idx[None, :] < true_len[:, None])   # [B, qb]
            s_probs = s_probs * row_real[:, None, :, None]
            colsum_all = colsum_all + jnp.sum(s_probs, axis=2)
        return colsum_all, out_blk

    colsum0 = jnp.zeros((B, H, S), jnp.float32)
    colsum_all, out_blocks = lax.scan(block, colsum0, jnp.arange(n_blocks))
    out = jnp.moveaxis(out_blocks, 0, 2).reshape(B, H, S, D)

    colsum_window = None
    if need_colsum_window:
        colsum_window = _window_colsum(q, k, true_len, w, scale)

    return out, PrefillScores(
        colsum_all=colsum_all if need_colsum_all else None,
        colsum_window=colsum_window,
    )


def prefill_scores_only(
    q: jnp.ndarray,
    k: jnp.ndarray,
    true_len: jnp.ndarray,
    *,
    window_size: int,
    need_colsum_all: bool = False,
    need_colsum_window: bool = False,
    q_block: int = 256,
) -> PrefillScores:
    """Eviction scores WITHOUT the attention output (chunked-prefill
    finalize pass: queries were staged during chunking and scored once all
    keys exist — the scoring softmax spans *future* keys per the reference
    quirk, kv_utils.py:648-654, so it cannot run chunk-locally).

    q, k: [B, H, S, D] roped.  Math is expression-identical to the scoring
    branch of :func:`prefill_attention` (backend="xla"), so chunked and
    monolithic prefill pick the same eviction sets.
    """
    B, H, S, D = q.shape
    scale = 1.0 / math.sqrt(D)
    q_block = min(q_block, S)
    while S % q_block:
        q_block //= 2
    n_blocks = S // q_block
    w = window_size

    kv_idx = jnp.arange(S)
    key_real = kv_idx[None, :] < true_len[:, None]            # [B, S]

    colsum_all = None
    if need_colsum_all:
        def block(colsum_all, qb_idx):
            q_start = qb_idx * q_block
            q_blk = lax.dynamic_slice_in_dim(q, q_start, q_block, axis=2)
            q_idx = q_start + jnp.arange(q_block)             # [qb]
            logits = jnp.einsum("bhqd,bhkd->bhqk", q_blk, k,
                                preferred_element_type=jnp.float32) * scale
            tl = true_len[:, None, None]                      # [B,1,1]
            in_tail = ((q_idx[None, :, None] >= tl - w)
                       & (kv_idx[None, None, :] >= tl - w)
                       & (kv_idx[None, None, :] > q_idx[None, :, None]))
            score_mask = key_real[:, None, :] & ~in_tail      # [B, qb, S]
            s_logits = jnp.where(score_mask[:, None, :, :], logits, NEG_INF)
            s_probs = jax.nn.softmax(s_logits.astype(jnp.float32), axis=-1)
            row_real = (q_idx[None, :] < true_len[:, None])   # [B, qb]
            s_probs = s_probs * row_real[:, None, :, None]
            return colsum_all + jnp.sum(s_probs, axis=2), None

        colsum0 = jnp.zeros((B, H, S), jnp.float32)
        colsum_all, _ = lax.scan(block, colsum0, jnp.arange(n_blocks))

    colsum_window = None
    if need_colsum_window:
        colsum_window = _window_colsum(q, k, true_len, w, scale)
    return PrefillScores(colsum_all=colsum_all, colsum_window=colsum_window)


def _window_colsum(q, k, true_len, w, scale):
    """SnapKV observation-window scores: softmax over the last w real query
    rows, column-summed.  kv_utils.py:440-450."""
    B, H, S, D = q.shape
    kv_idx = jnp.arange(S)

    # Gather the last w real queries per batch row (right-padded layout).
    row_pos = true_len[:, None] - w + jnp.arange(w)[None, :]   # [B, w]
    row_pos = jnp.clip(row_pos, 0, S - 1)
    q_win = jnp.take_along_axis(q, row_pos[:, None, :, None], axis=2)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q_win, k,
                        preferred_element_type=jnp.float32) * scale
    # Causal w.r.t. absolute positions + key pad mask.  For the last-w
    # queries this reproduces the reference's w x w tail mask exactly.
    mask = (kv_idx[None, None, :] <= row_pos[:, :, None]) & \
           (kv_idx[None, None, :] < true_len[:, None, None])
    logits = jnp.where(mask[:, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(probs, axis=2)                              # [B, H, S]


def pool_scores(scores: jnp.ndarray, kernel_size: int, pooling: str
                ) -> jnp.ndarray:
    """1-D pooling over the key axis, torch F.{avg,max}_pool1d semantics
    with stride=1 and padding=kernel_size//2 (kv_utils.py:451-456).

    torch avg_pool1d divides by kernel_size including zero pads
    (count_include_pad=True default); maxpool's zero pads never win because
    scores are non-negative softmax sums.
    """
    pad = kernel_size // 2
    if pooling == "avgpool":
        out = lax.reduce_window(scores, 0.0, lax.add,
                                (1, 1, kernel_size), (1, 1, 1),
                                [(0, 0), (0, 0), (pad, pad)])
        return out / kernel_size
    elif pooling == "maxpool":
        return lax.reduce_window(scores, NEG_INF, lax.max,
                                 (1, 1, kernel_size), (1, 1, 1),
                                 [(0, 0), (0, 0), (pad, pad)])
    raise ValueError(f"pooling {pooling!r} not supported")


def decode_attention(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    slot_mask: jnp.ndarray,
    *,
    softmax_f32: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-token attention over the slotted cache.

    q: [B, H, 1, D]; cache_k/v: [B, H, S_max, D]; slot_mask: [B, H, S_max]
    bool (True = valid slot).  Returns (out [B, H, 1, D],
    probs [B, H, S_max] float32) — the probabilities double as the
    compression scores, mirroring the reference where decode scoring and
    attention read the same appended cache (llama_model.py:593-611).
    """
    D = q.shape[-1]
    scale = 1.0 / math.sqrt(D)
    acc = jnp.float32 if softmax_f32 else q.dtype
    # int8 caches: converts fuse into the matmul operand loads, so the
    # HBM reads stay int8-sized; packed-int4 (uint8) caches contract per
    # nibble plane (quant.qk_einsum — the unpack concat defeats fusion).
    from scope_tpu.ops.quant import pv_einsum, qk_einsum
    cd = (q.dtype if jnp.issubdtype(cache_k.dtype, jnp.integer)
          else cache_k.dtype)
    logits = qk_einsum("bhqd,bhsd->bhqs", q, cache_k, cd, acc) * scale
    logits = jnp.where(slot_mask[:, :, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = pv_einsum("bhqs,bhsd->bhqd", probs.astype(cd), cache_v, cd)
    return out, probs[:, :, 0, :]
