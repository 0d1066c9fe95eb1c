"""Pallas TPU flash-attention prefill kernel with fused eviction scoring.

Replaces the reference's external flash_attn CUDA kernels
(llama_model.py:19-20, 64-81) and its separate O(S^2)-materialized scoring
pass (kv_utils.py:647-658) with:

- Phase A (`flash_prefill`): one online-softmax pass over K/V blocks that
  computes the causal attention output AND the row statistics (max m2,
  normalizer l2) of the *scoring* softmax — the reference's quirky mask
  where only the trailing w x w block is causal (kv_utils.py:648-654).
  Attention probabilities never touch HBM.
- Phase B (`colsum_scores`): given (m2, l2), accumulates the per-key
  column sums of the scoring softmax blockwise (H2O / PyramidInfer
  cumulative attention).  One extra pass over K (reads S*D, not S^2).

Memory traffic per layer head drops from O(S^2) (probabilities written +
read by XLA between the two einsums) to O(S*D).

Round-5 performance work (scripts/probe_flash_blocks.py, 1B 8k shapes):
1. Block sizes: each q-block re-streams all of K/V, so bigger blocks
   cut HBM traffic and amortize per-grid-step overhead — (1024, 1024)
   beats the old (256, 512)/(512, 512) defaults; (2048, *) exceeds the
   16MB VMEM scoped limit at D=64.
2. The kernel is ELEMENTWISE-bound, not MXU-bound: the useful matmuls
   are ~690 GFLOP/layer-set (~7 ms at D=64's half-filled MXU) while
   mask construction + exp over the full S^2 rectangle (which h2o
   scoring requires — its softmax is non-causal) costs ~20 VPU
   ops/element.  Both kernels therefore split blocks into a FAST class
   (interior: no iota/compare/select at all) and a masked EDGE class,
   and the flash kernel skips the attention side entirely above the
   causal diagonal.
Combined: 43-48 -> 26.5 ms/layer-set; full-model prefill 8192: 772 ->
485 ms, 16384: 2670 -> 1391 ms; the XLA/pallas auto crossover moved
from 4096 down to 2048 (config.resolve_attn_backend).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(tl_ref, q_ref, k_ref, v_ref, o_ref, m2_ref, l2_ref,
                  m_scr, l_scr, acc_scr, m2_scr, l2_scr, *,
                  scale: float, block_q: int, block_k: int, n_k: int,
                  w: int, need_scores: bool,
                  sliding_window: Optional[int], batch: int):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    b = bh // (pl.num_programs(0) // batch) if batch > 1 else 0
    true_len = tl_ref[b]

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if need_scores:
            m2_scr[:] = jnp.full_like(m2_scr, NEG_INF)
            l2_scr[:] = jnp.zeros_like(l2_scr)

    q = q_ref[0]                                   # [bq, D]
    k = k_ref[0]                                   # [bk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [bq, bk]

    # The kernel is ELEMENTWISE-bound (see module docstring): the mask
    # construction (two iotas + compares + selects per element) costs
    # more than the matmuls.  Blocks therefore split into a FAST class
    # (no masking needed at all) and a masked EDGE class, per side:
    # - attention: fast when the block is fully below the causal
    #   diagonal, inside the sliding window, and all rows/keys real;
    #   blocks fully ABOVE the diagonal skip the attention side whole.
    # - scoring: fast when all keys are real and every row is below the
    #   reference's trailing w-tail (its softmax is otherwise
    #   non-causal, so above-diagonal blocks still score).
    q_lo = iq * block_q
    q_hi = q_lo + block_q - 1
    k_lo = ik * block_k
    k_hi = k_lo + block_k - 1

    def _iotas():
        qi = q_lo + jax.lax.broadcasted_iota(jnp.int32,
                                             (block_q, block_k), 0)
        kj = k_lo + jax.lax.broadcasted_iota(jnp.int32,
                                             (block_q, block_k), 1)
        return qi, kj

    def _acc_attn(s_attn, guarded: bool):
        m_prev = m_scr[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s_attn, axis=1))
        alpha = jnp.exp(m_prev - m_new)
        if guarded:
            # Guard fully-masked (padding) rows: exp(-inf - -inf) = 1.
            p = jnp.where(s_attn > NEG_INF / 2,
                          jnp.exp(s_attn - m_new[:, None]), 0.0)
        else:
            p = jnp.exp(s_attn - m_new[:, None])
        l_new = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)
        acc_scr[:] = (acc_scr[:] * alpha[:, None]
                      + jax.lax.dot_general(
                          p.astype(v_ref.dtype), v_ref[0],
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32))
        m_scr[:] = m_new[:, None]
        l_scr[:] = l_new[:, None]

    attend_any = k_lo <= q_hi                     # not fully above diag
    fast_attn = ((k_hi <= q_lo) & (k_hi < true_len) & (q_hi < true_len))
    if sliding_window is not None:
        fast_attn = fast_attn & (k_lo > q_hi - sliding_window)

    @pl.when(fast_attn)
    def _attend_fast():
        _acc_attn(s, guarded=False)

    @pl.when(attend_any & jnp.logical_not(fast_attn))
    def _attend_masked():
        qi, kj = _iotas()
        mask = (kj <= qi) & (kj < true_len)
        if sliding_window is not None:
            mask = mask & (kj > qi - sliding_window)
        _acc_attn(jnp.where(mask, s, NEG_INF), guarded=True)

    # ---- scoring softmax row statistics (reference tail-mask quirk) ----
    if need_scores:
        def _acc_sc(s_sc, guarded: bool):
            m2_prev = m2_scr[:, 0]
            m2_new = jnp.maximum(m2_prev, jnp.max(s_sc, axis=1))
            if guarded:
                p2 = jnp.where(s_sc > NEG_INF / 2,
                               jnp.exp(s_sc - m2_new[:, None]), 0.0)
            else:
                p2 = jnp.exp(s_sc - m2_new[:, None])
            l2_scr[:] = (l2_scr[:, 0] * jnp.exp(m2_prev - m2_new)
                         + jnp.sum(p2, axis=1))[:, None]
            m2_scr[:] = m2_new[:, None]

        fast_sc = (k_hi < true_len) & (q_hi < true_len - w)

        @pl.when(fast_sc)
        def _score_fast():
            _acc_sc(s, guarded=False)

        @pl.when(jnp.logical_not(fast_sc))
        def _score_masked():
            qi, kj = _iotas()
            in_tail = ((qi >= true_len - w) & (kj >= true_len - w)
                       & (kj > qi))
            s_sc = jnp.where((kj < true_len) & ~in_tail, s, NEG_INF)
            _acc_sc(s_sc, guarded=True)

    @pl.when(ik == n_k - 1)
    def _finish():
        l = l_scr[:, 0]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l[:, None]).astype(o_ref.dtype)
        if need_scores:
            m2_ref[0] = jnp.broadcast_to(m2_scr[:, 0][None, :],
                                         m2_ref.shape[1:])
            l2_ref[0] = jnp.broadcast_to(l2_scr[:, 0][None, :],
                                         l2_ref.shape[1:])
        else:
            m2_ref[0] = jnp.zeros_like(m2_ref[0])
            l2_ref[0] = jnp.ones_like(l2_ref[0])


def flash_prefill(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  true_len: jnp.ndarray, *, window_size: int,
                  need_scores: bool,
                  sliding_window: Optional[int] = None,
                  block_q: int = 1024, block_k: int = 1024,
                  interpret: bool = False):
    """q/k/v: [B, H, S, D] -> (out [B,H,S,D], m2 [B,H,S], l2 [B,H,S])."""
    B, H, S, D = q.shape
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    while S % block_q:
        block_q //= 2
    while S % block_k:
        block_k //= 2
    n_q, n_k = S // block_q, S // block_k
    scale = 1.0 / math.sqrt(D)

    qf = q.reshape(B * H, S, D)
    kf = k.reshape(B * H, S, D)
    vf = v.reshape(B * H, S, D)

    kernel = functools.partial(
        _flash_kernel, scale=scale, block_q=block_q, block_k=block_k,
        n_k=n_k, w=window_size, need_scores=need_scores,
        sliding_window=sliding_window, batch=B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, iq, ik, tl: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, iq, ik, tl: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, iq, ik, tl: (bh, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, iq, ik, tl: (bh, iq, 0)),
            pl.BlockSpec((1, 8, block_q), lambda bh, iq, ik, tl: (bh, 0, iq)),
            pl.BlockSpec((1, 8, block_q), lambda bh, iq, ik, tl: (bh, 0, iq)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
    )
    out, m2, l2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 8, S), jnp.float32),
            jax.ShapeDtypeStruct((B * H, 8, S), jnp.float32),
        ],
        interpret=interpret,
    )(true_len.astype(jnp.int32), qf, kf, vf)
    return (out.reshape(B, H, S, D), m2[:, 0].reshape(B, H, S),
            l2[:, 0].reshape(B, H, S))


def _colsum_kernel(tl_ref, q_ref, k_ref, m2_ref, l2_ref, out_ref, acc_scr,
                   *, scale: float, block_q: int, block_k: int, n_q: int,
                   w: int, batch: int):
    bh = pl.program_id(0)
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    b = bh // (pl.num_programs(0) // batch) if batch > 1 else 0
    true_len = tl_ref[b]

    @pl.when(iq == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # [bq, D]
    k = k_ref[0]                                   # [bk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [bq, bk]

    m2 = m2_ref[0, 0]                              # [bq]
    l2 = l2_ref[0, 0]
    safe_l = jnp.where(l2 > 0, l2, 1.0)

    # Same fast/edge block split as _flash_kernel (elementwise-bound):
    # interior blocks (all keys below the trailing tail, all rows real)
    # need no mask construction at all.
    q_hi = iq * block_q + block_q - 1
    k_hi = ik * block_k + block_k - 1
    fast = (k_hi < true_len - w) & (q_hi < true_len)

    @pl.when(fast)
    def _fast():
        p = jnp.exp(s - m2[:, None]) / safe_l[:, None]
        acc_scr[:] = acc_scr[:] + jnp.sum(p, axis=0)[None, :]

    @pl.when(jnp.logical_not(fast))
    def _masked():
        qi = iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        kj = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        key_real = kj < true_len
        in_tail = ((qi >= true_len - w) & (kj >= true_len - w)
                   & (kj > qi))
        s_m = jnp.where(key_real & ~in_tail, s, NEG_INF)
        p = jnp.where(s_m > NEG_INF / 2,
                      jnp.exp(s_m - m2[:, None]), 0.0) / safe_l[:, None]
        row_real = (iq * block_q
                    + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                    ) < true_len
        p = jnp.where(row_real, p, 0.0)
        acc_scr[:] = acc_scr[:] + jnp.sum(p, axis=0)[None, :]

    @pl.when(iq == n_q - 1)
    def _finish():
        out_ref[0] = jnp.broadcast_to(acc_scr[0][None, :],
                                      out_ref.shape[1:])


def colsum_scores(q: jnp.ndarray, k: jnp.ndarray, true_len: jnp.ndarray,
                  m2: jnp.ndarray, l2: jnp.ndarray, *, window_size: int,
                  block_q: int = 1024, block_k: int = 1024,
                  interpret: bool = False) -> jnp.ndarray:
    """Column sums of the scoring softmax given row stats.  -> [B,H,S]."""
    B, H, S, D = q.shape
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    while S % block_q:
        block_q //= 2
    while S % block_k:
        block_k //= 2
    n_q, n_k = S // block_q, S // block_k
    scale = 1.0 / math.sqrt(D)

    qf = q.reshape(B * H, S, D)
    kf = k.reshape(B * H, S, D)
    m2f = jnp.broadcast_to(m2.reshape(B * H, 1, S), (B * H, 8, S))
    l2f = jnp.broadcast_to(l2.reshape(B * H, 1, S), (B * H, 8, S))

    kernel = functools.partial(
        _colsum_kernel, scale=scale, block_q=block_q, block_k=block_k,
        n_q=n_q, w=window_size, batch=B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, ik, iq, tl: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda bh, ik, iq, tl: (bh, ik, 0)),
            pl.BlockSpec((1, 8, block_q), lambda bh, ik, iq, tl: (bh, 0, iq)),
            pl.BlockSpec((1, 8, block_q), lambda bh, ik, iq, tl: (bh, 0, iq)),
        ],
        out_specs=pl.BlockSpec((1, 8, block_k),
                               lambda bh, ik, iq, tl: (bh, 0, ik)),
        scratch_shapes=[pltpu.VMEM((1, block_k), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, 8, S), jnp.float32),
        interpret=interpret,
    )(true_len.astype(jnp.int32), qf, kf, m2f, l2f)
    return out[:, 0].reshape(B, H, S)
