"""Chunked, head-folded flash-decode attention kernel.

One-token attention over the slotted cache.  Grid = (batch, k-chunks);
each program processes ALL cache heads of one batch row for one chunk of
slots, so per-grid-step work is a [Hc, chunk, D] tile (~1MB) — big enough
to hide the HBM->VMEM DMA behind compute, few enough grid steps
(~tens/layer) that Pallas' per-step overhead is negligible.  Two earlier
designs failed the overhead math: whole-stripe blocks (no DMA/compute
overlap, VMEM-capped) and per-(batch*head) chunk programs (thousands of
~µs grid steps per layer).

Dynamic-length efficiency with a static grid: the chunk index map clamps
to the last live chunk (from the scalar-prefetched per-row length), so
dead tail chunks repeat the previous block index and Pallas elides their
fetch; their compute is skipped with ``pl.when``.

Eviction scores are opt-in (``need_probs``): most decode steps don't
consume them (jump fires rarely; host-orchestrated hot steps never do).
When requested, the kernel streams out the masked f32 logits and the
caller normalises in one XLA elementwise pass.

Reference equivalent: the 1 x k_len decode attention + separate scoring
recompute at llama_model.py:602-611 / kv_utils.py:708-711.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(len_ref, q_ref, pv_ref, k_ref, v_ref, kn_ref, vn_ref,
            o_ref, s_ref, m_scr, l_scr, acc_scr, *, scale: float,
            chunk: int, n_chunks: int, prefill_gap: int, window: int,
            need_probs: bool, has_new: bool):
    b = pl.program_id(0)
    c = pl.program_id(1)
    length = len_ref[b]
    active = c * chunk < length

    @pl.when(c == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(active)
    def _compute():
        q = q_ref[0]                                  # [Hc, R, D]
        k = k_ref[0]                                  # [Hc, chunk, D]
        if k.dtype == jnp.int8:
            # Int8 cache: dequant in-register (per-channel scales are
            # folded into q / the output outside the kernel, ops/quant.py)
            # so the HBM->VMEM DMA moves half the bytes of a bf16 cache.
            k = k.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # [Hc, R, chunk]
        idx = c * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        if prefill_gap > 0:
            # Headwise layout: valid slots are [0, pvalid_h) u [gap, len).
            pv = pv_ref[b]                            # [Hc]
            valid = ((idx < pv[:, None, None])
                     | ((idx >= prefill_gap) & (idx < length)))
        else:
            valid = idx < length
        if window > 0:
            # Sliding window over positional slots (fullkv/allkv layouts).
            # In deferred-append mode the un-appended token is the latest
            # position, shifting the window bound by one.
            latest = length if has_new else length - 1
            valid = valid & (idx > latest - window)
        s = jnp.where(valid, s, NEG_INF)
        m_prev = m_scr[:]                             # [Hc, R]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(s > NEG_INF / 2, jnp.exp(s - m_new[:, :, None]), 0.0)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=2)
        v_t = v_ref[0]
        if v_t.dtype == jnp.int8:
            v_t = v_t.astype(q_ref.dtype)
        acc_scr[:] = (acc_scr[:] * alpha[:, :, None]
                      + jax.lax.dot_general(
                          p.astype(v_t.dtype), v_t,
                          (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32))
        m_scr[:] = m_new
        if need_probs:
            s_ref[0] = s

    if need_probs:
        @pl.when(jnp.logical_not(active))
        def _pad():
            s_ref[0] = jnp.full_like(s_ref[0], NEG_INF)

    @pl.when(c == n_chunks - 1)
    def _finish():
        if has_new:
            # Fold the step's own (not-yet-appended) k/v token: one more
            # online-softmax update.  This lets the hot decode step defer
            # the cache append entirely (one batched write per step
            # instead of one per layer).
            q = q_ref[0]                              # [Hc, R, D]
            kn = kn_ref[0]                            # [Hc, 1, D]
            if kn.dtype == jnp.int8:
                kn = kn.astype(q.dtype)
            sn = jax.lax.dot_general(
                q, kn, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, :, 0] * scale
            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, sn)
            alpha = jnp.exp(m_prev - m_new)
            pn = jnp.exp(sn - m_new)
            l_scr[:] = l_scr[:] * alpha + pn
            acc_scr[:] = (acc_scr[:] * alpha[:, :, None]
                          + pn[:, :, None]
                          * vn_ref[0].astype(jnp.float32))
        l = l_scr[:]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l[:, :, None]).astype(o_ref.dtype)


def _normalize_logits(s: jnp.ndarray) -> jnp.ndarray:
    """Masked-logits -> probabilities, guarding fully-masked rows."""
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(s > NEG_INF / 2, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p / jnp.where(l > 0, l, 1.0)


def default_chunk(num_heads: int, head_dim: int, itemsize: int = 2,
                  tile_bytes: int = 2**20) -> int:
    """Largest chunk whose [Hc, chunk, D] cache tile fits ``tile_bytes``."""
    c = tile_bytes // (num_heads * head_dim * itemsize)
    c = max(128, min(2048, c))
    return (c // 128) * 128


def fused_decode_attention(
    q: jnp.ndarray,            # [B, Hc, R, D] (R = group rows per head)
    cache_k: jnp.ndarray,      # [B, Hc, cap, D]
    cache_v: jnp.ndarray,
    length: jnp.ndarray,       # [B] int32
    pvalid: jnp.ndarray,       # [B, Hc] int32 (headwise layout)
    *,
    prefill_gap: int = 0,
    window: int = 0,
    need_probs: bool = True,
    new_k: Optional[jnp.ndarray] = None,   # [B, Hc, 1, D] un-appended token
    new_v: Optional[jnp.ndarray] = None,
    chunk: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (out [B, Hc, R, D], probs [B, Hc, R, cap] f32 or None).

    With ``new_k``/``new_v`` the step's own token is folded into the
    softmax in-kernel (deferred-append mode); requires need_probs=False
    (score-consuming steps append first so slot indices line up)."""
    B, Hc, R, D = q.shape
    cap = cache_k.shape[2]
    has_new = new_k is not None
    if has_new and need_probs:
        raise ValueError("new_kv folding requires need_probs=False")
    if not has_new:
        new_k = jnp.zeros((B, Hc, 1, D), cache_k.dtype)
        new_v = new_k
    if not chunk:
        chunk = default_chunk(Hc, D, cache_k.dtype.itemsize)
    chunk = min(chunk, ((cap + 127) // 128) * 128)
    n_chunks = pl.cdiv(cap, chunk)
    scale = 1.0 / math.sqrt(D)

    if prefill_gap > 0:
        # Valid slots are not a single prefix; fetch every chunk.
        def kv_map(b, c, ln):
            return (b, 0, c, 0)
    else:
        # Clamp to the last live chunk: repeated block indices are not
        # re-fetched, so dead tail chunks cost no HBM traffic.
        def kv_map(b, c, ln):
            last = jnp.maximum((ln[b] + chunk - 1) // chunk - 1, 0)
            return (b, 0, jnp.minimum(c, last), 0)

    kernel = functools.partial(
        _kernel, scale=scale, chunk=chunk, n_chunks=n_chunks,
        prefill_gap=prefill_gap, window=window, need_probs=need_probs,
        has_new=has_new)

    out_specs = [
        pl.BlockSpec((1, Hc, R, D), lambda b, c, ln: (b, 0, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, Hc, R, D), q.dtype)]
    if need_probs:
        out_specs.append(
            pl.BlockSpec((1, Hc, R, chunk), lambda b, c, ln: (b, 0, 0, c)))
        out_shape.append(
            jax.ShapeDtypeStruct((B, Hc, R, cap), jnp.float32))
    else:
        # Dummy 0-cost slot so the kernel signature is static.
        out_specs.append(
            pl.BlockSpec((1, 1, 1, chunk), lambda b, c, ln: (0, 0, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, 1, 1, chunk),
                                              jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, Hc, R, D), lambda b, c, ln: (b, 0, 0, 0)),
            # Whole-array block: a (1, Hc) slice would violate Mosaic's
            # (8, 128)-divisibility rule; the kernel row-indexes it.
            pl.BlockSpec((B, Hc), lambda b, c, ln: (0, 0)),
            pl.BlockSpec((1, Hc, chunk, D), kv_map),
            pl.BlockSpec((1, Hc, chunk, D), kv_map),
            pl.BlockSpec((1, Hc, 1, D), lambda b, c, ln: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hc, 1, D), lambda b, c, ln: (b, 0, 0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((Hc, R), jnp.float32),
            pltpu.VMEM((Hc, R), jnp.float32),
            pltpu.VMEM((Hc, R, D), jnp.float32),
        ],
    )
    out, s_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(length.astype(jnp.int32), q, pvalid.astype(jnp.int32),
      cache_k, cache_v, new_k, new_v)
    if not need_probs:
        return out, None
    return out, _normalize_logits(s_out)
