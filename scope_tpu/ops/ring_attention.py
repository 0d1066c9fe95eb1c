"""Sequence-parallel ring attention for prefill (SP/CP extension slot).

The reference handles long context only by compression + brute middle-
truncation (run_longgenbench.py:167-173) — it has no sequence sharding
of any kind (SURVEY §2.5).  Here the prefill's O(S^2) attention+scoring
compute shards the SEQUENCE axis over a mesh axis: each device holds a
contiguous prompt chunk of Q/K/V and K/V chunks rotate around the ring
(jax.lax.ppermute over ICI) while outputs accumulate via online softmax
— the standard TPU ring-attention pattern, extended with SCOPE's
eviction-score capture:

- the causal ATTENTION pass rotates K+V once (n steps), accumulating
  (max, denom, numerator) per query chunk;
- the SCORING pass reproduces ops/attention.prefill_attention's
  reference-quirk softmax (NO causal mask except the trailing w x w
  block, kv_utils.py:648-654 — earlier queries attend future keys, so
  scoring is inherently all-to-all): one rotation of K accumulates the
  per-query normalizers, a second rotates (K, colsum-accumulator) pairs
  so each key chunk's column sums ride home with it;
- SnapKV's last-w-query window scores use an all-gather of the (tiny)
  window queries + psum-normalized partial softmax.

Everything is expression-parallel to the XLA path in ops/attention.py,
and sp_prefill_attention (the shard_map wrapper) is tested equal to the
monolithic prefill_attention on a virtual 8-device mesh.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from scope_tpu.ops.attention import NEG_INF, PrefillScores


def _rot(x, axis_name, n):
    """Shift chunk ownership by +1 around the ring."""
    return lax.ppermute(x, axis_name,
                        perm=[(i, (i + 1) % n) for i in range(n)])


def ring_prefill_attention(
    q: jnp.ndarray,             # [B, H, C, D] this device's query chunk
    k: jnp.ndarray,             # [B, H, C, D] this device's key chunk
    v: jnp.ndarray,
    true_len: jnp.ndarray,      # [B] global real-token count
    *,
    axis_name: str,
    axis_size: int,
    window_size: int,
    need_colsum_all: bool = False,
    need_colsum_window: bool = False,
    sliding_window: Optional[int] = None,
) -> Tuple[jnp.ndarray, PrefillScores]:
    """Runs INSIDE shard_map with the sequence axis sharded over
    ``axis_name``.  Returns (out [B,H,C,D], scores with [B,H,C] leaves)
    — everything stays sequence-sharded."""
    B, H, C, D = q.shape
    n = axis_size
    scale = 1.0 / math.sqrt(D)
    d_idx = lax.axis_index(axis_name)
    my_q_pos = d_idx * C + jnp.arange(C)                      # [C] absolute
    q_real = my_q_pos[None, :] < true_len[:, None]            # [B, C]
    w = window_size

    # ---- causal attention pass: rotate K/V, online softmax ----------
    def attn_step(r, carry):
        m, s, o, kc, vc = carry
        src = (d_idx - r) % n            # chunk index currently held
        kv_pos = src * C + jnp.arange(C)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, kc,
                            preferred_element_type=jnp.float32) * scale
        mask = (kv_pos[None, :] <= my_q_pos[:, None])[None, :, :]
        mask = mask & (kv_pos[None, None, :] < true_len[:, None, None])
        if sliding_window is not None:
            mask = mask & (kv_pos[None, None, :]
                           > my_q_pos[None, :, None] - sliding_window)
        logits = jnp.where(mask[:, None, :, :], logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        s_new = s * alpha + p.sum(-1)
        o_new = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(vc.dtype), vc
        ).astype(jnp.float32)
        return (m_new, s_new, o_new, _rot(kc, axis_name, n),
                _rot(vc, axis_name, n))

    m0 = jnp.full((B, H, C), NEG_INF, jnp.float32)
    s0 = jnp.zeros((B, H, C), jnp.float32)
    o0 = jnp.zeros((B, H, C, D), jnp.float32)
    m, s, o, _, _ = lax.fori_loop(0, n, attn_step, (m0, s0, o0, k, v))
    out = (o / jnp.maximum(s, 1e-30)[..., None]).astype(q.dtype)

    colsum_all = None
    if need_colsum_all:
        # ---- scoring normalizers (all-to-all; reference quirk mask) ---
        def score_mask_for(src):
            kv_pos = src * C + jnp.arange(C)
            tl = true_len[:, None, None]
            in_tail = ((my_q_pos[None, :, None] >= tl - w)
                       & (kv_pos[None, None, :] >= tl - w)
                       & (kv_pos[None, None, :]
                          > my_q_pos[None, :, None]))
            key_real = kv_pos[None, None, :] < tl
            return key_real & ~in_tail                        # [B, C, C]

        def norm_step(r, carry):
            mh, sh, kc = carry
            src = (d_idx - r) % n
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, kc,
                                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(score_mask_for(src)[:, None], logits,
                               NEG_INF)
            m_new = jnp.maximum(mh, logits.max(axis=-1))
            sh = sh * jnp.exp(mh - m_new) \
                + jnp.exp(logits - m_new[..., None]).sum(-1)
            return m_new, sh, _rot(kc, axis_name, n)

        mh, sh, _ = lax.fori_loop(
            0, n, norm_step,
            (jnp.full((B, H, C), NEG_INF, jnp.float32), s0, k))

        # ---- column sums ride home with their key chunk ---------------
        def colsum_step(r, carry):
            kc, acc = carry
            src = (d_idx - r) % n
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, kc,
                                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(score_mask_for(src)[:, None], logits,
                               NEG_INF)
            p = jnp.exp(logits - mh[..., None]) \
                / jnp.maximum(sh, 1e-30)[..., None]
            p = p * q_real[:, None, :, None]       # pad rows contribute 0
            acc = acc + p.sum(axis=2)                          # [B,H,C]
            return _rot(kc, axis_name, n), _rot(acc, axis_name, n)

        # After n rotations each accumulator has passed every device once
        # and sits back on its key chunk's owner.
        _, colsum_all = lax.fori_loop(
            0, n, colsum_step, (k, jnp.zeros((B, H, C), jnp.float32)))

    colsum_window = None
    if need_colsum_window:
        # Last-w real queries: gather them to every device (w is tiny),
        # normalize the window softmax globally via pmax/psum, keep the
        # per-key column sums sharded.
        S = n * C
        row_pos = true_len[:, None] - w + jnp.arange(w)[None, :]  # [B,w]
        row_pos = jnp.clip(row_pos, 0, S - 1)
        local = (row_pos >= d_idx * C) & (row_pos < (d_idx + 1) * C)
        loc_idx = jnp.clip(row_pos - d_idx * C, 0, C - 1)
        q_loc = jnp.take_along_axis(q, loc_idx[:, None, :, None], axis=2)
        q_win = lax.psum(
            jnp.where(local[:, None, :, None], q_loc, 0.0), axis_name)
        kv_pos = d_idx * C + jnp.arange(C)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q_win, k,
                            preferred_element_type=jnp.float32) * scale
        mask = (kv_pos[None, None, :] <= row_pos[:, :, None]) & \
               (kv_pos[None, None, :] < true_len[:, None, None])
        logits = jnp.where(mask[:, None, :, :], logits, NEG_INF)
        mw = lax.pmax(logits.max(axis=-1), axis_name)          # [B,H,w]
        e = jnp.exp(logits - mw[..., None])
        dw = lax.psum(e.sum(-1), axis_name)                    # [B,H,w]
        probs = e / jnp.maximum(dw, 1e-30)[..., None]
        colsum_window = probs.sum(axis=2)                      # [B,H,C]

    return out, PrefillScores(colsum_all=colsum_all,
                              colsum_window=colsum_window)


def sp_prefill_attention(
    mesh,
    q: jnp.ndarray,             # [B, H, S, D] full (roped) tensors
    k: jnp.ndarray,
    v: jnp.ndarray,
    true_len: jnp.ndarray,
    *,
    seq_axis: str = "data",
    window_size: int,
    need_colsum_all: bool = False,
    need_colsum_window: bool = False,
    sliding_window: Optional[int] = None,
) -> Tuple[jnp.ndarray, PrefillScores]:
    """shard_map wrapper: shards the sequence axis of q/k/v over
    ``seq_axis``, runs the ring pass, returns FULL tensors (drop-in for
    ops.attention.prefill_attention; S must divide the axis size)."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                      # older jax
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[seq_axis]
    S = q.shape[2]
    if S % n:
        raise ValueError(f"sequence {S} not divisible by {seq_axis}={n}")

    fn = partial(ring_prefill_attention, axis_name=seq_axis, axis_size=n,
                 window_size=window_size, need_colsum_all=need_colsum_all,
                 need_colsum_window=need_colsum_window,
                 sliding_window=sliding_window)
    spec_seq = P(None, None, seq_axis, None)
    spec_cs = P(None, None, seq_axis)
    out_scores = PrefillScores(
        colsum_all=spec_cs if need_colsum_all else None,
        colsum_window=spec_cs if need_colsum_window else None)
    kwargs = dict(mesh=mesh,
                  in_specs=(spec_seq, spec_seq, spec_seq, P(None)),
                  out_specs=(spec_seq, out_scores))
    try:                       # jax.shard_map (>=0.8) validates replication
        sharded = shard_map(fn, check_vma=False, **kwargs)
    except TypeError:          # older shard_map API
        sharded = shard_map(fn, check_rep=False, **kwargs)
    return sharded(q, k, v, true_len)
