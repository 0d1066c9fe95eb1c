"""Fused decode attention kernel.

One-token attention over the slotted cache: logits, length-mask, softmax
and the value contraction fuse into a single kernel per (batch, cache
head).  At compressed-cache sizes (~2.7k slots) the XLA path is dominated
by fixed per-op overheads (~6 small ops/layer); fusing them is worth more
than the bandwidth, which is already near roofline for large caches.

Grid: (B * Hc,). Each program holds its head's K/V stripes in VMEM
(cap * D * 2B each — fits for cap up to ~16k at D=64 / ~8k at D=128; the
caller falls back to XLA beyond ``max_fused_cap``).  The R query rows per
cache head (R = GQA group size, 1 in parity mode) ride the MXU together.

Outputs the attention result and the normalized probabilities (the
schedulers reuse them as eviction scores; grouped mode needs true
probabilities because scores sum over the group).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(len_ref, pvalid_ref, q_ref, k_ref, v_ref, o_ref, p_ref, *,
            scale: float, cap: int, batch: int, heads: int,
            prefill_gap: int, window: int):
    bh = pl.program_id(0)
    b = bh // heads
    length = len_ref[b]
    q = q_ref[0]                                        # [R, D]
    k = k_ref[0]                                        # [cap, D]
    v = v_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if prefill_gap > 0:
        pv = pvalid_ref[bh]
        valid = (idx < pv) | ((idx >= prefill_gap) & (idx < length))
    else:
        valid = idx < length
    if window > 0:
        # Sliding window over positional slots (fullkv/allkv layouts).
        vpos = length - 1
        valid = valid & (idx > vpos - window)
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.where(s > NEG_INF / 2, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)
    l = jnp.where(l > 0, l, 1.0)
    p = p / l
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)
    p_ref[0] = p


def fused_decode_attention(
    q: jnp.ndarray,            # [B, Hc, R, D] (R = group rows per head)
    cache_k: jnp.ndarray,      # [B, Hc, cap, D]
    cache_v: jnp.ndarray,
    length: jnp.ndarray,       # [B] int32
    pvalid: jnp.ndarray,       # [B, Hc] int32 (headwise layout)
    *,
    prefill_gap: int = 0,
    window: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out [B, Hc, R, D], probs [B, Hc, R, cap] float32)."""
    B, Hc, R, D = q.shape
    cap = cache_k.shape[2]
    scale = 1.0 / math.sqrt(D)
    qf = q.reshape(B * Hc, R, D)
    kf = cache_k.reshape(B * Hc, cap, D)
    vf = cache_v.reshape(B * Hc, cap, D)

    kernel = functools.partial(_kernel, scale=scale, cap=cap, batch=B,
                               heads=Hc, prefill_gap=prefill_gap,
                               window=window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * Hc,),
        in_specs=[
            pl.BlockSpec((1, R, D), lambda bh, ln, pv: (bh, 0, 0)),
            pl.BlockSpec((1, cap, D), lambda bh, ln, pv: (bh, 0, 0)),
            pl.BlockSpec((1, cap, D), lambda bh, ln, pv: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, R, D), lambda bh, ln, pv: (bh, 0, 0)),
            pl.BlockSpec((1, R, cap), lambda bh, ln, pv: (bh, 0, 0)),
        ],
    )
    out, probs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * Hc, R, D), q.dtype),
            jax.ShapeDtypeStruct((B * Hc, R, cap), jnp.float32),
        ],
        interpret=interpret,
    )(length.astype(jnp.int32), pvalid.reshape(B * Hc).astype(jnp.int32),
      qf, kf, vf)
    return out.reshape(B, Hc, R, D), probs.reshape(B, Hc, R, cap)


def max_fused_cap(head_dim: int, vmem_budget: int = 8 * 2**20) -> int:
    """Largest cache capacity whose K+V stripes fit the VMEM budget."""
    return vmem_budget // (2 * head_dim * 2)
