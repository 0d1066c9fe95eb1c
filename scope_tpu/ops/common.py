"""Core numerical ops shared by all model families.

HF-compatible semantics (so that full-cache generation matches
``transformers`` token-for-token, cf. SURVEY.md §7 step 1):
- RMSNorm computes the variance in float32 and casts back before the weight
  multiply, like ``LlamaRMSNorm``.
- RoPE uses the rotate-half convention with duplicated cos/sin, and supports
  Llama-3.1-style frequency scaling.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * lax.rsqrt(var + eps)
    return (weight * xf.astype(dtype)).astype(dtype)


def rope_inv_freq(head_dim: int, theta: float,
                  rope_scaling: Optional[Tuple[float, float, float, int]]
                  ) -> jnp.ndarray:
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    if rope_scaling is None:
        return inv_freq
    # Llama-3.1 rope scaling (matches HF ROPE_INIT_FUNCTIONS["llama3"]).
    factor, low_freq_factor, high_freq_factor, orig_max = rope_scaling
    low_freq_wavelen = orig_max / low_freq_factor
    high_freq_wavelen = orig_max / high_freq_factor
    wavelen = 2.0 * math.pi / inv_freq
    inv_freq_llama = jnp.where(wavelen > low_freq_wavelen,
                               inv_freq / factor, inv_freq)
    smooth = ((orig_max / wavelen - low_freq_factor)
              / (high_freq_factor - low_freq_factor))
    smoothed = (1.0 - smooth) * inv_freq_llama / factor + smooth * inv_freq_llama
    is_medium = (wavelen >= high_freq_wavelen) & (wavelen <= low_freq_wavelen)
    return jnp.where(is_medium, smoothed, inv_freq_llama)


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions [..., S] int -> cos/sin [..., S, head_dim] float32."""
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
               ) -> jnp.ndarray:
    """x [B, H, S, D]; cos/sin [B, S, D] (or broadcastable)."""
    dtype = x.dtype
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(dtype)


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, H_kv, S, D] -> [B, H_kv * n_rep, S, D] (interleave like HF)."""
    if n_rep == 1:
        return x
    b, h, s, d = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, :], (b, h, n_rep, s, d))
    return x.reshape(b, h * n_rep, s, d)


def swiglu(x: jnp.ndarray, w_gate: jnp.ndarray, w_up: jnp.ndarray,
           w_down: jnp.ndarray) -> jnp.ndarray:
    g = jnp.dot(x, w_gate)
    u = jnp.dot(x, w_up)
    return jnp.dot(jax.nn.silu(g) * u, w_down)


def wdot(x: jnp.ndarray, p, name: str) -> jnp.ndarray:
    """Weight matmul with optional weight-only int8.

    If ``p[name]`` is int8 (ops/quant.quantize_layer_weights), the
    convert to x.dtype is fused into the dot's weight read — halving the
    HBM bytes the decode step streams per weight — and the per-output-
    channel scale ``p[name + "_scale"]`` is applied to the product.  The
    scale is linear, so under tensor parallelism it commutes with the
    o_proj/down all-reduce of partial sums.
    """
    w = p[name]
    if w.dtype == jnp.int8:
        out = jnp.dot(x, w.astype(x.dtype))
        return out * p[name + "_scale"].astype(x.dtype)
    return jnp.dot(x, w)


def mlp(x: jnp.ndarray, p) -> jnp.ndarray:
    """SwiGLU MLP over a layer param dict (int8-weight aware)."""
    g = wdot(x, p, "w_gate")
    u = wdot(x, p, "w_up")
    return wdot(jax.nn.silu(g) * u, p, "w_down")
