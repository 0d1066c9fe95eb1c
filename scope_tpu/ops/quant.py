"""Int8 KV-cache quantization (per-channel, prefill-calibrated).

true_k = k_int8 * scale[..., None, :] with one scale per (layer, batch
row, cache head, channel).  Per-CHANNEL (not per-slot) scales are the
TPU-friendly choice here:

- the scale folds into the query before the logit matmul
  (q_eff = q * ks, since q.k = sum_d q_d * s_d * kint_d) and into the
  attention output after the value matmul — two tiny elementwise ops per
  layer, nothing per cache slot;
- eviction gathers (compression/*) move int8 values only; the scales
  have no slot axis, so the entire compression matrix works unchanged;
- K channels are where RoPE-induced outliers live, which is what
  per-channel scaling captures.

Calibration happens once per request on the compressed prefill cache
with a safety margin for later decode tokens; out-of-range decode values
saturate at +/-127.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Headroom for decode-phase tokens exceeding the prefill calibration
# range before saturation.
MARGIN = 1.25


def calibrate(x: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Per-channel scale over the slot axis.  x: [..., S, D] -> [..., D]
    f32."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis)
    return jnp.maximum(amax * MARGIN, 1e-6) / 127.0


def quantize(x: jnp.ndarray, scale: jnp.ndarray, axis: int = -2
             ) -> jnp.ndarray:
    """x: [..., S, D], scale: [..., D] -> int8 [..., S, D]."""
    s = jnp.expand_dims(scale, axis)
    q = jnp.round(x.astype(jnp.float32) / s)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def dequantize(x_int: jnp.ndarray, scale: jnp.ndarray, axis: int = -2,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    s = jnp.expand_dims(scale, axis)
    return (x_int.astype(jnp.float32) * s).astype(dtype)


# ---------------------------------------------------------------------------
# Packed int4 KV (asymmetric per-channel, two codes per byte)
# ---------------------------------------------------------------------------
#
# true_v = code * scale[..., None, :] + off[..., None, :], codes in [0, 15]
# packed two-per-byte along the channel axis (storage [..., S, D//2] uint8
# — uint8 is the int4 marker dtype throughout the cache machinery).  The
# asymmetric zero point costs NOTHING on the hot path:
#
# - K: logits_s = q.k_s = sum_d q_d*s_d*code_{s,d} + sum_d q_d*s_d*off_d.
#   The second term is constant across slots s, and softmax is shift-
#   invariant, so folding q_eff = q*scale (exactly the int8 fold) yields
#   identical probabilities.
# - V: out_d = sum_s p_s*(code*s_d + off_d) = s_d*dot(p, code) + off_d
#   because the probabilities sum to 1 — the offset folds into the
#   attention output as one elementwise add.
#
# Eviction gathers index the slot axis only, so they move packed bytes
# unchanged; scales/offsets stay slot-free.

MARGIN4 = 1.25


def pack4(codes: jnp.ndarray) -> jnp.ndarray:
    """codes [..., D] integer-valued in [0, 15] -> [..., D//2] uint8.

    PLANAR nibble layout: byte j holds channel j in the low nibble and
    channel j + D//2 in the high nibble.  Unpacking is then a concat of
    two elementwise-shifted views of the packed buffer — no size-2
    minor axis.  The earlier interleaved layout (2i/2i+1) unpacked via
    stack+reshape, whose [..., D2, 2] intermediate tiles the size-2 dim
    to a 128 lane on TPU (64x padding + relayout): int4 decode measured
    253 ms/step at b192 vs ~26 for int8."""
    c = codes.astype(jnp.uint8)
    d2 = c.shape[-1] // 2
    return c[..., :d2] | (c[..., d2:] << 4)


def unpack4(packed: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[..., D2] uint8 -> [..., 2*D2] codes in [0, 15] as ``dtype``."""
    lo = (packed & 0xF).astype(dtype)
    hi = (packed >> 4).astype(dtype)
    return jnp.concatenate([lo, hi], axis=-1)


def calibrate4(x: jnp.ndarray, valid=None, axis: int = -2):
    """Asymmetric per-channel range over the slot axis with MARGIN4
    headroom for decode tokens.  x: [..., S, D]; valid: bool [..., S]
    (junk slots excluded — min/max calibration is junk-sensitive,
    unlike the int8 amax).  Returns (scale, off), each [..., D] f32."""
    xf = x.astype(jnp.float32)
    if valid is not None:
        vm = jnp.expand_dims(valid, -1)
        big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
        mn = jnp.min(jnp.where(vm, xf, big), axis=axis)
        mx = jnp.max(jnp.where(vm, xf, -big), axis=axis)
        ok = mx >= mn                       # any valid slot at all
        mn = jnp.where(ok, mn, 0.0)
        mx = jnp.where(ok, mx, 0.0)
    else:
        mn = jnp.min(xf, axis=axis)
        mx = jnp.max(xf, axis=axis)
    c = (mn + mx) * 0.5
    h = jnp.maximum((mx - mn) * 0.5 * MARGIN4, 1e-6)
    return (2.0 * h) / 15.0, c - h


def quantize4(x: jnp.ndarray, scale: jnp.ndarray, off: jnp.ndarray,
              axis: int = -2) -> jnp.ndarray:
    """x [..., S, D] -> packed uint8 [..., S, D//2]; out-of-range decode
    values saturate at code 0/15."""
    s = jnp.expand_dims(scale, axis)
    o = jnp.expand_dims(off, axis)
    codes = jnp.clip(jnp.round((x.astype(jnp.float32) - o) / s), 0, 15)
    return pack4(codes)


def dequantize4(packed: jnp.ndarray, scale: jnp.ndarray, off: jnp.ndarray,
                axis: int = -2, dtype=jnp.bfloat16) -> jnp.ndarray:
    codes = unpack4(packed, jnp.float32)
    s = jnp.expand_dims(scale, axis)
    o = jnp.expand_dims(off, axis)
    return (codes * s + o).astype(dtype)


def fold_q_scale(q: jnp.ndarray, k_scale: jnp.ndarray) -> jnp.ndarray:
    """Fold the per-channel K scale into q so attention reads quantized
    K bytes with no per-slot dequant: q.k = sum_d (q_d * s_d) * kint_d.
    q: [B, Hq, 1, D]; k_scale: [B, Hc, D] (Hc divides Hq).  Shared by
    the single-device decode path (models/llama.py) and the pipeline-
    parallel one."""
    B, Hq, _, D = q.shape
    Hc = k_scale.shape[1]
    return (q.reshape(B, Hc, Hq // Hc, D)
            * k_scale[:, :, None, :].astype(q.dtype)
            ).reshape(B, Hq, 1, D)


def fold_out_scale(out: jnp.ndarray, v_scale: jnp.ndarray,
                   v_off=None) -> jnp.ndarray:
    """Fold the per-channel V scale (and int4's V zero point — exact
    because probabilities sum to 1) into the attention output.
    out: [B, Hq, 1, D]; v_scale/v_off: [B, Hc, D]."""
    B, Hq, _, D = out.shape
    Hc = v_scale.shape[1]
    og = (out.reshape(B, Hc, Hq // Hc, D)
          * v_scale[:, :, None, :].astype(out.dtype))
    if v_off is not None:
        og = og + v_off[:, :, None, :].astype(out.dtype)
    return og.reshape(B, Hq, 1, D)


def to_compute(x: jnp.ndarray, cd) -> jnp.ndarray:
    """Cache values -> attention compute dtype.  bf16/f32 pass through,
    int8 converts (fuses into the matmul operand load), packed-int4
    uint8 unpacks to codes (scales/offsets are folded by the caller).

    NOTE: for the DECODE hot path use qk_einsum/pv_einsum below — the
    unpack4 concat on the minor axis defeats XLA's operand fusion and
    materializes the whole unpacked cache (52.6ms/step at 1B b192 vs
    int8's 26.4, CLAUDE.md).  to_compute remains for small operands
    (single tokens, page metadata) where the concat is harmless."""
    if x.dtype == jnp.uint8:
        return unpack4(x, cd)
    return x.astype(cd)


def qk_einsum(spec: str, q: jnp.ndarray, k_cache: jnp.ndarray, cd,
              acc=None) -> jnp.ndarray:
    """``einsum(spec, q, K)`` with K in its storage dtype.

    bf16/f32 pass through; int8's convert fuses into the operand load.
    Packed-int4 (uint8) contracts each nibble PLANE separately and adds
    the two half-width partials — no concat, so the mask+convert fuses
    into each einsum's operand and the HBM read stays packed-size
    (VERDICT r3 #4).  Channel layout matches pack4: byte j holds channel
    j in the low nibble and channel D/2+j in the high nibble, so the
    q slices line up with the planes exactly.  K's offset term cancels
    in the softmax (constant per row), so code-space logits are correct.
    """
    kw = {"preferred_element_type": acc} if acc is not None else {}
    if k_cache.dtype == jnp.uint8:
        D2 = k_cache.shape[-1]
        lo = (k_cache & 0xF).astype(cd)
        hi = (k_cache >> 4).astype(cd)
        return (jnp.einsum(spec, q[..., :D2], lo, **kw)
                + jnp.einsum(spec, q[..., D2:], hi, **kw))
    return jnp.einsum(spec, q, to_compute(k_cache, cd), **kw)


def pv_einsum(spec: str, probs: jnp.ndarray, v_cache: jnp.ndarray, cd
              ) -> jnp.ndarray:
    """``einsum(spec, probs, V)`` with V in its storage dtype.

    Packed-int4 runs one einsum per nibble plane; the concat lands on
    the TINY output [.., G, D] (channel halves), not the cache."""
    if v_cache.dtype == jnp.uint8:
        lo = (v_cache & 0xF).astype(cd)
        hi = (v_cache >> 4).astype(cd)
        return jnp.concatenate([jnp.einsum(spec, probs, lo),
                                jnp.einsum(spec, probs, hi)], axis=-1)
    return jnp.einsum(spec, probs, to_compute(v_cache, cd))


def quantize_prefill_layer(kv_dtype: str, ck, cv, length, pvalid, gap: int):
    """In-scan per-layer prefill-cache quantization.

    Returns (ck', cv', k_scale, v_scale, k_off, v_off) with scalar-zero
    placeholders for unused leaves (lax.scan needs one pytree shape
    across dtypes).  int4 calibration masks to valid slots: compression
    gathers leave junk in dead slots and a min/max range is junk-
    sensitive."""
    z = jnp.zeros(())
    if kv_dtype == "int8":
        ks, vs = calibrate(ck), calibrate(cv)
        return quantize(ck, ks), quantize(cv, vs), ks, vs, z, z
    if kv_dtype == "int4":
        from scope_tpu.cache import slot_mask
        mask = slot_mask(length, pvalid, gap, ck.shape[2])   # [B, H, S]
        ks, ko = calibrate4(ck, valid=mask)
        vs, vo = calibrate4(cv, valid=mask)
        return (quantize4(ck, ks, ko), quantize4(cv, vs, vo),
                ks, vs, ko, vo)
    return ck, cv, z, z, z, z


# ---------------------------------------------------------------------------
# Weight-only int8 (per output channel)
# ---------------------------------------------------------------------------

WEIGHT_NAMES = ("wqkv", "wo", "w_gate", "w_up", "w_down")


def quantize_layer_weights(params, names=WEIGHT_NAMES):
    """Weight-only per-output-channel int8 for the stacked layer weights.

    Decode at small batch streams every weight byte each step, so weight-
    only int8 halves the dominant HBM traffic; activations stay bf16 and
    the convert fuses into the matmul weight read (ops/common.wdot).
    w: [L, E, F] -> int8 [L, E, F] + f32 scale [L, F] (one scale per
    layer and output channel: dot(x, W)[f] = dot(x, W_i8)[f] * s[f]).

    Opt-in (EngineConfig.weight_dtype="int8"); the HF-parity contract
    keeps bf16 weights.
    """
    layers = dict(params["layers"])
    for n in names:
        w = layers[n].astype(jnp.float32)                     # [L, E, F]
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=1), 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / s[:, None, :]), -127, 127)
        layers[n] = q.astype(jnp.int8)
        layers[n + "_scale"] = s                              # [L, F]
    return {**params, "layers": layers}


def materialize_lm_head(params, int8: bool = True):
    """Store the tied lm_head in matmul orientation, once.

    ``dot(h, embed.T)`` makes XLA:TPU materialize the full transposed
    [V, E] matrix EVERY decode step (~525MB write+read at 1B — seen in
    optimized HLO); storing ``lm_head_t`` [E, V] pays that once in HBM.
    With int8 the scale is per INPUT channel (s[e]) so it folds into h
    before the matmul: logits = dot(h * s, W_i8) — per-OUTPUT (vocab)
    scales would reorder logits and change the argmax.  No-op for
    untied-head models (they already store lm_head in [E, V]).
    """
    if "lm_head" in params or "lm_head_t" in params:
        return params
    w = params["embed"].astype(jnp.float32).T                 # [E, V]
    if not int8:
        return {**params, "lm_head_t": w.astype(params["embed"].dtype)}
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=1), 1e-8) / 127.0   # [E]
    q = jnp.clip(jnp.round(w / s[:, None]), -127, 127).astype(jnp.int8)
    return {**params, "lm_head_t": q, "lm_head_t_scale": s}
