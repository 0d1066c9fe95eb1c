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
