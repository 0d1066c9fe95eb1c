"""SCOPE decode-phase budget schedulers as functional cache transforms.

Implements the reference's ``update_kv_in_decoding`` matrix — fixed
("slide"), linear ("adaptive"), jump ("discontinuous"), plus the
method-specific h2o / slm / pyramidinfer metrics — over the static slotted
cache.  The reference's cross-layer *class attribute* counters
(``current_decoding_step``/``jump_step``/``jump_layer``,
kv_utils.py:92-94 etc.) become explicit int32 state threaded through the
layer scan; each layer call performs exactly the same counter arithmetic as
one reference method call, so the div-by-(delta * num_layers) scheduling is
bit-identical.

Unlike the reference, counters are always reset at prefill (the reference
only resets them for H2O/ALLKV/Quest and leaks state across examples for
SnapKV/PyramidKV/StreamingLLM — SURVEY.md §2.3; that leak is a bug we do
not reproduce).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from scope_tpu.config import CompressionConfig
from scope_tpu.ops.attention import NEG_INF


@flax.struct.dataclass
class SchedState:
    """Cross-layer scheduler counters (reference class attributes)."""

    step: jnp.ndarray        # current_decoding_step (per layer-call)
    jump_step: jnp.ndarray
    jump_layer: jnp.ndarray

    @staticmethod
    def init() -> "SchedState":
        z = jnp.zeros((), jnp.int32)
        return SchedState(step=z, jump_step=z, jump_layer=z)


class DecodeCaps(NamedTuple):
    """Static capacity knobs derived by the engine."""

    keep_cap: int            # static top-k size >= any W(t) - r
    capacity: int            # cache slot capacity S_max


def static_keep_cap(comp: CompressionConfig, max_new_tokens: int) -> int:
    """Static top-k size bounding the data-dependent keep count."""
    W = comp.decoding_window_size
    r = comp.decoding_recent_size
    P = comp.max_capacity_prompt
    m = comp.decoding_metric
    if m in ("fixed",):
        return W - r
    if m in ("linear", "jump"):
        return max(W - r, max_new_tokens // max(comp.delta, 1) + 1)
    if m == "pyramidinfer":
        min_num = (P + W - r) // 2
        max_num = (P + W - r) * 2 - min_num
        return max(P + W - r, max_num + W)
    # h2o / slm global metrics
    return P + W - r


def _keep_map(probs: jnp.ndarray, length: jnp.ndarray, pseg: jnp.ndarray,
              recent: int, n_keep: jnp.ndarray, keep_cap: int,
              capacity: int, row_gate: jnp.ndarray,
              positional: bool = False):
    """Dest->src map for [prefill pseg verbatim | top-n_keep of the decode
    region by score | last ``recent``].  The shared mechanical skeleton of
    every decode metric (e.g. kv_utils.py:701-730).

    probs: [B, H, S] f32 scores (this step's attention probabilities).
    length/pseg/row_gate: [B]; n_keep: [B] (traced counts).
    Rows where row_gate is False get an identity map (no compression).
    positional=True keeps the lowest slot indices instead of top scores
    (slm metric, kv_utils.py:881-902).
    """
    B, H, S = probs.shape
    d = jnp.arange(capacity, dtype=jnp.int32)
    pseg_b = pseg[:, None, None]
    len_b = length[:, None, None]
    region = ((d[None, None, :] >= pseg_b)
              & (d[None, None, :] < len_b - recent))
    if positional:
        sc = jnp.where(region, -d[None, None, :].astype(jnp.float32),
                       NEG_INF)
        sc = jnp.broadcast_to(sc, (B, H, capacity))
    else:
        sc = jnp.where(region, probs, NEG_INF)
    topk_idx = lax.top_k(sc, keep_cap)[1]                      # [B,H,cap]

    nk = n_keep[:, None, None]
    in_pre = d[None, None, :] < pseg_b
    in_keep = (d[None, None, :] >= pseg_b) & (d[None, None, :] < pseg_b + nk)
    in_rec = ((d[None, None, :] >= pseg_b + nk)
              & (d[None, None, :] < pseg_b + nk + recent))
    keep_pos = jnp.clip(d[None, None, :] - pseg_b, 0, keep_cap - 1)
    src_keep = jnp.take_along_axis(
        topk_idx, jnp.broadcast_to(keep_pos, (B, H, capacity)), axis=-1)
    src_rec = (len_b - recent) + (d[None, None, :] - pseg_b - nk)
    src = jnp.where(in_pre, d[None, None, :],
                    jnp.where(in_keep, src_keep,
                              jnp.where(in_rec, src_rec, 0)))
    # Ungated rows: identity.
    src = jnp.where(row_gate[:, None, None], src, d[None, None, :])
    src = jnp.clip(src, 0, capacity - 1).astype(jnp.int32)
    new_len = jnp.where(row_gate, pseg + n_keep + recent, length)
    return src, new_len


def _rewrite(cache_k, cache_v, src):
    idx = src[..., None]
    return (jnp.take_along_axis(cache_k, idx, axis=2),
            jnp.take_along_axis(cache_v, idx, axis=2))


def decode_schedule(
    comp: CompressionConfig,
    caps: DecodeCaps,
    state: SchedState,
    cache_k: jnp.ndarray,       # [B, H, S_max, D] (token already appended)
    cache_v: jnp.ndarray,
    length: jnp.ndarray,        # [B] int32, includes the appended token
    probs: jnp.ndarray,         # [B, H, S_max] f32 this step's attn probs
    prompt_len: jnp.ndarray,    # [B] int32 recorded true prompt length
    layer_idx: jnp.ndarray,
    num_layers: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, SchedState]:
    """One reference ``update_kv_in_decoding`` call for one layer."""
    metric = comp.decoding_metric
    if metric == "none":
        return cache_k, cache_v, length, state

    W = comp.decoding_window_size
    r = comp.decoding_recent_size
    delta = comp.delta
    B = cache_k.shape[0]
    P = comp.max_capacity_prompt

    # P in the decode gates: recorded prompt length for ALLKV/Quest
    # (kv_utils.py:1070,1085), the configured budget for everything else.
    if comp.method in ("allkv", "quest"):
        pseg0 = prompt_len
    elif comp.method == "headwise":
        # Reserved per-head prefill segment boundary.
        pseg0 = jnp.full((B,), comp.headwise_max_budget, jnp.int32)
    else:
        pseg0 = jnp.full((B,), P, jnp.int32)

    thresh = delta * num_layers
    positional = False
    pseg = pseg0

    if metric == "fixed":
        # kv_utils.py:701-730 — no counters.
        row_gate = length >= pseg0 + W
        n_keep = jnp.full((B,), W - r, jnp.int32)
    elif metric in ("linear", "jump"):
        # W(t) = r + current_decoding_step // (delta * L); counter
        # increments *before* the gate (kv_utils.py:733-734, :764-765).
        w_t = r + state.step // thresh
        state = state.replace(step=state.step + 1)
        row_gate = length >= pseg0 + w_t
        n_keep = jnp.full((B,), w_t - r, jnp.int32)
        if metric == "jump":
            # jump burst waves (kv_utils.py:767-776): per reference, the
            # counters move once per layer call when *the* gate passes
            # (batch=1 semantics; we use the any-row gate for batch > 1).
            gate_any = jnp.any(row_gate)
            counting = gate_any & (state.jump_step < thresh)
            wave = gate_any & (state.jump_step >= thresh)
            js = state.jump_step + counting.astype(jnp.int32)
            jl = state.jump_layer + wave.astype(jnp.int32)
            finished = jl >= num_layers
            state = state.replace(
                jump_step=jnp.where(finished, 0, js),
                jump_layer=jnp.where(finished, 0, jl))
            row_gate = row_gate & wave
    elif metric == "h2o":
        # Pure H2O during decode: global top-k over the whole cache minus
        # the recent window, no protected prefill (kv_utils.py:679-700).
        row_gate = length >= pseg0 + W
        n_keep = pseg0 + W - r
        pseg = jnp.zeros((B,), jnp.int32)
    elif metric == "slm":
        # Positional sink+recent during decode (kv_utils.py:881-902; the
        # reference body has a latent NameError — we implement the intent).
        row_gate = length >= pseg0 + W
        n_keep = pseg0 + W - r
        pseg = jnp.zeros((B,), jnp.int32)
        positional = True
    elif metric == "pyramidinfer":
        # Pyramid budget over the full cache (kv_utils.py:237-280).
        min_num = (P + W - r) // 2
        max_num = (P + W - r) * 2 - min_num
        steps = (max_num - min_num) // num_layers
        budget_l = max_num - layer_idx * steps
        row_gate = length >= pseg0 + W
        mid = length < (P - r) * 2 + W
        n_keep = jnp.where(mid, P + W - r, budget_l + W)
        pseg = jnp.zeros((B,), jnp.int32)
    else:
        raise ValueError(f"unknown decoding metric {metric!r}")

    keep_cap = min(caps.keep_cap, caps.capacity)
    # Never keep more than the scored region holds, nor overflow capacity.
    region_len = length - r - pseg
    n_keep = jnp.clip(n_keep, 0, jnp.maximum(region_len, 0))
    n_keep = jnp.minimum(n_keep, keep_cap)
    n_keep = jnp.minimum(n_keep, caps.capacity - r - pseg)

    do = jnp.any(row_gate)

    def compress(args):
        ck, cv, ln = args
        src, new_len = _keep_map(probs, ln, pseg, r, n_keep, keep_cap,
                                 caps.capacity, row_gate,
                                 positional=positional)
        ck2, cv2 = _rewrite(ck, cv, src)
        return ck2, cv2, new_len

    def identity(args):
        return args

    cache_k, cache_v, length = lax.cond(
        do, compress, identity, (cache_k, cache_v, length))
    return cache_k, cache_v, length, state
