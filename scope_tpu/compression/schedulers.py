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
    """Cross-layer scheduler counters (reference class attributes).

    Scalar counters reproduce the reference's single-stream semantics
    (class attributes shared across layers, kv_utils.py:92-94).  With
    ``init(batch=B)`` the counters are per-row [B] arrays: each batch row
    is an independent request stream with its own linear/jump schedule —
    what continuous-batching serving needs (the reference cannot express
    this; its counters are global across whatever shares the process)."""

    step: jnp.ndarray        # current_decoding_step (per layer-call)
    jump_step: jnp.ndarray
    jump_layer: jnp.ndarray

    @staticmethod
    def init(batch: int = 0) -> "SchedState":
        z = jnp.zeros((batch,) if batch else (), jnp.int32)
        return SchedState(step=z, jump_step=z, jump_layer=z)

    def reset_row(self, row: int) -> "SchedState":
        """Zero one row's counters (new request admitted to that slot)."""
        return SchedState(step=self.step.at[row].set(0),
                          jump_step=self.jump_step.at[row].set(0),
                          jump_layer=self.jump_layer.at[row].set(0))


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


def schedule_decision(
    comp: CompressionConfig,
    caps: DecodeCaps,
    state: SchedState,
    length: jnp.ndarray,        # [B] includes the appended token
    prompt_len: jnp.ndarray,    # [B]
    layer_idx,
    num_layers: int,
):
    """Pure counter/gate logic for one layer call.

    Returns (row_gate [B] bool, n_keep [B], pseg [B], positional, state).
    Splitting this from the cache rewrite lets the model gate the whole
    (expensive) rewrite with one lax.cond on the stacked buffer.
    """
    metric = comp.decoding_metric
    W = comp.decoding_window_size
    r = comp.decoding_recent_size
    delta = comp.delta
    B = length.shape[0]
    P = comp.max_capacity_prompt

    if comp.method in ("allkv", "quest"):
        pseg0 = prompt_len
    elif comp.method == "headwise":
        pseg0 = jnp.full((B,), comp.headwise_max_budget, jnp.int32)
    else:
        pseg0 = jnp.full((B,), P, jnp.int32)

    thresh = delta * num_layers
    positional = False
    pseg = pseg0

    if metric == "none":
        return jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32), pseg, \
            False, state
    if metric == "fixed":
        row_gate = length >= pseg0 + W
        n_keep = jnp.full((B,), W - r, jnp.int32)
    elif metric in ("linear", "jump"):
        w_t = r + state.step // thresh           # scalar or [B] (per-row)
        state = state.replace(step=state.step + 1)
        row_gate = length >= pseg0 + w_t
        n_keep = jnp.broadcast_to((w_t - r).astype(jnp.int32), (B,))
        if metric == "jump":
            # Scalar counters: one stream, gate couples all rows (the
            # reference's class-attribute arithmetic).  Per-row counters:
            # each row runs its own jump wave.
            gate = jnp.any(row_gate) if state.jump_step.ndim == 0 \
                else row_gate
            counting = gate & (state.jump_step < thresh)
            wave = gate & (state.jump_step >= thresh)
            js = state.jump_step + counting.astype(jnp.int32)
            jl = state.jump_layer + wave.astype(jnp.int32)
            finished = jl >= num_layers
            state = state.replace(jump_step=jnp.where(finished, 0, js),
                                  jump_layer=jnp.where(finished, 0, jl))
            row_gate = row_gate & wave
    elif metric == "h2o":
        row_gate = length >= pseg0 + W
        n_keep = pseg0 + W - r
        pseg = jnp.zeros((B,), jnp.int32)
    elif metric == "slm":
        row_gate = length >= pseg0 + W
        n_keep = pseg0 + W - r
        pseg = jnp.zeros((B,), jnp.int32)
        positional = True
    elif metric == "pyramidinfer":
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
    region_len = length - r - pseg
    n_keep = jnp.clip(n_keep, 0, jnp.maximum(region_len, 0))
    n_keep = jnp.minimum(n_keep, keep_cap)
    n_keep = jnp.minimum(n_keep, caps.capacity - r - pseg)
    return row_gate, n_keep, pseg, positional, state


def force_pseg(comp: CompressionConfig, batch: int, prompt_len):
    """(pseg [B], positional) for a host-planned force rewrite — the one
    policy table shared by the single-device force path (models/llama.py)
    and the pipeline-parallel force path (parallel/pipeline.py):
    method-specific metrics re-rank from slot 0 (slm positionally,
    kv_utils.py:679-700/:881-902/:237-263); allkv/fullkv protect the
    RECORDED prompt; everything else protects max_capacity_prompt."""
    positional = comp.decoding_metric == "slm"
    if comp.decoding_metric in ("h2o", "slm", "pyramidinfer"):
        return jnp.zeros((batch,), jnp.int32), positional
    if comp.method in ("allkv", "fullkv"):
        return prompt_len, positional
    return jnp.full((batch,), comp.max_capacity_prompt, jnp.int32), \
        positional


def block_width(comp: CompressionConfig, caps: DecodeCaps) -> int:
    """Static width of the rewritten region [pseg, pseg + blkW)."""
    return min(caps.keep_cap + comp.decoding_recent_size, caps.capacity)


def block_map(comp, caps, probs, length, pseg, n_keep, row_gate,
              positional):
    """Src map restricted to the rewritten block [pseg, pseg+blkW).

    Returns (src_blk [B, H, blkW] absolute slot indices, new_len [B]).
    Rows/slots not rewritten map to themselves, so the caller can apply
    the gather+scatter unconditionally — the expensive top-k stays behind
    the caller's lax.cond while the cache rewrite never carries the full
    stacked buffer through a conditional (XLA copies cond operands)."""
    B, H, S = probs.shape
    r = comp.decoding_recent_size
    keep_cap = min(caps.keep_cap, caps.capacity)
    blkW = block_width(comp, caps)
    d = jnp.arange(blkW, dtype=jnp.int32)
    pseg_b = pseg[:, None, None]
    len_b = length[:, None, None]
    # Scores over [pseg, length - r).
    s_idx = jnp.arange(S, dtype=jnp.int32)
    score_region = ((s_idx[None, None, :] >= pseg_b)
                    & (s_idx[None, None, :] < len_b - r))
    if positional:
        sc = jnp.where(score_region,
                       -s_idx[None, None, :].astype(jnp.float32), NEG_INF)
        sc = jnp.broadcast_to(sc, (B, H, S))
    else:
        sc = jnp.where(score_region, probs, NEG_INF)
    topk_idx = lax.top_k(sc, keep_cap)[1]

    nk = n_keep[:, None, None]
    in_keep = d[None, None, :] < nk
    in_rec = (d[None, None, :] >= nk) & (d[None, None, :] < nk + r)
    keep_pos = jnp.clip(d, 0, keep_cap - 1)
    src_keep = jnp.take_along_axis(
        topk_idx, jnp.broadcast_to(keep_pos, (B, H, blkW)), axis=-1)
    src_rec = (len_b - r) + (d[None, None, :] - nk)
    src_id = pseg_b + d[None, None, :]
    src = jnp.where(in_keep, src_keep,
                    jnp.where(in_rec, src_rec, src_id))
    src = jnp.where(row_gate[:, None, None], src, src_id)
    new_len = jnp.where(row_gate, pseg + n_keep + r, length)
    return src.astype(jnp.int32), new_len


def identity_block_map(comp, caps, length, pseg, num_heads: int):
    """The hold-branch counterpart of :func:`block_map`."""
    B = length.shape[0]
    blkW = block_width(comp, caps)
    d = jnp.arange(blkW, dtype=jnp.int32)
    src = jnp.broadcast_to(pseg[:, None, None] + d[None, None, :],
                           (B, num_heads, blkW)).astype(jnp.int32)
    return src, length


def block_rewrite_cond(comp, caps, probs, ck_l, cv_l, length, pseg,
                       n_keep, row_gate, positional, num_heads: int):
    """Conditional block rewrite with a cheap hold path.

    Returns (kblk, vblk, new_len) where kblk/vblk are the [B, H, blkW, D]
    contents of the region [pseg, pseg+blkW) after this step.  The
    expensive top-k + gather only run when a row fires; the hold branch is
    a contiguous dynamic_slice.  Crucially the lax.cond only RETURNS the
    small block — returning the cache itself forces XLA to allocate (copy)
    fresh full-size output buffers every step (~20ms at 1B scale).
    """
    B, H, cap, D = ck_l.shape
    blkW = block_width(comp, caps)
    start = (0, 0, pseg[0], 0)

    def fire_branch(_):
        src_blk, new_len = block_map(comp, caps, probs, length, pseg,
                                     n_keep, row_gate, positional)
        src = jnp.broadcast_to(src_blk, (B, H, blkW))
        src_c = jnp.clip(src, 0, cap - 1)[..., None]
        return (jnp.take_along_axis(ck_l, src_c, axis=2),
                jnp.take_along_axis(cv_l, src_c, axis=2),
                jnp.where(row_gate, pseg + n_keep
                          + comp.decoding_recent_size, length))

    def hold_branch(_):
        if B == 1:
            return (lax.dynamic_slice(ck_l, start, (B, H, blkW, D)),
                    lax.dynamic_slice(cv_l, start, (B, H, blkW, D)),
                    length)
        # Per-row pseg (e.g. allkv batches): slice each row at its own
        # offset so the caller's per-row write-back round-trips.
        ks = [lax.dynamic_slice(ck_l, (b, 0, pseg[b], 0), (1, H, blkW, D))
              for b in range(B)]
        vs = [lax.dynamic_slice(cv_l, (b, 0, pseg[b], 0), (1, H, blkW, D))
              for b in range(B)]
        return (jnp.concatenate(ks, 0), jnp.concatenate(vs, 0), length)

    return lax.cond(jnp.any(row_gate), fire_branch, hold_branch, None)


def apply_block_rewrite(ck_all, cv_all, l: int, src_blk, pseg,
                        num_heads: int, uniform_pseg: bool = True):
    """Gather the block by absolute src indices and write it back at
    [pseg, pseg+blkW) in the stacked layer l.

    The destination is contiguous, so for B==1 (or a batch-uniform pseg)
    this is ONE dynamic_update_slice — a general XLA scatter here costs
    >20ms/step on TPU.  Capacity derivation guarantees
    pseg + blkW <= capacity (no start-index clamping)."""
    B = src_blk.shape[0]
    blkW = src_blk.shape[-1]
    H = num_heads
    cap = ck_all.shape[3]
    src = jnp.broadcast_to(src_blk, (B, H, blkW))
    src_c = jnp.clip(src, 0, cap - 1)[..., None]
    kblk = jnp.take_along_axis(ck_all[l], src_c, axis=2)
    vblk = jnp.take_along_axis(cv_all[l], src_c, axis=2)
    if B == 1 or uniform_pseg:
        start = (l, 0, 0, pseg[0], 0)
        ck_all = lax.dynamic_update_slice(ck_all, kblk[None], start)
        cv_all = lax.dynamic_update_slice(cv_all, vblk[None], start)
        return ck_all, cv_all
    dest = jnp.broadcast_to(
        pseg[:, None, None] + jnp.arange(blkW)[None, None, :], (B, H, blkW))
    b_ix = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, H, blkW))
    h_ix = jnp.broadcast_to(jnp.arange(H)[None, :, None], (B, H, blkW))
    ck_all = ck_all.at[l, b_ix, h_ix, dest, :].set(kblk, mode="drop")
    cv_all = cv_all.at[l, b_ix, h_ix, dest, :].set(vblk, mode="drop")
    return ck_all, cv_all


def lazy_tombstone_fire(comp, caps, probs, alive_l, length, pseg, n_keep,
                        row_gate):
    """LAZY fire on one layer's alive mask: kill the scored region
    [pseg, length - r), scatter the top-n_keep back alive — no gather,
    no big-buffer write-back (eviction is permanent, so tombstoning is
    semantically identical to the rewrite; the row-DMA gather costs
    ~675ms/fire at 1B b192, the mask update ~25ms).

    alive_l: [B, H, cap] bool; probs: [B, H, cap] f32 (this step's
    attention probabilities); length [B] INCLUDES the appended token;
    pseg/n_keep [B]; row_gate [B] bool (ungated rows keep their mask).
    Returns the new alive mask.  Shared by the single-device force path
    (models/llama.py) and the pipeline-parallel one
    (parallel/pipeline.py) — the parity contract between them depends
    on this being ONE implementation."""
    B, H, cap = alive_l.shape
    rr = comp.decoding_recent_size
    d_sl = jnp.arange(cap, dtype=jnp.int32)
    region = ((d_sl[None, None, :] >= pseg[:, None, None])
              & (d_sl[None, None, :] < (length - rr)[:, None, None])
              & row_gate[:, None, None])
    sc = jnp.where(region & alive_l, probs, -jnp.inf)
    kc = min(caps.keep_cap, cap)
    topk_idx = lax.top_k(sc, kc)[1]
    new_al = alive_l & ~region
    jpos = jnp.arange(kc, dtype=jnp.int32)[None, None, :]
    live = (jpos < n_keep[:, None, None]) & row_gate[:, None, None]
    idx = jnp.where(live, topk_idx, cap)
    bb = jnp.broadcast_to(jnp.arange(B)[:, None, None], idx.shape)
    hh = jnp.broadcast_to(jnp.arange(H)[None, :, None], idx.shape)
    return new_al.at[bb, hh, idx].set(True, mode="drop")


def compress_layer(comp, caps, probs, ck, cv, length, row_gate, n_keep,
                   pseg, positional):
    """The gather rewrite for one layer (call under lax.cond).

    ck/cv: [B, H, S, D]; probs: [B, H, S].  Returns (ck', cv', length')."""
    r = comp.decoding_recent_size
    keep_cap = min(caps.keep_cap, caps.capacity)
    src, new_len = _keep_map(probs, length, pseg, r, n_keep, keep_cap,
                             caps.capacity, row_gate, positional=positional)
    ck2, cv2 = _rewrite(ck, cv, src)
    return ck2, cv2, new_len


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
    """One reference ``update_kv_in_decoding`` call for one layer.

    Thin composition of :func:`schedule_decision` + :func:`compress_layer`
    (the model inlines these two for the stacked-buffer fast path)."""
    if comp.decoding_metric == "none":
        return cache_k, cache_v, length, state

    row_gate, n_keep, pseg, positional, state = schedule_decision(
        comp, caps, state, length, prompt_len, layer_idx, num_layers)
    do = jnp.any(row_gate)

    def compress(args):
        ck, cv, ln = args
        return compress_layer(comp, caps, probs, ck, cv, ln, row_gate,
                              n_keep, pseg, positional)

    def identity(args):
        return args

    cache_k, cache_v, length = lax.cond(
        do, compress, identity, (cache_k, cache_v, length))
    return cache_k, cache_v, length, state
