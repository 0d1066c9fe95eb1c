"""Quest: query-aware page selection over an uncompressed prefill cache.

Reference semantics (kv_utils.py:1182-1483):
- Prefill stores everything; the true prompt length is recorded (:1250).
- Each decode step scores 16-token pages with the sign-trick bound
  score_d = max(q_d * page_min_d, q_d * page_max_d) (:1296-1335), selects
  top pages with the last page force-included (local_heavy_hitter_mask
  :23-88, force-include :60-75), and separately compresses the decode
  region with the None/fixed/linear/jump metrics (:1389-1474).
- Layers 0..1 bypass selection entirely (:1277-1278).

Deviations (intent over artifact, SURVEY.md §7):
- The reference *computes* the page selection but then attends over the
  full cache anyway (llama_model.py:2201-2217 uses the appended
  ``key_states``, discarding the "for compute" tensors).  Here attention
  actually runs over [selected pages | decode region] — Quest's point.
- Page min/max metadata is precomputed once after prefill instead of
  rebuilt from ``key * sign`` every step (:1296-1331); the selected pages
  are identical because amax(key * sign) == where(q>0, page_max, page_min)
  dotted with |q|.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from scope_tpu.cache import KVCache
from scope_tpu.compression.schedulers import DecodeCaps, SchedState, _keep_map
from scope_tpu.config import CompressionConfig
from scope_tpu.ops.attention import NEG_INF


def num_pages(max_prompt_len: int, chunk: int) -> int:
    return -(-max_prompt_len // chunk)


def build_page_metadata(comp: CompressionConfig, cache: KVCache,
                        true_len: jnp.ndarray) -> KVCache:
    """Fill per-page min/max key metadata over the prefill region.

    cache.k: [L, B, H, cap, D]; pages cover slots [0, NP*chunk)."""
    chunk = comp.chunk_size
    L, B, H, cap, _ = cache.k.shape
    NP = cap // chunk
    k = cache.k[:, :, :, :NP * chunk, :]
    if k.dtype == jnp.uint8:
        # Packed int4: unpack to CODES for the metadata — per-channel
        # scales are positive, so code order == value order and the
        # selected pages are identical (the offset shifts every page
        # score by the same constant).
        from scope_tpu.ops.quant import unpack4
        k = unpack4(k, jnp.uint8)
    D = k.shape[-1]
    k = k.reshape(L, B, H, NP, chunk, D)
    slot = (jnp.arange(NP * chunk).reshape(NP, chunk))
    real = slot[None, :, :] < true_len[:, None, None]          # [B,NP,chunk]
    real = real[None, :, None, :, :, None]                     # broadcast
    # Int8 cache: min/max over the QUANTIZED values select the same pages
    # as over dequantized keys (per-channel scales are positive and the
    # folded query carries them), so the metadata stays int8-sized.
    if jnp.issubdtype(k.dtype, jnp.integer):
        big = jnp.asarray(jnp.iinfo(k.dtype).max, k.dtype)
    else:
        big = jnp.asarray(jnp.finfo(jnp.float32).max, k.dtype)
    page_min = jnp.min(jnp.where(real, k, big), axis=4)        # [L,B,H,NP,D]
    page_max = jnp.max(jnp.where(real, k, -big), axis=4)
    return cache.replace(page_min=page_min, page_max=page_max)


def update_decode_page_metadata(comp: CompressionConfig, ck_all,
                                pm_all, pM_all, len_all, l: int,
                                uniform_rows: bool = True):
    """Fold the just-appended token (slot length-1 of layer ``l``) into
    its page's min/max metadata — the incremental counterpart of
    :func:`build_page_metadata` for the DECODE region
    (quest_decode_pages > 0).

    Pages are absolute over the capacity, so the page containing the
    prompt/decode boundary accumulates both prefill and decode keys;
    that page is the force-included last prefill page, so its prefill
    selection never depends on the polluted score, and the decode-side
    token-validity mask keeps the two segments disjoint at attention
    time.  int4 caches (uint8 storage) fold UNPACKED codes — metadata
    holds full-head_dim codes (positive per-channel scales make code
    order == value order; note the empty-page max init is the uint8
    wrap of ``-big`` as in build_page_metadata, a ≤1-code overestimate
    for all-zero-code channels — selection heuristics only).

    ck_all: [L, B, Hc, cap, Ds]; pm_all/pM_all: [L, B, Hc, NP, D];
    len_all: [L, B] INCLUDING the appended token.  Returns (pm, pM)."""
    chunk = comp.chunk_size
    L, B, Hc, cap, Ds = ck_all.shape
    D = pm_all.shape[-1]
    int4 = ck_all.dtype == jnp.uint8

    def fold(pm, pM, slot, b0, nb):
        k_new = lax.dynamic_slice(ck_all, (l, b0, 0, slot, 0),
                                  (1, nb, Hc, 1, Ds))[0]     # [nb,Hc,1,Ds]
        if int4:
            from scope_tpu.ops.quant import unpack4
            k_new = unpack4(k_new, jnp.uint8)                # [nb,Hc,1,D]
        pg = slot // chunk
        cur_min = lax.dynamic_slice(pm, (l, b0, 0, pg, 0),
                                    (1, nb, Hc, 1, D))
        cur_max = lax.dynamic_slice(pM, (l, b0, 0, pg, 0),
                                    (1, nb, Hc, 1, D))
        pm = lax.dynamic_update_slice(
            pm, jnp.minimum(cur_min, k_new[None]), (l, b0, 0, pg, 0))
        pM = lax.dynamic_update_slice(
            pM, jnp.maximum(cur_max, k_new[None]), (l, b0, 0, pg, 0))
        return pm, pM

    if uniform_rows:
        return fold(pm_all, pM_all, len_all[l][0] - 1, 0, B)
    for b in range(B):
        pm_all, pM_all = fold(pm_all, pM_all, len_all[l][b] - 1, b, 1)
    return pm_all, pM_all


def _page_scores(q: jnp.ndarray, page_min: jnp.ndarray,
                 page_max: jnp.ndarray) -> jnp.ndarray:
    """q: [B, Hc, G, D]; page_min/max: [B, Hc, NP, D] -> [B, Hc, NP]
    (scores summed over the q-head group, per cache head)."""
    contrib = jnp.where(q[:, :, :, None, :] > 0,
                        page_max[:, :, None, :, :],
                        page_min[:, :, None, :, :])
    per_head = jnp.einsum("bhgd,bhgpd->bhgp",
                          q.astype(jnp.float32),
                          contrib.astype(jnp.float32))
    return per_head.sum(axis=2)                                # [B,Hc,NP]


def quest_decode_stacked(
    comp: CompressionConfig,
    caps: DecodeCaps,
    state: SchedState,
    q: jnp.ndarray,             # [B, Hq, 1, D]
    ck_all: jnp.ndarray,        # [L, B, Hc, cap, D] stacked cache
    cv_all: jnp.ndarray,
    len_all: jnp.ndarray,       # [L, B]
    l: int,                     # static layer index
    prompt_len: jnp.ndarray,
    page_min_all: jnp.ndarray,  # [L, B, Hc, NP, D]
    page_max_all: jnp.ndarray,
    num_layers: int,
    *,
    dec_cap: int,
    softmax_f32: bool = True,
    groups: int = 1,
    compress_mode: str = "cond",
    force_row_gate=None,
    force_n_keep=None,
    tot_cap: int = 0,
):
    """Stacked-buffer wrapper: static-slice reads, cond-gated write-back.

    Returns (out, ck_all, cv_all, len_all, state)."""
    out, ck, cv, length, state = quest_decode_layer(
        comp, caps, state, q, ck_all[l], cv_all[l], len_all[l],
        prompt_len, page_min_all[l], page_max_all[l], l,
        num_layers, dec_cap=dec_cap, softmax_f32=softmax_f32,
        groups=groups, stacked=(ck_all, cv_all, len_all, l),
        compress_mode=compress_mode, force_row_gate=force_row_gate,
        force_n_keep=force_n_keep, tot_cap=tot_cap)
    return out, ck, cv, length, state


def quest_decode_layer(
    comp: CompressionConfig,
    caps: DecodeCaps,
    state: SchedState,
    q: jnp.ndarray,             # [B, Hq, 1, D] roped query
    ck: jnp.ndarray,            # [B, Hc, cap, D] appended cache
    cv: jnp.ndarray,
    length: jnp.ndarray,        # [B] includes appended token
    prompt_len: jnp.ndarray,    # [B]
    page_min: jnp.ndarray,      # [B, Hc, NP, D]
    page_max: jnp.ndarray,
    layer_idx: jnp.ndarray,
    num_layers: int,
    *,
    dec_cap: int,
    softmax_f32: bool = True,
    groups: int = 1,
    stacked=None,
    compress_mode: str = "cond",
    force_row_gate=None,
    force_n_keep=None,
    tot_cap: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, SchedState]:
    """Returns (attn_out [B, Hq, 1, D], ck, cv, length, state).

    With ``stacked=(ck_all, cv_all, len_all, l)`` the compression rewrite
    is applied directly to the stacked [L, ...] buffers (in-place under
    donation) and the stacked arrays are returned instead.

    compress_mode (host scheduling — quest's gates are deterministic
    given lengths, compression/host_sched.QuestHostScheduler):
      "cond"  device counters + lax.cond rewrite (single-stream default);
      "off"   hot step: page selection + attention only, counters and
              rewrite machinery removed from the program entirely;
      "force" host-planned fire: use force_row_gate/force_n_keep ([B])
              instead of the counters; rewrite gated per row.
    dec_cap bounds the decode-region view (host-bucketed: the region
    grows from 0, so early steps attend a small static slice, not the
    max_new_tokens-wide one); tot_cap, when > 0, bounds the dense-layer
    full-cache view the same way."""
    B, Hq, _, D = q.shape
    Hc = ck.shape[1]
    cap = ck.shape[2]
    if tot_cap and tot_cap < cap:
        ck_r, cv_r = ck[:, :, :tot_cap], cv[:, :, :tot_cap]
        cap_r = tot_cap
    else:
        ck_r, cv_r, cap_r = ck, cv, cap
    chunk = comp.chunk_size
    NP = page_min.shape[2]
    P = comp.max_capacity_prompt
    W = comp.decoding_window_size
    r = comp.decoding_recent_size
    scale = 1.0 / math.sqrt(D)
    qg = q.reshape(B, Hc, groups, D)

    # ---------------- counters (shared class-attr semantics) -------------
    metric = comp.decoding_metric
    dk_len = length - prompt_len                               # [B]
    use_counters = compress_mode == "cond" and metric != "none"
    if use_counters and metric in ("linear", "jump"):
        w_t = r + state.step // (comp.delta * num_layers)
    else:
        w_t = jnp.full((), W, jnp.int32)

    if isinstance(layer_idx, int):
        dense = bool(layer_idx < comp.quest_skip_layers)
    else:
        dense = layer_idx < comp.quest_skip_layers
    not_dense = jnp.asarray(jnp.logical_not(dense))
    # Reference returns before touching counters for layers 0..1
    # (kv_utils.py:1277-1278).
    if use_counters and metric in ("linear", "jump"):
        state = state.replace(step=jnp.where(dense, state.step,
                                             state.step + 1))

    # ---------------- page selection -------------------------------------
    SELP = max(1, min(P, NP * chunk) // chunk)                 # static cap
    page_sc = _page_scores(qg, page_min, page_max)             # [B,Hc,NP]
    np_real = (prompt_len + chunk - 1) // chunk                # [B]
    last_page = jnp.maximum(np_real - 1, 0)
    p_idx = jnp.arange(NP)
    token_budget = jnp.minimum(prompt_len, P)
    n_pages = jnp.minimum(token_budget // chunk, np_real)      # [B] incl last
    masked = jnp.where(p_idx[None, None, :] < last_page[:, None, None],
                       page_sc, NEG_INF)
    if SELP > 1:
        sel = lax.top_k(masked, SELP - 1)[1]                   # [B,Hc,SELP-1]
    else:
        sel = jnp.zeros((B, Hc, 0), jnp.int32)
    j = jnp.arange(SELP)
    is_last_slot = j[None, None, :] == (n_pages - 1)[:, None, None]
    sel_padded = jnp.concatenate(
        [sel, jnp.zeros((B, Hc, 1), sel.dtype)], axis=-1)
    sel_pages = jnp.where(
        is_last_slot, last_page[:, None, None],
        jnp.take_along_axis(sel_padded,
                            jnp.broadcast_to(jnp.clip(j, 0, SELP - 1),
                                             (B, Hc, SELP)), axis=-1))
    page_valid = j[None, None, :] < n_pages[:, None, None]     # [B,Hc,SELP]

    off = jnp.arange(chunk)
    tok_idx = (sel_pages[..., None] * chunk + off).reshape(B, Hc,
                                                           SELP * chunk)
    tok_valid = (page_valid[..., None]
                 & ((sel_pages[..., None] * chunk + off)
                    < prompt_len[:, None, None, None])).reshape(
                        B, Hc, SELP * chunk)

    dec_idx = prompt_len[:, None, None] + jnp.arange(dec_cap)[None, None, :]
    dec_valid = dec_idx < length[:, None, None]
    dec_idx = jnp.broadcast_to(dec_idx, (B, Hc, dec_cap))
    dec_valid = jnp.broadcast_to(dec_valid, (B, Hc, dec_cap))

    if comp.quest_decode_pages > 0:
        # DECODE-REGION paging (beyond-reference; config.py knob): score
        # the region's pages with the same sign-trick metadata (folded
        # incrementally at append time — update_decode_page_metadata)
        # and attend only the top (SELD-1) pages + the force-included
        # last (partial) page, instead of the dense dec_cap-wide slice.
        # Only reachable with decoding_metric="none" (config validation);
        # the boundary page competes with a prefill-polluted score but
        # the token-validity mask keeps segments disjoint.
        SELD = comp.quest_decode_pages
        dpage0 = prompt_len // chunk                              # [B]
        last_dp = jnp.maximum((length - 1) // chunk, dpage0)      # [B]
        in_region = ((p_idx[None, None, :] >= dpage0[:, None, None])
                     & (p_idx[None, None, :] < last_dp[:, None, None]))
        dmask = jnp.where(in_region, page_sc, NEG_INF)
        if SELD > 1:
            dsc, dsel = lax.top_k(dmask, SELD - 1)      # [B,Hc,SELD-1]
        else:
            dsc = jnp.zeros((B, Hc, 0), jnp.float32)
            dsel = jnp.zeros((B, Hc, 0), jnp.int32)
        pvalid_d = jnp.concatenate(
            [dsc > NEG_INF / 2, jnp.ones((B, Hc, 1), bool)], axis=-1)
        dsel_pages = jnp.concatenate(
            [dsel, jnp.broadcast_to(last_dp[:, None, None], (B, Hc, 1))],
            axis=-1)                                        # [B,Hc,SELD]
        dtok = dsel_pages[..., None] * chunk + off          # [B,Hc,SELD,ch]
        dec_idx = dtok.reshape(B, Hc, SELD * chunk)
        dec_valid = (pvalid_d[..., None]
                     & (dtok >= prompt_len[:, None, None, None])
                     & (dtok < length[:, None, None, None])
                     ).reshape(B, Hc, SELD * chunk)

    all_idx = jnp.clip(jnp.concatenate([tok_idx, dec_idx], axis=-1),
                       0, cap_r - 1)
    all_valid = jnp.concatenate([tok_valid, dec_valid], axis=-1)

    # Quantized caches: compute in q's dtype (K scale is folded into q,
    # V scale/offset into the output by the caller — models/llama.py).
    # Packed-int4 contracts per nibble plane (quant.qk_einsum): the
    # gathers stay in the packed domain (half the row DMA), no concat.
    from scope_tpu.ops.quant import pv_einsum as _pv
    from scope_tpu.ops.quant import qk_einsum as _qk
    cd = q.dtype if jnp.issubdtype(ck.dtype, jnp.integer) else cv.dtype

    def attend(idx, valid):
        k_sel = jnp.take_along_axis(ck_r, idx[..., None], axis=2)
        v_sel = jnp.take_along_axis(cv_r, idx[..., None], axis=2)
        acc = jnp.float32 if softmax_f32 else q.dtype
        logits = _qk("bhgd,bhsd->bhgs", qg, k_sel, cd, acc) * scale
        logits = jnp.where(valid[:, :, None, :], logits, NEG_INF)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = _pv("bhgs,bhsd->bhgd", probs.astype(cd), v_sel, cd)
        return out.reshape(B, Hq, 1, D), probs.sum(axis=2)      # [B,Hc,S']

    def quest_branch(_):
        out, probs = attend(all_idx, all_valid)
        return out, probs[:, :, SELP * chunk:]                  # decode part

    def dense_branch(_):
        # Full attention over all valid slots (layers 0..1), bucketed to
        # tot_cap when the host knows the live length.
        slot = jnp.arange(cap_r)
        valid = jnp.broadcast_to(slot[None, None, :] < length[:, None, None],
                                 (B, Hc, cap_r))
        acc = jnp.float32 if softmax_f32 else q.dtype
        logits = _qk("bhgd,bhsd->bhgs", qg, ck_r, cd, acc) * scale
        logits = jnp.where(valid[:, :, None, :], logits, NEG_INF)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = _pv("bhgs,bhsd->bhgd", probs.astype(cd), cv_r, cd)
        dec_probs = jnp.take_along_axis(probs.sum(axis=2),
                                        jnp.clip(dec_idx, 0, cap_r - 1),
                                        axis=-1)
        return out.reshape(B, Hq, 1, D), dec_probs

    if isinstance(layer_idx, int):
        # Static layer index (unrolled decode loop): pick the branch at
        # trace time — a lax.cond would copy the cache operands.
        out, dec_probs = (dense_branch(None) if layer_idx
                          < comp.quest_skip_layers else quest_branch(None))
    else:
        out, dec_probs = lax.cond(dense, dense_branch, quest_branch, None)

    # ---------------- decode-region compression ---------------------------
    if metric == "none" or compress_mode == "off":
        # Hot host-scheduled steps carry NO rewrite machinery at all
        # (the host mirrors the gates, host_sched.QuestHostScheduler).
        if stacked is not None:
            cka, cva, la, _ = stacked
            return out, cka, cva, la, state
        return out, ck, cv, length, state

    if compress_mode == "force":
        # Host-planned fire: gates/keeps come in, counters stay host-side.
        row_gate = force_row_gate
        n_keep = force_n_keep
    else:
        # Gates are relative to the decode region (kv_utils.py:1397,:1422).
        row_gate = dk_len >= w_t
        if metric == "jump":
            thresh = comp.delta * num_layers
            # Scalar counters: one stream, any-row gate (reference
            # class-attr arithmetic).  Per-row counters ([B]): each row
            # runs its own wave (continuous-batching serving).
            per_row = state.jump_step.ndim == 1
            gate = row_gate if per_row else jnp.any(row_gate)
            gate = gate & not_dense
            counting = gate & (state.jump_step < thresh)
            wave = gate & (state.jump_step >= thresh)
            js = state.jump_step + counting.astype(jnp.int32)
            jl = state.jump_layer + wave.astype(jnp.int32)
            finished = jl >= num_layers
            state = state.replace(jump_step=jnp.where(finished, 0, js),
                                  jump_layer=jnp.where(finished, 0, jl))
            row_gate = row_gate & wave

        n_keep = jnp.clip(w_t - r, 0, caps.keep_cap)
        n_keep = jnp.minimum(jnp.broadcast_to(n_keep, (B,)),
                             jnp.maximum(dk_len - r, 0))

    # Scatter decode-region probabilities to absolute slot positions so the
    # generic keep-map applies with pseg = prompt_len.
    def scatter_row(p_abs, p_dec, start):
        return lax.dynamic_update_slice(p_abs, p_dec, (0, start))
    probs_abs = jax.vmap(scatter_row)(
        jnp.zeros((B, Hc, cap), jnp.float32), dec_probs, prompt_len)

    do = jnp.any(row_gate) & not_dense

    if stacked is not None:
        from scope_tpu.compression.schedulers import block_rewrite_cond
        cka0, cva0, la0, li = stacked
        if dense is True:      # static bypass layer: nothing to rewrite
            return out, cka0, cva0, la0, state
        kblk, vblk, new_len = block_rewrite_cond(
            comp, caps, probs_abs, cka0[li], cva0[li], length, prompt_len,
            n_keep, row_gate & not_dense, False, Hc)
        if B == 1:
            start = (li, 0, 0, prompt_len[0], 0)
            cka0 = lax.dynamic_update_slice(cka0, kblk[None], start)
            cva0 = lax.dynamic_update_slice(cva0, vblk[None], start)
        else:
            for b in range(B):
                sb = (li, b, 0, prompt_len[b], 0)
                cka0 = lax.dynamic_update_slice(cka0, kblk[b][None, None],
                                                sb)
                cva0 = lax.dynamic_update_slice(cva0, vblk[b][None, None],
                                                sb)
        la0 = la0.at[li].set(new_len)
        return out, cka0, cva0, la0, state

    def compress(args):
        k_, v_, ln = args
        src, new_len = _keep_map(probs_abs, ln, prompt_len, r, n_keep,
                                 caps.keep_cap, cap, row_gate)
        idx = src[..., None]
        return (jnp.take_along_axis(k_, idx, axis=2),
                jnp.take_along_axis(v_, idx, axis=2), new_len)

    ck, cv, length = lax.cond(do, compress, lambda a: a, (ck, cv, length))
    return out, ck, cv, length, state
