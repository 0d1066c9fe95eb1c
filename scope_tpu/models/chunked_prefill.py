"""Chunked (incremental) prefill.

Processes the prompt in fixed-size chunks instead of one monolithic
program.  Two production uses:

- **Serving**: admission prefill interleaves with running decode steps in
  C-token slices, bounding the decode stall per step to one chunk instead
  of the full TTFT (the reference blocks the whole GPU per request,
  run_longgenbench.py:231-242 — batch size 1).
- **Memory**: per-chunk activations are O(C x S) instead of O(S x S)
  score matrices, so prompts longer than the monolithic prefill's
  activation budget still fit.

Exactness: token- and cache-identical to :func:`scope_tpu.models.llama.
prefill` with ``attn_backend="xla"`` (tests/test_chunked_prefill.py).
The one structural subtlety is the reference's scoring quirk
(kv_utils.py:648-654): the H2O/PyramidKV scoring softmax lets every query
attend *future* keys, so chunk-local score accumulation is impossible —
roped queries are staged alongside K/V and scored once, in the finalize
pass, via :func:`scope_tpu.ops.attention.prefill_scores_only`.

Chunk attention masks the full staging buffer (a C x S rectangle per
layer); this matches the monolithic XLA path's FLOPs (it also computes
q_block x S rectangles and masks).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scope_tpu.cache import KVCache
from scope_tpu.compression.policies import compress_prefill
from scope_tpu.compression.schedulers import SchedState
from scope_tpu.config import CompressionConfig, EngineConfig, ModelSpec
from scope_tpu.models.llama import (_group_scores, _lm_logits,
                                    derive_statics, layer_post, layer_qkv)
from scope_tpu.ops.attention import (NEG_INF, PrefillScores,
                                     prefill_scores_only)
from scope_tpu.ops.common import (repeat_kv, rms_norm, rope_cos_sin,
                                  rope_inv_freq)


def _needs_staged_q(comp: CompressionConfig) -> bool:
    return comp.method in ("h2o", "pyramidkv", "snapkv", "headwise")


def _chunk_step(spec: ModelSpec, comp: CompressionConfig,
                ecfg: EngineConfig, need_q: bool,
                params, tokens_c: jnp.ndarray, c0: jnp.ndarray,
                true_len: jnp.ndarray, kbuf, vbuf, qbuf, h_last):
    """Run all layers for prompt positions [c0, c0+C); append roped K/V
    (and Q when scoring needs it) into the staging buffers.

    kbuf/vbuf: [L, B, Hc, S, D]; qbuf: [L, B, Hq, S, D] or None;
    h_last: [B, E] final-layer hidden at each row's last real token.
    """
    B, C = tokens_c.shape
    S = kbuf.shape[3]
    D = spec.head_dim
    G = spec.num_kv_groups
    dtype = jnp.dtype(ecfg.dtype)
    scale = 1.0 / math.sqrt(D)
    acc = jnp.float32 if ecfg.softmax_f32 else dtype

    inv_freq = rope_inv_freq(D, spec.rope_theta, spec.rope_scaling)
    pos = c0 + jnp.arange(C)                                   # [C]
    positions = jnp.broadcast_to(pos, (B, C))
    cos, sin = rope_cos_sin(positions, inv_freq)

    kv_idx = jnp.arange(S)
    causal = kv_idx[None, None, :] <= pos[None, :, None]       # [1, C, S]
    key_real = kv_idx[None, None, :] < true_len[:, None, None]  # [B, 1, S]
    mask = causal & key_real                                   # [B, C, S]
    if spec.sliding_window is not None:
        in_win = kv_idx[None, None, :] > (pos[None, :, None]
                                          - spec.sliding_window)
        mask = mask & in_win

    x = jnp.take(params["embed"], tokens_c, axis=0).astype(dtype)
    lp = params["layers"]

    def body(x, xs):
        if need_q:
            p, kb_l, vb_l, qb_l = xs
        else:
            p, kb_l, vb_l = xs
            qb_l = None
        q, k, v = layer_qkv(spec, p, x, cos, sin)
        if comp.evict_per_qhead:
            kc, vc = repeat_kv(k, G), repeat_kv(v, G)
        else:
            kc, vc = k, v
        kb_l = lax.dynamic_update_slice(kb_l, kc, (0, 0, c0, 0))
        vb_l = lax.dynamic_update_slice(vb_l, vc, (0, 0, c0, 0))
        if need_q:
            qb_l = lax.dynamic_update_slice(qb_l, q, (0, 0, c0, 0))

        k_att = kb_l if comp.evict_per_qhead else repeat_kv(kb_l, G)
        v_att = vb_l if comp.evict_per_qhead else repeat_kv(vb_l, G)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_att,
                            preferred_element_type=acc) * scale
        alog = jnp.where(mask[:, None, :, :], logits, NEG_INF)
        probs = jax.nn.softmax(alog.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v_att.dtype),
                         v_att)
        x = layer_post(spec, p, x, out)
        ys = (kb_l, vb_l, qb_l) if need_q else (kb_l, vb_l)
        return x, ys

    xs = (lp, kbuf, vbuf, qbuf) if need_q else (lp, kbuf, vbuf)
    x, ys = lax.scan(body, x, xs)
    if need_q:
        kbuf, vbuf, qbuf = ys
    else:
        kbuf, vbuf = ys

    last = true_len - 1
    in_chunk = (last >= c0) & (last < c0 + C)
    idx = jnp.clip(last - c0, 0, C - 1)
    h_c = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    h_last = jnp.where(in_chunk[:, None], h_c, h_last)
    if need_q:
        return kbuf, vbuf, qbuf, h_last
    return kbuf, vbuf, h_last


def _finalize(spec: ModelSpec, comp: CompressionConfig, ecfg: EngineConfig,
              need_q: bool, params, kbuf, vbuf, qbuf, h_last,
              true_len: jnp.ndarray
              ) -> Tuple[jnp.ndarray, KVCache, SchedState]:
    """Score the staged prompt, compress per layer, build the row cache —
    the compression tail of llama.prefill, run once after the last chunk."""
    st = derive_statics(spec, comp, ecfg)
    L = spec.num_layers
    G = spec.num_kv_groups
    need_all = comp.method in ("h2o", "pyramidkv")
    need_win = comp.method == "snapkv"
    gap = comp.headwise_max_budget if comp.method == "headwise" else 0

    def body(_, xs):
        if need_q:
            layer_idx, kb_l, vb_l, qb_l = xs
        else:
            layer_idx, kb_l, vb_l = xs
            qb_l = kb_l   # unused by non-headwise policies
        if need_all or need_win:
            k_sc = kb_l if comp.evict_per_qhead else repeat_kv(kb_l, G)
            sc = prefill_scores_only(
                qb_l, k_sc, true_len, window_size=comp.window_size,
                need_colsum_all=need_all, need_colsum_window=need_win)
            if not comp.evict_per_qhead:
                sc = sc._replace(
                    colsum_all=_group_scores(sc.colsum_all, G),
                    colsum_window=_group_scores(sc.colsum_window, G))
        else:
            sc = PrefillScores(None, None)
        res = compress_prefill(comp, layer_idx, L, kb_l, vb_l, qb_l, sc,
                               true_len, st.capacity)
        from scope_tpu.ops import quant
        ck, cv, ks, vs, ko, vo = quant.quantize_prefill_layer(
            ecfg.kv_dtype, res.cache_k, res.cache_v, res.length,
            res.pvalid, gap)
        return None, (ck, cv, res.length, res.pvalid, ks, vs, ko, vo)

    xs = ((jnp.arange(L), kbuf, vbuf, qbuf) if need_q
          else (jnp.arange(L), kbuf, vbuf))
    _, (cks, cvs, lens, pvalids, ks_scale, vs_scale, k_off, v_off) = \
        lax.scan(body, None, xs)

    if ecfg.kv_dtype not in ("int8", "int4"):
        ks_scale = vs_scale = None
    if ecfg.kv_dtype != "int4":
        k_off = v_off = None
    cache = KVCache(k=cks, v=cvs, length=lens, pvalid=pvalids,
                    prefill_gap=gap, prompt_len=true_len,
                    page_min=None, page_max=None,
                    k_scale=ks_scale, v_scale=vs_scale,
                    k_off=k_off, v_off=v_off)
    if ecfg.decode_ring:
        # Mirror llama.prefill: attach staging-ring buffers so the
        # host-scheduled decode path works off a chunked prefill too
        # (serving ignores these — its ring is engine-global).
        rshape = (L, cks.shape[1], cks.shape[2], ecfg.decode_ring,
                  cks.shape[-1])
        cache = cache.replace(
            ring_k=jnp.zeros(rshape, cks.dtype),
            ring_v=jnp.zeros(rshape, cvs.dtype),
            ring_fill=jnp.zeros((), jnp.int32))
    if comp.method == "quest":
        from scope_tpu.compression.quest import build_page_metadata
        cache = build_page_metadata(comp, cache, true_len)

    xh = rms_norm(h_last, params["final_norm"], spec.rms_norm_eps)
    logits = _lm_logits(spec, params, xh)
    return logits, cache, SchedState.init()


class ChunkedPrefiller:
    """Caches the jitted chunk/finalize programs per (S, C) shape.

    One chunk program serves every chunk (the offset ``c0`` is a traced
    scalar), so a full prefill costs 2 compiles total regardless of
    prompt length.  Trailing all-pad chunks are skipped on the host.
    """

    def __init__(self, spec: ModelSpec, comp: CompressionConfig,
                 ecfg: EngineConfig, chunk_size: int = 512):
        self.spec, self.comp, self.ecfg = spec, comp, ecfg
        self.chunk_size = chunk_size
        self._need_q = _needs_staged_q(comp)
        self._chunk_fns = {}
        self._fin_fns = {}

    def _chunk_fn(self, S: int, C: int):
        fn = self._chunk_fns.get((S, C))
        if fn is None:
            # partial binds (spec, comp, ecfg, need_q); the jitted fn sees
            # params=0 tokens=1 c0=2 true_len=3 kbuf=4 vbuf=5 qbuf=6
            # h_last=7.  Staging buffers are donated (updated in place).
            donate = (4, 5, 6, 7) if self._need_q else (4, 5, 7)
            fn = jax.jit(partial(_chunk_step, self.spec, self.comp,
                                 self.ecfg, self._need_q),
                         donate_argnums=donate)
            self._chunk_fns[(S, C)] = fn
        return fn

    def _fin_fn(self, S: int):
        fn = self._fin_fns.get(S)
        if fn is None:
            # No donation: the finalize pass consumes the [.., S, D]
            # staging buffers into [.., capacity, D] (possibly quantized)
            # cache outputs, so no output can alias them — donating here
            # only produced "donated buffers were not usable" warnings
            # (the buffers free when the program ends either way).
            fn = jax.jit(partial(_finalize, self.spec, self.comp,
                                 self.ecfg, self._need_q))
            self._fin_fns[S] = fn
        return fn

    def chunk_layout(self, S: int) -> int:
        C = min(self.chunk_size, S)
        while S % C:
            C //= 2
        return C

    def start(self, tokens, true_len):
        """Begin an incremental prefill; returns an opaque state dict.
        Drive with :meth:`advance` until it reports done, then
        :meth:`finish`."""
        spec, ecfg = self.spec, self.ecfg
        tokens = jnp.asarray(tokens, jnp.int32)
        true_len_j = jnp.asarray(true_len, jnp.int32)
        B, S = tokens.shape
        L, D, E = spec.num_layers, spec.head_dim, spec.hidden_size
        Hc = (spec.num_heads if self.comp.evict_per_qhead
              else spec.num_kv_heads)
        dtype = jnp.dtype(ecfg.dtype)
        st = {
            "tokens": tokens, "true_len": true_len_j,
            "tmax": int(np.max(np.asarray(true_len))),
            "c0": 0, "C": self.chunk_layout(S), "S": S,
            "kbuf": jnp.zeros((L, B, Hc, S, D), dtype),
            "vbuf": jnp.zeros((L, B, Hc, S, D), dtype),
            "qbuf": (jnp.zeros((L, B, spec.num_heads, S, D), dtype)
                     if self._need_q else None),
            "h_last": jnp.zeros((B, E), dtype),
        }
        return st

    def advance(self, params, st) -> bool:
        """Run ONE chunk; returns True while more chunks remain."""
        c0, C, S = st["c0"], st["C"], st["S"]
        if c0 >= min(S, st["tmax"]):
            return False
        fn = self._chunk_fn(S, C)
        tok_c = lax.slice_in_dim(st["tokens"], c0, c0 + C, axis=1)
        out = fn(params, tok_c, jnp.int32(c0), st["true_len"],
                 st["kbuf"], st["vbuf"],
                 st["qbuf"] if self._need_q else None, st["h_last"])
        if self._need_q:
            st["kbuf"], st["vbuf"], st["qbuf"], st["h_last"] = out
        else:
            st["kbuf"], st["vbuf"], st["h_last"] = out
        st["c0"] = c0 + C
        return st["c0"] < min(S, st["tmax"])

    def finish(self, params, st):
        fn = self._fin_fn(st["S"])
        return fn(params, st["kbuf"], st["vbuf"],
                  st["qbuf"] if self._need_q else None,
                  st["h_last"], st["true_len"])

    def __call__(self, params, tokens, true_len):
        st = self.start(tokens, true_len)
        while self.advance(params, st):
            pass
        self.advance(params, st)   # run the final partial chunk if any
        return self.finish(params, st)


def prefill_chunked(spec: ModelSpec, comp: CompressionConfig,
                    ecfg: EngineConfig, params, tokens, true_len,
                    chunk_size: int = 512):
    """One-shot functional wrapper (compiles fresh; prefer the class for
    repeated use)."""
    return ChunkedPrefiller(spec, comp, ecfg, chunk_size)(
        params, tokens, true_len)
