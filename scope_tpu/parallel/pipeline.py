"""Pipeline-parallel decode: layer stages over a mesh axis (GPipe).

The reference's only "pipeline" is accelerate's device_map layer
placement (run_longgenbench.py:359) — implicit transfers, one request at
a time.  Here PP is explicit and TPU-native: the layer-stacked weights
and the KV cache shard over a ``stage`` mesh axis via shard_map
(L/n_stages contiguous layers per device), and one decode step runs a
microbatched GPipe schedule — the batch splits into microbatches that
ripple through the stages, activations hopping stage-to-stage through a
replicated buffer merged with one small psum per round (disjoint
microbatch slots per stage), so all stages work concurrently once the
pipeline fills.

Scope: the decode hot path, plus host-scheduled SCOPE fires, at the
production cache formats — int8 KV (per-channel scales stage-shard like
the weights) and lazy eviction (tombstone fires + :func:`pp_compact_lazy`),
matching the single-device serving stack (VERDICT r4 #5).
Compression is layer-local (scores, top-k, rewrites never cross layers —
SURVEY §2.5), so a fire composes with stage sharding as a per-stage
block_map gather + contiguous write on each stage's local layers — no
new collectives (pass ``comp``/``caps`` + ``force_n_keep`` to
:func:`pp_decode_step`; fires are BATCH-UNIFORM — the whole pipeline
assumes uniform lengths, see pp_decode_step).  PP exists for MEMORY
reach (models whose weights+cache
exceed one chip's HBM after TP), not single-token latency — a lone
decode token cannot fill a pipeline; utilization comes from the
microbatches.
"""

from __future__ import annotations

import math

import numpy as np
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from scope_tpu.config import ModelSpec
from scope_tpu.ops.common import (apply_rope, mlp, repeat_kv, rms_norm,
                                  rope_cos_sin, rope_inv_freq, wdot)

STAGE_AXIS = "stage"


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), (STAGE_AXIS,))


def _pp_step_local(spec: ModelSpec, n_stages: int, n_micro: int,
                   softmax_f32: bool, tied: bool, comp, caps,
                   int8: bool, lazy: bool,
                   embed, final_norm, lm_head, layers,
                   token, vpos, ck, cv, length, force_nk, prompt_len,
                   k_scale, v_scale, alive):
    """Runs INSIDE shard_map.  layers: stage-local [L/S, ...] weight
    stack; ck/cv: stage-local [L/S, B, Hkv, cap, D]; token/vpos: [B]
    replicated.  With ``comp`` set this is the FORCE program: each stage
    applies the SCOPE block rewrite to its local layers using this step's
    attention probabilities and the host-planned per-row gates (layer-
    local per SURVEY §2.5 — no cross-stage traffic beyond the normal
    activation ripple).  ``int8``: ck/cv hold int8 codes with stage-local
    per-channel scales [L/S, B, Hkv, D] (slot-free, so fires gather codes
    unchanged — same folds as llama.decode_step).  ``lazy``: fires
    tombstone the stage-local alive mask [L/S, B, Hkv, cap] instead of
    the gather rewrite.  Returns (logits [B, V], ck, cv, alive,
    new_length)."""
    from scope_tpu.models.llama import _grouped_decode_attention, qkv_flat

    S = n_stages
    s_idx = lax.axis_index(STAGE_AXIS)
    B = token.shape[0]
    MB = B // n_micro
    L_loc = ck.shape[0]
    Hq, Hkv, D = spec.num_heads, spec.num_kv_heads, spec.head_dim
    G = spec.num_kv_groups
    cap = ck.shape[3]
    dtype = embed.dtype

    inv_freq = rope_inv_freq(D, spec.rope_theta, spec.rope_scaling)
    cos, sin = rope_cos_sin(vpos[:, None], inv_freq)        # [B, 1, Dh]

    if comp is not None:
        from scope_tpu.compression.schedulers import (block_map,
                                                      block_width,
                                                      force_pseg)
        # One shared policy table with the single-device force path.
        pseg_all, positional = force_pseg(comp, B, prompt_len)

    # All replicas embed the full batch (tiny at decode width 1); the
    # ripple below only ever reads/writes microbatch slices.
    x_buf = jnp.take(embed, token[:, None], axis=0).astype(dtype)
    logits_buf = jnp.zeros((B, spec.vocab_size), jnp.float32)

    def stage_layers(xs, rows0, ckl, cvl, al, ln):
        """Run this stage's layers on one microbatch slice."""
        cos_m = lax.dynamic_slice_in_dim(cos, rows0, MB, axis=0)
        sin_m = lax.dynamic_slice_in_dim(sin, rows0, MB, axis=0)
        ln_m = lax.dynamic_slice_in_dim(ln, rows0, MB, axis=0)
        for l in range(L_loc):
            p = {name: arr[l] for name, arr in layers.items()}
            h = rms_norm(xs, p["ln_attn"], spec.rms_norm_eps)
            qkv = qkv_flat(p, h).reshape(MB, 1, Hkv, G + 2, D)
            q = qkv[:, :, :, :G].reshape(MB, 1, Hq, D).transpose(0, 2, 1, 3)
            k = qkv[:, :, :, G].transpose(0, 2, 1, 3)
            v = qkv[:, :, :, G + 1].transpose(0, 2, 1, 3)
            q = apply_rope(q, cos_m, sin_m)
            k = apply_rope(k, cos_m, sin_m)
            if int8:
                # Same folds as llama.decode_step (shared helpers in
                # ops/quant.py): store the token quantized, fold the
                # per-channel K scale into q so attention reads int8
                # codes, fold the V scale into the output below.  Scales
                # are slot-free, so stage-sharding them is a plain
                # [L/S, ...] slice.
                from scope_tpu.ops import quant
                ks_m = lax.dynamic_slice(
                    k_scale, (l, rows0, 0, 0), (1, MB, Hkv, D))[0]
                vs_m = lax.dynamic_slice(
                    v_scale, (l, rows0, 0, 0), (1, MB, Hkv, D))[0]
                k = quant.quantize(k, ks_m)
                v = quant.quantize(v, vs_m)
                q = quant.fold_q_scale(q, ks_m)
            ckl = lax.dynamic_update_slice(ckl, k[None],
                                           (l, rows0, 0, ln_m[0], 0))
            cvl = lax.dynamic_update_slice(cvl, v[None],
                                           (l, rows0, 0, ln_m[0], 0))
            ck_m = lax.dynamic_slice(ckl, (l, rows0, 0, 0, 0),
                                     (1, MB, Hkv, cap, D))[0]
            cv_m = lax.dynamic_slice(cvl, (l, rows0, 0, 0, 0),
                                     (1, MB, Hkv, cap, D))[0]
            mask = jnp.broadcast_to(
                (jnp.arange(cap)[None, :] <= ln_m[:, None])[:, None, :],
                (MB, Hkv, cap))
            if lazy:
                al_m = lax.dynamic_slice(al, (l, rows0, 0, 0),
                                         (1, MB, Hkv, cap))[0]
                mask = mask & al_m
            out, probs = _grouped_decode_attention(q, ck_m, cv_m, mask, G,
                                                   softmax_f32=softmax_f32)
            if int8:
                out = quant.fold_out_scale(out, vs_m)
            if comp is not None:
                # SCOPE fire on this stage's layer: same block_map +
                # contiguous write as the single-device force path
                # (models/llama.py), on the appended microbatch slice.
                # Fill/drain rounds compute this rewrite too and discard
                # it via the caller's jnp.where(valid, ...) — (S-1)
                # wasted top-k+gathers per fire step (ADVICE r4).
                # Acceptable: fires are ~1/delta·L of steps and a
                # lax.cond here would put the stacked stage cache
                # through a conditional (XLA copies cond operands —
                # see schedulers.block_rewrite_cond).
                pseg_m = lax.dynamic_slice_in_dim(pseg_all, rows0, MB, 0)
                nk_m = lax.dynamic_slice_in_dim(force_nk, rows0, MB, 0)
                # Fires are batch-uniform (pipeline contract): every row
                # of the microbatch rewrites.
                gate_m = jnp.ones((MB,), bool)
                if lazy:
                    # Tombstone fire — the SAME helper as the single-
                    # device path (schedulers.lazy_tombstone_fire), so
                    # the PP parity contract rides one implementation.
                    # Physical slots are reclaimed by pp_compact_lazy.
                    from scope_tpu.compression.schedulers import (
                        lazy_tombstone_fire)
                    new_al = lazy_tombstone_fire(
                        comp, caps, probs, al_m, ln_m + 1, pseg_m, nk_m,
                        gate_m)
                    al = lax.dynamic_update_slice(al, new_al[None],
                                                  (l, rows0, 0, 0))
                else:
                    src_blk, _ = block_map(comp, caps, probs, ln_m + 1,
                                           pseg_m, nk_m, gate_m, positional)
                    blkW = block_width(comp, caps)
                    srcc = jnp.clip(
                        jnp.broadcast_to(src_blk, (MB, Hkv, blkW)),
                        0, cap - 1)[..., None]
                    kblk = jnp.take_along_axis(ck_m, srcc, axis=2)
                    vblk = jnp.take_along_axis(cv_m, srcc, axis=2)
                    ckl = lax.dynamic_update_slice(
                        ckl, kblk[None], (l, rows0, 0, pseg_m[0], 0))
                    cvl = lax.dynamic_update_slice(
                        cvl, vblk[None], (l, rows0, 0, pseg_m[0], 0))
            xs = xs + wdot(out.transpose(0, 2, 1, 3).reshape(MB, 1,
                                                             Hq * D),
                           p, "wo")
            xs = xs + mlp(rms_norm(xs, p["ln_mlp"], spec.rms_norm_eps), p)
        return xs, ckl, cvl, al

    def round_body(r, carry):
        x_buf, logits_buf, ckl, cvl, al = carry
        m = r - s_idx                                  # my microbatch
        valid = (m >= 0) & (m < n_micro)
        mb = jnp.clip(m, 0, n_micro - 1)
        rows0 = mb * MB
        xs = lax.dynamic_slice_in_dim(x_buf, rows0, MB, axis=0)
        xs_new, ckl_new, cvl_new, al_new = stage_layers(xs, rows0, ckl,
                                                        cvl, al, length)
        # Invalid rounds (pipeline fill/drain) must not mutate anything.
        ckl = jnp.where(valid, ckl_new, ckl)
        cvl = jnp.where(valid, cvl_new, cvl)
        al = jnp.where(valid, al_new, al)
        xs_out = jnp.where(valid, xs_new, xs)
        # Hand the microbatch to the next stage: stages write DISJOINT
        # slots this round (m = r - s is unique per s), so one psum of
        # the masked deltas merges the replicated buffer exactly.
        delta = jnp.zeros_like(x_buf)
        delta = lax.dynamic_update_slice_in_dim(delta, xs_out - xs, rows0,
                                                axis=0)
        x_buf = x_buf + lax.psum(
            jnp.where(valid, delta, jnp.zeros_like(delta)), STAGE_AXIS)
        # Last stage emits logits for its finished microbatch.  Tied
        # heads contract on embed's hidden axis DIRECTLY — `embed.T` as
        # a jnp op makes XLA materialize the full [V, E] transpose
        # (525MB bf16 at 1B) every step (see llama._lm_logits).
        is_last = s_idx == S - 1
        h = rms_norm(xs_out, final_norm, spec.rms_norm_eps)
        head_spec = "mse,ve->msv" if tied else "mse,ev->msv"
        lg = jnp.einsum(head_spec, h, lm_head.astype(h.dtype)
                        )[:, 0].astype(jnp.float32)
        lg_delta = jnp.zeros_like(logits_buf)
        lg_delta = lax.dynamic_update_slice_in_dim(lg_delta, lg, rows0,
                                                   axis=0)
        logits_buf = logits_buf + lax.psum(
            jnp.where(valid & is_last, lg_delta,
                      jnp.zeros_like(lg_delta)), STAGE_AXIS)
        return x_buf, logits_buf, ckl, cvl, al

    n_rounds = n_micro + S - 1
    x_buf, logits_buf, ck, cv, alive = lax.fori_loop(
        0, n_rounds, round_body, (x_buf, logits_buf, ck, cv, alive))
    # Device-side batch-uniformity guard: appends/writes land at row 0's
    # offsets, so a mixed-length batch would corrupt the cache SILENTLY.
    # The host check (pp_decode_step._assert_uniform) cannot inspect
    # device arrays on hot steps without a ~30ms blocking fetch, so the
    # program itself poisons the logits with NaN when the contract is
    # violated — loud at the caller's next argmax/finite check instead
    # of a corrupted cache three steps later.
    uniform = jnp.all(length == length[0])
    logits_buf = jnp.where(uniform, logits_buf, jnp.nan)
    if comp is not None and not lazy:
        # All rows shrink to pseg + n_keep + r (fires are batch-uniform
        # and layer-uniform — length is one [B] stream).
        new_len = pseg_all + force_nk + comp.decoding_recent_size
    else:
        # Hot steps, and LAZY fires (which tombstone without moving
        # slots): ``length`` tracks the PHYSICAL fill pointer, exactly
        # like the single-device lazy path — the host mirrors the live
        # count (host_sched) and schedules pp_compact_lazy.
        new_len = length + 1
    return logits_buf, ck, cv, alive, new_len


def pp_decode_step(mesh: Mesh, spec: ModelSpec, params, token, vpos,
                   ck, cv, length, *, n_micro: int = 0,
                   softmax_f32: bool = True, comp=None, caps=None,
                   force_n_keep=None, prompt_len=None,
                   k_scale=None, v_scale=None, alive=None):
    """One pipeline-parallel decode step.

    params: llama.init_params tree (layer stacks shard over the stage
    axis — L must divide n_stages); ck/cv: [L, B, Hkv, cap, D] cache,
    stage-sharded on the layer axis; length: [B].  n_micro microbatches
    (default = n_stages) must divide the batch.

    Hot steps: leave ``comp`` None.  SCOPE fire steps: pass ``comp`` +
    ``caps`` (schedulers.DecodeCaps) and the host-planned
    ``force_n_keep`` [B] — each stage rewrites its local layers, no
    extra collectives.  Fires are BATCH-UNIFORM by contract: the whole
    pipeline runs one shared length stream (appends and block writes
    land at row 0's offsets), so the host must drive all rows on one
    schedule — mixed-gate serving belongs to the non-PP engine.
    allkv/fullkv fires additionally need ``prompt_len`` [B] (the
    protected segment is the RECORDED prompt, not P), batch-uniform
    likewise.

    Production cache formats (VERDICT r4 #5 — PP exists for memory
    reach, where the quantized cache matters most):
    - int8 KV: pass ``k_scale``/``v_scale`` [L, B, Hkv, D] f32 (the
      prefill-calibrated per-channel scales; ck/cv hold int8 codes).
      Scales are slot-free, so they stage-shard like the weights and
      fires gather codes unchanged.
    - lazy eviction: pass ``alive`` [L, B, Hkv, cap] bool; fires
      tombstone the stage-local mask (llama.decode_step's lazy path),
      ``length`` then tracks the PHYSICAL fill pointer, and the host
      schedules :func:`pp_compact_lazy` before slots run out.

    Returns (logits [B, V], ck, cv, new_length), with ``alive`` inserted
    before new_length when lazy: (logits, ck, cv, alive, new_length)."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    S = mesh.shape[STAGE_AXIS]
    L = ck.shape[0]
    if L % S:
        raise ValueError(f"{L} layers not divisible by {S} stages")
    n_micro = n_micro or S
    B = token.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by "
                         f"{n_micro} microbatches")
    # Head orientation is static; tied heads pass embed UNtransposed
    # (the [V, E] transpose would re-materialize every step).
    lm_head = params.get("lm_head_t", params.get("lm_head"))
    if lm_head is not None and lm_head.dtype == jnp.int8:
        # int8 lm_head_t carries a per-input-channel scale folded into h
        # (llama._lm_logits); PP's einsum doesn't — use the fp source.
        lm_head = params.get("lm_head")
    tied = lm_head is None
    if tied:
        lm_head = params["embed"]
    def _assert_uniform(x, name, force_step: bool):
        # Appends and fire writes land at row 0's offsets (pipeline
        # contract) — a mixed batch would corrupt silently.  Only
        # checkable when the value is concrete; traced values are the
        # caller's responsibility.  np.asarray on a DEVICE array is a
        # blocking fetch (~30ms through the axon transport — ADVICE r4),
        # so hot steps only validate values already on the host
        # (ndarray/int/list); fire steps (rare) always validate.
        if not force_step and not isinstance(
                x, (np.ndarray, int, list, tuple)):
            return
        try:
            v = np.asarray(x)
        except Exception:
            return
        if np.unique(v).size > 1:
            raise ValueError(f"pipeline decode requires batch-uniform "
                             f"{name}; got {v}")

    _assert_uniform(length, "length", comp is not None)
    if comp is not None:
        if force_n_keep is None:
            raise ValueError("force steps need force_n_keep")
        if comp.method in ("allkv", "fullkv") and prompt_len is None:
            raise ValueError("allkv/fullkv force steps need prompt_len "
                             "(the protected segment is the recorded "
                             "prompt, not max_capacity_prompt)")
        if prompt_len is not None:
            _assert_uniform(prompt_len, "prompt_len", True)
    else:
        force_n_keep = jnp.zeros((B,), jnp.int32)
    if prompt_len is None:
        prompt_len = jnp.zeros((B,), jnp.int32)
    int8 = k_scale is not None
    lazy = alive is not None
    if int8 and v_scale is None:
        raise ValueError("int8 cache needs both k_scale and v_scale")
    # Unused optionals ride along as replicated [1] dummies (static
    # ``int8``/``lazy`` flags keep the body from ever reading them);
    # shard_map specs must structurally match the operands.
    dummy = jnp.zeros((1,), jnp.float32)
    ks_in = k_scale if int8 else dummy
    vs_in = v_scale if int8 else dummy
    al_in = alive if lazy else dummy
    fn = partial(_pp_step_local, spec, S, n_micro, softmax_f32, tied,
                 comp, caps, int8, lazy)
    lspec = {name: P(STAGE_AXIS) for name in params["layers"]}
    opt = lambda used: P(STAGE_AXIS) if used else P()
    kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(), P(), lspec, P(), P(), P(STAGE_AXIS), P(STAGE_AXIS),
                  P(), P(), P(), opt(int8), opt(int8), opt(lazy)),
        out_specs=(P(), P(STAGE_AXIS), P(STAGE_AXIS), opt(lazy), P()))
    try:
        sharded = shard_map(fn, check_vma=False, **kwargs)
    except TypeError:
        sharded = shard_map(fn, check_rep=False, **kwargs)
    logits, ck, cv, al_out, new_len = sharded(
        params["embed"], params["final_norm"], lm_head,
        params["layers"], token, vpos, ck, cv, length,
        force_n_keep, prompt_len, ks_in, vs_in, al_in)
    if lazy:
        return logits, ck, cv, al_out, new_len
    return logits, ck, cv, new_len


def pp_compact_lazy(mesh: Mesh, ck, cv, alive, length, gap: int):
    """Reclaim tombstoned slots on every stage (the amortized pass the
    host schedules when the physical fill pointer nears capacity —
    mirrors cache.compact_lazy, stage-locally; no collectives: the
    permutation never crosses layers).

    ck/cv/alive stage-sharded as in :func:`pp_decode_step`; length [B]
    is the PHYSICAL fill pointer (layer/batch-uniform by the pipeline
    contract).  Returns (ck, cv, alive, new_length [B])."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from scope_tpu.cache import KVCache, compact_gather, compact_write

    def body(ckl, cvl, al, ln):
        L_loc, B = ckl.shape[0], ckl.shape[1]
        c = KVCache(k=ckl, v=cvl,
                    length=jnp.broadcast_to(ln[None], (L_loc, B)),
                    pvalid=jnp.zeros((L_loc, B, ckl.shape[2]),
                                     jnp.int32),
                    alive=al)
        c2 = compact_write(c, *compact_gather(c, gap), gap=gap)
        # Fires are batch/layer-uniform, so every layer (and stage)
        # lands on the same live count — layer 0 is authoritative.
        return c2.k, c2.v, c2.alive, c2.length[0]

    kwargs = dict(mesh=mesh,
                  in_specs=(P(STAGE_AXIS), P(STAGE_AXIS), P(STAGE_AXIS),
                            P()),
                  out_specs=(P(STAGE_AXIS), P(STAGE_AXIS), P(STAGE_AXIS),
                             P()))
    try:
        sharded = shard_map(body, check_vma=False, **kwargs)
    except TypeError:
        sharded = shard_map(body, check_rep=False, **kwargs)
    return sharded(ck, cv, alive, length)
