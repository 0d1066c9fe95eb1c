"""Differential tests against the reference's OWN kv_utils.py clusters.

Unlike tests/oracle.py (an independent NumPy reimplementation of the
survey spec), these tests import and EXECUTE the reference's torch code
from /root/reference/model (pure torch, runs on CPU) and assert that
scope_tpu's policies/schedulers produce identical cache contents on
identical inputs.  This closes the "survey misread a quirk -> oracle and
implementation share the bug" risk (VERDICT.md round 3, Missing #1).

The reference module is loaded from its original path via importlib —
never vendored or copied.

Reference cells that CANNOT be executed (documented in PARITY.md):
- StreamingLLM 'slm' decode: UnboundLocalError — the gate reads
  ``decoding_window_size`` before its assignment inside the branch
  (kv_utils.py:882-885).  We implement the documented intent.
- PyramidKV 'pyramidinfer' deep branch (kv_utils.py:250): requests
  ``topk(budget_l + W)`` with budget_l ~ 2*(P+W-r), which exceeds the
  scored region ``k_len - r`` for every reachable steady-state cache size
  -> torch RuntimeError.  We clip n_keep to the region (the mid branch,
  which is the only reachable one, is tested differentially below).
- ALLKV 'jump': hard-codes 15*32 instead of delta*num_layers
  (kv_utils.py:1137,:1142) and never counts jump_layer.  We use the
  delta*num_layers arithmetic shared by every other cluster.
"""

import importlib.util
import math
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from scope_tpu.cache import append_token
from scope_tpu.compression.policies import compress_prefill
from scope_tpu.compression.quest import quest_decode_layer
from scope_tpu.compression.schedulers import (DecodeCaps, SchedState,
                                              decode_schedule,
                                              static_keep_cap)
from scope_tpu.config import CompressionConfig
from scope_tpu.ops.attention import prefill_attention

REF_KV_UTILS = "/root/reference/model/kv_utils.py"
REF_HEADWISE = "/root/reference/model/headwise_attention.py"

# Content pins for the UNTRUSTED reference checkout (ADVICE r4): exec'ing
# third-party source at collection time is only acceptable against the
# exact snapshot these differentials were written for.  On mismatch the
# module skips loudly instead of executing unreviewed code — re-pin after
# re-reviewing the diff.
REF_SHA256 = {
    REF_KV_UTILS:
        "fecee3a6f892eb4bc88390ea6c42a994c365c957c8ace0afb23d6c371dcf00da",
    REF_HEADWISE:
        "04477f94ff05aa5a840a75c002c25018d8d0051367b6c216090571ef88cfe031",
}

if not os.path.exists(REF_KV_UTILS):
    pytest.skip("reference checkout not present at /root/reference — "
                "differential tests need the original torch source",
                allow_module_level=True)


def _pin_or_skip(path):
    import hashlib
    with open(path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    if digest != REF_SHA256[path]:
        pytest.skip(f"{path} content hash {digest[:12]}… does not match "
                    f"the pinned snapshot — refusing to execute an "
                    f"unreviewed reference checkout (re-review the diff "
                    f"and update REF_SHA256)", allow_module_level=True)


_pin_or_skip(REF_KV_UTILS)
_pin_or_skip(REF_HEADWISE)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


kvu = _load(REF_KV_UTILS, "ref_kv_utils")

B, H, D = 1, 2, 8
S = 128            # prefill length (no padding: torch side is exact-length)
P, W_OBS = 64, 8   # prefill budget / observation window


def make_qkv(seed=0, s=S):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, s, D)).astype(np.float32)
    k = rng.standard_normal((B, H, s, D)).astype(np.float32)
    v = rng.standard_normal((B, H, s, D)).astype(np.float32)
    return q, k, v


def run_ours_prefill(comp, q, k, v, capacity, layer_idx=0, num_layers=2):
    tl = jnp.full((B,), q.shape[2], jnp.int32)
    _, scores = prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tl,
        window_size=comp.window_size,
        need_colsum_all=comp.method in ("h2o", "pyramidkv"),
        need_colsum_window=comp.method == "snapkv")
    return compress_prefill(comp, jnp.int32(layer_idx), num_layers,
                            jnp.asarray(k), jnp.asarray(v), jnp.asarray(q),
                            scores, tl, capacity)


def assert_prefill_equal(res, ref_k, ref_v):
    """Our cache rows [0, length) must equal the reference's compressed
    tensors element-for-element (same order: [topk-desc | tail])."""
    n = ref_k.shape[2]
    assert int(res.length[0]) == n
    np.testing.assert_allclose(np.asarray(res.cache_k)[0, :, :n],
                               ref_k.numpy()[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.cache_v)[0, :, :n],
                               ref_v.numpy()[0], rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# Prefill differential: update_kv on identical tensors
# --------------------------------------------------------------------------

def test_h2o_prefill_matches_reference():
    q, k, v = make_qkv(0)
    cl = kvu.H2OKVCluster(window_size=W_OBS, max_capacity_prompt=P,
                          decoding_window_size=8, decoding_recent_size=4)
    rk, rv = cl.update_kv(torch.tensor(k), torch.tensor(q),
                          torch.tensor(v), None, 1)
    comp = CompressionConfig(method="h2o", max_capacity_prompt=P,
                             window_size=W_OBS)
    res = run_ours_prefill(comp, q, k, v, capacity=96)
    assert_prefill_equal(res, rk, rv)


def test_snapkv_avgpool_prefill_matches_reference():
    q, k, v = make_qkv(1)
    cl = kvu.SnapKVCluster(window_size=W_OBS, max_capacity_prompt=P,
                           kernel_size=7, pooling="avgpool",
                           decoding_window_size=8, decoding_recent_size=4)
    rk, rv = cl.update_kv(torch.tensor(k), torch.tensor(q),
                          torch.tensor(v), None, 1)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=P,
                             window_size=W_OBS, kernel_size=7,
                             pooling="avgpool")
    res = run_ours_prefill(comp, q, k, v, capacity=96)
    assert_prefill_equal(res, rk, rv)


def _recover_src_indices(kept_rows, k_src):
    """Map compressed K rows back to their source slot by exact value match.

    kept_rows: [n, D]; k_src: [S, D] (distinct random rows)."""
    out = []
    for row in kept_rows:
        hits = np.nonzero((k_src == row[None, :]).all(axis=1))[0]
        assert hits.size == 1
        out.append(int(hits[0]))
    return out


def test_snapkv_maxpool_prefill_same_score_cut_as_reference():
    """maxpool produces PLATEAUS of exactly-equal pooled scores (each local
    max spreads over kernel_size positions), so torch.topk and lax.top_k
    legitimately pick different members of a tie — bitwise index parity is
    out of contract (SURVEY.md §7).  What must match is the VALUE cut: the
    multiset of kept scores, and every untied kept index."""
    q, k, v = make_qkv(1)
    cl = kvu.SnapKVCluster(window_size=W_OBS, max_capacity_prompt=P,
                           kernel_size=7, pooling="maxpool",
                           decoding_window_size=8, decoding_recent_size=4)
    rk, _ = cl.update_kv(torch.tensor(k), torch.tensor(q),
                         torch.tensor(v), None, 1)
    comp = CompressionConfig(method="snapkv", max_capacity_prompt=P,
                             window_size=W_OBS, kernel_size=7,
                             pooling="maxpool")
    res = run_ours_prefill(comp, q, k, v, capacity=96)
    assert int(res.length[0]) == P

    # Reference pooled scores, recomputed with torch ops.
    import torch.nn.functional as tF
    aw = torch.matmul(torch.tensor(q)[..., -W_OBS:, :],
                      torch.tensor(k).transpose(2, 3)) / math.sqrt(D)
    m = torch.full((W_OBS, W_OBS), torch.finfo(aw.dtype).min)
    mc = torch.arange(W_OBS)
    m.masked_fill_(mc < (mc + 1).view(W_OBS, 1), 0)
    aw[:, :, -W_OBS:, -W_OBS:] += m[None, None]
    aw = tF.softmax(aw, dim=-1, dtype=torch.float32)
    colsum = aw[:, :, -W_OBS:, :-W_OBS].sum(dim=-2)
    pooled = tF.max_pool1d(colsum, kernel_size=7, padding=3,
                           stride=1).numpy()[0]                # [H, S-w]

    n_keep = P - W_OBS
    ours_k = np.asarray(res.cache_k)[0]
    for h in range(H):
        ref_idx = _recover_src_indices(rk.numpy()[0, h, :n_keep], k[0, h])
        our_idx = _recover_src_indices(ours_k[h, :n_keep], k[0, h])
        # Same score cut: identical kept-score multisets.
        np.testing.assert_allclose(np.sort(pooled[h][ref_idx]),
                                   np.sort(pooled[h][our_idx]),
                                   rtol=1e-6, atol=1e-7)
        # Untied kept scores must select identical indices.
        thresh = np.sort(pooled[h])[::-1][n_keep - 1]
        untied_ref = {i for i in ref_idx
                      if (pooled[h] == pooled[h][i]).sum() == 1
                      and pooled[h][i] > thresh}
        assert untied_ref <= set(our_idx)
        # Tail window verbatim on both sides.
        np.testing.assert_allclose(ours_k[h, n_keep:P],
                                   k[0, h, S - W_OBS:], rtol=1e-6)
        np.testing.assert_allclose(rk.numpy()[0, h, n_keep:P],
                                   k[0, h, S - W_OBS:], rtol=1e-6)


def test_streamingllm_prefill_matches_reference():
    q, k, v = make_qkv(2)
    w = P // 2   # runner sets window = P/2 for slm (run_longgenbench.py:190)
    cl = kvu.StreamingLLMKVCluster(window_size=w, max_capacity_prompt=P,
                                   decoding_window_size=8,
                                   decoding_recent_size=4)
    rk, rv = cl.update_kv(torch.tensor(k), torch.tensor(q),
                          torch.tensor(v), None, 1)
    comp = CompressionConfig(method="streamingllm", max_capacity_prompt=P,
                             window_size=w)
    res = run_ours_prefill(comp, q, k, v, capacity=96)
    assert_prefill_equal(res, rk, rv)


@pytest.mark.parametrize("layer_idx", [0, 1])
@pytest.mark.parametrize("s", [96, 128])   # 96: mid branch; 128: deep branch
def test_pyramidkv_prefill_matches_reference(layer_idx, s):
    q, k, v = make_qkv(3, s=s)
    L = 2
    cl = kvu.PyramidKVCluster(window_size=W_OBS, max_capacity_prompt=P,
                              beta=20, num_hidden_layers=L,
                              layer_idx=layer_idx,
                              decoding_window_size=8,
                              decoding_recent_size=4)
    rk, rv = cl.update_kv(torch.tensor(k), torch.tensor(q),
                          torch.tensor(v), None, 1)
    comp = CompressionConfig(method="pyramidkv", max_capacity_prompt=P,
                             window_size=W_OBS, beta=20)
    res = run_ours_prefill(comp, q, k, v, capacity=160,
                           layer_idx=layer_idx, num_layers=L)
    assert_prefill_equal(res, rk, rv)


def test_prefill_below_budget_identity_matches_reference():
    q, k, v = make_qkv(4, s=48)   # 48 < P: reference returns inputs as-is
    cl = kvu.H2OKVCluster(window_size=W_OBS, max_capacity_prompt=P,
                          decoding_window_size=8, decoding_recent_size=4)
    rk, rv = cl.update_kv(torch.tensor(k), torch.tensor(q),
                          torch.tensor(v), None, 1)
    assert rk.shape[2] == 48
    comp = CompressionConfig(method="h2o", max_capacity_prompt=P,
                             window_size=W_OBS)
    res = run_ours_prefill(comp, q, k, v, capacity=96)
    assert_prefill_equal(res, rk, rv)


# --------------------------------------------------------------------------
# Decode differential: update_kv_in_decoding, step by step, multi-layer
# --------------------------------------------------------------------------

DP, DW, DR, DELTA = 16, 8, 4, 2     # decode P / W / r / delta
CAP = 96


def _reset_counters(cls):
    cls.current_decoding_step = 0
    cls.jump_step = 0
    cls.jump_layer = 0


# Metrics whose reference decode branch has the off-by-P gather bug: the
# top-k indices are taken RELATIVE to the [P:] score slice but used as
# ABSOLUTE gather positions (e.g. kv_utils.py:718-724 — `decoding_indices`
# from `attn_cache[:, :, self.max_capacity_prompt:].topk(...)` fed to
# `key_states.gather` without the +P shift).  The reference therefore keeps
# prefill tokens 0..n_keep-1 (reordered by decode-region ranking) and DROPS
# every non-recent decode token.  We implement the evident intent (+P
# offset; Quest's decode compression, which slices the region first at
# kv_utils.py:1389-1391, does exactly that and is differentially bit-exact
# below).  Documented in PARITY.md; pinned by
# test_reference_decode_gather_is_off_by_P.
REF_OFF_BY_P = {"fixed", "linear", "jump"}


def drive_decode(cls, make_cluster, method, metric, num_layers=2,
                 steps=40, prompt=DP, seed=0):
    """Run the reference cluster and our decode_schedule side by side.

    For metrics without the off-by-P bug, after every (step, layer) the
    slotted cache contents [0, length) must equal the reference's
    dynamically-sized cache element-for-element.  For REF_OFF_BY_P metrics
    the caches diverge at the first fire by design; there the differential
    checks (a) full content equality up to the first fire, (b) at each
    row's first fire, that the reference picked relative indices p_j inside
    the prefill segment (the bug) while our kept rows are exactly the
    decode-region rows P + p_j (the intent, same ranking), and (c) length
    equality at every subsequent (step, layer) — the gates and counters
    never depend on scores, so fire timing must stay identical forever.
    Scores are computed with torch on our cache so both sides see
    bit-identical attention probabilities: the differential isolates the
    keep/gather machinery, which is exactly what's under test.

    ``prompt`` may be a per-layer list (pyramidkv: the pyramid prefill
    keeps a DIFFERENT count per layer, so each layer's decode gate fires
    at a different step while the counters stay shared — the per-layer
    length streams of kv_utils.py:281-351)."""
    _reset_counters(cls)
    clusters = [make_cluster(l) for l in range(num_layers)]
    prompts = (list(prompt) if isinstance(prompt, (list, tuple))
               else [prompt] * num_layers)
    comp = CompressionConfig(
        method=method, decoding_metric=metric, max_capacity_prompt=DP,
        window_size=4, decoding_window_size=DW, decoding_recent_size=DR,
        delta=DELTA)
    caps = DecodeCaps(keep_cap=static_keep_cap(comp, steps), capacity=CAP)
    rng = np.random.default_rng(seed)

    k0s, v0s, tk, tv, caches = [], [], [], [], []
    for l in range(num_layers):
        pl = prompts[l]
        k0 = rng.standard_normal((B, H, pl, D)).astype(np.float32)
        v0 = rng.standard_normal((B, H, pl, D)).astype(np.float32)
        k0s.append(k0)
        v0s.append(v0)
        tk.append(torch.tensor(k0))
        tv.append(torch.tensor(v0))
        ck0 = np.zeros((B, H, CAP, D), np.float32)
        ck0[:, :, :pl] = k0
        cv0 = np.zeros((B, H, CAP, D), np.float32)
        cv0[:, :, :pl] = v0
        caches.append((jnp.asarray(ck0), jnp.asarray(cv0),
                       jnp.full((B,), pl, jnp.int32)))
    prompt_len = jnp.full((B,), prompts[0], jnp.int32)
    state = SchedState.init()

    if method == "allkv":
        # update_kv records the true prompt length in a class attribute
        # (kv_utils.py:1047); replicate that side effect.
        cls.max_capacity_prompt = prompts[0]

    step_fn = jax.jit(
        lambda st, k, v, ln, pr, li: decode_schedule(
            comp, caps, st, k, v, ln, pr, prompt_len, li, num_layers))

    off_by_p = metric in REF_OFF_BY_P
    fired = [False] * num_layers

    for s in range(steps):
        qs = rng.standard_normal((B, H, 1, D)).astype(np.float32)
        nk = rng.standard_normal((B, H, 1, D)).astype(np.float32)
        nv = rng.standard_normal((B, H, 1, D)).astype(np.float32)
        for l in range(num_layers):
            # ---- reference: append then compress -----------------------
            tk[l] = torch.cat([tk[l], torch.tensor(nk)], dim=2)
            tv[l] = torch.cat([tv[l], torch.tensor(nv)], dim=2)
            klen = tk[l].shape[2]
            pre_k = tk[l].numpy().copy()      # pre-compress cache (shared)
            tk[l], tv[l] = clusters[l].update_kv_in_decoding(
                tk[l], torch.tensor(qs), tv[l], None, 1)

            # ---- ours: append, torch-computed probs, schedule ----------
            ck, cv, length = caches[l]
            ck, cv, length = append_token(
                ck, cv, jnp.asarray(nk), jnp.asarray(nv), length)
            tck = torch.tensor(np.asarray(ck)[:, :, :klen])
            aw = torch.matmul(torch.tensor(qs), tck.transpose(2, 3)) \
                / math.sqrt(D)
            p = torch.nn.functional.softmax(aw, dim=-1,
                                            dtype=torch.float32)
            probs = np.zeros((B, H, CAP), np.float32)
            probs[:, :, :klen] = p[:, :, 0, :].numpy()
            ck, cv, length, state = step_fn(state, ck, cv, length,
                                            jnp.asarray(probs),
                                            jnp.int32(l))
            caches[l] = (ck, cv, length)

            # ---- compare ------------------------------------------------
            n = tk[l].shape[2]
            assert int(length[0]) == n, \
                f"step {s} layer {l}: len {int(length[0])} != ref {n}"
            this_fired = n < klen or (off_by_p and n == klen
                                      and not np.array_equal(
                                          tk[l].numpy(), pre_k))
            if off_by_p and this_fired and not fired[l]:
                # First fire: check the ranking mapping (see docstring).
                pseg = prompts[l] if method == "allkv" else DP
                r = DR
                n_keep = n - pseg - r
                ours_k = np.asarray(ck)
                for h in range(H):
                    for j in range(n_keep):
                        row = tk[l].numpy()[0, h, pseg + j]
                        hits = np.nonzero(
                            (pre_k[0, h] == row[None, :]).all(axis=1))[0]
                        assert hits.size == 1
                        p_j = int(hits[0])
                        assert p_j < pseg, \
                            "reference gather was not off-by-P?!"
                        np.testing.assert_allclose(
                            ours_k[0, h, pseg + j],
                            pre_k[0, h, pseg + p_j], rtol=1e-6,
                            err_msg=f"step {s} l{l} h{h} keep {j}")
                fired[l] = True
            if fired[l]:
                # Caches diverged by design; the PROTECTED segment
                # [0, pseg) must stay verbatim on our side (pseg = P for
                # the budgeted methods — a pyramid layer whose prefill
                # kept MORE than P has its tokens beyond P in the scored
                # region, legitimately rewritten).
                pl = min(prompts[l], prompts[l] if method == "allkv"
                         else DP)
                np.testing.assert_allclose(
                    np.asarray(ck)[:, :, :min(pl, n)],
                    k0s[l][:, :, :min(pl, n)], rtol=1e-6,
                    err_msg=f"step {s} layer {l} prefill segment")
            else:
                np.testing.assert_allclose(
                    np.asarray(ck)[:, :, :n], tk[l].numpy(),
                    rtol=1e-4, atol=1e-5,
                    err_msg=f"step {s} layer {l} K mismatch")
                np.testing.assert_allclose(
                    np.asarray(cv)[:, :, :n], tv[l].numpy(),
                    rtol=1e-4, atol=1e-5,
                    err_msg=f"step {s} layer {l} V mismatch")
    if off_by_p:
        assert all(fired), "differential never reached a fire"
    return caches


@pytest.mark.parametrize("metric", ["fixed", "linear", "jump", "h2o"])
def test_h2o_decode_matches_reference(metric):
    def mk(l):
        return kvu.H2OKVCluster(
            decoding_metric=metric, delta=DELTA, num_hidden_layers=2,
            decoding_window_size=DW, decoding_recent_size=DR,
            window_size=4, max_capacity_prompt=DP)
    drive_decode(kvu.H2OKVCluster, mk, "h2o", metric)


@pytest.mark.parametrize("metric", ["fixed", "linear"])
def test_allkv_decode_matches_reference(metric):
    # true prompt != config P: ALLKV gates on the RECORDED length.
    def mk(l):
        return kvu.ALLKVCluster(
            decoding_metric=metric, delta=DELTA, num_hidden_layers=2,
            decoding_window_size=DW, decoding_recent_size=DR)
    drive_decode(kvu.ALLKVCluster, mk, "allkv", metric, prompt=24)


@pytest.mark.parametrize("metric", ["fixed", "linear", "jump"])
def test_snapkv_decode_matches_reference(metric):
    def mk(l):
        return kvu.SnapKVCluster(
            decoding_metric=metric, delta=DELTA, num_hidden_layers=2,
            decoding_window_size=DW, decoding_recent_size=DR,
            window_size=4, max_capacity_prompt=DP)
    drive_decode(kvu.SnapKVCluster, mk, "snapkv", metric)


@pytest.mark.parametrize("metric", ["fixed", "linear", "jump"])
def test_pyramidkv_decode_matches_reference(metric):
    """PyramidKV under the generic SCOPE metrics (kv_utils.py:281-351):
    the pyramid prefill leaves DIFFERENT lengths per layer, so each
    layer's ``k_len >= P + W(t)`` gate opens at a different step while
    current_decoding_step/jump_step/jump_layer stay class-shared — the
    per-layer length streams VERDICT r4 Missing #3 flagged as untested.
    Layer 0 starts longer (shallow layers keep more)."""
    def mk(l):
        return kvu.PyramidKVCluster(
            decoding_metric=metric, delta=DELTA, num_hidden_layers=2,
            layer_idx=l, decoding_window_size=DW, decoding_recent_size=DR,
            window_size=4, max_capacity_prompt=DP)
    # Staggered pyramid prefill outputs: shallow layer kept more.
    drive_decode(kvu.PyramidKVCluster, mk, "pyramidkv", metric,
                 prompt=[DP + 2, DP - 4])


@pytest.mark.parametrize("metric", ["linear", "jump"])
def test_streamingllm_decode_matches_reference(metric):
    def mk(l):
        return kvu.StreamingLLMKVCluster(
            decoding_metric=metric, delta=DELTA, num_hidden_layers=2,
            decoding_window_size=DW, decoding_recent_size=DR,
            window_size=4, max_capacity_prompt=DP)
    drive_decode(kvu.StreamingLLMKVCluster, mk, "streamingllm", metric)


@pytest.mark.parametrize("metric", ["fixed", "linear", "jump"])
def test_layered_host_sched_matches_reference_pyramidkv(metric):
    """The pyramidkv HOST mirror (host_sched.LayeredHostScheduler —
    distinct code from the device gates, VERDICT r4 Missing #3) must
    track the reference's per-layer cache-length streams exactly: same
    gates, same shared-counter arithmetic, same post-fire lengths, for
    staggered per-layer prefill lengths."""
    from scope_tpu.compression.host_sched import LayeredHostScheduler

    L = 3
    init_lengths = [DP + 3, DP, DP - 5]       # pyramid: shallow keeps more
    _reset_counters(kvu.PyramidKVCluster)
    clusters = [kvu.PyramidKVCluster(
        decoding_metric=metric, delta=DELTA, num_hidden_layers=L,
        layer_idx=l, decoding_window_size=DW, decoding_recent_size=DR,
        window_size=4, max_capacity_prompt=DP) for l in range(L)]
    comp = CompressionConfig(
        method="pyramidkv", decoding_metric=metric, max_capacity_prompt=DP,
        window_size=4, decoding_window_size=DW, decoding_recent_size=DR,
        delta=DELTA)
    sched = LayeredHostScheduler(comp, L, prompt_len=DP, prompt_pad=DP,
                                 keep_cap=static_keep_cap(comp, 64),
                                 capacity=CAP)
    sched.lengths = list(init_lengths)        # staggered pyramid output

    rng = np.random.default_rng(3)
    tk = [torch.tensor(rng.standard_normal(
        (B, H, init_lengths[l], D)).astype(np.float32)) for l in range(L)]
    tv = [torch.tensor(rng.standard_normal(
        (B, H, init_lengths[l], D)).astype(np.float32)) for l in range(L)]
    for s in range(48):
        # Host plans the whole step BEFORE the per-layer reference calls
        # (the host mirror's contract: one plan per decode step).
        plan = sched.plan_step()
        for l in range(L):
            nk = torch.tensor(rng.standard_normal(
                (B, H, 1, D)).astype(np.float32))
            qs = torch.tensor(rng.standard_normal(
                (B, H, 1, D)).astype(np.float32))
            tk[l] = torch.cat([tk[l], nk], dim=2)
            tv[l] = torch.cat([tv[l], nk], dim=2)
            pre_len = tk[l].shape[2]
            tk[l], tv[l] = clusters[l].update_kv_in_decoding(
                tk[l], qs, tv[l], None, 1)
            ref_fired = tk[l].shape[2] < pre_len
            assert sched.lengths[l] == tk[l].shape[2], \
                f"step {s} layer {l}: host {sched.lengths[l]} " \
                f"!= ref {tk[l].shape[2]}"
            if ref_fired:
                assert plan.fire[l], f"step {s} layer {l}: ref fired, " \
                    f"host plan did not"
    # The staggered gates must actually have produced fires at some point.
    assert any(tk[l].shape[2] < init_lengths[l] + 48 for l in range(L))


def test_pyramidinfer_mid_branch_matches_reference():
    """The mid branch (kv_utils.py:243-263) is the only reachable
    pyramidinfer branch (see module docstring); steady state re-fires it
    every step once k_len reaches P+W."""
    def mk(l):
        return kvu.PyramidKVCluster(
            decoding_metric="pyramidinfer", delta=DELTA,
            num_hidden_layers=2, layer_idx=l,
            decoding_window_size=DW, decoding_recent_size=DR,
            window_size=4, max_capacity_prompt=DP)
    drive_decode(kvu.PyramidKVCluster, mk, "pyramidkv", "pyramidinfer",
                 steps=12)


def test_streamingllm_decode_fixed_matches_reference():
    def mk(l):
        return kvu.StreamingLLMKVCluster(
            decoding_metric="fixed", delta=DELTA, num_hidden_layers=2,
            decoding_window_size=DW, decoding_recent_size=DR,
            window_size=4, max_capacity_prompt=DP)
    drive_decode(kvu.StreamingLLMKVCluster, mk, "streamingllm", "fixed")


def test_reference_decode_gather_is_off_by_P():
    """Pin the off-by-P bug (REF_OFF_BY_P comment above): with token ids
    encoded in K component 0, the reference's 'fixed' fire keeps
    [0..P-1 | some PREFILL ids reordered | recent r] — the decode-region
    tokens between P and k_len-r are dropped, not top-k'd.  Our
    implementation applies the evident +P intent; if a fixed reference
    ever lands this test fails and the full-content differential must be
    re-enabled for fixed/linear/jump."""
    _reset_counters(kvu.H2OKVCluster)
    cl = kvu.H2OKVCluster(
        decoding_metric="fixed", decoding_window_size=DW,
        decoding_recent_size=DR, window_size=4, max_capacity_prompt=DP)
    n = DP + DW
    k = torch.zeros((B, H, n, D))
    k[:, :, :, 0] = torch.arange(n).float()
    q = torch.randn((B, H, 1, D))
    rk, _ = cl.update_kv_in_decoding(k, q, k.clone(), None, 1)
    ids = rk[0, 0, :, 0].tolist()
    assert ids[:DP] == list(range(DP))                    # prefill verbatim
    assert all(i < DP for i in ids[DP:DP + DW - DR])      # BUG: prefill ids
    assert ids[-DR:] == list(range(n - DR, n))            # recent tail


def test_slm_branch_is_unrunnable_in_reference():
    """Pin the documented deviation: the reference's slm branch raises
    UnboundLocalError before doing any work (kv_utils.py:882-885), so our
    implementation-of-intent CANNOT be differentially tested against it.
    If a fixed reference ever lands, this test fails and the differential
    must be written."""
    cl = kvu.StreamingLLMKVCluster(
        decoding_metric="slm", decoding_window_size=DW,
        decoding_recent_size=DR, window_size=4, max_capacity_prompt=DP)
    k = torch.zeros((B, H, DP + DW + 1, D))
    q = torch.zeros((B, H, 1, D))
    with pytest.raises(UnboundLocalError):
        cl.update_kv_in_decoding(k, q, k.clone(), None, 1)


def test_pyramidinfer_deep_branch_is_unrunnable_in_reference():
    """Pin the documented deviation: the deep branch requests
    topk(budget_l + W) > region size for its own steady-state cache
    (kv_utils.py:250-259) -> torch RuntimeError."""
    cl = kvu.PyramidKVCluster(
        decoding_metric="pyramidinfer", num_hidden_layers=2, layer_idx=0,
        decoding_window_size=DW, decoding_recent_size=DR,
        window_size=4, max_capacity_prompt=8)
    # k_len at the deep gate: (P - r)*2 + W = 16.
    k = torch.randn((B, H, 16, D))
    q = torch.randn((B, H, 1, D))
    with pytest.raises(RuntimeError):
        cl.update_kv_in_decoding(k, q, k.clone(), None, 1)


# --------------------------------------------------------------------------
# Quest differential
# --------------------------------------------------------------------------

CHUNK = 16
QP = 32           # quest token budget (max_capacity_prompt)
QCAP = 128


def _page_meta(k_np, prompt):
    """Per-page min/max over real slots only (build_page_metadata math)."""
    NP = k_np.shape[2] // CHUNK
    kp = k_np[:, :, :NP * CHUNK].reshape(B, H, NP, CHUNK, D)
    real = (np.arange(NP * CHUNK).reshape(NP, CHUNK) < prompt)
    real = real[None, None, :, :, None]
    big = np.float32(np.finfo(np.float32).max)
    pmin = np.where(real, kp, big).min(axis=3)
    pmax = np.where(real, kp, -big).max(axis=3)
    return jnp.asarray(pmin), jnp.asarray(pmax)


def _torch_attn(q, k, v):
    aw = torch.matmul(q, k.transpose(2, 3)) / math.sqrt(D)
    p = torch.nn.functional.softmax(aw, dim=-1, dtype=torch.float32)
    return torch.matmul(p, v.float())


def drive_quest(metric, prompt=53, steps=24, layer_idx=2, num_layers=3,
                seed=0, check_out=False):
    """Reference QuestKVCluster vs quest_decode_layer, step by step.

    Compares the STORED cache ([full prefill | compressed decode region])
    every step; with check_out also compares the attention output against
    torch attention over the reference's for-compute tensors (page
    selection identical <=> outputs identical)."""
    _reset_counters(kvu.QuestKVCluster)
    kvu.QuestKVCluster.quest_prompt_length = prompt
    # The reference spells the no-op metric 'None' (kv_utils.py:1394).
    ref_metric = "None" if metric == "none" else metric
    cl = kvu.QuestKVCluster(
        max_capacity_prompt=QP, decoding_metric=ref_metric,
        decoding_window_size=DW, decoding_recent_size=DR,
        chunk_size=CHUNK, num_hidden_layers=num_layers, delta=DELTA)

    comp = CompressionConfig(
        method="quest", decoding_metric=metric, max_capacity_prompt=QP,
        decoding_window_size=DW, decoding_recent_size=DR, delta=DELTA,
        chunk_size=CHUNK, quest_skip_layers=2)
    caps = DecodeCaps(keep_cap=static_keep_cap(comp, steps), capacity=QCAP)

    rng = np.random.default_rng(seed)
    k0 = rng.standard_normal((B, H, prompt, D)).astype(np.float32)
    v0 = rng.standard_normal((B, H, prompt, D)).astype(np.float32)
    tk, tv = torch.tensor(k0), torch.tensor(v0)

    ck = np.zeros((B, H, QCAP, D), np.float32)
    ck[:, :, :prompt] = k0
    cv = np.zeros((B, H, QCAP, D), np.float32)
    cv[:, :, :prompt] = v0
    ck, cv = jnp.asarray(ck), jnp.asarray(cv)
    length = jnp.full((B,), prompt, jnp.int32)
    prompt_len = jnp.full((B,), prompt, jnp.int32)
    pmin, pmax = _page_meta(k0, prompt)
    # Pad page metadata to the full capacity's page count.
    NPfull = QCAP // CHUNK
    big = jnp.float32(np.finfo(np.float32).max)
    pmin = jnp.concatenate(
        [pmin, jnp.full((B, H, NPfull - pmin.shape[2], D), big)], axis=2)
    pmax = jnp.concatenate(
        [pmax, jnp.full((B, H, NPfull - pmax.shape[2], D), -big)], axis=2)
    state = SchedState.init()
    dec_cap = steps + 4

    for s in range(steps):
        qs = rng.standard_normal((B, H, 1, D)).astype(np.float32)
        nk = rng.standard_normal((B, H, 1, D)).astype(np.float32)
        nv = rng.standard_normal((B, H, 1, D)).astype(np.float32)

        tk = torch.cat([tk, torch.tensor(nk)], dim=2)
        tv = torch.cat([tv, torch.tensor(nv)], dim=2)
        kc, vc, tk, tv = cl.update_kv_in_decoding(
            tk, torch.tensor(qs), tv, None, None, layer_idx, 1)

        ck, cv, length = append_token(ck, cv, jnp.asarray(nk),
                                      jnp.asarray(nv), length)
        out, ck, cv, length, state = quest_decode_layer(
            comp, caps, state, jnp.asarray(qs), ck, cv, length,
            prompt_len, pmin, pmax, layer_idx, num_layers,
            dec_cap=dec_cap, groups=1)

        n = tk.shape[2]
        assert int(length[0]) == n, \
            f"step {s}: stored len {int(length[0])} != ref {n}"
        np.testing.assert_allclose(np.asarray(ck)[:, :, :n], tk.numpy(),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"step {s} stored K mismatch")
        np.testing.assert_allclose(np.asarray(cv)[:, :, :n], tv.numpy(),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"step {s} stored V mismatch")
        if check_out:
            ref_out = _torch_attn(torch.tensor(qs), kc, vc).numpy()
            np.testing.assert_allclose(np.asarray(out)[:, :, 0],
                                       ref_out[:, :, 0], rtol=1e-4,
                                       atol=1e-4,
                                       err_msg=f"step {s} attn out")


@pytest.mark.parametrize("prompt", [53, 64, 49])
def test_quest_page_selection_matches_reference(prompt):
    """metric=none: the for-compute tensors are [selected pages | decode
    region], so attention-output equality proves the page sets (incl.
    force-included last page and padding trim) match the reference's
    local_heavy_hitter_mask + masked_select exactly."""
    drive_quest("none", prompt=prompt, steps=8, check_out=True)


@pytest.mark.parametrize("metric", ["fixed", "linear", "jump"])
def test_quest_decode_compression_matches_reference(metric):
    drive_quest(metric, steps=24)


def test_quest_dense_layer_bypass_matches_reference():
    """Layers < 2 return the cache untouched and skip all counters
    (kv_utils.py:1277-1278)."""
    _reset_counters(kvu.QuestKVCluster)
    kvu.QuestKVCluster.quest_prompt_length = 40
    cl = kvu.QuestKVCluster(
        max_capacity_prompt=QP, decoding_metric="linear",
        decoding_window_size=DW, decoding_recent_size=DR,
        chunk_size=CHUNK, num_hidden_layers=3, delta=DELTA)
    k = torch.randn((B, H, 60, D))
    q = torch.randn((B, H, 1, D))
    r = cl.update_kv_in_decoding(k, q, k.clone(), None, None, 1, 1)
    assert torch.equal(r[2], k)
    assert kvu.QuestKVCluster.current_decoding_step == 0  # not incremented

    comp = CompressionConfig(
        method="quest", decoding_metric="linear", max_capacity_prompt=QP,
        decoding_window_size=DW, decoding_recent_size=DR, delta=DELTA,
        chunk_size=CHUNK, quest_skip_layers=2)
    caps = DecodeCaps(keep_cap=static_keep_cap(comp, 8), capacity=QCAP)
    rng = np.random.default_rng(0)
    ck = jnp.asarray(rng.standard_normal((B, H, QCAP, D)).astype(np.float32))
    state = SchedState.init()
    _, ck2, _, ln2, state = quest_decode_layer(
        comp, caps, state, jnp.asarray(q.numpy()), ck, ck,
        jnp.full((B,), 60, jnp.int32), jnp.full((B,), 40, jnp.int32),
        jnp.zeros((B, H, QCAP // CHUNK, D)),
        jnp.zeros((B, H, QCAP // CHUNK, D)), 1, 3, dec_cap=24, groups=1)
    assert int(state.step) == 0
    np.testing.assert_array_equal(np.asarray(ck2), np.asarray(ck))
    assert int(ln2[0]) == 60


# --------------------------------------------------------------------------
# Headwise budget differential (reference WIP, completed here)
# --------------------------------------------------------------------------

def test_headwise_budget_matches_reference():
    """coverage_budget == the reference's score_cover_topk + min-clamp
    (headwise_attention.py:10-15, :81) on identical probabilities."""
    hw = _load(REF_HEADWISE, "ref_headwise")
    from scope_tpu.compression.headwise import coverage_budget
    rng = np.random.default_rng(7)
    for gamma in (0.5, 0.95):
        logits = rng.standard_normal((B, H, 1, 96)).astype(np.float32) * 3
        probs = torch.nn.functional.softmax(torch.tensor(logits), dim=-1,
                                            dtype=torch.float32)
        ref = hw.score_cover_topk(probs, gamma).squeeze(-1)     # [B,H]
        ref = torch.clamp(ref, min=4)
        ours = coverage_budget(jnp.asarray(probs.numpy()[:, :, 0]), gamma)
        ours = jnp.clip(ours, 4, 96)
        np.testing.assert_array_equal(np.asarray(ours), ref.numpy())
