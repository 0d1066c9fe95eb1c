"""Typed, frozen configuration for the TPU-native SCOPE engine.

The reference (kengchiawu/SCOPE) spreads configuration over argparse CLI flags,
runtime attribute injection onto each HF ``self_attn.config`` object
(run_longgenbench.py:201-226) and ``hasattr``-guarded defaults in the
``init_*`` factories (kv_utils.py:1485-1665).  Here everything is a frozen
dataclass threaded explicitly; derived quantities (delta, buffer capacities)
are computed once in :class:`EngineConfig`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

PREFILL_METHODS = (
    "fullkv",       # no compression, no decode scheduling state at all
    "allkv",        # no prefill compression; records prompt length (kv_utils.py:1038-1053)
    "h2o",          # cumulative-attention heavy hitters (kv_utils.py:633-667)
    "snapkv",       # observation-window pooled scoring (kv_utils.py:430-465)
    "pyramidkv",    # layer-decayed budget, PyramidInfer-mode scoring (kv_utils.py:141-225)
    "streamingllm", # positional sink + recent (kv_utils.py:850-869)
    "quest",        # full prefill kept; per-step page selection (kv_utils.py:1231-1483)
    "headwise",     # per-head coverage budget (headwise_attention.py, completed here)
)

DECODE_METRICS = (
    "none",         # no decode-phase compression
    "fixed",        # SCOPE "slide": steady-state cache P+W (kv_utils.py:701-730)
    "linear",       # SCOPE "adaptive": W(t) grows 1 per delta steps (kv_utils.py:731-761)
    "jump",         # SCOPE "discontinuous": burst compression waves (kv_utils.py:762-801)
    "h2o",          # H2O-only: global top-k during decode (kv_utils.py:679-700)
    "slm",          # StreamingLLM-only: positional during decode (kv_utils.py:881-902)
    "pyramidinfer", # PyramidKV-only: pyramid budget over full cache (kv_utils.py:237-280)
)


@dataclass(frozen=True)
class ModelSpec:
    """Architecture hyper-parameters of a dense decoder-only LLM."""

    name: str
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    # Llama-3.1-style rope scaling: (factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings); None = plain RoPE.
    rope_scaling: Optional[Tuple[float, float, float, int]] = None
    # Mistral-style sliding window attention; None = global attention.
    sliding_window: Optional[int] = None
    # Qwen2-style q/k/v projection bias (o_proj stays bias-free).
    attention_bias: bool = False
    arch: str = "llama"

    @property
    def num_kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads

    def replace(self, **kw) -> "ModelSpec":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class CompressionConfig:
    """Prefill policy x decode scheduler, mirroring the reference knob set.

    Reference knob sources: ``window_sizes``/``max_capacity_prompts``/
    ``kernel_sizes``/``pooling`` injection at run_longgenbench.py:209-226,
    per-method window sizing at run_longgenbench.py:188-194, quest knobs at
    run_longgenbench.py:196-197.
    """

    method: str = "allkv"
    decoding_metric: str = "none"
    # P: prefill token budget (CLI --max_capacity_prompts).
    max_capacity_prompt: int = 2048
    # w: protected observation/recent window during prefill compression.
    # Reference: 8 for snap/pyramid/h2o, P//2 for streamingllm.
    window_size: int = 8
    kernel_size: int = 7
    pooling: str = "maxpool"
    # PyramidKV pyramid sharpness (kv_utils.py:150).
    beta: int = 20
    # W: decode-phase window budget (CLI --decoding_window_size).
    decoding_window_size: int = 512
    # r: protected recent window during decode compression.
    decoding_recent_size: int = 256
    # linear/jump growth period; runner derives it as
    # (output_max_len - r) // (W - r)  (run_longgenbench.py:218).
    delta: int = 15
    # Quest page (chunk) size and skipped dense layers (kv_utils.py:1277).
    chunk_size: int = 16
    quest_skip_layers: int = 2
    # Quest DECODE-REGION paging (beyond-reference, ROADMAP r4 #4 /
    # VERDICT r4 Next #7): with decoding_metric="none" the decode region
    # grows unboundedly and quest attends it densely (reference
    # semantics, kv_utils.py:1389-1474) — late-generation attention cost
    # approaches full-cache.  Setting this > 0 pages the decode region
    # with the SAME min/max metadata + sign-trick scores as the prefill
    # region (metadata updated incrementally as tokens append): each
    # step attends the top (quest_decode_pages - 1) decode pages plus
    # the force-included last (partial) page.  Only legal with
    # decoding_metric="none": the SCOPE schedulers need eviction scores
    # over the WHOLE region, and their bounded region (~W) gains nothing
    # from paging.  Accuracy-gated by tests/test_quest_paged_decode.py
    # (greedy agreement vs the dense region).  0 = dense (reference
    # behavior).
    quest_decode_pages: int = 0
    # Headwise coverage budgeting (headwise_attention.py:17-101).
    headwise_max_budget: int = 2048
    headwise_min_budget: int = 128
    headwise_gamma: float = 0.95
    # True reproduces the reference's GQA-expanded per-query-head eviction
    # (repeat_kv before cache update, llama_model.py:159-160); False evicts
    # per KV head (memory-correct mode, cache is num_kv_heads wide).
    evict_per_qhead: bool = True
    # Reproduce the reference's Mistral decode-phase sliding-window cache
    # slicing for COMPRESSED methods (mistral_model.py:246-269): once the
    # virtual length exceeds the window, each step physically keeps only
    # the last window-1 slots of the (possibly compressed) cache before
    # appending.  Post-compression slots hold arbitrary original
    # positions, so this is positional-in-slot-space only — the
    # reference's admittedly degraded semantics, off by default (see
    # models/mistral.py for the rationale).  Device-scheduled path only.
    mistral_window_parity: bool = False

    def __post_init__(self):
        if self.method not in PREFILL_METHODS:
            raise ValueError(f"unknown method {self.method!r}")
        if self.decoding_metric not in DECODE_METRICS:
            raise ValueError(f"unknown decoding metric {self.decoding_metric!r}")
        if self.method not in ("allkv", "fullkv", "quest"):
            if not self.max_capacity_prompt - self.window_size > 0:
                raise ValueError("max_capacity_prompt must exceed window_size")
        if self.decoding_metric != "none":
            if not self.decoding_window_size - self.decoding_recent_size > 0:
                raise ValueError("decoding_window_size must exceed decoding_recent_size")
        if self.quest_decode_pages:
            if self.method != "quest" or self.decoding_metric != "none":
                raise ValueError(
                    "quest_decode_pages requires method='quest' with "
                    "decoding_metric='none' (the schedulers score the "
                    "whole region; their bounded region gains nothing)")

    def replace(self, **kw) -> "CompressionConfig":
        return dataclasses.replace(self, **kw)


def derive_delta(output_max_len: int, decoding_window_size: int,
                 decoding_recent_size: int) -> int:
    """delta = (output_max_len - r) // (W - r); run_longgenbench.py:218."""
    return max(1, (output_max_len - decoding_recent_size)
               // (decoding_window_size - decoding_recent_size))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class EngineConfig:
    """Static engine-level shapes derived from model + compression config.

    Everything under jit must have static shapes; these capacities bound the
    dynamic lengths the reference lets tensors take.
    """

    max_prompt_len: int = 8192        # S_cap: prompt bucket ceiling (padded)
    max_new_tokens: int = 4096
    prompt_pad_multiple: int = 128
    dtype: str = "bfloat16"
    # KV cache storage dtype: "bfloat16" (matches compute dtype),
    # "int8" (per-channel symmetric quantization calibrated once at
    # prefill: scales fold into q / the attention output, so the hot
    # decode path reads half the HBM bytes with two extra elementwise
    # ops per layer; compression gathers move int8 values unchanged),
    # or "int4" (two asymmetric per-channel codes per byte — quarter the
    # cache bytes; the K zero point cancels in softmax and the V zero
    # point folds into the output because probabilities sum to 1, so the
    # hot path cost is the same two folds as int8 — see ops/quant.py).
    kv_dtype: str = "bfloat16"
    # Upcast attention logits/softmax to f32 (reference: kv_utils.py:656).
    softmax_f32: bool = True
    # Prefill attention backend: "auto" (pallas on TPU, xla elsewhere),
    # "xla", "pallas", "pallas_interpret".
    attn_backend: str = "auto"
    # NOTE (kernel verdict, rounds 3-4): THREE hand-written pallas
    # decode-attention kernels were built, measured, and REMOVED.
    # Round 3: whole-stripe and head-folded chunked designs lost to
    # XLA's einsum path; an in-place append kernel was defeated by
    # runtime copies of aliased buffers at jit boundaries (solved by
    # the staging ring / in-chunk staging + lazy eviction instead).
    # Round 4 quantified the ceiling (scripts/probe_attn_roofline.py):
    # XLA grouped decode attention sustains 391 GB/s useful at b192
    # int8 (48% of the 819 GB/s peak; bf16 the same 47%, so the int8
    # convert fuses) — the gap is the f32 logits/probs HBM round-trip
    # plus head_dim=64 half-filling 128-lane tiles (a TRANSPOSED [D,S]
    # layout bought only +13%, scripts/probe_attn_layout2.py).  A third
    # kernel (VMEM-resident softmax over transposed [D,S] stripes,
    # blocks fully lane-packed) measured 146-177 GB/s at nb=8..16 —
    # 2.2-2.7x SLOWER than XLA: per-grid-step DMA/compute
    # serialization dominates in this environment, and VMEM (16MB)
    # caps the block size.  Verdict: XLA owns decode attention; its
    # ~47%-of-peak is the practical ceiling here.
    # The pallas fused flash-prefill kernel (ops/pallas/flash_prefill.py)
    # remains the production prefill path on TPU.
    # Promise that all batch rows share identical prompt lengths and hence
    # identical cache lengths/schedules.  Enables the contiguous
    # (single dynamic_update_slice) cache-write fast path for batch > 1;
    # per-row paths otherwise.
    uniform_lengths: bool = False
    # Host-scheduled decode: dispatch runs of fire-free steps as ONE
    # jitted multi-step program (lax.scan over the hot step; the cache
    # stays in place as the loop carry).  Per-step jit calls pay a fixed
    # per-call cost that scales with the cache buffers (donated-buffer
    # copy + transport, ~4.5ms at 1B b64 int8 — scripts/bisect_step.py);
    # chunking pays it once per chunk.  Sizes are tried largest-first;
    # empty tuple = per-step dispatch (reference-style per-token timing).
    decode_chunk_sizes: Tuple[int, ...] = ()
    # Lazy eviction (host-scheduled methods only).  Compression fires
    # normally REWRITE the cache: top-k + a take_along_axis gather + a
    # block write-back.  On this hardware the gather is latency-bound row
    # DMA (~4 GB/s effective — scripts/probe_gather.py: 106ms for 16
    # layers at b96 whether or not indices are sorted), making each jump
    # wave cost ~675ms at b192 (~40% of steady-state).  With lazy_evict,
    # a fire only updates a per-slot ALIVE mask (~25ms: kill the scored
    # region, scatter the top-k back in) — evictions are permanent, so
    # tombstoning is semantically identical; attention masks dead slots
    # (same logit multiset => same probabilities).  Physical slots are
    # reclaimed by an amortized compaction pass every ~lazy_slack steps.
    lazy_evict: bool = False
    # Extra physical slots between compactions (the compaction period):
    # larger = rarer (amortized-cheaper) compaction but more HBM and a
    # wider masked attention window.
    lazy_slack: int = 256
    # Staging-ring size R (0 = off).  Hot host-scheduled steps write the
    # per-step token into a small [L,B,H,R,D] ring instead of the big
    # cache buffers — a big-buffer update costs a near-full-buffer copy
    # on this hardware regardless of formulation (scripts/bisect_step.py,
    # scripts/micro_dus.py) while small-buffer updates are ~free.
    # Attention folds ring slots; the host flushes the ring every R
    # steps / before fires / before admissions (cache.flush_ring), so
    # the copy is paid once per R tokens.  The physical cache allocates
    # R slots of slack so a full-R flush block never clips valid slots.
    decode_ring: int = 0

    def resolve_attn_backend(self, seq_len: int = 0) -> str:
        """Prefill attention backend; ``seq_len`` is the padded prompt
        length when known.  Measured on v5e (1B, h2o scoring), round-5
        kernel (block-class split + (1024, 1024) blocks): XLA's chunked
        path only wins the shortest prompts (2048: 62 vs 72 ms) — the
        pallas flash kernel wins from 4096 up (4096: 202 vs 247;
        8192: 485 ms vs XLA's 36.9 s collapse — the full-S scoring
        softmax per block stops fitting), so "auto" picks XLA up to
        2048 and the fused flash kernel beyond.  (r4 history: the
        pre-split kernel crossed at 4096 — 242 vs 274.)"""
        if self.attn_backend != "auto":
            return self.attn_backend
        import jax
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "cpu"
        if platform != "tpu":
            return "xla"
        return "xla" if 0 < seq_len <= 2048 else "pallas"

    def cache_capacity(self, comp: CompressionConfig) -> int:
        """Physical slot capacity S_max of the per-layer KV buffer.

        fixed: steady-state P+W, +1 for the append-before-compress step.
        linear/jump: W grows to ~r + max_new/delta; jump additionally
        overshoots by up to delta tokens between waves (see SURVEY §2.2).
        """
        P = comp.max_capacity_prompt
        W = comp.decoding_window_size
        r = comp.decoding_recent_size
        if comp.method in ("fullkv", "quest") or (
            comp.method == "allkv" and comp.decoding_metric == "none"
        ):
            # Quest keeps the full prefill for all layers and lets layers
            # 0..quest_skip_layers grow uncompressed (kv_utils.py:1277).
            return _round_up(self.max_prompt_len + self.max_new_tokens, 128)
        if comp.method == "allkv":
            # Full prefill is kept; only the decode region is bounded.
            base = self.max_prompt_len
        elif comp.method == "headwise":
            # Reserved per-head segment (compression/headwise.py layout).
            base = comp.headwise_max_budget
        else:
            base = min(P, self.max_prompt_len)
        if comp.decoding_metric == "none":
            return _round_up(base + self.max_new_tokens, 128)
        if comp.decoding_metric == "pyramidinfer":
            # Shallow layers may keep up to max_num + W + r tokens
            # (kv_utils.py:241-245).
            min_num = (P + W - r) // 2
            max_num = (P + W - r) * 2 - min_num
            return _round_up(max(base, max_num + W) + r + 2, 128)
        w_final = self.decode_budget_cap(comp) + r
        slack = comp.delta + 2  # jump-wave overshoot + append slot
        if self.decode_chunk_sizes:
            # In-chunk staging lands a full chunk in one write.
            slack += max(self.decode_chunk_sizes)
        if self.lazy_evict:
            slack += self.lazy_slack   # tombstoned slots await compaction
        return _round_up(base + w_final + slack, 128)

    def decode_budget_cap(self, comp: CompressionConfig) -> int:
        """Static cap on the data-dependent decode keep-count W(t) - r."""
        W = comp.decoding_window_size
        r = comp.decoding_recent_size
        if comp.decoding_metric in ("fixed", "h2o", "slm", "pyramidinfer"):
            return W - r
        # linear/jump: W(t) = r + steps//delta, steps <= max_new_tokens.
        return max(W - r, self.max_new_tokens // max(comp.delta, 1) + 1)

    def prompt_buckets(self) -> Tuple[int, ...]:
        """Padded prompt lengths we are willing to compile for."""
        buckets = []
        b = self.prompt_pad_multiple
        while b < self.max_prompt_len:
            buckets.append(b)
            b *= 2
        buckets.append(self.max_prompt_len)
        return tuple(buckets)

    def bucket_for(self, length: int) -> int:
        for b in self.prompt_buckets():
            if length <= b:
                return b
        raise ValueError(f"prompt length {length} exceeds max_prompt_len "
                         f"{self.max_prompt_len}")

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)
