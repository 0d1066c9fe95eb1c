"""Host-side SCOPE scheduler: precomputed firing decisions.

Key observation: the reference's decode gates and counters
(``current_decoding_step``/``jump_step``/``jump_layer`` and the
``k_len >= P + W(t)`` checks, kv_utils.py:701-801) depend only on step
counts and cache lengths — both fully deterministic given the prompt
length.  Nothing about WHEN compression fires depends on data; only WHAT
is kept (the top-k) does.

So the host can mirror the counters exactly and dispatch one of two jitted
device programs per step:
- the hot step with NO compression logic at all (no lax.cond, no top-k),
- a "fire" step with unconditional compression.

This removes all conditional machinery from the common step — measured
multiple ms/step of XLA cond/copy overhead — while remaining bit-identical
to the device-counter path (tested in tests/test_host_sched.py).

Supported: the batch-uniform methods (h2o/snapkv/streamingllm/allkv/
fullkv) x metrics (none/fixed/linear/jump) via :class:`HostScheduler`,
and pyramidkv (per-layer budgets) via :class:`LayeredHostScheduler` with
per-layer fire masks.  quest/headwise keep the device-side path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

from scope_tpu.config import CompressionConfig


def host_schedulable(comp: CompressionConfig) -> bool:
    """Methods whose decode gates the host can mirror exactly.

    Layer-uniform length streams (fullkv/allkv/h2o/snapkv/streamingllm)
    mirror one counter set; quest mirrors per-layer lengths (its skip
    layers never compress and never advance the counters,
    kv_utils.py:1277-1278, so jump waves span two steps) via
    :class:`QuestHostScheduler`."""
    if comp.mistral_window_parity:
        # The per-step positional window slicing mutates lengths in a way
        # the host mirror does not model; parity runs use the device path.
        return False
    if comp.method in ("fullkv", "allkv", "h2o", "snapkv",
                       "streamingllm", "quest") \
            and comp.decoding_metric in ("none", "fixed", "linear", "jump"):
        return True
    # Method-specific metrics: gates are pure length thresholds
    # (kv_utils.py:689, :887) — deterministic per stream, so serving can
    # mirror them per slot exactly like `fixed` (VERDICT r3 #5).  The
    # rewrite re-ranks from slot 0 (pseg=0 on the device side).
    return (comp.method, comp.decoding_metric) in (
        ("h2o", "h2o"), ("streamingllm", "slm"))


def host_schedulable_layered(comp: CompressionConfig) -> bool:
    """PyramidKV: per-LAYER prefill budgets make lengths (and hence fire
    steps) differ per layer, but they are still deterministic — the host
    mirrors L length streams and dispatches per-layer fire masks."""
    return (comp.method == "pyramidkv"
            and not comp.mistral_window_parity
            and comp.decoding_metric in ("none", "fixed", "linear",
                                         "jump", "pyramidinfer"))


def pyramid_prefill_kept(comp: CompressionConfig, num_layers: int,
                         prompt_len: int, prompt_bucket: int) -> list:
    """Host mirror of the PyramidKV prefill kept-count per layer
    (compression/policies.py pyramidkv branch; kv_utils.py:150-160).

    prompt_bucket is the padded prompt length S_pad (the device skips
    compression entirely when S_pad <= P, policies.py:119-125)."""
    P, w, beta = (comp.max_capacity_prompt, comp.window_size, comp.beta)
    if prompt_bucket <= P or prompt_len < P:
        return [prompt_len] * num_layers
    q_len = prompt_len
    min_num = (P - w) // beta
    max_num = (P - w) * 2 - min_num
    over = max_num >= q_len - w
    max_num_d = (q_len - w) if over else max_num
    lo = ((P - w) * 2 - max_num_d) if over else min_num
    steps = (max_num_d - lo) // num_layers
    mid = q_len < (P - w) * 2
    kept = []
    for l in range(num_layers):
        budget_l = max_num_d - l * steps
        n_keep = P if mid else budget_l
        n_keep = max(0, min(n_keep, q_len - w))
        kept.append(n_keep + w)
    return kept


@dataclass
class StepPlan:
    fire: bool
    n_keep: int = 0          # tokens kept from the scored region
    w_t: int = 0             # current decode window budget


@dataclass
class LayeredStepPlan:
    fire_any: bool
    fire: list               # [L] bool
    n_keep: list             # [L] int


class HostScheduler:
    """Python mirror of the reference per-layer-call counters.

    One instance per request stream.  Counters advance exactly as the
    class attributes do in the reference (one increment per layer call);
    lengths mirror the device cache length bookkeeping."""

    def __init__(self, comp: CompressionConfig, num_layers: int,
                 prompt_len: int, prefill_kept: int, keep_cap: int,
                 lazy: bool = False, capacity: int = 0):
        self.comp = comp
        self.L = num_layers
        self.metric = comp.decoding_metric
        # pseg: the scheduling boundary (kv_utils.py:1070 vs :714).
        if comp.method in ("allkv", "fullkv"):
            self.pseg = prompt_len
        else:
            self.pseg = comp.max_capacity_prompt
        self.length = prefill_kept        # LIVE cache length (gates)
        # Physical fill pointer: equals `length` in eager mode; with lazy
        # eviction it only grows (+1 per append) until compact_lazy.
        self.phys = prefill_kept
        self.lazy = lazy
        self.capacity = capacity
        self.keep_cap = keep_cap
        self.step_counter = 0             # current_decoding_step
        self.jump_step = 0
        self.jump_layer = 0
        self.ring_fill = 0                # staged (unflushed) ring tokens

    def plan_step(self) -> StepPlan:
        """Advance one decode step (all L layer calls) and return whether
        this step's layers fire.  Call AFTER the append is conceptually
        counted (gates see the appended length, llama_model.py:593)."""
        comp = self.comp
        self.length += 1                  # the appended token
        self.phys += 1
        m = self.metric
        if m == "none" or comp.method == "fullkv":
            return StepPlan(fire=False)
        W = comp.decoding_window_size
        r = comp.decoding_recent_size
        thresh = comp.delta * self.L

        if m in ("h2o", "slm"):
            # Method-specific global metrics (kv_utils.py:679-700 h2o,
            # :881-902 slm intent): gate on pseg+W like fixed, but the
            # rewrite re-ranks the WHOLE cache from slot 0 (device pseg=0)
            # keeping pseg+W-r (top-scored for h2o, positional for slm)
            # + the recent r.  Mirrors schedulers.schedule_decision.
            gate = self.length >= self.pseg + W
            if not gate:
                return StepPlan(fire=False, w_t=W)
            n_keep = max(0, min(self.pseg + W - r, self.keep_cap,
                                self.length - r))
            if self.capacity:
                n_keep = min(n_keep, self.capacity - r)
            self.length = n_keep + r
            if not self.lazy:
                self.phys = self.length
            return StepPlan(fire=True, n_keep=n_keep, w_t=W)
        if m == "fixed":
            w_t = W
            gate = self.length >= self.pseg + W
            fire = gate
        elif m in ("linear", "jump"):
            # Counter increments per layer call BEFORE the gate
            # (kv_utils.py:733-734); within one step all L calls see the
            # same W(t) (floor((s*L + l) / (delta*L)) == s // delta).
            w_t = r + self.step_counter // thresh
            self.step_counter += self.L
            gate = self.length >= self.pseg + w_t
            if m == "linear":
                fire = gate
            else:
                fire = False
                if gate:
                    if self.jump_step < thresh:
                        self.jump_step += self.L
                    else:
                        # Wave: all L layers compress this step, then the
                        # counters reset (kv_utils.py:772-776).
                        fire = True
                        self.jump_step = 0
                        self.jump_layer = 0
        else:
            raise ValueError(f"metric {m} is not host-schedulable")

        if not fire:
            return StepPlan(fire=False, w_t=w_t)
        n_keep = max(0, min(w_t - r, self.keep_cap,
                            self.length - r - self.pseg))
        self.length = self.pseg + n_keep + r
        if not self.lazy:
            self.phys = self.length       # eager fires compact in place
        return StepPlan(fire=True, n_keep=n_keep, w_t=w_t)

    # -- lazy compaction -------------------------------------------------
    def needs_compact(self, headroom: int = 1) -> bool:
        """True when the physical fill pointer is about to overflow —
        the host must dispatch cache.compact_lazy before the next
        ``headroom`` appends."""
        return self.lazy and self.phys + headroom >= self.capacity

    def compacted(self):
        """Mirror a compact_lazy dispatch: physical == live."""
        self.phys = self.length

    # -- chunk planning ------------------------------------------------
    def _snapshot(self):
        return (self.length, self.phys, self.step_counter, self.jump_step,
                self.jump_layer)

    def _restore(self, snap):
        (self.length, self.phys, self.step_counter, self.jump_step,
         self.jump_layer) = snap

    def hot_run_length(self, max_n: int) -> int:
        """How many of the next ``max_n`` steps are fire-free.

        Peeks by simulating plan_step on the (tiny, deterministic) mirror
        state and restoring it — the caller can then dispatch one multi-
        step hot program covering that run (models/llama.py decode_steps)
        and advance the mirror with ``advance_hot(n)``."""
        if self.lazy:
            max_n = min(max_n, max(self.capacity - 1 - self.phys, 0))
        snap = self._snapshot()
        n = 0
        while n < max_n and not self.plan_step().fire:
            n += 1
        self._restore(snap)
        return n

    def advance_hot(self, n: int):
        """Advance the mirror over ``n`` known-fire-free steps."""
        for _ in range(n):
            plan = self.plan_step()
            assert not plan.fire, "advance_hot crossed a fire step"


class QuestHostScheduler:
    """Host mirror for quest's decode-region compression gates.

    Mirrors compression/quest.quest_decode_layer exactly: the skip layers
    (kv_utils.py:1277-1278) never compress AND never advance the shared
    counters, so only L-skip counter increments happen per step — w_t
    grows slower than the generic metrics and a jump wave needs two
    consecutive steps to cover all L jump_layer increments (the second
    step re-fires the first wave's layers; reference class-attr
    arithmetic, reproduced bit-for-bit).  Per-layer lengths: the skip
    layers' decode regions grow unboundedly; fired layers reset to
    prompt_len + n_keep + r."""

    def __init__(self, comp: CompressionConfig, num_layers: int,
                 prompt_len: int, keep_cap: int):
        self.comp = comp
        self.L = num_layers
        self.skip = comp.quest_skip_layers
        self.prompt_len = prompt_len
        self.lengths = [prompt_len] * num_layers
        self.keep_cap = keep_cap
        self.step_counter = 0
        self.jump_step = 0
        self.jump_layer = 0
        self.ring_fill = 0      # unused (quest never stages a ring)

    def plan_step(self) -> LayeredStepPlan:
        comp = self.comp
        m = comp.decoding_metric
        W = comp.decoding_window_size
        r = comp.decoding_recent_size
        thresh = comp.delta * self.L
        fire = [False] * self.L
        n_keep = [0] * self.L
        for l in range(self.L):
            self.lengths[l] += 1            # the appended token
            if m == "none" or l < self.skip:
                continue
            dk = self.lengths[l] - self.prompt_len
            if m in ("linear", "jump"):
                w_t = r + self.step_counter // thresh
                self.step_counter += 1
            else:                            # fixed
                w_t = W
            gate = dk >= w_t
            if m == "jump":
                counting = gate and self.jump_step < thresh
                wave = gate and self.jump_step >= thresh
                if counting:
                    self.jump_step += 1
                if wave:
                    self.jump_layer += 1
                if self.jump_layer >= self.L:
                    self.jump_step = 0
                    self.jump_layer = 0
                f = gate and wave
            else:
                f = gate
            if f:
                nk = max(0, min(w_t - r, self.keep_cap))
                nk = min(nk, max(dk - r, 0))
                fire[l] = True
                n_keep[l] = nk
                self.lengths[l] = self.prompt_len + nk + r
        return LayeredStepPlan(fire_any=any(fire), fire=fire,
                               n_keep=n_keep)

    # -- chunk planning (see HostScheduler) -----------------------------
    def _snapshot(self):
        return (list(self.lengths), self.step_counter, self.jump_step,
                self.jump_layer)

    def _restore(self, snap):
        lengths, self.step_counter, self.jump_step, self.jump_layer = snap
        self.lengths = lengths

    def hot_run_length(self, max_n: int) -> int:
        snap = self._snapshot()
        n = 0
        while n < max_n and not self.plan_step().fire_any:
            n += 1
        self._restore(snap)
        return n

    def advance_hot(self, n: int):
        for _ in range(n):
            plan = self.plan_step()
            assert not plan.fire_any, "advance_hot crossed a fire step"

    @property
    def length(self) -> int:
        """Largest live total length across layers (bucketing)."""
        return max(self.lengths)

    @property
    def dec_len(self) -> int:
        """Largest PAGED-layer decode-region length (quest_dec_cap
        bucketing; the skip layers attend via the dense full-cache
        branch, bounded by the total-length bucket instead)."""
        if self.L <= self.skip:
            return 0
        return max(self.lengths[l] - self.prompt_len
                   for l in range(self.skip, self.L))


class LayeredHostScheduler:
    """Per-layer host mirror for PyramidKV's layer-decayed budgets.

    Prefill keeps a different count per layer (pyramid budgets), so each
    layer's cache length — and therefore its fire step — differs.  The
    counters themselves stay scalar (reference class attributes,
    kv_utils.py:92-94): one increment per layer CALL, exactly like the
    device path (schedulers.schedule_decision called once per layer)."""

    def __init__(self, comp: CompressionConfig, num_layers: int,
                 prompt_len: int, prompt_pad: int, keep_cap: int,
                 capacity: int):
        self.comp = comp
        self.L = num_layers
        self.pseg = comp.max_capacity_prompt
        self.lengths = pyramid_prefill_kept(comp, num_layers, prompt_len,
                                            prompt_pad)
        self.keep_cap = min(keep_cap, capacity)
        self.capacity = capacity
        self.step_counter = 0
        self.jump_step = 0
        self.jump_layer = 0
        self.ring_fill = 0                # staged (unflushed) ring tokens

    def plan_step(self) -> LayeredStepPlan:
        comp = self.comp
        m = comp.decoding_metric
        W = comp.decoding_window_size
        r = comp.decoding_recent_size
        thresh = comp.delta * self.L
        fire = [False] * self.L
        n_keep = [0] * self.L
        P = comp.max_capacity_prompt
        for l in range(self.L):
            self.lengths[l] += 1
            if m == "none":
                continue
            if m == "pyramidinfer":
                # Decode-phase pyramid budgets (kv_utils.py:237-263, the
                # reachable mid branch; deep branch clamped — PARITY.md).
                # Rewrite pseg=0 on the device; mirrors
                # schedulers.schedule_decision's pyramidinfer arm.
                if self.lengths[l] < self.pseg + W:
                    continue
                min_num = (P + W - r) // 2
                max_num = (P + W - r) * 2 - min_num
                steps = (max_num - min_num) // self.L
                budget_l = max_num - l * steps
                mid = self.lengths[l] < (P - r) * 2 + W
                nk = (P + W - r) if mid else (budget_l + W)
                nk = max(0, min(nk, self.lengths[l] - r, self.keep_cap,
                                self.capacity - r))
                n_keep[l] = nk
                fire[l] = True
                self.lengths[l] = nk + r
                continue
            if m == "fixed":
                w_t = W
                gate = self.lengths[l] >= self.pseg + W
                f = gate
            else:
                w_t = r + self.step_counter // thresh
                self.step_counter += 1
                gate = self.lengths[l] >= self.pseg + w_t
                if m == "linear":
                    f = gate
                else:            # jump: wave machinery per layer call
                    counting = gate and self.jump_step < thresh
                    wave = gate and self.jump_step >= thresh
                    if counting:
                        self.jump_step += 1
                    if wave:
                        self.jump_layer += 1
                    if self.jump_layer >= self.L:
                        self.jump_step = 0
                        self.jump_layer = 0
                    f = gate and wave
            if f:
                nk = max(0, min(w_t - r,
                                max(self.lengths[l] - r - self.pseg, 0)))
                nk = min(nk, self.keep_cap,
                         self.capacity - r - self.pseg)
                n_keep[l] = nk
                fire[l] = True
                self.lengths[l] = self.pseg + nk + r
        return LayeredStepPlan(fire_any=any(fire), fire=fire,
                               n_keep=n_keep)

    # -- chunk planning (see HostScheduler) -----------------------------
    def _snapshot(self):
        return (list(self.lengths), self.step_counter, self.jump_step,
                self.jump_layer)

    def _restore(self, snap):
        lengths, self.step_counter, self.jump_step, self.jump_layer = snap
        self.lengths = lengths

    def hot_run_length(self, max_n: int) -> int:
        snap = self._snapshot()
        n = 0
        while n < max_n and not self.plan_step().fire_any:
            n += 1
        self._restore(snap)
        return n

    def advance_hot(self, n: int):
        for _ in range(n):
            plan = self.plan_step()
            assert not plan.fire_any, "advance_hot crossed a fire step"

    @property
    def length(self) -> int:
        return max(self.lengths)
