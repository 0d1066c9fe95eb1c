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
fullkv) x metrics (none/fixed/linear/jump).  Per-layer-budget methods
(pyramidkv) and quest/headwise keep the device-side path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

from scope_tpu.config import CompressionConfig


def host_schedulable(comp: CompressionConfig) -> bool:
    return (comp.method in ("fullkv", "allkv", "h2o", "snapkv",
                            "streamingllm")
            and comp.decoding_metric in ("none", "fixed", "linear", "jump"))


@dataclass
class StepPlan:
    fire: bool
    n_keep: int = 0          # tokens kept from the scored region
    w_t: int = 0             # current decode window budget


class HostScheduler:
    """Python mirror of the reference per-layer-call counters.

    One instance per request stream.  Counters advance exactly as the
    class attributes do in the reference (one increment per layer call);
    lengths mirror the device cache length bookkeeping."""

    def __init__(self, comp: CompressionConfig, num_layers: int,
                 prompt_len: int, prefill_kept: int, keep_cap: int):
        self.comp = comp
        self.L = num_layers
        self.metric = comp.decoding_metric
        # pseg: the scheduling boundary (kv_utils.py:1070 vs :714).
        if comp.method in ("allkv", "fullkv"):
            self.pseg = prompt_len
        else:
            self.pseg = comp.max_capacity_prompt
        self.length = prefill_kept        # physical cache length
        self.keep_cap = keep_cap
        self.step_counter = 0             # current_decoding_step
        self.jump_step = 0
        self.jump_layer = 0

    def plan_step(self) -> StepPlan:
        """Advance one decode step (all L layer calls) and return whether
        this step's layers fire.  Call AFTER the append is conceptually
        counted (gates see the appended length, llama_model.py:593)."""
        comp = self.comp
        self.length += 1                  # the appended token
        m = self.metric
        if m == "none" or comp.method == "fullkv":
            return StepPlan(fire=False)
        W = comp.decoding_window_size
        r = comp.decoding_recent_size
        thresh = comp.delta * self.L

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
        return StepPlan(fire=True, n_keep=n_keep, w_t=w_t)
