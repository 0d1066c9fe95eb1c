"""Mistral family support.

Architecturally Mistral-7B is the Llama body with (a) sliding-window
attention and (b) its own rope/vocab hyper-parameters, so the model
functions are shared with :mod:`scope_tpu.models.llama`; the sliding
window enters through ``ModelSpec.sliding_window``:

- Prefill: a banded causal mask (ops/attention.py ``sliding_window=``),
  equivalent to HF's windowed prefill mask.  This replaces the reference's
  flash-attn window support (mistral_model.py:22-26).
- Decode: slots hold arbitrary original positions after compression, so a
  positional window mask is only well-defined for the non-evicting methods
  (fullkv/allkv), where slot index == position; llama.decode_step applies
  it there.  The compressed methods intentionally run un-windowed decode —
  the reference's window slicing (mistral_model.py:246-269) also assumes
  an uncompressed physical layout and silently degrades once the cache is
  rewritten; the budget (P+W << sliding_window in the reference operating
  points) makes the window vacuous during decode anyway.

Checkpoint loading: HF Mistral uses identical parameter names to Llama, so
loader.load_hf_checkpoint handles both (model_type selects the spec).
"""

from scope_tpu.models.llama import (decode_step, init_params,  # noqa: F401
                                    prefill)
