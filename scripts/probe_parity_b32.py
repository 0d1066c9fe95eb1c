"""Validate the r02-OOM parity config (b32/int8, GQA-expanded) under
lazy eviction: the eager force program materialized per-layer cache
slices around its gathers; the lazy force has no gathers."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from bench import log, run_scope_only
from scope_tpu.models import llama
from scope_tpu.models.registry import get_spec
from scope_tpu.utils import compile_cache

compile_cache.enable()
spec = get_spec("llama-3.2-1b")
params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)
for b, lz in ((32, 256), (32, 0)):
    try:
        tps = run_scope_only(spec, params, b, kv_dtype="int8", lazy=lz)
        log(f"[parity b{b} lazy={lz}] {tps:.1f} tok/s")
    except Exception as e:
        log(f"[parity b{b} lazy={lz}] FAILED {type(e).__name__}: "
            f"{str(e).splitlines()[0][:160]}")
