"""Persistent XLA compilation cache for benchmark/serving processes.

TPU compiles run server-side through the transport and cost 20s-5min per
program at 1B scale; the persistent cache stores serialized executables
keyed by HLO so a re-run (or a sweep revisiting a config) skips them.
Tests do NOT enable this (CPU compiles are cheap and cache writes would
race across xdist-style runs).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get("SCOPE_TPU_COMPILE_CACHE",
                             "/tmp/scope_tpu_jax_cache")


def enable(path: str = DEFAULT_DIR) -> bool:
    """Best-effort: returns True when the cache is active."""
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took real compile time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
