"""Measure the quest decode-region paging speed delta (VERDICT r4 #7).

Thin driver over bench.run_quest_paged_leg (the harness the driver
records every round) at two region lengths — quest + none, 1B shapes,
batch 4, dense vs quest_decode_pages=16.  Accuracy gate:
tests/test_quest_paged_decode (planted-structure selection +
exactness-while-fits + metadata rebuild).

Run alone — the chip is single-tenant.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from scope_tpu.models import llama
    from scope_tpu.models.registry import get_spec
    from scope_tpu.utils import compile_cache

    compile_cache.enable()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    spec = get_spec("llama-3.2-1b")
    params = llama.init_params(spec, jax.random.key(0), jnp.bfloat16)
    for region in (2048, 6000):
        bench.run_quest_paged_leg(spec, params, region=region)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
