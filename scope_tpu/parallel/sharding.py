"""Device mesh + sharding layout for multi-chip inference.

The reference has no distributed layer at all (SURVEY.md §2.5): its only
multi-device mechanism is ``accelerate device_map="auto"`` layer placement
(run_longgenbench.py:359).  Here weights and the compressed KV cache are
tensor-sharded over the head axis ('model', riding ICI) and requests over
the batch axis ('data', riding DCN across hosts):

- q/k/v projections: output (heads) dim over 'model'
- o_proj / mlp down: input dim over 'model' -> XLA inserts the reduce
- embed: vocab rows over 'model'; lm_head: vocab cols over 'model'
- KV cache: heads over 'model', batch over 'data'

Per-head eviction (the reference's GQA-expanded semantics, SURVEY.md §2.3)
is embarrassingly parallel across heads, so NO collective appears anywhere
in the compression path — scoring, top-k, and the gather rewrite all stay
local to the head shard.  Collectives only appear where standard TP decode
has them (o_proj/down all-reduce, logits gather).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int = 1, n_model: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_model is None:
        n_model = n // n_data
    if n_data * n_model != n:
        raise ValueError(f"{n_data}x{n_model} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs matching the llama params pytree."""
    specs: Dict[str, Any] = {
        "embed": P(MODEL_AXIS, None),
        "final_norm": P(None),
        "layers": {
            "ln_attn": P(None, None),
            "ln_mlp": P(None, None),
            # Fused qkv columns are grouped by kv head, so sharding the
            # flat F axis splits on whole kv-head groups (each shard's
            # q/k/v slice stays local).
            "wqkv": P(None, None, MODEL_AXIS),
            "wo": P(None, MODEL_AXIS, None),
            "w_gate": P(None, None, MODEL_AXIS),
            "w_up": P(None, None, MODEL_AXIS),
            "w_down": P(None, MODEL_AXIS, None),
        },
    }
    if "bqkv" in params["layers"]:
        # Fused qkv bias shards with wqkv's output (F) axis.
        specs["layers"]["bqkv"] = P(None, MODEL_AXIS)
    if "lm_head" in params:
        specs["lm_head"] = P(None, MODEL_AXIS)
    if "lm_head_t" in params:
        specs["lm_head_t"] = P(None, MODEL_AXIS)
    if "lm_head_t_scale" in params:
        specs["lm_head_t_scale"] = P(None)
    # Weight-only int8 (ops/quant.quantize_layer_weights): per-output-
    # channel scales shard exactly like their weight's output axis —
    # sharded for column-parallel weights, replicated where the output is
    # the all-reduced model dim.
    scale_specs = {
        "wqkv_scale": P(None, MODEL_AXIS),
        "wo_scale": P(None, None),
        "w_gate_scale": P(None, MODEL_AXIS),
        "w_up_scale": P(None, MODEL_AXIS),
        "w_down_scale": P(None, None),
    }
    for name, sp in scale_specs.items():
        if name in params["layers"]:
            specs["layers"][name] = sp
    return specs


def cache_pspecs(cache) -> Any:
    """PartitionSpecs for the KVCache pytree (heads over model, batch over
    data)."""
    from scope_tpu.cache import KVCache
    pages = P(None, DATA_AXIS, MODEL_AXIS, None, None)
    return KVCache(
        k=P(None, DATA_AXIS, MODEL_AXIS, None, None),
        v=P(None, DATA_AXIS, MODEL_AXIS, None, None),
        length=P(None, DATA_AXIS),
        pvalid=P(None, DATA_AXIS, MODEL_AXIS),
        prefill_gap=cache.prefill_gap,
        prompt_len=P(DATA_AXIS),
        page_min=pages if cache.page_min is not None else None,
        page_max=pages if cache.page_max is not None else None,
        k_scale=(P(None, DATA_AXIS, MODEL_AXIS, None)
                 if cache.k_scale is not None else None),
        v_scale=(P(None, DATA_AXIS, MODEL_AXIS, None)
                 if cache.v_scale is not None else None),
        k_off=(P(None, DATA_AXIS, MODEL_AXIS, None)
               if cache.k_off is not None else None),
        v_off=(P(None, DATA_AXIS, MODEL_AXIS, None)
               if cache.v_off is not None else None),
        ring_k=(P(None, DATA_AXIS, MODEL_AXIS, None, None)
                if cache.ring_k is not None else None),
        ring_v=(P(None, DATA_AXIS, MODEL_AXIS, None, None)
                if cache.ring_v is not None else None),
        ring_fill=P() if cache.ring_fill is not None else None,
        alive=(P(None, DATA_AXIS, MODEL_AXIS, None)
               if cache.alive is not None else None),
    )


def _to_shardings(mesh: Mesh, pspecs):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s) if isinstance(s, P) else s, pspecs,
        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    shardings = _to_shardings(mesh, param_pspecs(params))
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_cache(cache, mesh: Mesh):
    from scope_tpu.cache import KVCache
    ps = cache_pspecs(cache)

    def put(x, s):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, s))

    return KVCache(
        k=put(cache.k, ps.k), v=put(cache.v, ps.v),
        length=put(cache.length, ps.length),
        pvalid=put(cache.pvalid, ps.pvalid),
        prefill_gap=cache.prefill_gap,
        prompt_len=put(cache.prompt_len, ps.prompt_len),
        page_min=put(cache.page_min, ps.page_min),
        page_max=put(cache.page_max, ps.page_max),
        k_scale=put(cache.k_scale, ps.k_scale),
        v_scale=put(cache.v_scale, ps.v_scale),
        k_off=put(cache.k_off, ps.k_off),
        v_off=put(cache.v_off, ps.v_off),
        ring_k=put(cache.ring_k, ps.ring_k),
        ring_v=put(cache.ring_v, ps.ring_v),
        ring_fill=put(cache.ring_fill, ps.ring_fill),
        alive=put(cache.alive, ps.alive),
    )


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
