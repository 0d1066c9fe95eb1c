"""HF checkpoint -> scope_tpu parameter pytree.

Replaces the reference's ``AutoModelForCausalLM.from_pretrained`` +
``device_map="auto"`` path (run_longgenbench.py:353-361) with a direct
safetensors read into stacked JAX arrays (layer-stacked for ``lax.scan``),
optionally placed with a NamedSharding (see scope_tpu/parallel).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scope_tpu.config import ModelSpec


def _resolve_sliding_window(cfg: Dict[str, Any]):
    """HF Qwen2 windows only layers >= max_window_layers
    (modeling_qwen2: use_sliding_window and layer_idx >= max_window_layers);
    ModelSpec.sliding_window is all-layers-uniform, so only the two
    extremes map faithfully.  No shipped Qwen2.5 checkpoint enables the
    window (all ship use_sliding_window=false)."""
    win = cfg.get("sliding_window")
    if win is None or not cfg.get("use_sliding_window", True):
        return None
    mwl = cfg.get("max_window_layers", 0)
    n_layers = cfg["num_hidden_layers"]
    if mwl >= n_layers:
        return None          # window never applies to any layer
    if mwl > 0:
        raise NotImplementedError(
            f"per-layer sliding windows (max_window_layers={mwl} of "
            f"{n_layers}) are not supported; ModelSpec windows are uniform")
    return win


def spec_from_hf_config(cfg: Dict[str, Any], name: str = "hf-model"
                        ) -> ModelSpec:
    """Build a ModelSpec from an HF config.json dict (llama/mistral)."""
    rope_scaling = None
    rs = cfg.get("rope_scaling")
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        rope_scaling = (float(rs["factor"]), float(rs["low_freq_factor"]),
                        float(rs["high_freq_factor"]),
                        int(rs["original_max_position_embeddings"]))
    head_dim = cfg.get("head_dim") or (cfg["hidden_size"]
                                       // cfg["num_attention_heads"])
    return ModelSpec(
        name=name,
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        num_kv_heads=cfg.get("num_key_value_heads",
                             cfg["num_attention_heads"]),
        head_dim=head_dim,
        rope_theta=cfg.get("rope_theta", 10000.0),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
        max_position_embeddings=cfg.get("max_position_embeddings", 8192),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        rope_scaling=rope_scaling,
        # Qwen2 gates its window behind use_sliding_window (default off)
        # and applies it only to layers >= max_window_layers; a uniform
        # ModelSpec window is only faithful at the two extremes.
        sliding_window=_resolve_sliding_window(cfg),
        # Qwen2's qkv bias is hardcoded in the HF model, not serialized
        # in config.json (transformers Qwen2Attention bias=True).
        attention_bias=cfg.get("attention_bias",
                               cfg.get("model_type") == "qwen2"),
        arch=cfg.get("model_type", "llama"),
    )


_LAYER_KEYS = {
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.q_proj.bias": "bq",
    "self_attn.k_proj.bias": "bk",
    "self_attn.v_proj.bias": "bv",
    "self_attn.o_proj.weight": "wo",
    "mlp.gate_proj.weight": "w_gate",
    "mlp.up_proj.weight": "w_up",
    "mlp.down_proj.weight": "w_down",
    "input_layernorm.weight": "ln_attn",
    "post_attention_layernorm.weight": "ln_mlp",
}


def params_from_state_dict(spec: ModelSpec, tensors: Dict[str, np.ndarray],
                           dtype=jnp.bfloat16) -> Dict[str, Any]:
    """tensors: flat HF state dict (numpy).  Linear weights are [out, in]
    in HF; ours are [in, out] so matmuls read x @ W."""
    L = spec.num_layers
    layers: Dict[str, list] = {v: [None] * L for v in _LAYER_KEYS.values()}
    params: Dict[str, Any] = {"layers": {}}

    def cast(x):
        return jnp.asarray(np.asarray(x), dtype)

    for key, val in tensors.items():
        k = key.removeprefix("model.")
        if k == "embed_tokens.weight":
            params["embed"] = cast(val)
            continue
        if k == "norm.weight":
            params["final_norm"] = cast(val)
            continue
        if key == "lm_head.weight":
            params["lm_head"] = cast(np.asarray(val).T)
            continue
        m = re.match(r"layers\.(\d+)\.(.+)", k)
        if not m:
            continue
        idx, rest = int(m.group(1)), m.group(2)
        name = _LAYER_KEYS.get(rest)
        if name is None:
            continue
        arr = np.asarray(val)
        if name.startswith("w"):
            arr = arr.T  # [out, in] -> [in, out]
        layers[name][idx] = arr

    for name in ("bq", "bk", "bv"):
        if not spec.attention_bias and all(v is None for v in layers[name]):
            layers.pop(name)
    for name, vals in layers.items():
        missing = [i for i, v in enumerate(vals) if v is None]
        if missing:
            raise ValueError(f"missing {name} for layers {missing}")
        layers[name] = np.stack(vals)

    # Fuse q/k/v into the flat kv-head-grouped layout
    # [L, E, Hkv*(G+2)*D] (see llama.init_params).
    L_, E = layers["wq"].shape[:2]
    Hkv, D, G = spec.num_kv_heads, spec.head_dim, spec.num_kv_groups
    q = layers.pop("wq").reshape(L_, E, Hkv, G, D)
    k = layers.pop("wk").reshape(L_, E, Hkv, 1, D)
    v = layers.pop("wv").reshape(L_, E, Hkv, 1, D)
    layers["wqkv"] = np.concatenate([q, k, v], axis=3).reshape(L_, E, -1)
    if "bq" in layers:
        # Fuse the qkv biases with the same kv-head grouping as wqkv.
        bq = layers.pop("bq").reshape(L_, Hkv, G, D)
        bk = layers.pop("bk").reshape(L_, Hkv, 1, D)
        bv = layers.pop("bv").reshape(L_, Hkv, 1, D)
        layers["bqkv"] = np.concatenate([bq, bk, bv],
                                        axis=2).reshape(L_, -1)

    for name, arr in layers.items():
        params["layers"][name] = cast(arr)

    if spec.tie_word_embeddings:
        params.pop("lm_head", None)
    elif "lm_head" not in params:
        raise ValueError("checkpoint lacks lm_head but spec is untied")
    return params


def load_hf_checkpoint(path: str, dtype=jnp.bfloat16,
                       spec: Optional[ModelSpec] = None):
    """Load an HF model directory (config.json + *.safetensors shards).

    Returns (spec, params)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    if spec is None:
        spec = spec_from_hf_config(cfg, name=os.path.basename(path.rstrip("/")))

    from safetensors import safe_open
    tensors: Dict[str, np.ndarray] = {}
    shards = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not shards:
        raise FileNotFoundError(f"no .safetensors files in {path}")
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return spec, params_from_state_dict(spec, tensors, dtype)


def params_from_torch_model(spec: ModelSpec, model, dtype=jnp.float32):
    """Convert an in-memory HF torch model (tests) to our params."""
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in model.state_dict().items()}
    return params_from_state_dict(spec, sd, dtype)
