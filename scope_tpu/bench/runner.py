"""LongGenBench benchmark runner (reference: run_longgenbench.py).

Same CLI knobs, same per-example JSON record schema
({prompt, questions, answers, pre_length, gen_length, TTFT, TPOT, pred},
run_longgenbench.py:259-272) and the same result-file layout
(save_dir/{model}_{P}_{attn}/{dataset}/pre_{method}_dec_{metric}.json,
:149-153) so the evaluator consumes either harness's output.

Differences by design:
- Per-layer config injection into HF modules (:201-226) is replaced by a
  typed CompressionConfig; the derived delta formula (:218) is kept.
- Runs on TPU/CPU via JAX; weights load from an HF safetensors dir, or
  --random_weights for infrastructure smoke runs without a checkpoint.
- Tokenizer: HF AutoTokenizer when available; --tokenizer byte provides a
  dependency-free byte-level fallback for smoke runs.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional

import numpy as np

from scope_tpu.bench import data as D
from scope_tpu.config import (CompressionConfig, EngineConfig, derive_delta)

CANON_METHOD = {
    "fullkv": "FullKV", "allkv": "ALLKV", "h2o": "H2O", "snapkv": "SnapKV",
    "pyramidkv": "PyramidKV", "streamingllm": "StreamingLLM",
    "quest": "Quest", "headwise": "Headwise",
}


class ByteTokenizer:
    """Byte-level fallback tokenizer (ids 0..255, eos=256, bos=257)."""

    vocab_size = 258
    eos_token_id = 256
    bos_token_id = 257

    def encode(self, text: str) -> List[int]:
        return [self.bos_token_id] + list(text.encode("utf-8"))

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        body = bytes(i for i in ids if i < 256)
        return body.decode("utf-8", errors="replace")


def load_tokenizer(args):
    if args.tokenizer == "byte":
        return ByteTokenizer()
    path = args.tokenizer if args.tokenizer else args.model_path
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(path, use_fast=True,
                                        padding_side="left")
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token
    return tok


def build_compression(args, output_len: int, dataset: str
                      ) -> CompressionConfig:
    method = args.method.lower()
    P = args.max_capacity_prompts
    # Window sizing rule (run_longgenbench.py:188-194).
    if method == "streamingllm":
        window = P // 2
    else:
        window = 8
    delta = derive_delta(output_len, args.decoding_window_size,
                         args.decoding_recent_size)
    metric = args.decoding_metric
    metric = "none" if metric in ("None", "none") else metric
    return CompressionConfig(
        method=method, decoding_metric=metric,
        max_capacity_prompt=P, window_size=window,
        kernel_size=7, pooling="maxpool",
        decoding_window_size=args.decoding_window_size,
        decoding_recent_size=args.decoding_recent_size,
        delta=delta, chunk_size=args.chunk_size,
        quest_decode_pages=args.quest_decode_pages,
        evict_per_qhead=not args.evict_per_kv_head,
        # Headwise: the reference HARDCODES prefill_max_budget=2048 /
        # prefill_min_budget=128 independent of P (headwise_attention.py
        # get_headwise_budget defaults) — parity runs keep those
        # constants at any P >= 128 (ADVICE r4; reported-as-parity runs
        # at P != 2048 must reserve the same per-head segment the
        # reference would).  Sub-128 smoke budgets scale both down to P.
        headwise_max_budget=2048 if P >= 128 else P,
        headwise_min_budget=128 if P >= 128 else P,
    )


def run_dataset(args, spec, params, tokenizer, dataset: str, fout):
    import jax
    import jax.numpy as jnp
    from scope_tpu.engine.generate import StreamingGenerator

    K = D.rescale_k_for_dataset(dataset, args.K)
    out_len = (args.max_new_tokens if args.max_new_tokens
               else D.output_max_len(dataset, args.K))
    data_file = args.data_file or os.path.join(
        args.base_dir, "data", "longgenbench_examples",
        f"{dataset}_{K}_{args.shot_number}shot.jsonl")
    examples = D.load_examples(data_file, dataset, args.model_path or "",
                               args.max_num_examples)
    if args.skip_examples:
        examples = examples[args.skip_examples:]
    limit = D.model_max_len(args.model_path or spec.name)

    comp = build_compression(args, out_len, dataset)
    ecfg = EngineConfig(
        max_prompt_len=min(args.max_prompt_len, spec.max_position_embeddings),
        max_new_tokens=out_len, dtype=args.dtype,
        kv_dtype=args.kv_dtype, decode_ring=args.decode_ring,
        decode_chunk_sizes=tuple(args.decode_chunk_sizes),
        lazy_evict=args.lazy_evict, lazy_slack=args.lazy_slack)
    eos_ids = tuple(args.eos_ids) if args.eos_ids else (
        (tokenizer.eos_token_id,) if tokenizer.eos_token_id is not None
        else ())
    gen = StreamingGenerator(spec, comp, ecfg, params, eos_ids=eos_ids)

    for ex in examples:
        ids = tokenizer.encode(ex.prompt)
        # Middle-truncate at the EFFECTIVE ceiling (model limit AND the
        # engine's prompt bucket ceiling) — reference semantics
        # (run_longgenbench.py:167-173) at every limit.  A head-clip here
        # (`ids[:max_prompt_len]`, the r4 bug) silently dropped the END
        # of over-long prompts — where LongGenBench packs the questions.
        ids = D.middle_truncate_ids(ids, min(limit, ecfg.max_prompt_len))
        bucket = ecfg.bucket_for(len(ids))
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :len(ids)] = ids
        res = gen.generate(toks, np.array([len(ids)]), out_len)
        n = int(res.gen_lengths[0])
        pred = tokenizer.decode(res.tokens[0, :n].tolist(),
                                skip_special_tokens=True)
        record = {
            "prompt": ex.prompt,
            "questions": ex.questions,
            "answers": ex.answers,
            "pre_length": len(ex.prompt),
            "gen_length": n,
            "TTFT": res.ttft_s,
            "TPOT": res.tpot_s,
            "pred": pred,
        }
        fout.write(json.dumps(record) + "\n")
        fout.flush()


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", type=str, default="",
                   help="force a JAX platform (e.g. 'cpu' for smoke "
                        "sweeps; the axon TPU plugin ignores the "
                        "JAX_PLATFORMS env var, so this calls "
                        "jax.config.update)")
    p.add_argument("--base_dir", type=str, default=".")
    p.add_argument("--datasets", type=str, nargs="*", default=["gsm8k"])
    p.add_argument("--data_file", type=str, default=None)
    p.add_argument("--save_dir", type=str, default="results")
    p.add_argument("--model_path", type=str, default=None,
                   help="HF checkpoint dir (config.json + safetensors)")
    p.add_argument("--model_spec", type=str, default=None,
                   help="registry spec name when using --random_weights")
    p.add_argument("--random_weights", action="store_true",
                   help="random-init weights (infrastructure smoke runs)")
    p.add_argument("--tokenizer", type=str, default=None,
                   help="tokenizer path, or 'byte' for the fallback")
    p.add_argument("--max_num_examples", type=int, default=None)
    p.add_argument("--max_new_tokens", type=int, default=None)
    p.add_argument("--max_prompt_len", type=int, default=16384,
                   help="engine prompt-bucket ceiling (clamped to the "
                        "model's max_position_embeddings); prompts "
                        "beyond it are middle-truncated, reference "
                        "semantics (run_longgenbench.py:167-173)")
    p.add_argument("--method", type=str, default="allkv")
    p.add_argument("--max_capacity_prompts", type=int, default=512)
    p.add_argument("--decoding_metric", type=str, default="None")
    p.add_argument("--decoding_window_size", type=int, default=1024)
    p.add_argument("--decoding_recent_size", type=int, default=128)
    p.add_argument("--K", type=int, default=30)
    p.add_argument("--shot_number", type=int, default=8)
    p.add_argument("--chunk_size", type=int, default=16)
    p.add_argument("--quest_decode_pages", type=int, default=0,
                   help="page quest's decode region with N pages "
                        "(beyond-reference; quest + decoding_metric "
                        "None only — see config.py)")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--weight_dtype", type=str, default="",
                   choices=["", "int8"],
                   help="weight-only int8 (per-output-channel; "
                        "ops/quant.quantize_layer_weights) — halves the "
                        "weight HBM stream; default keeps the load dtype")
    p.add_argument("--decode_ring", type=int, default=0,
                   help="staging-ring size R (0 = direct appends); hot "
                        "decode steps stage tokens in a small ring and "
                        "flush every R steps (big-buffer updates cost a "
                        "full copy per step on TPU)")
    p.add_argument("--decode_chunk_sizes", type=int, nargs="*", default=[],
                   help="dispatch fire-free runs as one multi-step "
                        "program (largest-first sizes, e.g. 8 4 2); "
                        "chunks stage their appends and land them in "
                        "one write (in-chunk staging)")
    p.add_argument("--lazy_evict", action="store_true",
                   help="tombstone fires into an alive mask instead of "
                        "the gather rewrite (host-scheduled methods; "
                        "amortized compaction every --lazy_slack steps)")
    p.add_argument("--lazy_slack", type=int, default=256)
    p.add_argument("--kv_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "int8", "int4"],
                   help="KV cache storage dtype (int8: per-channel "
                        "prefill-calibrated scales; int4: packed "
                        "asymmetric per-channel codes, quarter bytes)")
    p.add_argument("--evict_per_kv_head", action="store_true")
    p.add_argument("--eos_ids", type=int, nargs="*", default=None)
    p.add_argument("--resume", action="store_true",
                   help="append to an existing result file, skipping "
                        "already-completed examples")
    p.add_argument("--skip_examples", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from scope_tpu.models import llama
    from scope_tpu.models.loader import load_hf_checkpoint
    from scope_tpu.models.registry import get_spec

    np.random.seed(args.seed)
    dtype = jnp.dtype(args.dtype)
    if args.random_weights:
        spec = get_spec(args.model_spec or "tiny-llama")
        params = llama.init_params(spec, jax.random.key(args.seed), dtype)
    else:
        spec, params = load_hf_checkpoint(args.model_path, dtype)
    if args.weight_dtype == "int8":
        from scope_tpu.ops import quant
        params = quant.quantize_layer_weights(params)

    tokenizer = load_tokenizer(args)
    model_name = (args.model_path or spec.name).rstrip("/").split("/")[-1]
    method_name = CANON_METHOD.get(args.method.lower(), args.method)

    for dataset in args.datasets:
        out_dir = os.path.join(
            args.save_dir,
            f"{model_name}_{args.max_capacity_prompts}_tpu", dataset)
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(
            out_dir, f"pre_{method_name}_dec_{args.decoding_metric}.json")
        # Resume: completed examples are preserved (records append per
        # example; the reference only preserved partial runs by accident —
        # run_longgenbench.py:272 — with no skip logic).
        mode = "a" if args.resume and os.path.exists(out_path) else "w"
        if mode == "a":
            with open(out_path) as f:
                done = sum(1 for line in f if line.strip())
            args.skip_examples = done
            print(f"resuming {out_path} at example {done}")
        with open(out_path, mode) as fout:
            run_dataset(args, spec, params, tokenizer, dataset, fout)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
