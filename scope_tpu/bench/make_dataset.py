"""Build LongGenBench-style packed-question datasets.

The reference ships pre-packed JSONL files (C9: data/longgenbench_examples,
``{prompt, questions[], answers[]}`` with K questions per long prompt).
This tool regenerates that format from raw question pools (GSM8K-style
``{question, answer}`` JSONL, or MMLU/CSQA-style multiple choice), so the
framework is standalone: point it at a raw pool and it emits packed
examples compatible with the runner/evaluator.

Format (matching the reference examples):
  prompt   = "Examples: \\n" + few-shot Q/A pairs + "\\n" +
             "Question_1: ...\\nQuestion_2: ..." block
  questions = the K packed question strings
  answers   = the K gold answers ("... #### N" for gsm8k; letter for MC)
"""

from __future__ import annotations

import argparse
import json
import random
from typing import Dict, List


def pack_gsm8k(pool: List[Dict], K: int, shots: int, num_examples: int,
               seed: int = 0) -> List[Dict]:
    rng = random.Random(seed)
    out = []
    for _ in range(num_examples):
        picked = rng.sample(pool, shots + K)
        shot_items, q_items = picked[:shots], picked[shots:]
        parts = ["Examples: \n"]
        for i, it in enumerate(shot_items, 1):
            parts.append(f"Question_{i}: \n{it['question']}\n")
            parts.append(f"Answer_{i}: {it['answer']}\n")
        parts.append("\nNow answer the following questions:\n")
        for i, it in enumerate(q_items, 1):
            parts.append(f"Question_{shots + i}: \n{it['question']}\n")
        out.append({
            "prompt": "".join(parts),
            "questions": [it["question"] for it in q_items],
            "answers": [it["answer"] for it in q_items],
        })
    return out


def pack_choices(pool: List[Dict], K: int, shots: int, num_examples: int,
                 seed: int = 0) -> List[Dict]:
    """MC pools: {question, choices: [..], answer: 'A'}."""
    rng = random.Random(seed)
    out = []
    for _ in range(num_examples):
        picked = rng.sample(pool, shots + K)
        shot_items, q_items = picked[:shots], picked[shots:]

        def fmt(i, it):
            ch = "\n".join(f"({chr(65 + j)}) {c}"
                           for j, c in enumerate(it["choices"]))
            return f"Question_{i}: \n{it['question']}\n{ch}\n"

        parts = ["Examples: "]
        for i, it in enumerate(shot_items, 1):
            parts.append(fmt(i, it))
            parts.append(f"Answer_{i}: The answer is ({it['answer']})\n")
        parts.append("\nNow answer the following questions:\n")
        for i, it in enumerate(q_items, 1):
            parts.append(fmt(shots + i, it))
        out.append({
            "prompt": "".join(parts),
            "questions": [it["question"] for it in q_items],
            "answers": [it["answer"] for it in q_items],
        })
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw", required=True,
                   help="raw pool JSONL ({question, answer[, choices]})")
    p.add_argument("--out", required=True)
    p.add_argument("--kind", choices=["gsm8k", "choices"], default="gsm8k")
    p.add_argument("--K", type=int, default=30)
    p.add_argument("--shots", type=int, default=8)
    p.add_argument("--num_examples", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    pool = [json.loads(l) for l in open(args.raw) if l.strip()]
    fn = pack_gsm8k if args.kind == "gsm8k" else pack_choices
    examples = fn(pool, args.K, args.shots, args.num_examples, args.seed)
    with open(args.out, "w") as f:
        for ex in examples:
            f.write(json.dumps(ex) + "\n")
    print(f"wrote {len(examples)} examples to {args.out}")


if __name__ == "__main__":
    main()
