"""Generate synthetic raw question pools for LongGenBench packing.

The reference ships packed datasets built from GSM8K / MMLU / CSQA
(reference data/longgenbench_examples/, consumed at
run_longgenbench.py:384).  Those corpora cannot be redistributed from
here, so this tool generates *synthetic* pools in the same record
shapes — procedural multi-step arithmetic word problems for the
gsm8k-style pool (gold answers in the ``#### N`` format the evaluator's
regex expects, eval_longgenbench.py:18) and procedural multiple-choice
items for the mmlu/csqa-style pools (letter answers matched by
eval_longgenbench.py:58/:62).  Everything is deterministic given the
seed, so the packed datasets in data/ can be regenerated from scratch:

    python -m scope_tpu.bench.make_pool --kind gsm8k  --n 400 --out pool.jsonl
    python -m scope_tpu.bench.make_dataset --raw pool.jsonl --kind gsm8k ...
"""

from __future__ import annotations

import argparse
import json
import random
from typing import Dict, List

_NAMES = ["Ava", "Ben", "Carla", "Deon", "Elena", "Farid", "Grace",
          "Hiro", "Imani", "Jonas", "Kara", "Liam", "Mara", "Noor",
          "Omar", "Priya", "Quinn", "Rosa", "Sam", "Tara"]
_ITEMS = ["apples", "books", "marbles", "stickers", "coins", "pencils",
          "cards", "shells", "stamps", "beads", "tokens", "buttons"]


def _gsm8k_item(rng: random.Random) -> Dict:
    """One multi-step arithmetic word problem with a worked solution."""
    name = rng.choice(_NAMES)
    item = rng.choice(_ITEMS)
    kind = rng.randrange(4)
    if kind == 0:       # buy then give away
        a, b = rng.randint(8, 60), rng.randint(3, 40)
        c = rng.randint(1, a + b - 1)
        q = (f"{name} has {a} {item}. {name} buys {b} more {item}, then "
             f"gives {c} {item} to a friend. How many {item} does "
             f"{name} have now?")
        s1 = a + b
        ans = s1 - c
        sol = (f"{name} starts with {a} {item} and buys {b} more, so "
               f"{a} + {b} = {s1} {item}. After giving away {c}, "
               f"{s1} - {c} = {ans} {item} remain. The answer is {ans}.")
    elif kind == 1:     # packs of n
        n, p = rng.randint(3, 12), rng.randint(4, 15)
        extra = rng.randint(0, 10)
        q = (f"{name} buys {p} packs of {item} with {n} {item} in each "
             f"pack, plus {extra} loose {item}. How many {item} does "
             f"{name} have in total?")
        s1 = n * p
        ans = s1 + extra
        sol = (f"{p} packs of {n} {item} each is {p} * {n} = {s1} "
               f"{item}. Adding {extra} loose ones gives {s1} + {extra} "
               f"= {ans}. The answer is {ans}.")
    elif kind == 2:     # share equally
        people = rng.randint(2, 9)
        each = rng.randint(3, 25)
        total = people * each
        q = (f"{name} shares {total} {item} equally among {people} "
             f"friends. How many {item} does each friend get?")
        ans = each
        sol = (f"Dividing {total} {item} among {people} friends gives "
               f"{total} / {people} = {ans} each. The answer is {ans}.")
    else:               # earn per day
        days = rng.randint(2, 14)
        per = rng.randint(2, 30)
        spend = rng.randint(0, days * per - 1)
        q = (f"{name} collects {per} {item} every day for {days} days, "
             f"then loses {spend}. How many {item} are left?")
        s1 = days * per
        ans = s1 - spend
        sol = (f"Over {days} days {name} collects {days} * {per} = {s1} "
               f"{item}. Losing {spend} leaves {s1} - {spend} = {ans}. "
               f"The answer is {ans}.")
    return {"question": q, "answer": f"{sol}\n#### {ans}"}


def _mc_item(rng: random.Random, n_choices: int) -> Dict:
    """One multiple-choice arithmetic/comparison item."""
    kind = rng.randrange(3)
    if kind == 0:
        a, b = rng.randint(11, 99), rng.randint(11, 99)
        q = f"What is {a} + {b}?"
        correct = a + b
        opts = {correct}
        while len(opts) < n_choices:
            opts.add(correct + rng.choice([-30, -20, -10, -2, -1, 1, 2,
                                           10, 20, 30]))
    elif kind == 1:
        a, b = rng.randint(3, 20), rng.randint(3, 20)
        q = f"What is {a} times {b}?"
        correct = a * b
        opts = {correct}
        while len(opts) < n_choices:
            opts.add(max(1, correct + rng.choice(
                [-a, -b, a, b, -1, 1, -10, 10])))
    else:
        vals = rng.sample(range(10, 500), n_choices)
        correct = max(vals)
        q = "Which of the following numbers is the largest?"
        opts = set(vals)
    choices = sorted(opts)
    rng.shuffle(choices)
    answer = chr(65 + choices.index(correct))
    return {"question": q, "choices": [str(c) for c in choices],
            "answer": answer}


def _csqa_raw_item(rng: random.Random, idx: int) -> Dict:
    """Synthetic item in the reference's raw CommonsenseQA record shape
    (data/longgenbench_examples/CommonsenseQA.jsonl: id / question /
    question_concept / choices{label,text} / answerKey)."""
    base = _mc_item(rng, 5)
    labels = ["A", "B", "C", "D", "E"]
    return {
        "id": f"synth{idx:08x}",
        "question": base["question"],
        "question_concept": "arithmetic",
        "choices": {"label": labels, "text": base["choices"]},
        "answerKey": base["answer"],
    }


def _humaneval_item(rng: random.Random, idx: int) -> Dict:
    """Synthetic item in the raw HumanEval record shape (task_id /
    prompt / canonical_solution / test / entry_point)."""
    a, b = rng.randint(2, 30), rng.randint(2, 30)
    kind = rng.randrange(3)
    if kind == 0:
        name, op, expr = f"add_{a}", f"adds {a}", f"x + {a}"
    elif kind == 1:
        name, op, expr = f"scale_{a}", f"multiplies by {a}", f"x * {a}"
    else:
        name, op, expr = (f"affine_{a}_{b}", f"computes {a}*x + {b}",
                          f"{a} * x + {b}")
    x0, x1 = rng.randint(0, 50), rng.randint(51, 200)
    ref = {0: lambda x: x + a, 1: lambda x: x * a,
           2: lambda x: a * x + b}[kind]
    prompt = (f"def {name}(x: int) -> int:\n"
              f"    \"\"\" Returns the value that {op} the input.\n"
              f"    >>> {name}({x0})\n    {ref(x0)}\n    \"\"\"\n")
    return {
        "task_id": f"SynthEval/{idx}",
        "prompt": prompt,
        "canonical_solution": f"    return {expr}\n",
        "test": (f"def check(candidate):\n"
                 f"    assert candidate({x0}) == {ref(x0)}\n"
                 f"    assert candidate({x1}) == {ref(x1)}\n"),
        "entry_point": name,
    }


def make_pool(kind: str, n: int, seed: int = 0,
              n_choices: int = 4) -> List[Dict]:
    rng = random.Random(seed)
    if kind == "gsm8k":
        return [_gsm8k_item(rng) for _ in range(n)]
    if kind == "csqa_raw":
        return [_csqa_raw_item(rng, i) for i in range(n)]
    if kind == "humaneval_raw":
        return [_humaneval_item(rng, i) for i in range(n)]
    return [_mc_item(rng, n_choices) for _ in range(n)]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["gsm8k", "choices", "csqa_raw", "humaneval_raw"], default="gsm8k")
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--n_choices", type=int, default=4,
                   help="options per MC item (mmlu-style 4, csqa-style 5)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    pool = make_pool(args.kind, args.n, args.seed, args.n_choices)
    with open(args.out, "w") as f:
        for it in pool:
            f.write(json.dumps(it) + "\n")
    print(f"wrote {len(pool)} {args.kind} items to {args.out}")


if __name__ == "__main__":
    main()
