"""LongGenBench accuracy evaluator.

Behavior-compatible with eval_longgenbench.py so result files produced by
either harness are cross-comparable: identical extraction regexes
(:16-23, :56-62), zip-truncating comparison (:39, :81), identical score
rounding (:105), per-dataset metrics.json and the method x dataset CSV
matrix (:166-186).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re
from typing import List, Optional

import numpy as np

METHOD_ROWS = ["SnapKV", "StreamingLLM", "H2O", "PyramidKV", "Quest",
               "Headwise", "ALLKV"]
DATASETS = ["gsm8k", "mmlu", "csqa"]


def extract_final_answer(answer: str) -> Optional[str]:
    m = re.search(r"####\s*(\d+)", answer)
    return m.group(1) if m else None


def extract_predicted_answers(pred: str) -> List[str]:
    return re.findall(r"Answer_\d+:\s*.*?answer is (\d+)", pred, re.DOTALL)


def extract_predicted_choices(pred: str) -> List[str]:
    return re.findall(r"Answer_\d+:\s*.*?answer is \((.*?)\)", pred)


def extract_predicted_choices_csqa(pred: str) -> List[str]:
    return re.findall(r"Answer_\d+:\s*.*?\s*The answer is\s*\(([A-Z])\)",
                      pred)


def _native_extract(kind: str, pred: str) -> Optional[List[str]]:
    """C++ fast path (scope_tpu/native/scorer.cpp); None -> use Python.

    The native extractors are fuzz-tested regex-identical
    (tests/test_native_scorer.py)."""
    try:
        from scope_tpu import native
    except Exception:
        return None
    fn = {"gsm8k": native.extract_gsm8k, "mmlu": native.extract_mmlu,
          "csqa": native.extract_csqa}[kind]
    try:
        return fn(pred)
    except Exception:
        return None


def compare_answers(pred: str, answers: List[str]) -> float:
    expected = [extract_final_answer(a) for a in answers]
    predicted = _native_extract("gsm8k", pred)
    if predicted is None:
        predicted = extract_predicted_answers(pred)
    correct = sum(e == p for e, p in zip(expected, predicted))
    return correct / len(expected) if expected else 0.0


def compare_choices(pred: str, answers: List[str], dataset: str) -> float:
    predicted = _native_extract(dataset if dataset == "csqa" else "mmlu",
                                pred)
    if predicted is None:
        if dataset == "csqa":
            predicted = extract_predicted_choices_csqa(pred)
        else:
            predicted = extract_predicted_choices(pred)
    correct = sum(e == p for e, p in zip(answers, predicted))
    return correct / len(answers) if answers else 0.0


def scorer(dataset: str, predictions: List[str],
           answers: List[List[str]]) -> float:
    scores = []
    for pred, gold in zip(predictions, answers):
        if dataset == "gsm8k":
            scores.append(compare_answers(pred, gold))
        elif dataset in ("mmlu", "csqa"):
            scores.append(compare_choices(pred, gold, dataset))
        else:
            raise ValueError(f"unknown dataset {dataset!r}")
    return round(100 * float(np.mean(scores)), 4) if scores else 0.0


def score_file(eval_file: str, dataset: str) -> float:
    predictions, answers = [], []
    with open(eval_file, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            data = json.loads(line)
            predictions.append(data["pred"])
            answers.append(data["answers"])
    return scorer(dataset, predictions, answers)


def evaluate_results_dir(results_dir: str, decoding_metric: str,
                         datasets: List[str] = None,
                         methods: List[str] = None) -> List[List]:
    """Produce metrics.json per dataset dir + the CSV rows
    (eval_longgenbench.py:107-186).  Missing files score -1."""
    datasets = datasets or DATASETS
    methods = methods or METHOD_ROWS
    rows: List[List] = [["dataset"]] + [[m] for m in methods]
    for dataset in datasets:
        rows[0].append(dataset)
        for idx, method in enumerate(methods):
            eval_file = os.path.join(
                results_dir, dataset,
                f"pre_{method}_dec_{decoding_metric}.json")
            try:
                score = score_file(eval_file, dataset)
                with open(os.path.join(os.path.dirname(eval_file),
                                       "metrics.json"), "w") as f:
                    json.dump({dataset: score}, f, ensure_ascii=False,
                              indent=4)
                rows[idx + 1].append(score)
            except (OSError, json.JSONDecodeError, KeyError):
                rows[idx + 1].append(-1)
    out_csv = os.path.join(results_dir,
                           f"dec_{decoding_metric}_results.csv")
    with open(out_csv, "w", newline="") as fp:
        csv.writer(fp).writerows(rows)
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--results_dir", type=str, required=True)
    parser.add_argument("--decoding_metric", type=str, default="None")
    parser.add_argument("--datasets", type=str, nargs="*", default=None)
    parser.add_argument("--methods", type=str, nargs="*", default=None)
    args = parser.parse_args(argv)
    rows = evaluate_results_dir(args.results_dir, args.decoding_metric,
                                args.datasets, args.methods)
    for row in rows:
        print(",".join(str(x) for x in row))


if __name__ == "__main__":
    main()
