"""LongGenBench data loading and prompt construction.

Behavior-compatible with the reference runner's data path
(run_longgenbench.py:80-143): JSONL examples with
``{prompt, questions[], answers[]}``, per-dataset instruction templates,
model-keyed chat formats and max lengths, and middle-truncation of
over-long prompts (:167-173).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional

# run_longgenbench.py:15-25
DATASET2MAXLEN_8K = {"gsm8k": 7950, "mmlu": 7950, "csqa": 7950}
DATASET2MAXLEN_4K = {"gsm8k": 4096, "mmlu": 4096, "csqa": 4096}

# run_longgenbench.py:27-31
DATASET2PROMPT = {
    "gsm8k": ("Answer each question step by step, adhering to the format "
              "shown in the examples provided. Start each response with "
              "'Answer_' and introduce the final response with 'The answer "
              "is'. Do not repeat the question. Ensure that you respond to "
              "all the questions presented, regardless of their number."),
    "mmlu": ("Answer each question step by step, adhering to the format "
             "shown in the examples provided. Start each response with "
             "'Answer_' and introduce the final response with 'The answer "
             "is'. Do not repeat the question. Ensure that you respond to "
             "all the questions presented, regardless of their number. The "
             "following are multiple choice questions (with answers) about "),
    "csqa": ("Answer each question step by step, adhering to the format "
             "shown in the examples provided. Start each response with "
             "'Answer_' and introduce the final response with 'The answer "
             "is'. Do not repeat the question. Ensure that you respond to "
             "all the questions presented, regardless of their number."),
}

# run_longgenbench.py:33-43
MODEL2MAXLEN = {
    "llama2": 3950,
    "llama-2": 3950,
    "llama3-": 7950,
    "llama-3-": 7950,
    "llama3.1": 130000,
    "llama-3.1": 130000,
    "llama3.2": 130000,
    "llama-3.2": 130000,
    "mistral": 31500,
}


def model_max_len(model_name: str, default: int = 7950) -> int:
    low = model_name.lower()
    out = default
    for key, val in MODEL2MAXLEN.items():
        if key in low:
            out = val
    return out


def output_max_len(dataset: str, K: int) -> int:
    """4096 for K=30 runs, 7950 otherwise (run_longgenbench.py:93-96)."""
    if K == 30:
        return DATASET2MAXLEN_4K[dataset]
    return DATASET2MAXLEN_8K[dataset]


def build_chat_llama2(system_prompt: str, prompt: str) -> str:
    return (f"[INST] <<SYS>>\n {system_prompt} \n<</SYS>>\n\n{prompt} "
            f"[/INST]")


def build_chat_llama3_modify(system_prompt: str, prompt: str) -> str:
    """The variant the reference actually uses (run_longgenbench.py:122)."""
    return f"<<SYS>>\n {system_prompt} \n<</SYS>>\n\n{prompt}"


def build_chat_llama3(system_prompt: str, prompt: str) -> str:
    return (f"<|begin_of_text|><|start_header_id|>system<|end_header_id|>"
            f"\n\n{system_prompt}<|eot_id|><|start_header_id|>user"
            f"<|end_header_id|>\n\n{prompt}<|eot_id|><|start_header_id|>"
            f"assistant<|end_header_id|>")


@dataclass
class Example:
    prompt: str
    questions: List[str]
    answers: List[str]


def load_examples(path: str, dataset: str, model_name: str,
                  max_num_examples: Optional[int] = None) -> List[Example]:
    """Load JSONL and build the final prompt string per example
    (run_longgenbench.py:98-136)."""
    out: List[Example] = []
    low = model_name.lower()
    with open(path) as fp:
        for line in fp:
            if not line.strip():
                continue
            ex = json.loads(line)
            template = DATASET2PROMPT[dataset]
            system_prompt = template
            if "task" in ex:          # mmlu task suffix (:108-110)
                system_prompt = template + ex["task"] + "."
            if "llama2" in low:
                prompt = build_chat_llama2(system_prompt, ex["prompt"])
            elif "llama-3" in low or "llama3" in low:
                prompt = build_chat_llama3_modify(system_prompt, ex["prompt"])
            else:
                prompt = system_prompt + "\n\n" + ex["prompt"]
            out.append(Example(prompt=prompt, questions=ex["questions"],
                               answers=ex["answers"]))
    if max_num_examples is not None:
        out = out[:max_num_examples]
    return out


def middle_truncate_ids(ids: List[int], limit: int) -> List[int]:
    """Keep the first and last halves when over the model limit
    (run_longgenbench.py:167-173)."""
    if len(ids) <= limit:
        return ids
    half = limit // 2
    return ids[:half] + ids[-half:]


def rescale_k_for_dataset(dataset: str, K: int) -> int:
    """CSQA packs 40/80 questions where GSM8K/MMLU pack 30/60
    (run_longgenbench.py:382-383)."""
    if dataset == "csqa":
        return int(K / 3 * 4)
    return K
