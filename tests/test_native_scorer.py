"""C++ scorer equivalence vs the Python regex reference, incl. fuzzing."""

import random
import re

import pytest

from scope_tpu import native
from scope_tpu.bench import evaluate as E

lib = native.load_scorer()
pytestmark = pytest.mark.skipif(lib is None,
                                reason="no C++ toolchain available")


CASES = [
    "Answer_1: Some steps. The answer is 42\nAnswer_2: more. answer is 7\n",
    "Answer_1: no marker here Answer_2: the answer is 5",
    "Answer_3: answer is x5 then later answer is 99 done",
    "Answer_1: The answer is (B)\nAnswer_2: reasoning. answer is (C)!",
    "Answer_1: blah\nanswer is (A)\nAnswer_2: ok answer is (D)",
    "Answer_1: reasoning stuff\n\nThe answer is (B)",
    "Answer_1: line1\nline2\nThe answer is (B)",
    "Answer_1: x The answer is (ab) then The answer is (C)",
    "Answer_12:The answer is(E)",
    "Answer_: not a tag answer is 3",
    "Answer_1: answer is  77",     # two spaces -> no gsm8k match there
    "",
    "no answers at all",
    "Answer_1: \t \n  answer is (Z)",
]


def _fuzz_strings(n=300, seed=0):
    rng = random.Random(seed)
    pieces = ["Answer_", "Answer_1:", "Answer_23:", "answer is ",
              "answer is (", "The answer is", "(A)", "(BC)", "(", ")",
              "42", "7", " ", "  ", "\n", "\n\n", "\t", "step by step",
              "so the answer is 19.", "x", ":", "_", "is", "answer"]
    out = []
    for _ in range(n):
        k = rng.randint(1, 25)
        out.append("".join(rng.choice(pieces) for _ in range(k)))
    return out


ALL = CASES + _fuzz_strings()


@pytest.mark.parametrize("idx", range(len(ALL)))
def test_gsm8k_equivalence(idx):
    s = ALL[idx]
    assert native.extract_gsm8k(s) == E.extract_predicted_answers(s), s


@pytest.mark.parametrize("idx", range(len(ALL)))
def test_mmlu_equivalence(idx):
    s = ALL[idx]
    assert native.extract_mmlu(s) == E.extract_predicted_choices(s), s


@pytest.mark.parametrize("idx", range(len(ALL)))
def test_csqa_equivalence(idx):
    s = ALL[idx]
    assert native.extract_csqa(s) == E.extract_predicted_choices_csqa(s), s


def test_long_generation():
    body = "\n".join(
        f"Answer_{i}: work work work. The answer is {i * 3}" for i in
        range(1, 61))
    got = native.extract_gsm8k(body)
    assert got == [str(i * 3) for i in range(1, 61)]
