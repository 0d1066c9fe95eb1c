"""Runner + evaluator tests (reference L4/L5 behavior compatibility)."""

import json
import os

import numpy as np
import pytest

from scope_tpu.bench import data as D
from scope_tpu.bench import evaluate as E


# ------------------------- evaluator ---------------------------------------

GSM_PRED = ("Answer_1: Some steps here. The answer is 42\n"
            "Answer_2: More work. The answer is 7\n"
            "Answer_3: Wrong. The answer is 9\n")
GSM_GOLD = ["blah #### 42", "blah #### 7", "blah #### 10"]


def test_gsm8k_scoring():
    assert E.compare_answers(GSM_PRED, GSM_GOLD) == pytest.approx(2 / 3)


def test_gsm8k_zip_truncation():
    """Missing predictions only count against the expected total."""
    pred = "Answer_1: The answer is 42\n"
    assert E.compare_answers(pred, GSM_GOLD) == pytest.approx(1 / 3)


def test_mmlu_choice_scoring():
    pred = ("Answer_1: reasoning. The answer is (A)\n"
            "Answer_2: reasoning. The answer is (C)\n")
    assert E.compare_choices(pred, ["A", "B"], "mmlu") == pytest.approx(0.5)


def test_csqa_choice_scoring():
    pred = ("Answer_1: something. The answer is (D)\n"
            "Answer_2: other. The answer is (E)\n")
    assert E.compare_choices(pred, ["D", "E"], "csqa") == pytest.approx(1.0)


def test_scorer_rounding():
    s = E.scorer("gsm8k", [GSM_PRED], [GSM_GOLD])
    assert s == round(100 * 2 / 3, 4)


def test_evaluate_results_dir(tmp_path):
    d = tmp_path / "gsm8k"
    d.mkdir()
    rec = {"pred": GSM_PRED, "answers": GSM_GOLD}
    with open(d / "pre_H2O_dec_fixed.json", "w") as f:
        f.write(json.dumps(rec) + "\n")
    rows = E.evaluate_results_dir(str(tmp_path), "fixed",
                                  datasets=["gsm8k"])
    header, scores = rows[0], {r[0]: r[1] for r in rows[1:]}
    assert header == ["dataset", "gsm8k"]
    assert scores["H2O"] == round(100 * 2 / 3, 4)
    assert scores["SnapKV"] == -1            # missing file -> -1 (:170-174)
    assert (tmp_path / "dec_fixed_results.csv").exists()
    assert json.load(open(d / "metrics.json"))["gsm8k"] == scores["H2O"]


# ------------------------- data --------------------------------------------

def test_middle_truncation():
    ids = list(range(100))
    out = D.middle_truncate_ids(ids, 10)
    assert out == list(range(5)) + list(range(95, 100))
    assert D.middle_truncate_ids(ids, 200) == ids


def test_runner_truncates_middle_at_engine_limit(tmp_path, monkeypatch):
    """A prompt longer than the ENGINE ceiling must be middle-truncated
    (reference semantics, run_longgenbench.py:167-173) — not head-clipped
    (the r4 bug, VERDICT r4 Missing #2: `ids[:max_prompt_len]` silently
    dropped the END of the prompt, where LongGenBench packs the
    questions).  Captures exactly which token ids reach the generator."""
    from scope_tpu.bench.runner import main as runner_main
    from scope_tpu.engine import generate as G

    # ~600 byte-tokens; engine ceiling 256 (< the model limit).
    body = "".join(chr(ord("a") + (i % 26)) for i in range(600))
    f = tmp_path / "gsm8k_30_8shot.jsonl"
    f.write_text(json.dumps({"prompt": body, "questions": ["q"],
                             "answers": ["#### 1"]}) + "\n")

    seen = {}

    def fake_generate(self, toks, lengths, out_len):
        seen["ids"] = toks[0, :int(lengths[0])].tolist()

        class R:
            gen_lengths = np.array([1])
            tokens = np.zeros((1, 8), np.int32)
            ttft_s = 0.0
            tpot_s = [0.0]
        return R()

    monkeypatch.setattr(G.StreamingGenerator, "generate", fake_generate)
    runner_main([
        "--data_file", str(f), "--datasets", "gsm8k",
        "--save_dir", str(tmp_path / "results"),
        "--random_weights", "--model_spec", "tiny-llama",
        "--tokenizer", "byte",
        "--method", "h2o", "--decoding_metric", "fixed",
        "--max_capacity_prompts", "64",
        "--decoding_window_size", "32", "--decoding_recent_size", "16",
        "--max_new_tokens", "8", "--max_prompt_len", "256",
        "--dtype", "float32", "--K", "30",
    ])
    from scope_tpu.bench.runner import ByteTokenizer
    out = (tmp_path / "results" / "tiny-llama_64_tpu" / "gsm8k"
           / "pre_H2O_dec_fixed.json")
    rec = json.loads(out.read_text().splitlines()[0])
    full = ByteTokenizer().encode(rec["prompt"])   # templated prompt
    assert len(full) > 256
    assert len(seen["ids"]) == 256
    # First and last halves of the full id sequence — the packed
    # questions at the END of the prompt survive.
    assert seen["ids"] == full[:128] + full[-128:]


def test_k_rescale():
    assert D.rescale_k_for_dataset("csqa", 30) == 40
    assert D.rescale_k_for_dataset("csqa", 60) == 80
    assert D.rescale_k_for_dataset("gsm8k", 30) == 30


def test_output_max_len():
    assert D.output_max_len("gsm8k", 30) == 4096
    assert D.output_max_len("gsm8k", 60) == 7950


def test_model_max_len():
    assert D.model_max_len("meta-llama/Llama-2-7b-hf") == 3950
    assert D.model_max_len("Meta-Llama-3.1-8B-Instruct") == 130000
    assert D.model_max_len("mistral-7b") == 31500


def test_load_examples(tmp_path):
    f = tmp_path / "x.jsonl"
    ex = {"prompt": "Q1: a?\nQ2: b?", "questions": ["a?", "b?"],
          "answers": ["#### 1", "#### 2"]}
    f.write_text(json.dumps(ex) + "\n")
    out = D.load_examples(str(f), "gsm8k", "llama-3.1-8b")
    assert len(out) == 1
    assert out[0].prompt.startswith("<<SYS>>")          # llama3 modify style
    assert "Q1: a?" in out[0].prompt
    out2 = D.load_examples(str(f), "gsm8k", "llama2-7b")
    assert out2[0].prompt.startswith("[INST]")


# ------------------------- runner end-to-end --------------------------------

def test_runner_end_to_end(tmp_path):
    """Full pipeline smoke: tiny random model + byte tokenizer + 1 example
    -> record file consumable by the evaluator."""
    from scope_tpu.bench.runner import main as runner_main

    f = tmp_path / "gsm8k_30_8shot.jsonl"
    ex = {"prompt": "Question_1: 1+1?", "questions": ["1+1?"],
          "answers": ["#### 2"]}
    f.write_text(json.dumps(ex) + "\n")

    save = tmp_path / "results"
    runner_main([
        "--data_file", str(f),
        "--datasets", "gsm8k",
        "--save_dir", str(save),
        "--random_weights", "--model_spec", "tiny-llama",
        "--tokenizer", "byte",
        "--method", "h2o", "--decoding_metric", "fixed",
        "--max_capacity_prompts", "64",
        "--decoding_window_size", "32", "--decoding_recent_size", "16",
        "--max_new_tokens", "8", "--max_prompt_len", "256",
        "--dtype", "float32", "--K", "30",
    ])
    out = save / "tiny-llama_64_tpu" / "gsm8k" / "pre_H2O_dec_fixed.json"
    assert out.exists()
    rec = json.loads(out.read_text().splitlines()[0])
    for key in ("prompt", "questions", "answers", "pre_length",
                "gen_length", "TTFT", "TPOT", "pred"):
        assert key in rec
    assert rec["gen_length"] >= 1
    assert len(rec["TPOT"]) == rec["gen_length"]


def test_runner_kv_dtype_int8(tmp_path):
    """--kv_dtype int8 threads through to the engine and still produces a
    well-formed record."""
    from scope_tpu.bench.runner import main as runner_main

    f = tmp_path / "gsm8k_30_8shot.jsonl"
    ex = {"prompt": "Question_1: 1+1?", "questions": ["1+1?"],
          "answers": ["#### 2"]}
    f.write_text(json.dumps(ex) + "\n")
    save = tmp_path / "results"
    runner_main([
        "--data_file", str(f),
        "--datasets", "gsm8k",
        "--save_dir", str(save),
        "--random_weights", "--model_spec", "tiny-llama",
        "--tokenizer", "byte",
        "--method", "h2o", "--decoding_metric", "jump",
        "--max_capacity_prompts", "64",
        "--decoding_window_size", "32", "--decoding_recent_size", "16",
        "--max_new_tokens", "8", "--max_prompt_len", "256",
        "--dtype", "float32", "--kv_dtype", "int8",
        "--evict_per_kv_head", "--K", "30",
    ])
    out = save / "tiny-llama_64_tpu" / "gsm8k" / "pre_H2O_dec_jump.json"
    assert out.exists()
    rec = json.loads(out.read_text().splitlines()[0])
    assert rec["gen_length"] >= 1


# ------------------------- bench.py drivers ---------------------------------

def test_run_serving_engine_smoke():
    """bench.run_serving_engine (the 8B serving leg) must run end-to-end
    at tiny scale on CPU: admissions, fire-warm simulation, timed window,
    positive rate."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench
    import jax
    import jax.numpy as jnp
    from scope_tpu.models import llama
    from scope_tpu.models.registry import TINY_LLAMA

    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    tps = bench.run_serving_engine(
        TINY_LLAMA, params, 2, prompt_len=64, max_new=400, lazy=16,
        chunks=(4, 2), timed_steps=8, P=32, W=16, r=8,
        dtype="float32", kv_dtype="float32")
    assert tps > 0


def test_roofline_fields():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench
    import jax
    import jax.numpy as jnp
    from scope_tpu.models import llama
    from scope_tpu.models.registry import TINY_LLAMA

    params = llama.init_params(TINY_LLAMA, jax.random.key(0), jnp.float32)
    rl = bench.roofline(TINY_LLAMA, params, 4, 2e5, 64, kv_bytes=1)
    assert rl["hbm_gbps"] > 0 and 0 < rl["roofline_pct"] < 100
    assert bench.roofline(TINY_LLAMA, params, 4, None, 64) is None


def test_headwise_runner_to_evaluator(tmp_path):
    """Headwise must run the WHOLE L4->L5 harness loop (the reference
    left it WIP and out of its sweep; VERDICT r3 #3): runner CLI ->
    per-example records -> evaluator -> a real (non -1) Headwise row."""
    from scope_tpu.bench import runner as R

    R.main([
        "--platform", "cpu",
        "--data_file", "data/longgenbench_examples/gsm8k_4_2shot.jsonl",
        "--datasets", "gsm8k", "--K", "4", "--shot_number", "2",
        "--random_weights", "--model_spec", "tiny-llama",
        "--tokenizer", "byte", "--method", "headwise",
        "--decoding_metric", "jump", "--max_capacity_prompts", "64",
        "--decoding_window_size", "32", "--decoding_recent_size", "16",
        "--max_new_tokens", "16", "--max_prompt_len", "512",
        "--max_num_examples", "1", "--dtype", "float32",
        "--save_dir", str(tmp_path),
    ])
    res_dir = os.path.join(str(tmp_path), "tiny-llama_64_tpu")
    rows = E.evaluate_results_dir(res_dir, "jump", datasets=["gsm8k"])
    scores = {r[0]: r[1] for r in rows[1:]}
    assert scores["Headwise"] != -1
