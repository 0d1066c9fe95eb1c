#!/bin/bash
# Full LongGenBench method x decoding-metric sweep at CPU smoke scale —
# the L4 -> L5 loop end to end (runner -> per-example records ->
# evaluator -> metrics.json -> CSV), mirroring the reference's
# run_longgenbench_in_cir.sh:24-45 sweep on the committed synthetic
# gsm8k_4_2shot dataset with the tiny model (random weights: the
# artifact proves the pipeline, not model quality; ALLKV is the control).
set -e
cd "$(dirname "$0")/.."
SAVE=${1:-results/tiny_cpu_sweep}
for method in allkv h2o snapkv pyramidkv streamingllm quest headwise; do
  for metric in None fixed linear jump; do
    echo "=== $method / $metric ==="
    python -m scope_tpu.bench.runner \
      --platform cpu \
      --data_file data/longgenbench_examples/gsm8k_4_2shot.jsonl \
      --datasets gsm8k --K 4 --shot_number 2 \
      --random_weights --model_spec tiny-llama --tokenizer byte \
      --method "$method" --decoding_metric "$metric" \
      --max_capacity_prompts 256 --decoding_window_size 64 \
      --decoding_recent_size 32 --max_new_tokens 128 \
      --max_prompt_len 2048 --dtype float32 \
      --save_dir "$SAVE"
  done
done
for metric in None fixed linear jump; do
  python -m scope_tpu.bench.evaluate \
    --results_dir "$SAVE/tiny-llama_256_tpu" \
    --datasets gsm8k --decoding_metric "$metric"
done
echo "SWEEP COMPLETE"
