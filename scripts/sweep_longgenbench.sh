#!/usr/bin/env bash
# Full method x decoding-metric sweep, mirroring the reference driver
# (run_longgenbench_in_cir.sh:24-45), against this repo's runner.
#
# Usage: scripts/sweep_longgenbench.sh <model_path> <save_dir> [data_file]
set -euo pipefail

MODEL=${1:?model path or spec name}
SAVE=${2:?save dir}
DATA=${3:-}

methods=(allkv pyramidkv snapkv h2o streamingllm quest headwise)
metrics=(None fixed linear jump)

extra=()
if [[ ! -d "$MODEL" ]]; then
  extra+=(--random_weights --model_spec "$MODEL" --tokenizer byte)
else
  extra+=(--model_path "$MODEL")
fi
if [[ -n "$DATA" ]]; then
  extra+=(--data_file "$DATA")
fi

for method in "${methods[@]}"; do
  for metric in "${metrics[@]}"; do
    echo ">>> method=$method decoding_metric=$metric"
    python -m scope_tpu.bench.runner \
      --save_dir "$SAVE" \
      --method "$method" \
      --decoding_metric "$metric" \
      --max_capacity_prompts 2048 \
      --decoding_window_size 512 \
      --decoding_recent_size 256 \
      --K 30 --max_num_examples 20 \
      "${extra[@]}"
  done
done

python -m scope_tpu.bench.evaluate --results_dir "$SAVE" \
  --decoding_metric fixed || true
