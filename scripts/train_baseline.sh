#!/usr/bin/env bash
# Ablation: vanilla SAM dense prompt (no LLM hidden states) —
# train_joint_v2_baseline.py equivalent.
set -euo pipefail
python -m ullsam_tpu.train.cli \
  --mode segment_baseline \
  --data_path "${DATA_PATH:?}" --tokenizer_path "${TOKENIZER_PATH:?}" \
  --output_dir "${OUTPUT_DIR:-runs/segment_baseline}" \
  --epochs 24 --learning_rate 1e-3 --max_length 1280 \
  --sam_max_point_bs 4 --batch_size 1 --grad_accum 8 "$@"
