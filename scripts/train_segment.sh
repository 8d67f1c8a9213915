#!/usr/bin/env bash
# Segment-mode training with the reference's hyperparameters of record
# (scripts/train_all_joint_v2.sh: 24 epochs, lr 1e-3, max_len 1280,
# point-bs 4, grad accumulation 8). Data parallel over all local devices.
set -euo pipefail
python -m ullsam_tpu.train.cli \
  --mode segment \
  --data_path "${DATA_PATH:?set DATA_PATH to the seg jsonl}" \
  --tokenizer_path "${TOKENIZER_PATH:?set TOKENIZER_PATH}" \
  --sam_checkpoint "${SAM_CKPT:-}" \
  --llm_checkpoint_dir "${LLM_DIR:-}" \
  --output_dir "${OUTPUT_DIR:-runs/segment}" \
  --epochs 24 --learning_rate 1e-3 --max_length 1280 \
  --sam_max_point_bs 4 --batch_size 1 --grad_accum 8 \
  --tensorboard "$@"
