#!/usr/bin/env bash
# Instance-segmentation evaluation (the reference's never-committed
# eval_uLLSAM_seg.py): per-GT-instance point prompting with the LLM-guided
# dense prompt, AP 0.5:0.95 + pixel metrics.
set -euo pipefail
python -m ullsam_tpu.eval.cli --mode seg \
  --data_path "${DATA_PATH:?}" --tokenizer_path "${TOKENIZER_PATH:?}" \
  --checkpoint "${CHECKPOINT:-}" --output "${OUTPUT:-eval_seg.json}" "$@"
