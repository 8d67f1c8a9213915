#!/usr/bin/env bash
# Serving app on the reference's port with continuous batching.
set -euo pipefail
python -m ullsam_tpu.serve.app \
  --checkpoint "${CHECKPOINT:?set CHECKPOINT to a uLLSAM .pt or npz}" \
  --tokenizer_path "${TOKENIZER_PATH:?}" \
  --engine --port "${PORT:-9996}" "$@"
