#!/usr/bin/env bash
# Fused-megakernel chat launch — twin of the reference's
# scripts/llama2_clusterfusion.sh (USE_CLUSTER_FUSION=true).
set -euo pipefail

export MODEL_PATH=${MODEL_PATH:-/models/llama-2-7b-chat}
export TOKENIZER_PATH=${TOKENIZER_PATH:-/models/llama-2-7b/tokenizer.model}

USE_CLUSTER_FUSION=true python "$(dirname "$0")/../chat.py" \
  --ckpt_dir "$MODEL_PATH" \
  --tokenizer_path "$TOKENIZER_PATH" \
  --max_seq_len 1024 \
  --max_gen_len 1024
