#!/usr/bin/env bash
# The quantized production operating point (beyond the reference): INT4
# W4A8 weights + INT8 KV cache through the whole-stack megakernel.
set -euo pipefail

export MODEL_PATH=${MODEL_PATH:-/models/llama-2-7b-chat}
export TOKENIZER_PATH=${TOKENIZER_PATH:-/models/llama-2-7b/tokenizer.model}

python "$(dirname "$0")/../chat.py" \
  --ckpt_dir "$MODEL_PATH" \
  --tokenizer_path "$TOKENIZER_PATH" \
  --quant int4 --kv_int8 \
  --max_seq_len 1024 \
  --max_gen_len 1024
