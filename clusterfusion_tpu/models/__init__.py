"""Model layer — TPU twin of the reference's `chat/llama/` stack."""

from clusterfusion_tpu.models.llama import (
    LlamaParams,
    init_params,
    fuse_attention_weights,
    prefill,
    decode_step,
    init_cache,
)
