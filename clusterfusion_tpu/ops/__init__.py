"""Pallas op layer — the TPU-native equivalent of the reference's
kernel + dispatch + binding stack (`include/`, SURVEY.md §2.2)."""

from clusterfusion_tpu.ops.rmsnorm import rmsnorm, fused_add_rmsnorm
from clusterfusion_tpu.ops.decoder_layer import (
    llama_decoder_layer,
    llama_decoder_layer_sglang,
)
from clusterfusion_tpu.ops.paged_decoder_layer import (
    llama_decoder_layer_batch_decode_sglang,
    llama_decoder_layer_paged,
)
from clusterfusion_tpu.ops.ffn import fused_ffn
from clusterfusion_tpu.ops.stack_kernel import fused_decoder_stack
from clusterfusion_tpu.ops.gemv import gemv
from clusterfusion_tpu.ops.deepseek_layer import (
    deepseek_decoder_layer, deepseek_decoder_layer_fused)
from clusterfusion_tpu.ops.quant import (
    QuantizedTensor,
    maybe_dequantize,
    quantize,
    quantize_int4,
    quantize_int8,
    quantize_llama_params,
)

__all__ = [
    "rmsnorm",
    "fused_add_rmsnorm",
    "llama_decoder_layer",
    "llama_decoder_layer_sglang",
    "llama_decoder_layer_batch_decode_sglang",
    "llama_decoder_layer_paged",
    "deepseek_decoder_layer",
    "deepseek_decoder_layer_fused",
    "fused_ffn",
    "fused_decoder_stack",
    "gemv",
    "QuantizedTensor",
    "maybe_dequantize",
    "quantize",
    "quantize_int4",
    "quantize_int8",
    "quantize_llama_params",
]
