"""ClusterFusion-TPU: a TPU-native fused decoder-layer inference framework.

A from-scratch JAX/Pallas re-design of the capabilities of ClusterFusion
(arXiv:2508.18850; reference CUDA implementation surveyed in /root/repo/SURVEY.md):
whole-decoder-layer megakernels for LLM autoregressive decode, built TPU-first.

The public op surface mirrors the reference python package
(`clusterfusion/__init__.py:6-16` + `include/pybind.cpp:108-123` in the
reference tree):

- ``llama_decoder_layer``          — fused attention block, GPT-J interleaved RoPE
- ``llama_decoder_layer_sglang``   — fused attention block, NEOX RoPE +
                                     fused residual-add, runtime eps
- ``llama_decoder_layer_batch_decode_sglang`` — batched decode with paged KV
- ``deepseek_decoder_layer``       — DeepSeek-V2 MLA fused attention block
- ``rmsnorm``                      — standalone batched RMSNorm

On GPU the reference achieves fusion with thread-block clusters + distributed
shared memory; on TPU a single core's VMEM is uniformly visible to a kernel,
so the intra-cluster collectives collapse into scratch accumulation across a
sequential Pallas grid, and the collective problem moves up to the ICI mesh
(see ``clusterfusion_tpu.parallel``).
"""

from clusterfusion_tpu.config import (
    KernelConfig,
    LlamaConfig,
    DeepSeekConfig,
    MeshConfig,
)
from clusterfusion_tpu.ops import (
    rmsnorm,
    fused_add_rmsnorm,
    llama_decoder_layer,
    llama_decoder_layer_sglang,
    llama_decoder_layer_batch_decode_sglang,
    llama_decoder_layer_paged,
    deepseek_decoder_layer,
    fused_ffn,
    gemv,
    QuantizedTensor,
    quantize_llama_params,
)

from clusterfusion_tpu.runtime import PagedKVScheduler, ServingEngine

__version__ = "0.1.0"

__all__ = [
    "KernelConfig",
    "LlamaConfig",
    "DeepSeekConfig",
    "MeshConfig",
    "rmsnorm",
    "fused_add_rmsnorm",
    "llama_decoder_layer",
    "llama_decoder_layer_sglang",
    "llama_decoder_layer_batch_decode_sglang",
    "llama_decoder_layer_paged",
    "deepseek_decoder_layer",
    "fused_ffn",
    "gemv",
    "QuantizedTensor",
    "quantize_llama_params",
    "PagedKVScheduler",
    "ServingEngine",
]
