"""DeepSeek-V2 MLA fused decoder-layer op.

TPU twin of `DeepSeekDecoderLayerKernel`
(`include/H100/deepseek/kernel.cuh:9-697` + dispatch
`deepseek_kernel_dispatch.cu`): matrix-absorbed MLA decode — RMSNorm,
q_nope/q_pe/ckv/k_pe projections, partial RoPE on the rope slices, ckv
RMSNorm, q@W_UK absorption into the compressed space, flash-decoding over the
compressed ckv cache, @W_UV expansion, O-projection.

Improvements over the reference prototype (SURVEY.md §2.1): sequence length
is dynamic (the reference hardcodes SEQ_LEN 4096, `deepseek/config.h:9`) and
the new compressed-KV row is returned for cache append (the reference never
appends).

NOTE: this entry point currently lowers to the jitted fp32 path in
``ops.reference`` while the fused Pallas MLA kernel is brought up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from clusterfusion_tpu.ops import reference as ref


@functools.partial(jax.jit, static_argnames=(
    "n_heads", "nope_dim", "rope_dim", "lora_rank", "eps"))
def deepseek_decoder_layer(
    input: jnp.ndarray,          # [1, hidden]
    weight_q_nope: jnp.ndarray,  # [heads*nope_dim, hidden]
    weight_q_pe: jnp.ndarray,    # [heads*rope_dim, hidden]
    weight_uk: jnp.ndarray,      # [heads, nope_dim, lora_rank]
    weight_kv_nope: jnp.ndarray, # [lora_rank, hidden]
    weight_k_pe: jnp.ndarray,    # [rope_dim, hidden]
    weight_uv: jnp.ndarray,      # [heads, lora_rank, nope_dim]
    weight_o: jnp.ndarray,       # [hidden, heads*nope_dim]
    ckv_cache: jnp.ndarray,      # [seq, lora_rank + rope_dim]
    rms_input_weight: jnp.ndarray,  # [hidden]
    rms_ckv_weight: jnp.ndarray,    # [lora_rank]
    cos: jnp.ndarray,            # [rope_dim/2]
    sin: jnp.ndarray,            # [rope_dim/2]
    n_heads: int = 16,
    nope_dim: int = 128,
    rope_dim: int = 64,
    lora_rank: int = 512,
    eps: float = 1e-6,
):
    """Returns (output [1, hidden], ckv_new [1, lora_rank + rope_dim]).

    The reference returns output only (`pybind.cpp:45-59`); ckv_new is added
    so callers can append to the cache, fixing the prototype's missing
    cache-append."""
    return ref.deepseek_decoder_layer_ref(
        input, weight_q_nope, weight_q_pe, weight_uk, weight_kv_nope,
        weight_k_pe, weight_uv, weight_o, ckv_cache,
        rms_input_weight, rms_ckv_weight, cos, sin,
        n_heads=n_heads, nope_dim=nope_dim, rope_dim=rope_dim,
        lora_rank=lora_rank, eps=eps)
