"""Batched decode with paged KV cache — fused layer op.

TPU twin of `LlamaDecoderLayerBatchDecodeWithPagedKVCacheKernel`
(`include/H100/llama/kernel_batch_sglang.cuh:43-663` + dispatch
`llama_kernel_batch_sglang_dispatch.cu`).  Differences dictated by the
platform (SURVEY.md §2.2 item 3):

- The reference receives per-layer raw device pointers
  (`k_cache_ptrs[layer_id]`, `:118-119`); here the cache is one stacked
  array ``[n_layers, num_pages, hidden]`` indexed by ``layer_id``.
- The reference mutates output/caches in place on a CUDA stream
  (`llama_kernel_batch_sglang_dispatch.cu:29,92`); here the op is
  functional and returns updated caches (donate the inputs under jit for
  true in-place behavior).
- Page size is one token row, as in the reference (`:341`).

NOTE: this entry point currently lowers to the jitted fp32 path in
``ops.reference`` while the fused Pallas kernel (scalar-prefetched block
tables, per-page DMA via BlockSpec index maps) is brought up — see
``paged_decoder_layer_fused`` work in progress.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from clusterfusion_tpu.ops import reference as ref


@functools.partial(jax.jit, static_argnames=("layer_id", "eps", "n_heads", "head_dim"))
def llama_decoder_layer_batch_decode_sglang(
    input: jnp.ndarray,            # [batch, hidden]
    residual: jnp.ndarray,         # [batch, hidden]
    weight_qkv: jnp.ndarray,       # [3*hidden, hidden] ([out, in])
    weight_o: jnp.ndarray,         # [hidden, hidden]   ([out, in])
    paged_kv_indptr: jnp.ndarray,  # [batch+1] int32
    paged_kv_indices: jnp.ndarray, # [total] int32, page size = 1 token
    k_cache: jnp.ndarray,          # [n_layers, num_pages, hidden]
    v_cache: jnp.ndarray,          # [n_layers, num_pages, hidden]
    layer_id: int,
    rms_w: jnp.ndarray,            # [hidden]
    eps: float,
    positions: jnp.ndarray,        # [batch] int32
    cos_sin: jnp.ndarray,          # [max_pos, head_dim] (cos half ‖ sin half)
    n_heads: int = 32,
    head_dim: int = 128,
):
    """Returns (output, residual_out, k_cache', v_cache')."""
    out, res_out, kc, vc = ref.llama_decoder_layer_batch_paged_ref(
        input, residual, weight_qkv, weight_o,
        paged_kv_indptr, paged_kv_indices,
        k_cache[layer_id], v_cache[layer_id],
        rms_w, eps, positions, cos_sin,
        n_heads=n_heads, head_dim=head_dim)
    k_cache = k_cache.at[layer_id].set(kc)
    v_cache = v_cache.at[layer_id].set(vc)
    return out, res_out, k_cache, v_cache
