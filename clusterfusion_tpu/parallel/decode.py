"""Tensor-parallel fused decode across an ICI mesh.

This is where the reference's collective philosophy lands on TPU
(SURVEY.md §2.4, §7): inside one chip the megakernel already fused the
DSM-style reductions into scratch; across chips the same two reduction
points — after the head-parallel attention block (the reference's
`Stage::ATTN` DSM reduce + cross-head atomicAdd, `kernel.cuh:561-568,600`)
and after the row-parallel FFN — become two ``psum`` collectives over the
``tp`` axis, riding ICI.

Layout per chip: ``kv_heads/tp`` heads of every weight + cache; RMSNorms and
the residual stream are replicated; logits are vocab-sharded then gathered.
The fairscale TP of the reference's *unfused* path (`model.py:208-235`)
required gathering full weights per rank for the fused kernel
(`model.py:306-311` — replicating all work); here the fused kernel itself
runs sharded.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from clusterfusion_tpu.config import KernelConfig, LlamaConfig
from clusterfusion_tpu.models import llama as model
from clusterfusion_tpu.ops._support import interpret_mode
from clusterfusion_tpu.ops.decoder_layer import _fused_decoder_layer
from clusterfusion_tpu.ops.rmsnorm import fused_add_rmsnorm
from clusterfusion_tpu.ops.reference import rmsnorm_ref
from clusterfusion_tpu.ops.reference import fused_add_rmsnorm_ref
from clusterfusion_tpu.parallel.collective import Stage, cluster_reduce
from clusterfusion_tpu.parallel.sharding import cache_pspec, param_pspecs


def make_sharded_decode_step(cfg: LlamaConfig, mesh: Mesh,
                             kcfg: KernelConfig = KernelConfig(),
                             fused_collectives: bool = False,
                             interpret=None, params=None):
    """Build a jitted tp-sharded fused decode step:

    ``step(params, k_cache, v_cache, token, pos) ->
    (logits [vocab], k_cache', v_cache')``

    params/caches must be device_put with ``param_shardings``/
    ``cache_shardings`` of the same mesh.

    ``fused_collectives=True`` runs the whole stack as ONE megakernel per
    chip with the two reference reduction points fused IN-KERNEL as
    remote-DMA ring all-reduces (``ops.stack_kernel`` ``reduce_axis``) —
    the Stage::ATTN hops overlap the layer's FFN weight streaming and the
    Stage::LINEAR hops overlap the next layer's QKV prefetch, the craft of
    `dsm.cuh:89-169` at chip scope.  Explicitly opt-in, same policy as the
    ring backend (collective.py): validated under the interpret simulation
    with race detection; the default path keeps between-kernel XLA psums.
    """
    tp = mesh.shape["tp"]
    kv_local = cfg.kv_heads // tp
    g = cfg.n_heads // cfg.kv_heads
    hd = cfg.head_dim_

    if fused_collectives:
        return _make_fused_collective_decode_step(cfg, mesh, kcfg,
                                                  interpret, params)

    def local_step(params, k_cache, v_cache, token, pos):
        cos_t, sin_t = model.rope_table(cfg)
        cos = jax.lax.dynamic_slice(cos_t, (pos, 0), (1, hd))
        sin = jax.lax.dynamic_slice(sin_t, (pos, 0), (1, hd))
        x = params["embed"][token][None]
        residual = jnp.zeros_like(x)

        lw = params["layers"]

        def layer(carry, l):
            x, residual, kc, vc = carry
            # residual add + RMSNorm live inside the kernel and must see the
            # *full* residual: replicated here, so the kernel computes the
            # same norm on every chip (cheap), then per-chip partial attn.
            # Whole weight stacks enter the kernel (layer picked in the
            # BlockSpec index maps) — see models.llama on why scanning
            # weight slices through a pallas operand copies them per layer.
            attn, residual, _, _, kc, vc = _fused_decoder_layer(
                x, residual, lw["attn_norm"][:, None], cos, sin,
                lw["wqkv_f"], lw["wo_f"], kc, vc, pos, l,
                group=g, head_dim=hd, rope_style=cfg.rope_style,
                fuse_residual=True, eps=cfg.norm_eps, kcfg=kcfg,
                interpret=interpret_mode(), append_kv=True,
                window=cfg.sliding_window, bias_qkv=lw.get("bqkv_f"),
                softcap=cfg.attn_logit_softcap,
                window_pattern=cfg.window_pattern)
            # ICI all-reduce of the row-parallel O-projection — the chip-
            # scope Stage::ATTN reduce (`kernel.cuh:561-568`).
            attn = cluster_reduce(attn, "tp", Stage.ATTN)
            if cfg.sandwich_norms:
                # gemma-2 post-attn norm: AFTER the reduce (nonlinear)
                attn = rmsnorm_ref(
                    attn, jax.lax.dynamic_index_in_dim(
                        lw["post_attn_norm"], l, 0, keepdims=False),
                    cfg.norm_eps)
            ffn_norm = jax.lax.dynamic_index_in_dim(lw["ffn_norm"], l, 0,
                                                    keepdims=False)
            ffn_in, residual = fused_add_rmsnorm(attn, residual,
                                                 ffn_norm, cfg.norm_eps)
            # tree-map slicing also works on QuantizedTensor pytrees
            # (q and s both carry the leading layer axis)
            h = model._ffn(
                ffn_in,
                jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), lw["w13"]),
                jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False), lw["w2"]),
                cfg.ffn_act)
            # ICI all-reduce of the row-parallel FFN down-projection
            # (the reference's Stage::FFN reduce minus its fused ReLU —
            # SwiGLU's activation lives before the down-proj).
            h = cluster_reduce(h, "tp", Stage.LINEAR)
            if cfg.sandwich_norms:
                h = rmsnorm_ref(
                    h, jax.lax.dynamic_index_in_dim(
                        lw["post_ffn_norm"], l, 0, keepdims=False),
                    cfg.norm_eps)
            return (h, residual, kc, vc), None

        layer_idx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        (x, residual, k_cache, v_cache), _ = jax.lax.scan(
            layer, (x, residual, k_cache, v_cache), layer_idx)
        xn, _ = fused_add_rmsnorm_ref(x, residual, params["final_norm"],
                                      cfg.norm_eps)
        logits = model._lm_logits(xn[0], params["lm_head"])
        return logits, k_cache, v_cache           # logits vocab-sharded

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(param_pspecs(cfg, tp, params), cache_pspec(),
                  cache_pspec(), P(), P()),
        out_specs=(P("tp"), cache_pspec(), cache_pspec()),
        check_rep=False,
    )
    return jax.jit(step)


def _make_fused_collective_decode_step(cfg: LlamaConfig, mesh: Mesh,
                                       kcfg: KernelConfig, interpret,
                                       params=None):
    """One megakernel per chip per token, ICI rings fused in-kernel —
    see ``make_sharded_decode_step(fused_collectives=True)``."""
    from clusterfusion_tpu.ops.stack_kernel import fused_decoder_stack
    from clusterfusion_tpu.parallel.collective import _interpret

    tp = mesh.shape["tp"]
    g = cfg.n_heads // cfg.kv_heads
    hd = cfg.head_dim_
    interp = interpret if interpret is not None else _interpret()

    def local_step(params, k_cache, v_cache, token, pos):
        cos_t, sin_t = model.rope_table(cfg)
        cos = jax.lax.dynamic_slice(cos_t, (pos, 0), (1, hd))
        sin = jax.lax.dynamic_slice(sin_t, (pos, 0), (1, hd))
        x = params["embed"][token][None]
        lw = params["layers"]
        x_out, res_out, k_cache, v_cache = fused_decoder_stack(
            x, lw["attn_norm"], lw["ffn_norm"], cos, sin,
            lw["wqkv_f"], lw["wo_f"], lw["w13"], lw["w2"],
            k_cache, v_cache, pos,
            group=g, head_dim=hd, rope_style=cfg.rope_style,
            eps=cfg.norm_eps, kcfg=kcfg, interpret=interp,
            reduce_axis="tp", window=cfg.sliding_window,
            bias_qkv=lw.get("bqkv_f"), ffn_act=cfg.ffn_act,
            softcap=cfg.attn_logit_softcap,
            window_pattern=cfg.window_pattern,
            post_attn_norm=lw.get("post_attn_norm"),
            post_ffn_norm=lw.get("post_ffn_norm"))
        # x_out/res_out are fully reduced and replicated: the final norm +
        # vocab-sharded LM head need no further collective
        xn, _ = fused_add_rmsnorm_ref(x_out, res_out, params["final_norm"],
                                      cfg.norm_eps)
        logits = model._lm_logits(xn[0], params["lm_head"])
        return logits, k_cache, v_cache

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(param_pspecs(cfg, tp, params), cache_pspec(),
                  cache_pspec(), P(), P()),
        out_specs=(P("tp"), cache_pspec(), cache_pspec()),
        check_rep=False,
    )
    return jax.jit(step)


def make_sharded_serving_step(cfg: LlamaConfig, mesh: Mesh,
                              kcfg: KernelConfig = KernelConfig(),
                              params=None):
    """Tensor-parallel BATCHED serving step over an ICI mesh — the north
    star's "multi-chip sharding with continuous batching" (BASELINE.md):
    the ServingEngine's batched-matmul step (runtime.serving), with heads,
    FFN columns, paged KV pools, and the LM head sharded over ``tp``.

    Per chip: local head-group projections (M=B matmuls on the weight
    shard), the lean paged-attention kernel over the LOCAL kv-head slice
    of the pools, then the two reference reduction points as ICI psums
    (O-projection = Stage::ATTN, FFN down-proj = Stage::LINEAR).

    ``step(params, k_pool, v_pool, tokens, positions, table, seq_lens)
    -> (logits [B, vocab], k_pool', v_pool')``.  Pools are sharded
    ``P(None, "dcn", "tp")`` (pages over hosts, kv-heads over tp).
    bf16 and int8 param trees supported (int8 dots apply scales after
    the matmul — no materialized copies; pass ``params`` so the spec tree
    matches).  int4 group scales cannot commute with XLA dots — int4
    serving stays on the single-chip fused engine.

    Multi-host (north-star configs[4]): the batch axis (tokens, positions,
    block table, seq_lens) and the page pool are sharded over ``dcn`` — each
    host runs continuous batching on its own requests with its own page
    pool, weights replicated per host and tp-sharded inside it.  No
    collective ever crosses dcn in the decode hot path (the reference's
    NCCL process scope, `chat/llama/generation.py:84-89`, replaced by
    data-parallel serving over the host axis)."""
    from clusterfusion_tpu.ops.paged_decoder_layer import paged_attention

    tp = mesh.shape["tp"]
    kv_local = cfg.kv_heads // tp
    g = cfg.n_heads // cfg.kv_heads
    hd = cfg.head_dim_
    if hd % 128 != 0:
        # Same Mosaic constraint ServingEngine reroutes around: the batched
        # paged_attention gathers pages with DMAs that slice the pool's
        # head (minor) dim, illegal under (8, 128) tiling for sub-128 head
        # dims.  The sharded step has no fused fallback — fail clearly
        # instead of an opaque Mosaic compile error.
        raise ValueError(
            f"make_sharded_serving_step requires head_dim % 128 == 0 "
            f"(got {hd}); sub-128 head-dim models (TinyLlama, Qwen2-0.5B) "
            f"are served single-chip via ServingEngine(step_impl='fused')")

    def local_step(params, k_pool, v_pool, tokens, positions, table,
                   seq_lens):
        B = tokens.shape[0]
        cos_t, sin_t = model.rope_table(cfg)
        cos = cos_t[positions]
        sin = sin_t[positions]
        x = params["embed"][tokens]
        residual = jnp.zeros_like(x)
        lw = params["layers"]

        def idx(w, l):
            return jax.lax.dynamic_index_in_dim(w, l, 0, keepdims=False)

        def idxq(w, l):
            """Layer slice that also descends QuantizedTensor pytrees."""
            return jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(
                a, l, 0, keepdims=False), w)

        def layer(carry, l):
            from clusterfusion_tpu.runtime.serving import (batched_ffn,
                batched_o_dot, batched_qkv_dot)
            x, res, kp, vp = carry
            xn, res = fused_add_rmsnorm_ref(x, res, idx(lw["attn_norm"], l),
                                            cfg.norm_eps)
            # int8-aware batched dots (scale-after-dot — no materialized
            # bf16 weight copies); bf16 trees take the plain einsum path
            y = batched_qkv_dot(xn, idxq(lw["wqkv_f"], l),
                                w8a8=kcfg.serving_w8a8)
            if "bqkv_f" in lw:                        # Qwen2 QKV bias
                y = y + idx(lw["bqkv_f"], l)[None].astype(y.dtype)
            y = y.reshape(B, kv_local, (g + 2) * hd)
            q = y[..., : g * hd].reshape(B, kv_local, g, hd)
            k = y[..., g * hd:(g + 1) * hd]
            v = y[..., (g + 1) * hd:]
            q = model._apply_rope(q, cos[:, None, None, :],
                                  sin[:, None, None, :], cfg.rope_style)
            k = model._apply_rope(k, cos[:, None, :], sin[:, None, :],
                                  cfg.rope_style)
            o, kp, vp = paged_attention(q, k, v, kp, vp, table, seq_lens,
                                        l, kcfg=kcfg,
                                        interpret=interpret_mode())
            G = lw["wo_f"].shape[1]
            attn = batched_o_dot(
                o.reshape(B, G, (kv_local // G) * g * hd),
                idxq(lw["wo_f"], l),
                w8a8=kcfg.serving_w8a8).astype(x.dtype)
            attn = cluster_reduce(attn, "tp", Stage.ATTN)
            xn2, res = fused_add_rmsnorm_ref(attn, res,
                                             idx(lw["ffn_norm"], l),
                                             cfg.norm_eps)
            h = batched_ffn(xn2, idxq(lw["w13"], l), idxq(lw["w2"], l),
                            cfg.ffn_act, w8a8=kcfg.serving_w8a8)
            h = cluster_reduce(h, "tp", Stage.LINEAR)
            return (h.astype(x.dtype), res.astype(x.dtype), kp, vp), None

        layer_idx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        (x, residual, k_pool, v_pool), _ = jax.lax.scan(
            layer, (x, residual, k_pool, v_pool), layer_idx)
        xn, _ = fused_add_rmsnorm_ref(x, residual, params["final_norm"],
                                      cfg.norm_eps)
        logits = model._lm_logits(xn, params["lm_head"])
        return logits, k_pool, v_pool            # logits vocab-sharded

    pool_spec = P(None, "dcn", "tp")
    batch_spec = P("dcn")
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(param_pspecs(cfg, tp, params), pool_spec, pool_spec,
                  batch_spec, batch_spec, batch_spec, batch_spec),
        out_specs=(P("dcn", "tp"), pool_spec, pool_spec),
        check_rep=False,
    )
    return jax.jit(step)
