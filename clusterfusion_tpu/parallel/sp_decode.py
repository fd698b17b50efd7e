"""Sequence-parallel (+ tensor-parallel) fused decode across the ICI mesh.

The reference scales sequence length *inside one GPU* by splitting the KV
cache across the CTAs of a cluster and merging per-CTA online-softmax
states over DSM (`llama_kernel_dispatch.cu:36`, `kernel.cuh:479-551`); it
has no cross-device sequence parallelism (SURVEY.md §2.3).  This module
lifts that same two-level merge algebra to chip scope (SURVEY.md §5
"long-context"):

- the KV cache is sharded over the ``sp`` mesh axis (each chip owns a
  contiguous ``capacity/sp`` slice of positions) and over ``tp`` (heads);
- each chip runs the fused megakernel in *partials* mode
  (``emit_partials=True``): full fused residual+RMSNorm+QKV+RoPE and
  flash-decode over its local KV slice, emitting the unnormalized
  per-q-head (acc, m, l) softmax state — the kernel-level analogue of one
  CTA's state before the cluster merge;
- the chip-scope merge is exactly `kernel.cuh:506-551` with ICI
  collectives in place of DSM scalar reduces:
  ``m* = pmax(m); l* = Σ l·2^(m−m*); acc* = Σ acc·2^(m−m*)``;
- the current token's KV is folded by exactly ONE chip — the owner of
  position ``pos`` — via the kernel's prefetched fold flag (mirroring the
  rank-0-only insertion, `kernel.cuh:444-477`), and appended to that
  chip's cache shard;
- the O-projection runs on the merged, normalized heads and is row-parallel
  over ``tp`` (one psum), as in the tp-only path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from clusterfusion_tpu.config import KernelConfig, LlamaConfig
from clusterfusion_tpu.models import llama as model
from clusterfusion_tpu.ops._support import interpret_mode
from clusterfusion_tpu.ops.decoder_layer import _fused_decoder_layer
from clusterfusion_tpu.ops.quant import maybe_dequantize
from clusterfusion_tpu.ops.reference import (fused_add_rmsnorm_ref,
    rmsnorm_ref)
from clusterfusion_tpu.parallel.collective import Stage, cluster_reduce
from clusterfusion_tpu.parallel.sharding import param_pspecs


def cache_pspec_2d() -> P:
    """[L, kv_heads, capacity, head_dim]: heads on tp, sequence on sp."""
    return P(None, "tp", "sp", None)


def cache_shardings_2d(mesh: Mesh):
    return NamedSharding(mesh, cache_pspec_2d())


def make_sp_sharded_decode_step(cfg: LlamaConfig, mesh: Mesh,
                                kcfg: KernelConfig = KernelConfig(),
                                params=None):
    """Build a jitted (tp, sp)-sharded fused decode step:

    ``step(params, k_cache, v_cache, token, pos) ->
    (logits [vocab], k_cache', v_cache')``

    params sharded with ``param_shardings`` (tp on heads/ffn, sp
    replicated); caches with ``cache_shardings_2d``.  Requires
    capacity % sp == 0."""
    tp, sp = mesh.shape["tp"], mesh.shape["sp"]
    g = cfg.n_heads // cfg.kv_heads
    hd = cfg.head_dim_

    def local_step(params, k_cache, v_cache, token, pos):
        sp_idx = jax.lax.axis_index("sp")
        cap_l = k_cache.shape[2]                       # local slice length
        start = sp_idx * cap_l
        # tokens 0..pos-1 are cached; this chip holds [start, start+cap_l)
        seq_local = jnp.clip(pos - start, 0, cap_l)
        fold = jnp.logical_and(pos >= start,
                               pos < start + cap_l).astype(jnp.int32)
        pos_local = jnp.clip(pos - start, 0, cap_l - 1)
        # sliding window on the sp path: the window is defined on GLOBAL
        # positions ([pos+1-window, pos]); translate its lower bound into
        # this chip's local slice coordinates for the kernel (negative ⇒
        # shard fully inside the window; >= seq_local ⇒ shard fully below
        # it, every chunk skipped and the partial merges as (m=-inf, l=0)).
        win_lo = (pos + 1 - cfg.sliding_window - start
                  if cfg.sliding_window else None)

        cos_t, sin_t = model.rope_table(cfg)
        cos = jax.lax.dynamic_slice(cos_t, (pos, 0), (1, hd))
        sin = jax.lax.dynamic_slice(sin_t, (pos, 0), (1, hd))
        x = params["embed"][token][None]
        residual = jnp.zeros_like(x)

        lw = params["layers"]

        def layer(carry, l):
            x, res, kc, vc = carry
            p = jax.tree.map(
                lambda w: jax.lax.dynamic_index_in_dim(w, l, 0,
                                                       keepdims=False), lw)
            G = p["wo_f"].shape[0]
            acc, ml, res, k_new, v_new = _fused_decoder_layer(
                x, res, p["attn_norm"][None], cos, sin,
                p["wqkv_f"], p["wo_f"], kc, vc, seq_local, l,
                group=g, head_dim=hd, rope_style=cfg.rope_style,
                fuse_residual=True, eps=cfg.norm_eps, kcfg=kcfg,
                interpret=interpret_mode(),
                emit_partials=True, fold_current=fold,
                window=cfg.sliding_window, window_lo=win_lo,
                window_pattern=cfg.window_pattern,
                softcap=cfg.attn_logit_softcap,
                bias_qkv=p.get("bqkv_f"))
            # chip-scope softmax merge over sp (kernel.cuh:506-551 algebra)
            m, lsum = ml[0], ml[1]                     # [rows_local]
            m_g = jax.lax.pmax(m, "sp")
            alpha = jnp.exp2(m - m_g)
            l_g = jax.lax.psum(lsum * alpha, "sp")
            acc_g = jax.lax.psum(acc * alpha[:, None], "sp")
            o = (acc_g / l_g[:, None]).astype(jnp.bfloat16)
            rows_l = o.shape[0]
            o_flat = o.reshape(G, rows_l // G * hd)
            # partials mode keeps the O-projection outside the kernel:
            # dequantize QuantizedTensor wo here (int8/int4 sp decode)
            attn = jnp.einsum("Gc,Gco->o", o_flat,
                              maybe_dequantize(p["wo_f"], o.dtype),
                              preferred_element_type=jnp.float32)[None]
            # row-parallel O reduce over tp (Stage::ATTN at chip scope)
            attn = cluster_reduce(attn.astype(x.dtype), "tp", Stage.ATTN)
            if cfg.sandwich_norms:
                # gemma-2 post-attn norm, after the cross-chip reduces
                attn = rmsnorm_ref(attn, p["post_attn_norm"], cfg.norm_eps)

            # KV append on the owner chip only
            k_cur = jax.lax.dynamic_slice(
                kc, (l, 0, pos_local, 0), (1, kc.shape[1], 1, hd))
            v_cur = jax.lax.dynamic_slice(
                vc, (l, 0, pos_local, 0), (1, vc.shape[1], 1, hd))
            k_upd = jnp.where(fold == 1,
                              k_new[None, :, None, :].astype(kc.dtype), k_cur)
            v_upd = jnp.where(fold == 1,
                              v_new[None, :, None, :].astype(vc.dtype), v_cur)
            kc = jax.lax.dynamic_update_slice(kc, k_upd, (l, 0, pos_local, 0))
            vc = jax.lax.dynamic_update_slice(vc, v_upd, (l, 0, pos_local, 0))

            ffn_in, res = fused_add_rmsnorm_ref(attn, res, p["ffn_norm"],
                                                cfg.norm_eps)
            h = model._ffn(ffn_in, p["w13"], p["w2"], cfg.ffn_act)
            h = cluster_reduce(h.astype(x.dtype), "tp", Stage.LINEAR)
            if cfg.sandwich_norms:
                h = rmsnorm_ref(h, p["post_ffn_norm"], cfg.norm_eps)
            return (h, res, kc, vc), None

        layer_idx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        (x, residual, k_cache, v_cache), _ = jax.lax.scan(
            layer, (x, residual, k_cache, v_cache), layer_idx)
        xn, _ = fused_add_rmsnorm_ref(x, residual, params["final_norm"],
                                      cfg.norm_eps)
        logits = model._lm_logits(xn[0], params["lm_head"])
        return logits, k_cache, v_cache               # logits vocab-sharded

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(param_pspecs(cfg, tp, params), cache_pspec_2d(),
                  cache_pspec_2d(), P(), P()),
        out_specs=(P("tp"), cache_pspec_2d(), cache_pspec_2d()),
        check_vma=False,
    )
    return jax.jit(step)
