"""Functional JAX Llama — the TPU twin of the reference model layer
(`chat/llama/model.py`): Transformer with per-layer branch between the fused
megakernel decode path and an eager (stock-XLA) path, plus eager prefill.

Design deltas from the reference, all TPU-motivated:

- Functional params/caches (pytrees) instead of nn.Module state; the layer
  stack runs under ``lax.scan`` so 32 layers trace once.
- Weights are stored in the *fused, kernel-native* layout from load time
  (`wqkv_f [kv_heads, hidden, (g+2)·head_dim]`, `wo_f [kv_heads,
  g·head_dim, hidden]`) — the reference rebuilds fused weights in a
  post-load hook (`model.py:286-328`); here fusion is the primary layout and
  the eager path consumes it via einsum without re-transposing.
- The sglang residual-pair convention is used end-to-end: each fused layer
  takes (hidden, residual) and returns (attn_out, residual'), so the
  residual-add is inside the kernel (`kernel_sglang.cuh:98-106`), and the
  FFN half uses ``fused_add_rmsnorm``.
- KV caches are preallocated to capacity [L, kv_heads, max_seq, head_dim]
  with a dynamic position — no per-length recompiles (the reference derives
  SEQ_LEN from the cache tensor shape per call,
  `llama_kernel_dispatch.cu:35`).
- GQA is native (the reference is MHA-only).
- FFN stays on the eager XLA path, exactly like the reference
  (`model.py:518-520` — FFN and prefill are never fused).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from clusterfusion_tpu.config import KernelConfig, LlamaConfig
from clusterfusion_tpu.ops.stack_kernel import fused_decoder_stack
from clusterfusion_tpu.ops.flash_prefill import flash_prefill_attention
from clusterfusion_tpu.ops.gemv import gemv
from clusterfusion_tpu.ops.rmsnorm import fused_add_rmsnorm, rmsnorm
from clusterfusion_tpu.ops.reference import fused_add_rmsnorm_ref, rmsnorm_ref
from clusterfusion_tpu.ops.rope import (
    apply_rope_gptj,
    apply_rope_neox,
    rope_tables_gptj,
    rope_tables_neox,
)
from clusterfusion_tpu.ops._support import glu_act, interpret_mode
from clusterfusion_tpu.ops.quant import (Int8KV, QuantizedTensor,
    maybe_dequantize, quantize_kv_rows, quantize_llama_params)

LlamaParams = Dict[str, Any]


# --------------------------------------------------------------------------
# Parameter construction
# --------------------------------------------------------------------------


def padded_ffn_dim(cfg: LlamaConfig) -> int:
    """FFN dim zero-padded to a multiple of 1024: keeps the fused-FFN
    kernel's column blocks large and lane-aligned, and tp-sharded local
    shapes 128-aligned (zero gate/up columns are exact no-ops)."""
    from clusterfusion_tpu.config import round_up
    return round_up(cfg.ffn_dim, 1024)


def default_head_group(cfg: LlamaConfig, quant: Optional[str] = None) -> int:
    """KV heads per kernel grid step in the fused weight layout.

    bf16: 4 keeps the whole-stack megakernel's double-buffered blocks
    inside the default 100 MB VMEM budget at 7B geometry (hg=8 needs
    ~126 MB for no measured gain: 50.8 vs 51.8 tok/s on v5e).

    int8/int4 (``quant``): the blocks are 2-4× smaller, so hg=8 fits and
    halves the attention grid steps — measured +6% at int4+int8kv on v5e
    (166.5 → 176.3 tok/s; per-step fixed overhead is the remaining gap
    to the byte floor, scripts/profile_decode.py)."""
    hg = min(8 if quant in ("int8", "int4") else 4, cfg.kv_heads)
    while cfg.kv_heads % hg:
        hg -= 1
    return hg


def fuse_attention_weights(wq, wk, wv, wo, cfg: LlamaConfig,
                           head_group: Optional[int] = None):
    """Torch-Linear-layout projections -> kernel-native head-grouped layout.

    wq: [heads·hd, hidden]; wk/wv: [kv·hd, hidden]; wo: [hidden, heads·hd]
    (all [out, in]).  Returns (wqkv_f [G, hidden, hg·(g+2)·hd],
    wo_f [G, hg·g·hd, hidden]) with G = kv_heads / head_group.  This is the
    TPU version of ``_build_cf_weights`` (`chat/llama/model.py:292-328`),
    done once at load; the head grouping keeps the decode GEMVs N-wide (see
    ops.decoder_layer performance note)."""
    from clusterfusion_tpu.ops.decoder_layer import fuse_qkv_o_for_kernel
    kv, g, hd, hidden = cfg.kv_heads, cfg.n_heads // cfg.kv_heads, \
        cfg.head_dim_, cfg.hidden_dim
    hg = head_group or default_head_group(cfg)
    q = wq.reshape(kv, g, hd, hidden).transpose(0, 3, 1, 2).reshape(kv, hidden, g * hd)
    k = wk.reshape(kv, hd, hidden).transpose(0, 2, 1)
    v = wv.reshape(kv, hd, hidden).transpose(0, 2, 1)
    wqkv_per_head = jnp.concatenate([q, k, v], axis=-1)
    wo_per_head = wo.T.reshape(kv, g * hd, hidden)
    return fuse_qkv_o_for_kernel(wqkv_per_head, wo_per_head, kv, g, hd, hg)


def fuse_qkv_bias(bq, bk, bv, cfg: LlamaConfig,
                  head_group: Optional[int] = None):
    """Per-projection bias vectors (torch layout: bq [heads·hd],
    bk/bv [kv·hd]) → the grouped-column layout [G, hg·(g+2)·hd] matching
    ``fuse_attention_weights``'s wqkv_f columns (Qwen2 family)."""
    kv, g, hd = cfg.kv_heads, cfg.n_heads // cfg.kv_heads, cfg.head_dim_
    hg = head_group or default_head_group(cfg)
    G = kv // hg
    per_head = jnp.concatenate(
        [bq.reshape(kv, g * hd), bk.reshape(kv, hd), bv.reshape(kv, hd)],
        axis=-1)                                       # [kv, (g+2)·hd]
    return per_head.reshape(G, hg * (g + 2) * hd)


def init_params(cfg: LlamaConfig, key, dtype=jnp.bfloat16,
                head_group: Optional[int] = None) -> LlamaParams:
    """Random-init params in the fused layout (layer arrays stacked on axis
    0 for lax.scan)."""
    kv, g, hd = cfg.kv_heads, cfg.n_heads // cfg.kv_heads, cfg.head_dim_
    h, L, V = cfg.hidden_dim, cfg.n_layers, cfg.vocab_size
    f = padded_ffn_dim(cfg)
    hg = head_group or default_head_group(cfg)
    G = kv // hg
    ks = jax.random.split(key, 8)

    def norm(k, shape, fan_in):
        # generate directly in the target dtype: at 7B scale an fp32
        # intermediate would blow HBM during init
        return jax.random.normal(k, shape, dtype) / jnp.sqrt(fan_in).astype(dtype)

    params = {
        "embed": norm(ks[0], (V, h), h),
        "layers": {
            "wqkv_f": norm(ks[1], (L, G, h, hg * (g + 2) * hd), h),
            "wo_f": norm(ks[2], (L, G, hg * g * hd, h), g * hd),
            "w13": norm(ks[3], (L, 2, h, f), h),
            "w2": norm(ks[4], (L, f, h), f),
            "attn_norm": jnp.ones((L, h), dtype),
            "ffn_norm": jnp.ones((L, h), dtype),
        },
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": norm(ks[5], (h, V), h),
    }
    if cfg.qkv_bias:
        # Qwen2-family QKV bias, grouped-column layout matching wqkv_f
        params["layers"]["bqkv_f"] = \
            norm(ks[6], (L, G, hg * (g + 2) * hd), hd)
    if cfg.sandwich_norms:
        # gemma-2 post-attention / post-FFN RMSNorm weights
        params["layers"]["post_attn_norm"] = jnp.ones((L, h), dtype)
        params["layers"]["post_ffn_norm"] = jnp.ones((L, h), dtype)
    return params


def _lm_logits(xn, lm):
    """LM-head projection accepting a bf16 matrix or a per-column-int8
    QuantizedTensor (dequant commutes with the dot: scale the logits)."""
    if isinstance(lm, QuantizedTensor):
        y = jnp.dot(xn, lm.q.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return y * lm.s.reshape(-1)     # [V] broadcast: keeps y's rank
    return jnp.dot(xn, lm, preferred_element_type=jnp.float32)


def rope_table(cfg: LlamaConfig, max_pos: Optional[int] = None):
    """Full-dim (cos, sin) tables [max_pos, head_dim] in the layout the
    megakernel consumes for cfg.rope_style."""
    hd = cfg.head_dim_
    max_pos = max_pos or cfg.max_seq_len
    l3 = cfg.llama3_scaling
    if cfg.rope_style == "neox":
        c, s = rope_tables_neox(hd, max_pos, cfg.rope_theta, l3)
        return (jnp.concatenate([c, c], axis=-1), jnp.concatenate([s, s], axis=-1))
    c, s = rope_tables_gptj(hd, max_pos, cfg.rope_theta, l3)
    return c, s


def init_cache(cfg: LlamaConfig, max_seq: Optional[int] = None,
               dtype=jnp.bfloat16):
    """[L, kv_heads, capacity, head_dim] ×2, zero-filled (zeros matter: tile
    padding read by the kernel must not be NaN).

    dtype "int8" (or jnp.int8) → :class:`~clusterfusion_tpu.ops.quant.Int8KV`
    caches (int8 payload + per-position scale planes), the TPU-native fast
    8-bit KV format; capacity rounds up to the scale-plane tile (128)."""
    cap = max_seq or cfg.max_seq_len
    if dtype == "int8" or dtype == jnp.int8:
        from clusterfusion_tpu.ops.quant import init_kv_int8
        if cap > 128:
            cap = -(-cap // 128) * 128
        return (init_kv_int8(cfg.n_layers, cfg.kv_heads, cap, cfg.head_dim_),
                init_kv_int8(cfg.n_layers, cfg.kv_heads, cap, cfg.head_dim_))
    shape = (cfg.n_layers, cfg.kv_heads, cap, cfg.head_dim_)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


# --------------------------------------------------------------------------
# Shared pieces
# --------------------------------------------------------------------------


def _ffn(x, w13, w2, act: str = "silu"):
    """SwiGLU/GeGLU in bf16 with fp32 accumulation.

    w13: [2, hidden, ffn] = stacked (w1, w3) so a tp shard of the ffn axis
    holds *matching* gate/up columns (no resharding at the gate·up product).
    The gate/up axis leads so the tiled trailing dims are (hidden, ffn) —
    a size-2 dim in tiled position pads 2-8x in HBM on TPU.
    """
    if isinstance(w13, QuantizedTensor) and w13.kind == "int8":
        # INT8 per-column scales commute with the dot: scale the result
        # (XLA fuses the int8->bf16 convert into the matmul; a dequantized
        # copy would materialize ~185 MB/layer at 7B)
        y = jnp.einsum("...d,udf->...uf", x, w13.q.astype(x.dtype),
                       preferred_element_type=jnp.float32) * w13.s[:, 0, :]
        act = glu_act(y[..., 0, :], y[..., 1, :], act).astype(x.dtype)
        return (jnp.dot(act, w2.q.astype(x.dtype),
                        preferred_element_type=jnp.float32)
                * w2.s).astype(x.dtype)
    w13 = maybe_dequantize(w13, x.dtype)
    w2 = maybe_dequantize(w2, x.dtype)
    y = jnp.einsum("...d,udf->...uf", x, w13,
                   preferred_element_type=jnp.float32)
    act = glu_act(y[..., 0, :], y[..., 1, :], act).astype(x.dtype)
    return jnp.dot(act, w2, preferred_element_type=jnp.float32).astype(x.dtype)


def _qkv_eager(x, wqkv_f, cfg: LlamaConfig, bias=None):
    """x [B?, T, h] → q [.., T, kv, g, hd], k/v [.., T, kv, hd] from the
    head-grouped fused layout [G, h, hg·(g+2)·hd] (no un-transpose: the
    grouped columns are head-major, so a reshape recovers per-head).
    ``bias`` [G, hg·(g+2)·hd]: optional QKV projection bias in the same
    grouped-column layout (Qwen2-family; llama/mistral have none)."""
    g, hd, kv = cfg.n_heads // cfg.kv_heads, cfg.head_dim_, cfg.kv_heads
    wqkv_f = maybe_dequantize(wqkv_f, x.dtype)
    y = jnp.einsum("...td,Gdc->...tGc", x, wqkv_f,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    y = y.reshape(*y.shape[:-2], kv, (g + 2) * hd)
    q = y[..., : g * hd].reshape(*y.shape[:-1], g, hd)
    k = y[..., g * hd:(g + 1) * hd]
    v = y[..., (g + 1) * hd:]
    return q, k, v


def _apply_rope(x, cos, sin, style):
    if style == "neox":
        hd = x.shape[-1]
        return apply_rope_neox(x, cos[..., : hd // 2], sin[..., : hd // 2])
    return apply_rope_gptj(x, cos, sin)


def _prefix_rows(cache_l, pos0: int):
    """First pos0 positions of a per-layer cache slice [kv, S, hd]
    (dequantized for Int8KV)."""
    if isinstance(cache_l, Int8KV):
        H = cache_l.q.shape[0]
        sflat = cache_l.s.reshape(H, -1)[:, :pos0]
        return cache_l.q[:, :pos0].astype(jnp.float32) * sflat[:, :, None]
    return cache_l[:, :pos0]


def _cache_fill(cache, rows, pos0: int):
    """Write [L, kv, T, hd] freshly-computed rows at positions
    pos0..pos0+T-1 (quantizing per row for Int8KV)."""
    from clusterfusion_tpu.ops.quant import cache_fill_rows
    return cache_fill_rows(cache, rows, pos0)


# --------------------------------------------------------------------------
# Prefill.  The reference only ever prefills eagerly with a materialized
# [T, S] score tensor (`model.py:589-603`); here the default path is the
# flash-attention Pallas kernel (ops/flash_prefill.py) with the eager path
# kept as the in-tree oracle (flash=False).  ``pos0`` makes it a *chunked*
# prefill: tokens occupy absolute positions pos0..pos0+T-1 and attend to
# the already-filled cache prefix — a serving capability the reference
# lacks entirely.
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "pos0", "flash"))
def prefill_chunk(params: LlamaParams, k_cache, v_cache, tokens: jnp.ndarray,
                  cfg: LlamaConfig, pos0: int = 0, flash: bool = True):
    """Process tokens [T] at positions pos0..pos0+T-1, filling the caches.

    Requires the first ``pos0`` cache positions to be filled.  Returns
    (logits [T, vocab], k_cache', v_cache')."""
    T = tokens.shape[0]
    kv, g, hd = cfg.kv_heads, cfg.n_heads // cfg.kv_heads, cfg.head_dim_
    cos_t, sin_t = rope_table(cfg, max_pos=max(pos0 + T, cfg.max_seq_len))
    cos, sin = cos_t[pos0:pos0 + T][None], sin_t[pos0:pos0 + T][None]
    h = params["embed"][tokens][None]                      # [1, T, hidden]

    def one_layer(h, p, kc_l, vc_l, win: int):
        xn = rmsnorm_ref(h, p["attn_norm"], cfg.norm_eps)
        q, k, v = _qkv_eager(xn, p["wqkv_f"], cfg, p.get("bqkv_f"))         # q [1,T,kv,g,hd]
        q = _apply_rope(q, cos[..., None, None, :], sin[..., None, None, :],
                        cfg.rope_style)
        k = _apply_rope(k, cos[..., None, :], sin[..., None, :], cfg.rope_style)
        k_new = k[0].transpose(1, 0, 2)                    # [kv, T, hd]
        v_new = v[0].transpose(1, 0, 2)
        if pos0:
            k_ctx = jnp.concatenate(
                [_prefix_rows(kc_l, pos0).astype(h.dtype), k_new], axis=1)
            v_ctx = jnp.concatenate(
                [_prefix_rows(vc_l, pos0).astype(h.dtype), v_new], axis=1)
        else:
            k_ctx, v_ctx = k_new, v_new                    # [kv, S, hd]
        if flash:
            o4 = flash_prefill_attention(q[0].transpose(1, 0, 2, 3),
                                         k_ctx, v_ctx, q_offset=pos0,
                                         window=win,
                                         softcap=cfg.attn_logit_softcap)
            o = o4.transpose(1, 0, 2, 3)[None]             # [1,T,kv,g,hd]
        else:
            # f32 oracle math (also sidesteps CPU XLA's unsupported
            # bf16xbf16->f32 DotThunk for this contraction shape)
            scale = 1.0 / jnp.sqrt(jnp.float32(hd))
            scores = jnp.einsum("btkgd,ksd->bkgts", q.astype(jnp.float32),
                                k_ctx.astype(jnp.float32)) * scale
            if cfg.attn_logit_softcap:
                c = cfg.attn_logit_softcap
                scores = c * jnp.tanh(scores / c)
            qpos = pos0 + jnp.arange(T)[:, None]
            kpos = jnp.arange(pos0 + T)[None, :]
            mask = kpos <= qpos                            # [T, S]
            if win:
                mask &= kpos > qpos - win
            scores = jnp.where(mask[None, None, None], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bkgts,ksd->btkgd", probs,
                           v_ctx.astype(jnp.float32)).astype(h.dtype)
        G = p["wo_f"].shape[0]
        attn = jnp.einsum("btGc,Gco->bto",
                          o.reshape(1, T, G, (kv // G) * g * hd),
                          maybe_dequantize(p["wo_f"], h.dtype),
                          preferred_element_type=jnp.float32
                          ).astype(h.dtype)
        if cfg.sandwich_norms:
            attn = rmsnorm_ref(attn, p["post_attn_norm"], cfg.norm_eps)
        h = h + attn
        xn2 = rmsnorm_ref(h, p["ffn_norm"], cfg.norm_eps)
        f_out = _ffn(xn2, p["w13"], p["w2"], cfg.ffn_act)
        if cfg.sandwich_norms:
            f_out = rmsnorm_ref(f_out, p["post_ffn_norm"], cfg.norm_eps)
        h = h + f_out
        return h, (k_new, v_new)

    if cfg.sliding_window and cfg.window_pattern == "even":
        # gemma-2 interleaved local/global: the flash kernel's window is a
        # compile-time parameter, so scan layer PAIRS — the even (local)
        # layer runs windowed, the odd (global) one full-context
        assert cfg.n_layers % 2 == 0, cfg.n_layers
        L2 = cfg.n_layers // 2

        def pair(carry, xs):
            h = carry
            p2, kc2, vc2 = xs
            kns, vns = [], []
            for i in range(2):
                sel = lambda t: jax.tree.map(lambda a: a[i], t)
                h, (kn, vn) = one_layer(h, sel(p2), sel(kc2), sel(vc2),
                                        cfg.sliding_window if i == 0 else 0)
                kns.append(kn)
                vns.append(vn)
            return h, (jnp.stack(kns), jnp.stack(vns))

        pair_xs = jax.tree.map(
            lambda a: a.reshape(L2, 2, *a.shape[1:]),
            (params["layers"], k_cache, v_cache))
        h, (k_new, v_new) = jax.lax.scan(pair, h, pair_xs)
        k_new = k_new.reshape(cfg.n_layers, *k_new.shape[2:])
        v_new = v_new.reshape(cfg.n_layers, *v_new.shape[2:])
    else:
        h, (k_new, v_new) = jax.lax.scan(
            lambda h, xs: one_layer(h, *xs, cfg.sliding_window),
            h, (params["layers"], k_cache, v_cache))
    k_cache = _cache_fill(k_cache, k_new, pos0)
    v_cache = _cache_fill(v_cache, v_new, pos0)
    xn = rmsnorm_ref(h, params["final_norm"], cfg.norm_eps)
    logits = _lm_logits(xn[0], params["lm_head"])
    if cfg.final_logit_softcap:
        c = cfg.final_logit_softcap
        logits = c * jnp.tanh(logits / c)
    return logits, k_cache, v_cache


def prefill(params: LlamaParams, k_cache, v_cache, tokens: jnp.ndarray,
            cfg: LlamaConfig, flash: bool = True):
    """Process a full prompt from position 0, fill caches.

    tokens: [T] int32.  Returns (logits [T, vocab], k_cache', v_cache').
    The reference's analogue is the eager mask path (`model.py:589-603`)."""
    return prefill_chunk(params, k_cache, v_cache, tokens, cfg, pos0=0,
                         flash=flash)


# --------------------------------------------------------------------------
# Batched training/eval forward (no cache) — differentiable, GSPMD-shardable
# --------------------------------------------------------------------------


def layer_forward(h, p, cos, sin, mask, cfg: LlamaConfig):
    """One decoder layer of the batched training/eval forward.

    h [B, T, hidden]; p: one layer's slice of the ``layers`` pytree;
    cos/sin [1, T, hd]; mask [T, T] causal.  Shared by :func:`forward`
    (full stack via lax.scan) and the pipeline-parallel schedule
    (``parallel.pp``: each pp stage scans its local sub-stack)."""
    B, T = h.shape[0], h.shape[1]
    kv, g, hd = cfg.kv_heads, cfg.n_heads // cfg.kv_heads, cfg.head_dim_
    xn = rmsnorm_ref(h, p["attn_norm"], cfg.norm_eps)
    q, k, v = _qkv_eager(xn, p["wqkv_f"], cfg, p.get("bqkv_f"))         # q [B,T,kv,g,hd]
    q = _apply_rope(q, cos[..., None, None, :], sin[..., None, None, :],
                    cfg.rope_style)
    k = _apply_rope(k, cos[..., None, :], sin[..., None, :], cfg.rope_style)
    scale = 1.0 / jnp.sqrt(jnp.float32(cfg.head_dim_))
    scores = jnp.einsum("btkgd,bskd->bkgts", q, k,
                        preferred_element_type=jnp.float32) * scale
    if cfg.attn_logit_softcap:
        csc = cfg.attn_logit_softcap
        scores = csc * jnp.tanh(scores / csc)
    scores = jnp.where(mask[None, None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
    o = jnp.einsum("bkgts,bskd->btkgd", probs, v,
                   preferred_element_type=jnp.float32).astype(h.dtype)
    G = p["wo_f"].shape[0]
    attn = jnp.einsum("btGc,Gco->bto",
                      o.reshape(B, T, G, (kv // G) * g * hd),
                      maybe_dequantize(p["wo_f"], h.dtype),
                      preferred_element_type=jnp.float32
                      ).astype(h.dtype)
    if cfg.sandwich_norms:
        attn = rmsnorm_ref(attn, p["post_attn_norm"], cfg.norm_eps)
    h2 = h + attn
    xn2 = rmsnorm_ref(h2, p["ffn_norm"], cfg.norm_eps)
    f_out = _ffn(xn2, p["w13"], p["w2"], cfg.ffn_act)
    if cfg.sandwich_norms:
        f_out = rmsnorm_ref(f_out, p["post_ffn_norm"], cfg.norm_eps)
    return h2 + f_out


def forward(params: LlamaParams, tokens: jnp.ndarray, cfg: LlamaConfig):
    """Causal LM forward for training/eval.  tokens: [B, T] int32 →
    logits [B, T, vocab] fp32.  Pure jnp (differentiable; the fused decode
    kernel is inference-only, like the reference's fused path which is
    decode-only, `model.py:490`)."""
    T = tokens.shape[1]
    cos_t, sin_t = rope_table(cfg, max_pos=max(T, cfg.max_seq_len))
    cos, sin = cos_t[:T][None], sin_t[:T][None]            # [1, T, hd]
    h = params["embed"][tokens]                            # [B, T, hidden]
    mask = jnp.tril(jnp.ones((T, T), jnp.bool_))
    mask_w = mask
    if cfg.sliding_window:
        mask_w = mask & jnp.triu(jnp.ones((T, T), jnp.bool_),
                                 k=1 - cfg.sliding_window)

    if cfg.sliding_window and cfg.window_pattern == "even":
        # gemma-2 interleaved local/global: scan layer pairs (even layer
        # windowed, odd layer full-context)
        assert cfg.n_layers % 2 == 0, cfg.n_layers
        lp2 = jax.tree.map(
            lambda a: a.reshape(cfg.n_layers // 2, 2, *a.shape[1:]),
            params["layers"])

        def pairf(h, p2):
            for i, m in enumerate((mask_w, mask)):
                pi = jax.tree.map(lambda a: a[i], p2)
                h = layer_forward(h, pi, cos, sin, m, cfg)
            return h, None

        h, _ = jax.lax.scan(pairf, h, lp2)
    else:
        m = mask_w if cfg.sliding_window else mask
        h, _ = jax.lax.scan(
            lambda h, p: (layer_forward(h, p, cos, sin, m, cfg), None),
            h, params["layers"])
    xn = rmsnorm_ref(h, params["final_norm"], cfg.norm_eps)
    logits = _lm_logits(xn, params["lm_head"])
    if cfg.final_logit_softcap:
        c = cfg.final_logit_softcap
        logits = c * jnp.tanh(logits / c)
    return logits


# --------------------------------------------------------------------------
# Decode step — fused megakernel path and eager baseline path
# --------------------------------------------------------------------------


def _cache_append(cache, rows, l, pos):
    """Append [kv, 1, hd] new rows at (layer l, position pos) — plain dtype
    cast for bf16/fp8 caches, row quantization + scale-plane write for
    :class:`Int8KV` (the eager oracle of the in-kernel quantized append)."""
    if isinstance(cache, Int8KV):
        q8, s = quantize_kv_rows(rows)               # [kv,1,hd], [kv,1]
        H = q8.shape[0]
        qc = jax.lax.dynamic_update_slice(cache.q, q8[None], (l, 0, pos, 0))
        sc = jax.lax.dynamic_update_slice(
            cache.s, s.reshape(1, H, 1, 1).astype(cache.s.dtype),
            (l, 0, pos // 128, pos - (pos // 128) * 128))
        return Int8KV(qc, sc)
    return jax.lax.dynamic_update_slice(
        cache, rows[None].astype(cache.dtype), (l, 0, pos, 0))


def _cache_layer(cache, l):
    """Layer l of a cache, dequantized to f32-compatible values:
    [kv, cap, hd]."""
    if isinstance(cache, Int8KV):
        ql = jax.lax.dynamic_index_in_dim(cache.q, l, 0, keepdims=False)
        sl = jax.lax.dynamic_index_in_dim(cache.s, l, 0, keepdims=False)
        H, cap, _ = ql.shape
        sflat = sl.reshape(H, -1)[:, :cap]           # [kv, cap]
        return ql.astype(jnp.float32) * sflat[:, :, None]
    return jax.lax.dynamic_index_in_dim(cache, l, 0, keepdims=False)


def _decode_step_impl(params: LlamaParams, k_cache, v_cache,
                      token: jnp.ndarray, pos: jnp.ndarray, cfg: LlamaConfig,
                      kcfg: KernelConfig = KernelConfig(), fused: bool = True):
    """One autoregressive decode step at position ``pos`` (``pos`` tokens
    already cached).  token: [] int32.  Returns (logits [vocab], k_cache',
    v_cache').

    fused=True  → megakernel per layer (the `USE_CLUSTER_FUSION=true` path,
                  `model.py:353-374`);
    fused=False → eager XLA baseline (the fairscale/flashinfer path,
                  `model.py:376-404`)."""
    g = cfg.n_heads // cfg.kv_heads
    hd = cfg.head_dim_
    cos_t, sin_t = rope_table(cfg)
    cos = jax.lax.dynamic_slice(cos_t, (pos, 0), (1, hd))   # [1, hd]
    sin = jax.lax.dynamic_slice(sin_t, (pos, 0), (1, hd))

    x = params["embed"][token][None]                        # [1, hidden]
    residual = jnp.zeros_like(x)

    # Caches ride the scan carry as the full stacked [L, kv, cap, hd]
    # arrays; the megakernel picks its layer via a prefetched scalar and the
    # append is a dynamic_update_slice on the carry (in-place under XLA).

    # The fused path scans over layer INDICES only; the whole [L, ...]
    # weight stacks enter each kernel and the layer is picked inside the
    # BlockSpec index maps.  Scanning the weights as xs would dynamic-slice
    # the stack per layer, and a pallas operand (unlike a fused einsum)
    # needs a real buffer — XLA materializes a full copy of every layer's
    # weights per call (~410 MB/layer at 7B; measured 3x decode slowdown).
    # The same applies to the caches: the kernel appends the new K/V in
    # place via an input_output_aliased DMA instead of an XLA-level
    # dynamic_update_slice (~1 GB copy/layer otherwise).
    lw = params["layers"]

    def eager_layer(carry, xs):
        x, residual, kc, vc = carry
        p, l = xs
        xn, residual = fused_add_rmsnorm_ref(x, residual, p["attn_norm"],
                                             cfg.norm_eps)
        q, k, v = _qkv_eager(xn[None], p["wqkv_f"], cfg, p.get("bqkv_f"))    # q [1,1,kv,g,hd]
        q = _apply_rope(q, cos[0], sin[0], cfg.rope_style)
        k = _apply_rope(k, cos[0], sin[0], cfg.rope_style)
        kc = _cache_append(kc, k[0].transpose(1, 0, 2), l, pos)
        vc = _cache_append(vc, v[0].transpose(1, 0, 2), l, pos)
        kl = _cache_layer(kc, l)
        vl = _cache_layer(vc, l)
        scale = 1.0 / jnp.sqrt(jnp.float32(hd))
        scores = jnp.einsum("kgd,ksd->kgs", q[0, 0], kl,
                            preferred_element_type=jnp.float32) * scale
        if cfg.attn_logit_softcap:
            c = cfg.attn_logit_softcap
            scores = c * jnp.tanh(scores / c)
        valid = jnp.arange(kl.shape[1])[None, None] <= pos
        if cfg.sliding_window:
            # Mistral semantics: position `pos` attends >= pos+1-window
            # only; pattern "even" (gemma-2): odd layers stay full-context
            wlo = pos + 1 - cfg.sliding_window
            if cfg.window_pattern == "even":
                wlo = jnp.where(l % 2 == 0, wlo, 0)
            valid &= jnp.arange(kl.shape[1])[None, None] >= wlo
        scores = jnp.where(valid, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("kgs,ksd->kgd", probs, vl,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        G = p["wo_f"].shape[0]
        attn = jnp.einsum("Gc,Gco->o",
                          o.reshape(G, (cfg.kv_heads // G) * g * hd),
                          maybe_dequantize(p["wo_f"], x.dtype),
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)[None]
        if cfg.sandwich_norms:
            attn = rmsnorm_ref(attn, p["post_attn_norm"], cfg.norm_eps)
        xn2, residual = fused_add_rmsnorm_ref(attn, residual, p["ffn_norm"],
                                              cfg.norm_eps)
        x = _ffn(xn2, p["w13"], p["w2"], cfg.ffn_act)
        if cfg.sandwich_norms:
            x = rmsnorm_ref(x, p["post_ffn_norm"], cfg.norm_eps)
        return (x, residual, kc, vc), None

    if fused:
        from clusterfusion_tpu.ops.stack_kernel import _vocab_block
        if _vocab_block(cfg.vocab_size) > 0:
            # final norm + LM head ride the same kernel: logits in ONE
            # pallas call per token
            logits, _, k_cache, v_cache = fused_decoder_stack(
                x, lw["attn_norm"], lw["ffn_norm"], cos, sin,
                lw["wqkv_f"], lw["wo_f"], lw["w13"], lw["w2"],
                k_cache, v_cache, pos, group=g, head_dim=hd,
                rope_style=cfg.rope_style, eps=cfg.norm_eps, kcfg=kcfg,
                interpret=interpret_mode(), window=cfg.sliding_window,
                bias_qkv=lw.get("bqkv_f"), ffn_act=cfg.ffn_act,
                softcap=cfg.attn_logit_softcap,
                window_pattern=cfg.window_pattern,
                post_attn_norm=lw.get("post_attn_norm"),
                post_ffn_norm=lw.get("post_ffn_norm"),
                final_norm=params["final_norm"], lm_head=params["lm_head"])
            lg = logits[0]
            if cfg.final_logit_softcap:
                c = cfg.final_logit_softcap
                lg = c * jnp.tanh(lg / c)
            return lg, k_cache, v_cache
        x, residual, k_cache, v_cache = fused_decoder_stack(
            x, lw["attn_norm"], lw["ffn_norm"], cos, sin,
            lw["wqkv_f"], lw["wo_f"], lw["w13"], lw["w2"],
            k_cache, v_cache, pos, group=g, head_dim=hd,
            rope_style=cfg.rope_style, eps=cfg.norm_eps, kcfg=kcfg,
            interpret=interpret_mode(), window=cfg.sliding_window,
            bias_qkv=lw.get("bqkv_f"), ffn_act=cfg.ffn_act,
            softcap=cfg.attn_logit_softcap,
            window_pattern=cfg.window_pattern,
            post_attn_norm=lw.get("post_attn_norm"),
            post_ffn_norm=lw.get("post_ffn_norm"))
        x = x.astype(params["embed"].dtype)
        residual = residual.astype(x.dtype)
    else:
        layer_idx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        (x, residual, k_cache, v_cache), _ = jax.lax.scan(
            eager_layer, (x, residual, k_cache, v_cache),
            (params["layers"], layer_idx))

    xn, _ = fused_add_rmsnorm_ref(x, residual, params["final_norm"], cfg.norm_eps)
    lm = params["lm_head"]
    if fused and cfg.vocab_size % 128 == 0 and not isinstance(lm, QuantizedTensor):
        logits = gemv(xn.astype(jnp.bfloat16), lm,
                      interpret=interpret_mode())[0]
    else:
        logits = _lm_logits(xn[0], lm)
    if cfg.final_logit_softcap:
        c = cfg.final_logit_softcap
        logits = c * jnp.tanh(logits / c)
    return logits, k_cache, v_cache


# Test/parity variant: inputs preserved (caches copied on update).
decode_step = jax.jit(_decode_step_impl,
                      static_argnames=("cfg", "kcfg", "fused"))


def _decode_loop_impl(params, k_cache, v_cache, first_token, start_pos,
                      cfg: LlamaConfig, kcfg: KernelConfig = KernelConfig(),
                      fused: bool = True, n_steps: int = 32):
    """Greedy-decode ``n_steps`` tokens entirely on device (one dispatch).

    Returns (tokens [n_steps] — the inputs' successors, k_cache', v_cache').
    The host-side streaming loop lives in models.generation; this is the
    throughput path (and the honest benchmark: no host round-trip per
    token)."""
    def body(carry, _):
        tok, pos, kc, vc = carry
        logits, kc, vc = _decode_step_impl(params, kc, vc, tok, pos, cfg,
                                           kcfg, fused)
        nxt = jnp.argmax(logits).astype(jnp.int32)
        return (nxt, pos + 1, kc, vc), nxt

    (_, _, k_cache, v_cache), toks = jax.lax.scan(
        body, (first_token, start_pos, k_cache, v_cache), None,
        length=n_steps)
    return toks, k_cache, v_cache


decode_loop = jax.jit(_decode_loop_impl,
                      static_argnames=("cfg", "kcfg", "fused", "n_steps"),
                      donate_argnums=(1, 2))

# Engine variant: donates the caches so the per-layer appends are truly
# in-place (no full-cache copy per token — 0.5 GB/token at 7B otherwise).
decode_step_donated = jax.jit(_decode_step_impl,
                              static_argnames=("cfg", "kcfg", "fused"),
                              donate_argnums=(1, 2))
