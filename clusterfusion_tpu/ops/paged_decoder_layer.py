"""Batched decode with paged KV cache — fused Pallas megakernel.

TPU twin of `LlamaDecoderLayerBatchDecodeWithPagedKVCacheKernel`
(`include/H100/llama/kernel_batch_sglang.cuh:43-663` + dispatch
`llama_kernel_batch_sglang_dispatch.cu`).  Platform mapping:

- The reference gathers token-granular KV pages with predicated 128-bit
  `cp.async` loads through `paged_kv_indices` (`:11-41,356-433`); here the
  gather happens in the *BlockSpec index maps*: the block table is a
  scalar-prefetch operand and each grid step's KV block index is looked up
  from it, so Pallas's pipelining double-buffers the scattered pages like
  any other stream (SURVEY.md §7 "paged gather" hard part).
- The per-layer device-pointer table (`k_cache_ptrs[layer_id]`,
  `:118-119`) becomes a layer-stacked pool array indexed by a prefetched
  ``layer_id`` scalar.
- In-place stream-ordered outputs (`llama_kernel_batch_sglang_dispatch.cu:
  29,92-110`) become functional outputs; donate the pool under jit for
  in-place behavior.
- The TPU-native entry (``llama_decoder_layer_paged``) uses vLLM-style
  fixed-width block tables with page_size ≥ 1 tokens so each page is one
  contiguous DMA; the reference-parity entry
  (``llama_decoder_layer_batch_decode_sglang``) keeps the sglang
  indptr/indices, page-size-1 calling convention (`:341`) and converts.

Grid: (head_groups, batch, page_windows) — group outermost so each weight
block streams from HBM once per call.  Step (g, 0, 0) runs the batched
M=B QKV projection; step (g, b, c) walks request b's page window c with
the online-softmax state in scratch; the last walk step folds the current
token, and (g, B-1, last) runs the batched M=B O-projection.  Per-request
page counts are dynamic: index maps clamp to the last needed page (no DMA
for skipped steps) and masked compute skips them.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clusterfusion_tpu.config import KernelConfig
from clusterfusion_tpu.ops._support import cdiv, interpret_mode, round_up
from clusterfusion_tpu.ops.decoder_layer import (_dequant_int4_tile,
                                                 _kv_tile, _m2,
                                                 _pick_head_group, _rope_vec)
from clusterfusion_tpu.ops.quant import QuantizedTensor

_LOG2E = 1.4426950408889634
_NEG_INF = -1e30


def _paged_kernel(
    # scalar prefetch
    meta_ref,        # [1]: layer_id
    lens_ref,        # [B] cached-token counts (excluding current)
    pos_ref,         # [B] rope positions
    table_ref,       # [B, max_pages] pool page ids
    # inputs: x, res, rmsw, cos, sin, wqkv[, wqkv_s], wo[, wo_s], k, v
    x_ref, res_ref, rmsw_ref, cos_ref, sin_ref,
    *refs,
    hg: int,
    group: int,
    head_dim: int,
    page: int,
    npp: int,
    rope_style: str,
    eps: float,
    wq_kind: str = "none",
    gs_q: int = 0,
    append: bool = False,
    gather: bool = True,
    with_bias: bool = False,
    softcap: float = 0.0,  # attn logit softcap, pre-multiplied by log2(e)
    window_pattern: str = "all",  # "even": gemma-2 interleaved local/global
    window: int = 0,      # sliding-window attention (Mistral semantics):
                          # the query at position seq attends positions
                          # >= seq+1-window only; 0 = full context.
                          # Below-window page windows are never gathered.
):
    it = iter(refs)
    wqkv_ref = next(it)
    wqkv_s_ref = next(it) if wq_kind != "none" else None
    bqkv_ref = next(it) if with_bias else None
    wo_ref = next(it)
    wo_s_ref = next(it) if wq_kind != "none" else None
    k_any_ref, v_any_ref = next(it), next(it)
    out_ref, res_out_ref, knew_ref, vnew_ref = (next(it) for _ in range(4))
    if append:
        kp_out_ref, vp_out_ref = next(it), next(it)
    xnorm_s, qkv_s, q_s, acc_s, o_all_s, out_s, ml_s, kv_s = \
        (next(it) for _ in range(8))
    if gather:
        kwin_s, vwin_s, win_sem = (next(it) for _ in range(3))
    if append:
        krow_s, vrow_s, row_sem = (next(it) for _ in range(3))
    # grid (G, B, C): the head-group axis is OUTERMOST so each weight block
    # streams from HBM exactly once per kernel call and stays VMEM-resident
    # while every request's page walk runs under it — the round-4 grid
    # (B, G, C) re-fetched the weights per request, which is why the fused
    # step lost ~2.8x to the batched-matmul step at B=8 (weights dominate
    # the decode byte stream).  The projections are likewise batched M=B
    # dots; only the page walk (grid dim 1) stays per-request.
    # grid dim 2 is the page-window walk, ONE step per window: step c does
    # chunk c's softmax; step 0 additionally runs projection+rope (the
    # chunk-0 gather flies over that VPU/MXU work) and the last step folds
    # the current token + O-projection.  The former (n_steps+2)-phase
    # layout paid ~1.5 us of grid-step fixed cost per extra phase per
    # (g, b) — at B=8, G=8, 32 layers that was ~40% of the whole step.
    g_id = pl.program_id(0)
    b_id = pl.program_id(1)
    c_id = pl.program_id(2)
    n_steps = pl.num_programs(2)
    B = pl.num_programs(1)
    seq = lens_ref[b_id]
    hd = head_dim
    rows = hg * group
    chunk = npp * page
    f32 = jnp.float32
    l = meta_ref[0]
    last_pg = jnp.maximum(pl.cdiv(seq, page) - 1, 0)

    def window_copies(w, buf):
        """Gather window w's npp pages (this group's head slice) — the
        reference's predicated page gather (`kernel_batch_sglang.cuh:
        356-433`) as double-buffered per-page DMAs off the prefetched
        block table."""
        hsl = pl.ds(g_id * hg, hg)
        out = []
        for i in range(npp):
            j = jnp.minimum(w * npp + i, last_pg)
            pg = table_ref[b_id, j]
            cols = pl.ds(i * page, page)
            out.append(pltpu.make_async_copy(
                k_any_ref.at[l, pg, hsl], kwin_s.at[buf, :, cols],
                win_sem.at[buf, 0, i]))
            out.append(pltpu.make_async_copy(
                v_any_ref.at[l, pg, hsl], vwin_s.at[buf, :, cols],
                win_sem.at[buf, 1, i]))
        return out

    # ---- once per group (b==0, c==0): batched norm + M=B QKV projection -----
    @pl.when(jnp.logical_and(b_id == 0, c_id == 0))
    def _():
        @pl.when(g_id == 0)
        def _():
            # once per kernel call: batched residual add + RMSNorm for the
            # whole batch, and zero the batched O-projection accumulator
            x = x_ref[...].astype(f32) + res_ref[...].astype(f32)  # [B, h]
            res_out_ref[...] = x.astype(res_out_ref.dtype)
            var = jnp.mean(x * x, axis=-1, keepdims=True)
            xnorm_s[...] = x * jax.lax.rsqrt(var + eps) \
                * rmsw_ref[...].astype(f32)
            out_s[...] = jnp.zeros_like(out_s)
        # one M=B MXU dot against this group's VMEM-resident weight block
        xn = xnorm_s[...].astype(jnp.bfloat16)                     # [B, h]
        if wq_kind == "none":
            qkv = jnp.dot(xn, _m2(wqkv_ref), preferred_element_type=f32)
        elif wq_kind == "int8":
            qkv = jnp.dot(xn, _m2(wqkv_ref).astype(jnp.bfloat16),
                          preferred_element_type=f32) * _m2(wqkv_s_ref)
        else:
            wb = _dequant_int4_tile(_m2(wqkv_ref), _m2(wqkv_s_ref), gs_q)
            qkv = jnp.dot(xn, wb, preferred_element_type=f32)
        if with_bias:
            # Qwen2-family QKV bias, added pre-rope (part of the linear)
            qkv = qkv + _m2(bqkv_ref).astype(f32)
        qkv_s[...] = qkv                                   # [B, qkv_cols]

    # ---- per (group, request): RoPE + new-KV off the batched projection ----
    @pl.when(c_id == 0)
    def _():
        # kick off window 0's page gather before the rope work so the
        # first KV chunk flies while the VPU works
        if gather:
            @pl.when(seq > 0)
            def _():
                if window:
                    # kick off the FIRST IN-WINDOW chunk's gather (buffer
                    # parity keyed to the chunk ordinal, matching the
                    # compute loop's rem(c, 2)); pattern "even": odd
                    # (global) layers start at chunk 0
                    w0 = jnp.maximum(seq + 1 - window, 0) // chunk
                    if window_pattern == "even":
                        w0 = jnp.where(l % 2 == 0, w0, 0)
                    for cp in window_copies(w0, jax.lax.rem(w0, 2)):
                        cp.start()
                else:
                    for cp in window_copies(0, 0):
                        cp.start()
        if append:
            # kick the append-RMW window READ now; it lands by the last
            # step's modify+write (overlapped with the whole page walk)
            rmw = min(8, page)
            pg_a = table_ref[b_id, seq // page]
            off_a = seq - (seq // page) * page
            row8 = (off_a // rmw) * rmw
            hsl = pl.ds(g_id * hg, hg)
            pltpu.make_async_copy(
                kp_out_ref.at[l, pg_a, hsl, pl.ds(row8, rmw)], krow_s,
                row_sem.at[0]).start()
            pltpu.make_async_copy(
                vp_out_ref.at[l, pg_a, hsl, pl.ds(row8, rmw)], vrow_s,
                row_sem.at[1]).start()
        qkv = qkv_s[pl.ds(b_id, 1), :]                     # [1, qkv_cols]
        cos_f = cos_ref[0].astype(f32)
        sin_f = sin_ref[0].astype(f32)
        scale = (1.0 / math.sqrt(hd)) * _LOG2E
        for h in range(hg):
            base = h * (group + 2) * hd
            k = _rope_vec(qkv[:, base + group * hd: base + (group + 1) * hd],
                          cos_f, sin_f, rope_style)
            v = qkv[:, base + (group + 1) * hd: base + (group + 2) * hd]
            knew_ref[0, 0, h:h + 1, :] = k.astype(knew_ref.dtype)
            vnew_ref[0, 0, h:h + 1, :] = v.astype(vnew_ref.dtype)
            kv_s[h:h + 1, :] = k
            kv_s[hg + h:hg + h + 1, :] = v
            for i in range(group):
                qi = _rope_vec(qkv[:, base + i * hd: base + (i + 1) * hd],
                               cos_f, sin_f, rope_style)
                q_s[h * group + i: h * group + i + 1, :] = qi * scale
        acc_s[...] = jnp.zeros_like(acc_s)
        ml_s[0, :] = jnp.full((rows,), _NEG_INF, f32)
        ml_s[1, :] = jnp.zeros((rows,), f32)

    # ---- page-window walk: online softmax, one window per grid step ---------
    c = c_id
    chunk_live = c * chunk < seq
    if window:
        # chunks entirely below the window are skipped: no gather DMA was
        # started for them (see the w0 kick-off) and no compute runs.
        # Pattern "even": odd (global) layers walk the full context.
        wlo = seq + 1 - window
        if window_pattern == "even":
            wlo = jnp.where(l % 2 == 0, wlo, 0)
        chunk_live = jnp.logical_and(chunk_live, (c + 1) * chunk > wlo)
    @pl.when(chunk_live)
    def _():
        if gather:
            buf = jax.lax.rem(c, 2)
            for cp in window_copies(c, buf):
                cp.wait()
            # prefetch the next window into the other buffer while computing
            @pl.when(jnp.logical_and(c_id < n_steps - 1,
                                     (c + 1) * chunk < seq))
            def _():
                for cp in window_copies(c + 1, 1 - buf):
                    cp.start()
        pos_base = c * chunk
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        row_valid = (pos_base + row_iota) < seq
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (group, chunk), 1)
        col_valid = (pos_base + col_iota) < seq
        if window:
            # positions below seq+1-window inside the first in-window
            # chunk mask out (the current token at `seq` is handled by
            # the final step and is always in-window)
            col_valid = jnp.logical_and(
                col_valid, (pos_base + col_iota) >= wlo)
        for h in range(hg):
            q = q_s[h * group:(h + 1) * group, :].astype(jnp.bfloat16)
            # fp8 pools decode via the bit-twiddle re-bias (see ops.quant);
            # the 2**56 fixup rides the scores / pv products
            if gather:
                kc, kfix = _kv_tile(kwin_s[buf, h])       # [chunk, hd]
                vcr, vfix = _kv_tile(vwin_s[buf, h])
            else:
                # page % 8 != 0 (sglang page-1 parity op): Mosaic cannot
                # DMA-slice the sub-tile page axis, so pages arrive as
                # BlockSpec blocks, one per step
                kc, kfix = _kv_tile(k_any_ref[0, 0, h])
                vcr, vfix = _kv_tile(v_any_ref[0, 0, h])
            vc = jnp.where(row_valid, vcr, 0)
            scores = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())), preferred_element_type=f32)
            if kfix != 1.0:
                scores = scores * kfix
            if softcap:
                # gemma-2 softcap (exp2 domain: cap pre-scaled by log2e)
                scores = softcap * jnp.tanh(scores * (1.0 / softcap))
            scores = jnp.where(col_valid, scores, _NEG_INF)

            m_old = ml_s[0, h * group:(h + 1) * group].reshape(group, 1)
            l_old = ml_s[1, h * group:(h + 1) * group].reshape(group, 1)
            m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp2(m_old - m_new)
            p = jnp.exp2(scores - m_new) * col_valid.astype(f32)
            pv = jnp.dot(p.astype(jnp.bfloat16), vc, preferred_element_type=f32)
            if vfix != 1.0:
                pv = pv * vfix
            acc_s[h * group:(h + 1) * group, :] = \
                acc_s[h * group:(h + 1) * group, :] * alpha + pv
            ml_s[0, h * group:(h + 1) * group] = m_new[:, 0]
            ml_s[1, h * group:(h + 1) * group] = \
                (l_old * alpha + jnp.sum(p, axis=-1, keepdims=True))[:, 0]

    # ---- last walk step: current token + O-proj (+ in-kernel append) --------
    @pl.when(c_id == n_steps - 1)
    def _():
        if append:
            # finish the append RMW started at step 0: wait the window
            # read (long landed — it overlapped the whole page walk),
            # set row seq%page of this group's head slice, write back.
            # An XLA scatter next to a pallas pool operand would
            # materialize a full pool copy per layer (measured 116.7 vs
            # 14.4 ms/step).  The RMW window is 8 sublanes, or the whole
            # page when page < 8 (the sglang parity entry runs
            # page-size-1 pools).
            rmw = min(8, page)
            pg = table_ref[b_id, seq // page]
            off = seq - (seq // page) * page
            row8 = (off // rmw) * rmw
            hsl = pl.ds(g_id * hg, hg)
            ksl = kp_out_ref.at[l, pg, hsl, pl.ds(row8, rmw)]
            vsl = vp_out_ref.at[l, pg, hsl, pl.ds(row8, rmw)]
            pltpu.make_async_copy(ksl, krow_s, row_sem.at[0]).wait()
            pltpu.make_async_copy(vsl, vrow_s, row_sem.at[1]).wait()
            sub = jax.lax.broadcasted_iota(jnp.int32, (hg, rmw, hd), 1)
            sel = sub == off - row8
            krow_s[...] = jnp.where(
                sel, kv_s[:hg, :].astype(krow_s.dtype)[:, None, :], krow_s[...])
            vrow_s[...] = jnp.where(
                sel, kv_s[hg:, :].astype(vrow_s.dtype)[:, None, :], vrow_s[...])
            k_out = pltpu.make_async_copy(krow_s, ksl, row_sem.at[0])
            v_out = pltpu.make_async_copy(vrow_s, vsl, row_sem.at[1])
            k_out.start()
            v_out.start()
            k_out.wait()
            v_out.wait()
        q = q_s[...]
        k_cur = kv_s[:hg, :]
        v_cur = kv_s[hg:, :]
        if group == 1:
            k_rows, v_rows = k_cur, v_cur
        else:
            k_rows = jnp.concatenate(
                [pltpu.repeat(k_cur[h:h + 1, :], group, axis=0)
                 for h in range(hg)], axis=0)
            v_rows = jnp.concatenate(
                [pltpu.repeat(v_cur[h:h + 1, :], group, axis=0)
                 for h in range(hg)], axis=0)
        s_cur = jnp.sum(q * k_rows, axis=-1, keepdims=True)
        if softcap:
            s_cur = softcap * jnp.tanh(s_cur * (1.0 / softcap))
        m_old = ml_s[0, :].reshape(rows, 1)
        l_old = ml_s[1, :].reshape(rows, 1)
        m_f = jnp.maximum(m_old, s_cur)
        alpha = jnp.exp2(m_old - m_f)
        p_cur = jnp.exp2(s_cur - m_f)
        acc = acc_s[...] * alpha + p_cur * v_rows
        l_f = l_old * alpha + p_cur
        # bf16-round first (numerics identical to the old per-request dot),
        # then widen to the f32 scratch dtype — exact for bf16 values
        o = (acc / l_f).astype(jnp.bfloat16)
        if hd % 128 == 0:
            o_all_s[pl.ds(b_id, 1), :] = \
                o.reshape(1, rows * hd).astype(jnp.float32)
        else:
            # hd=64: Mosaic rejects the [rows, 64] -> [1, rows*64] lane
            # collapse — the scratch is [rows*B, hd] in row-major-by-r
            # layout so the batched O-proj below can slice [B, hd] blocks
            for r in range(rows):
                o_all_s[pl.ds(r * B + b_id, 1), :] = \
                    o[r:r + 1].astype(jnp.float32)

        # last request of this group: ONE M=B O-projection against the
        # resident weight block, accumulated across groups
        @pl.when(b_id == B - 1)
        def _():
            if wq_kind == "none":
                wv = _m2(wo_ref)
            elif wq_kind == "int8":
                wv = _m2(wo_ref).astype(jnp.bfloat16)
            else:
                wv = _dequant_int4_tile(_m2(wo_ref), _m2(wo_s_ref), gs_q)
            if hd % 128 == 0:
                o_all = o_all_s[...].astype(jnp.bfloat16)  # [B, rows*hd]
                part = jnp.dot(o_all, wv, preferred_element_type=f32)
            else:
                # per-row [B, hd] x [hd, hidden] dots, summed over r
                part = None
                for r in range(rows):
                    ob = o_all_s[r * B:(r + 1) * B, :].astype(jnp.bfloat16)
                    pr = jnp.dot(ob, wv[r * hd:(r + 1) * hd],
                                 preferred_element_type=f32)
                    part = pr if part is None else part + pr
            if wq_kind == "int8":
                part = part * _m2(wo_s_ref)
            out_s[...] += part

            @pl.when(g_id == pl.num_programs(0) - 1)
            def _():
                out_ref[...] = out_s[...].astype(out_ref.dtype)


def llama_decoder_layer_paged(
    input: jnp.ndarray,        # [B, hidden]
    residual: jnp.ndarray,     # [B, hidden]
    wqkv_g: jnp.ndarray,       # [G, hidden, hg·(g+2)·hd]
    wo_g: jnp.ndarray,         # [G, hg·g·hd, hidden]
    block_table: jnp.ndarray,  # [B, max_pages] int32 pool page ids
    seq_lens: jnp.ndarray,     # [B] int32 cached tokens (excl. current)
    positions: jnp.ndarray,    # [B] int32 rope positions
    k_pool: jnp.ndarray,       # [L, n_pages, kv_heads, page, hd]
    v_pool: jnp.ndarray,
    layer_id,
    rms_w: jnp.ndarray,        # [1, hidden]
    eps: float,
    cos_t: jnp.ndarray,        # [max_pos, hd] full-dim cos table
    sin_t: jnp.ndarray,        # [max_pos, hd]
    *,
    group: int = 1,
    rope_style: str = "neox",
    kcfg: KernelConfig = KernelConfig(),
    update_pool: bool = True,
    interpret=None,
    bias_qkv=None,
    window: int = 0,
    softcap: float = 0.0,
    window_pattern: str = "all",
):
    """TPU-native paged batch-decode fused layer.

    Returns (output [B, hidden], residual_out [B, hidden],
    k_pool', v_pool') — pools updated IN-KERNEL with the new token's K/V at
    ``block_table[b, seq_lens[b] // page], seq_lens[b] % page`` through
    input_output_aliased pool outputs (donate the pools under jit; an XLA
    scatter next to a pallas pool operand would copy the pool per layer).
    KV pages are gathered by explicit double-buffered per-page DMAs into
    ~``kcfg.kv_chunk``-row windows (see :func:`paged_attention`).  If
    ``update_pool`` is False, returns (output, residual_out,
    k_new [B, kv, hd], v_new [B, kv, hd]) instead.
    """
    if interpret is None:
        interpret = interpret_mode()
    B, hidden = input.shape
    # weight-only quantized weights: dequant fused in-kernel as in
    # ops.decoder_layer (INT8 scale-after-dot, INT4 tile dequant)
    wq_kind, gs_q = "none", 0
    wqkv_s = wo_s = None
    if isinstance(wqkv_g, QuantizedTensor):
        assert isinstance(wo_g, QuantizedTensor) and wo_g.kind == wqkv_g.kind
        wq_kind, gs_q = wqkv_g.kind, wqkv_g.group_size
        sdt = jnp.bfloat16 if wqkv_g.kind == "int4" else jnp.float32
        wqkv_s = wqkv_g.s.astype(sdt)
        wo_s = wo_g.s.astype(sdt)
        wshape = wqkv_g.shape
        wqkv_g, wo_g = wqkv_g.q, wo_g.q
    else:
        wshape = wqkv_g.shape
    # stacked mode: [L, G, hidden, cols] weight stacks, layer picked by the
    # prefetched meta scalar in the index maps (slicing the stack at the XLA
    # level would copy the layer's weights per call — see ops.stack_kernel)
    stacked = len(wshape) == 4
    G, _, qkv_cols = wshape[-3:]
    L, n_pages, kv_heads, page, hd = k_pool.shape
    hg = kv_heads // G
    assert qkv_cols == hg * (group + 2) * hd
    max_pages = block_table.shape[1]
    # page % 8 != 0 (the page-1 sglang parity op): Mosaic cannot DMA-slice
    # the sub-tile page axis, so the kernel falls back to BlockSpec page
    # reads (one page per grid step) and the append to an XLA scatter
    # the explicit page-gather DMAs slice the pool's head (minor) dim,
    # which must align to the (8,128) tiling: sub-128 head dims fall back
    # to BlockSpec page reads (one page per step) + the XLA scatter append,
    # like the page%8!=0 sglang parity case
    gather = page % 8 == 0 and hd % 128 == 0
    # npp capped at 64: each window page is one DMA + one semaphore slot
    npp = max(1, min(max_pages, kcfg.kv_chunk // page, 64)) if gather else 1
    chunk = npp * page
    n_steps = cdiv(max_pages, npp)
    dt = input.dtype
    pack = 2 if wq_kind == "int4" else 1
    wo_rows = hg * group * hd

    meta = jnp.asarray([layer_id], jnp.int32) if not hasattr(layer_id, "dtype") \
        else jnp.asarray(layer_id, jnp.int32).reshape(1)
    lens = seq_lens.astype(jnp.int32)
    poss = positions.astype(jnp.int32)
    table = block_table.astype(jnp.int32)

    def rope_index_map(g, b, c, meta_s, lens_s, pos_s, table_s):
        return (pos_s[b], 0, 0)

    def wspec(rows, cols):
        """Weight BlockSpec: [L, G, rows, cols] stacked or [G, rows, cols].
        Index constant in (b, c) — with the group axis outermost the block
        streams from HBM once per kernel call."""
        if stacked:
            return pl.BlockSpec((1, 1, rows, cols),
                                lambda g, b, c, *s: (s[0][0], g, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, rows, cols), lambda g, b, c, *s: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        # whole-batch activations: one resident [B, hidden] block
        pl.BlockSpec((B, hidden), lambda g, b, c, *s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, hidden), lambda g, b, c, *s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda g, b, c, *s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hd), rope_index_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hd), rope_index_map, memory_space=pltpu.VMEM),
        wspec(hidden // pack, qkv_cols),
    ]
    inputs = [input, residual, rms_w,
              cos_t[:, None, :], sin_t[:, None, :], wqkv_g]
    if wq_kind != "none":
        in_specs.append(wspec(wqkv_s.shape[-2], qkv_cols))
        inputs.append(wqkv_s)
    if bias_qkv is not None:
        # [L, G, cols] stacked / [G, cols] single-layer (Qwen2 QKV bias)
        if stacked:
            in_specs.append(pl.BlockSpec(
                (1, 1, qkv_cols), lambda g, b, c, *s: (s[0][0], g, 0),
                memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                (1, qkv_cols), lambda g, b, c, *s: (g, 0),
                memory_space=pltpu.VMEM))
        inputs.append(bias_qkv)
    in_specs.append(wspec(wo_rows // pack, hidden))
    inputs.append(wo_g)
    if wq_kind != "none":
        in_specs.append(wspec(wo_s.shape[-2], hidden))
        inputs.append(wo_s)
    def kv_index_map(g, b, c, meta_s, lens_s, pos_s, table_s):
        last = jnp.maximum(pl.cdiv(lens_s[b], page) - 1, 0)
        j = jnp.minimum(c, last)
        if window:
            # below-window pages alias the first in-window page (their
            # fetch is elided; the kernel body skips their compute);
            # pattern "even": odd (global) layers keep the full walk
            first = jnp.maximum(lens_s[b] + 1 - window, 0) // page
            if window_pattern == "even":
                first = jnp.where(meta_s[0] % 2 == 0, first, 0)
            j = jnp.maximum(j, jnp.minimum(first, last))
        pg = table_s[b, j]
        return (meta_s[0], pg, g, 0, 0)

    if gather:
        # pools stay in HBM; the kernel gathers its own page windows
        kv_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        kv_spec = pl.BlockSpec((1, 1, hg, page, hd), kv_index_map,
                               memory_space=pltpu.VMEM)
    in_specs += [kv_spec, kv_spec]
    # alias indices include the 4 scalar-prefetch operands
    k_alias_idx = 4 + len(inputs)
    inputs += [k_pool, v_pool]

    out_specs = [
        pl.BlockSpec((B, hidden), lambda g, b, c, *s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, hidden), lambda g, b, c, *s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hg, hd), lambda g, b, c, *s: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hg, hd), lambda g, b, c, *s: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, hidden), dt),
        jax.ShapeDtypeStruct((B, hidden), dt),
        jax.ShapeDtypeStruct((B, G, hg, hd), dt),
        jax.ShapeDtypeStruct((B, G, hg, hd), dt),
    ]
    aliases = {}
    in_kernel_append = update_pool and gather
    if in_kernel_append:
        out_specs += [pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
        out_shape += [jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
                      jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype)]
        aliases = {k_alias_idx: 4, k_alias_idx + 1: 5}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G, B, n_steps),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((B, hidden), jnp.float32),        # batched x-norm
            pltpu.VMEM((B, qkv_cols), jnp.float32),      # batched QKV proj
            pltpu.VMEM((hg * group, hd), jnp.float32),   # q (rope'd, scaled)
            pltpu.VMEM((hg * group, hd), jnp.float32),   # softmax acc
            # per-request attention out: [B, rows*hd] flat, or r-major
            # [rows*B, hd] when hd < 128 (no lane-collapse reshapes)
            pltpu.VMEM((B, wo_rows) if hd % 128 == 0
                       else (hg * group * B, hd), jnp.float32),
            pltpu.VMEM((B, hidden), jnp.float32),        # batched O-proj acc
            pltpu.VMEM((2, hg * group), jnp.float32),
            pltpu.VMEM((2 * hg, hd), jnp.float32),
        ] + ([
            pltpu.VMEM((2, hg, chunk, hd), k_pool.dtype),    # K windows
            pltpu.VMEM((2, hg, chunk, hd), v_pool.dtype),    # V windows
            pltpu.SemaphoreType.DMA((2, 2, npp)),            # window DMAs
        ] if gather else []) + ([
            pltpu.VMEM((hg, 8, hd), k_pool.dtype),           # K append RMW
            pltpu.VMEM((hg, 8, hd), v_pool.dtype),           # V append RMW
            pltpu.SemaphoreType.DMA((2,)),
        ] if in_kernel_append else []),
    )

    kernel = functools.partial(
        _paged_kernel, hg=hg, group=group, head_dim=hd, page=page, npp=npp,
        rope_style=rope_style, eps=eps, wq_kind=wq_kind, gs_q=gs_q,
        append=in_kernel_append, gather=gather,
        with_bias=bias_qkv is not None, window=window,
        softcap=softcap * _LOG2E if softcap else 0.0,
        window_pattern=window_pattern)

    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kcfg.vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * hidden * (group + 2) * hd * kv_heads,
            bytes_accessed=(wqkv_g.size * wqkv_g.dtype.itemsize
                            + wo_g.size * wo_g.dtype.itemsize),
            transcendentals=B * kv_heads * max_pages * page),
        input_output_aliases=aliases,
        interpret=interpret,
    )(meta, lens, poss, table, *inputs)

    out, res_out, k_new, v_new = results[:4]
    out = out.reshape(B, hidden)
    res_out = res_out.reshape(B, hidden)
    k_new = k_new.reshape(B, kv_heads, hd)
    v_new = v_new.reshape(B, kv_heads, hd)
    if not update_pool:
        return out, res_out, k_new, v_new
    if in_kernel_append:
        return out, res_out, results[4], results[5]
    # page % 8 != 0 fallback: scatter the new K/V into the pool tail slots
    b_idx = jnp.arange(B)
    pg = block_table[b_idx, seq_lens // page]
    off = seq_lens % page
    lidx = jnp.broadcast_to(meta[0], (B,))
    k_pool = k_pool.at[lidx, pg, :, off].set(k_new.astype(k_pool.dtype))
    v_pool = v_pool.at[lidx, pg, :, off].set(v_new.astype(v_pool.dtype))
    return out, res_out, k_pool, v_pool


# --------------------------------------------------------------------------
# Reference-parity entry: sglang indptr/indices, page size 1
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("layer_id", "eps", "n_heads",
                                             "head_dim"))
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
    cos_sin: jnp.ndarray,          # [max_pos, head_dim]: cos half ‖ sin half
    n_heads: int = 32,
    head_dim: int = 128,
):
    """Twin of the reference op (`pybind.cpp:27-43,112`), functional:
    returns (output, residual_out, k_cache', v_cache') with the new token's
    K/V written to pool row ``indices[indptr[b+1]-1]``
    (`kernel_batch_sglang.cuh:340-346`)."""
    B, hidden = input.shape
    hd = head_dim
    heads = n_heads
    L, num_pages, _ = k_cache.shape
    kcfg = KernelConfig()
    hg = _pick_head_group(heads, kcfg.head_group)

    # reference layouts -> kernel layouts
    from clusterfusion_tpu.ops.decoder_layer import fuse_qkv_o_for_kernel
    per_head = (weight_qkv.reshape(3, heads, hd, hidden)
                .transpose(1, 3, 0, 2).reshape(heads, hidden, 3 * hd))
    wo_per_head = weight_o.T.reshape(heads, hd, hidden)
    wqkv_g, wo_g = fuse_qkv_o_for_kernel(per_head, wo_per_head, heads, 1, hd, hg)

    # indptr/indices (page=1) -> fixed-width block table; row b holds the
    # request's pages INCLUDING the tail slot for the new token
    max_pages = paged_kv_indices.shape[0]
    j = jnp.arange(max_pages)[None, :]
    starts = paged_kv_indptr[:-1, None]
    table = paged_kv_indices[jnp.clip(starts + j, 0, max_pages - 1)]
    seq_lens = paged_kv_indptr[1:] - paged_kv_indptr[:-1] - 1  # excl. new slot

    # pool [L, pages, hidden] -> [L, pages, heads, 1, hd]
    k_pool = k_cache.reshape(L, num_pages, heads, 1, hd)
    v_pool = v_cache.reshape(L, num_pages, heads, 1, hd)

    # fused cos‖sin half-table -> full-dim tables
    cos_h = cos_sin[:, : hd // 2]
    sin_h = cos_sin[:, hd // 2:]
    cos_t = jnp.concatenate([cos_h, cos_h], axis=-1)
    sin_t = jnp.concatenate([sin_h, sin_h], axis=-1)

    out, res_out, k_pool, v_pool = llama_decoder_layer_paged(
        input, residual, wqkv_g, wo_g, table, seq_lens, positions,
        k_pool, v_pool, layer_id, rms_w[None, :], eps, cos_t, sin_t,
        group=1, rope_style="neox", kcfg=kcfg)
    return (out, res_out,
            k_pool.reshape(L, num_pages, hidden),
            v_pool.reshape(L, num_pages, hidden))


# --------------------------------------------------------------------------
# Lean batched paged attention: pages only, weights stay outside.
#
# The fused per-layer megakernel above re-runs its M=1 projection GEMVs per
# request (grid (B, G, pages)), so a batch of B requests costs ~B x a
# single-sequence decode (measured 160 ms at B=8/7B-int8 — no sharing).
# At B >= 4 the TPU-right split is the opposite of the bs=1 design: do the
# projections/O/FFN as BATCHED XLA matmuls (weights stream ONCE at M=B,
# which the MXU likes), and keep Pallas only for what XLA cannot do — the
# per-request scattered page walk with online softmax.  This kernel is
# that piece: grid (B, page_windows), all KV heads per step, no weight
# operands.
#
# The new token's K/V is appended IN-KERNEL through input_output_aliased
# pool outputs at the FINAL grid step per request (after every page read —
# BlockSpec prefetch of a page the same step just wrote would race), with
# the current token folded into the softmax state from registers exactly
# like the single-sequence kernels.  An XLA-level scatter next to this
# kernel is not an option: the pools are pallas operands, so the scatter
# output must materialize — measured 116.7 ms/step vs 14.4 without the
# scatter at 7B (a full pool copy per layer, the ops.stack_kernel copy
# pitfall all over again).
# --------------------------------------------------------------------------


def _paged_attn_kernel(
    meta_ref, lens_ref, pgrow_ref, off_ref, table_ref,    # scalar prefetch
    q_ref, kn_ref, vn_ref, k_any_ref, v_any_ref,
    o_ref, kp_out_ref, vp_out_ref,
    acc_s, ml_s, kwin_s, vwin_s, win_sem, krow_s, vrow_s, row_sem,
    *,
    kv_heads: int, group: int, head_dim: int, page: int, npp: int,
    window: int = 0, softcap: float = 0.0, window_pattern: str = "all",
):
    b_id = pl.program_id(0)
    c_id = pl.program_id(1)
    n_steps = pl.num_programs(1)         # one grid step per page window:
    # step c computes chunk c; step 0 also inits + kicks gathers and the
    # append-RMW read; the last step folds the current token and writes
    # back (grid fixed cost ~1.5 us/step — extra phases are pure overhead)
    n_past = lens_ref[b_id]              # cached rows (EXCLUDING current)
    hd = head_dim
    rows = kv_heads * group
    chunk = npp * page                   # KV rows per grid step
    f32 = jnp.float32
    l = meta_ref[0]
    last_pg = jnp.maximum(pl.cdiv(n_past, page) - 1, 0)

    def start_window(w, buf):
        """Gather window w's npp pages into ping-pong buffer ``buf`` —
        the TPU statement of the reference's predicated per-16B page
        gather (`kernel_batch_sglang.cuh:356-433`): per-page DMAs driven
        by the prefetched block table, double-buffered so the next
        window flies while this one computes (SURVEY §7 "paged gather")."""
        for i in range(npp):
            j = jnp.minimum(w * npp + i, last_pg)
            pg = table_ref[b_id, j]
            cols = pl.ds(i * page, page)
            pltpu.make_async_copy(
                k_any_ref.at[l, pg], kwin_s.at[buf, :, cols],
                win_sem.at[buf, 0, i]).start()
            pltpu.make_async_copy(
                v_any_ref.at[l, pg], vwin_s.at[buf, :, cols],
                win_sem.at[buf, 1, i]).start()

    def wait_window(w, buf):
        for i in range(npp):
            j = jnp.minimum(w * npp + i, last_pg)
            pg = table_ref[b_id, j]
            cols = pl.ds(i * page, page)
            pltpu.make_async_copy(
                k_any_ref.at[l, pg], kwin_s.at[buf, :, cols],
                win_sem.at[buf, 0, i]).wait()
            pltpu.make_async_copy(
                v_any_ref.at[l, pg], vwin_s.at[buf, :, cols],
                win_sem.at[buf, 1, i]).wait()

    @pl.when(c_id == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)
        ml_s[0, :] = jnp.full((rows,), _NEG_INF, f32)
        ml_s[1, :] = jnp.zeros((rows,), f32)
        # kick the append-RMW window read — it lands by the last step's
        # modify+write, overlapped with the whole page walk
        pg_a = pgrow_ref[b_id]
        row8_a = (off_ref[b_id] // 8) * 8
        pltpu.make_async_copy(
            kp_out_ref.at[l, pg_a, :, pl.ds(row8_a, 8)], krow_s,
            row_sem.at[0]).start()
        pltpu.make_async_copy(
            vp_out_ref.at[l, pg_a, :, pl.ds(row8_a, 8)], vrow_s,
            row_sem.at[1]).start()

        @pl.when(n_past > 0)
        def _():
            if window:
                # start at the first in-window chunk (buffer parity keyed
                # to the chunk ordinal, matching the compute loop);
                # pattern "even": odd (global) layers start at chunk 0
                w0 = jnp.maximum(n_past + 1 - window, 0) // chunk
                if window_pattern == "even":
                    w0 = jnp.where(l % 2 == 0, w0, 0)
                start_window(w0, jax.lax.rem(w0, 2))
            else:
                start_window(0, 0)

    _live = (c_id * chunk < n_past)
    if window:
        # chunks entirely below the window: no gather was started, no
        # compute runs (the query sits at position n_past — Mistral
        # semantics: attend >= n_past+1-window only).  Pattern "even":
        # odd (global) layers walk the full context.
        _wlo = n_past + 1 - window
        if window_pattern == "even":
            _wlo = jnp.where(l % 2 == 0, _wlo, 0)
        _live = jnp.logical_and(_live, (c_id + 1) * chunk > _wlo)
    @pl.when(_live)
    def _():
        c = c_id
        buf = jax.lax.rem(c, 2)
        wait_window(c, buf)
        # prefetch the next window into the other buffer while computing
        @pl.when(jnp.logical_and(c_id < n_steps - 1,
                                 (c + 1) * chunk < n_past))
        def _():
            start_window(c + 1, 1 - buf)
        pos_base = c * chunk
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        row_valid = (pos_base + row_iota) < n_past
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (group, chunk), 1)
        col_valid = (pos_base + col_iota) < n_past
        if window:
            col_valid = jnp.logical_and(
                col_valid, (pos_base + col_iota) >= _wlo)
        for h in range(kv_heads):
            q = q_ref[0, h].astype(jnp.bfloat16)            # [g, hd]
            kc, kfix = _kv_tile(kwin_s[buf, h])             # [chunk, hd]
            vcr, vfix = _kv_tile(vwin_s[buf, h])
            vc = jnp.where(row_valid, vcr, 0)
            scores = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())), preferred_element_type=f32)
            if kfix != 1.0:
                scores = scores * kfix
            if softcap:
                # gemma-2 softcap (exp2 domain: cap pre-scaled by log2e)
                scores = softcap * jnp.tanh(scores * (1.0 / softcap))
            scores = jnp.where(col_valid, scores, _NEG_INF)
            r0 = h * group
            m_old = ml_s[0, r0:r0 + group].reshape(group, 1)
            l_old = ml_s[1, r0:r0 + group].reshape(group, 1)
            m_new = jnp.maximum(m_old,
                                jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp2(m_old - m_new)
            p = jnp.exp2(scores - m_new) * col_valid.astype(f32)
            pv = jnp.dot(p.astype(jnp.bfloat16), vc,
                         preferred_element_type=f32)
            if vfix != 1.0:
                pv = pv * vfix
            acc_s[r0:r0 + group, :] = acc_s[r0:r0 + group, :] * alpha + pv
            ml_s[0, r0:r0 + group] = m_new[:, 0]
            ml_s[1, r0:r0 + group] = \
                (l_old * alpha + jnp.sum(p, axis=-1, keepdims=True))[:, 0]

    @pl.when(c_id == n_steps - 1)
    def _():
        # fold the current token from registers, write output, then append
        # its K/V row (RMW read started at step 0, long landed)
        k_cur = kn_ref[0].astype(f32)                       # [kv, hd]
        v_cur = vn_ref[0].astype(f32)
        q = q_ref[0].astype(f32)                            # [kv, g, hd]
        s_cur = jnp.sum(q * k_cur[:, None, :], axis=-1,
                        keepdims=True).reshape(rows, 1)
        if softcap:
            s_cur = softcap * jnp.tanh(s_cur * (1.0 / softcap))
        m_old = ml_s[0, :].reshape(rows, 1)
        l_old = ml_s[1, :].reshape(rows, 1)
        m_f = jnp.maximum(m_old, s_cur)
        alpha = jnp.exp2(m_old - m_f)
        p_cur = jnp.exp2(s_cur - m_f)
        if group == 1:
            v_rows = v_cur
        else:
            v_rows = jnp.concatenate(
                [pltpu.repeat(v_cur[h:h + 1], group, axis=0)
                 for h in range(kv_heads)], axis=0)
        acc = acc_s[...] * alpha + p_cur * v_rows
        l_f = l_old * alpha + p_cur
        o = acc / l_f
        o_ref[...] = o.reshape(1, 1, rows * hd).astype(o_ref.dtype)

        pg = pgrow_ref[b_id]
        off = off_ref[b_id]
        row8 = (off // 8) * 8
        ksl = kp_out_ref.at[l, pg, :, pl.ds(row8, 8)]
        vsl = vp_out_ref.at[l, pg, :, pl.ds(row8, 8)]
        pltpu.make_async_copy(ksl, krow_s, row_sem.at[0]).wait()
        pltpu.make_async_copy(vsl, vrow_s, row_sem.at[1]).wait()
        sub = jax.lax.broadcasted_iota(jnp.int32, (kv_heads, 8, hd), 1)
        sel = sub == off - row8
        krow_s[...] = jnp.where(sel, kn_ref[0].astype(krow_s.dtype)[:, None, :],
                                krow_s[...])
        vrow_s[...] = jnp.where(sel, vn_ref[0].astype(vrow_s.dtype)[:, None, :],
                                vrow_s[...])
        k_out = pltpu.make_async_copy(krow_s, ksl, row_sem.at[0])
        v_out = pltpu.make_async_copy(vrow_s, vsl, row_sem.at[1])
        k_out.start()
        v_out.start()
        k_out.wait()
        v_out.wait()


def paged_attention(
    q: jnp.ndarray,            # [B, kv_heads, group, head_dim] (rope'd, UNscaled)
    k_new: jnp.ndarray,        # [B, kv_heads, head_dim] current token K (rope'd)
    v_new: jnp.ndarray,        # [B, kv_heads, head_dim]
    k_pool: jnp.ndarray,       # [L, n_pages, kv_heads, page, hd]
    v_pool: jnp.ndarray,
    block_table: jnp.ndarray,  # [B, max_pages] int32
    seq_lens: jnp.ndarray,     # [B] int32 cached rows (EXCLUDING current)
    layer_id,
    *,
    kcfg: KernelConfig = KernelConfig(),
    pages_per_step: Optional[int] = None,
    interpret=None,
    window: int = 0,
    softcap: float = 0.0,
    window_pattern: str = "all",
):
    """Batched paged flash-decode attention + in-place append.

    ``window`` > 0 = sliding-window attention (Mistral semantics): each
    request attends its last ``window`` positions only; below-window page
    windows are never gathered, so decode streams O(window) KV per
    request regardless of context length.

    Attends each request's ``seq_lens[b]`` cached rows plus the current
    token (folded from registers), appends the current K/V at
    ``block_table[b, seq_lens[b]//page], seq_lens[b]%page`` through the
    aliased pool outputs (donate the pools under jit), and returns
    (o [B, kv·group·hd], k_pool', v_pool').  Softmax runs in the exp2
    domain with 1/sqrt(hd) applied here.

    ``pages_per_step``: logically-consecutive pages gathered per grid step
    into one npp·page VMEM chunk by explicit double-buffered per-page DMAs
    off the prefetched block table (window c+1 flies while window c
    computes).  Default sizes the chunk to ~``kcfg.kv_chunk`` rows: at
    page 16 a one-page step is a [16, hd] tile per head — per-step
    overhead (grid bookkeeping + small-DMA latency) dominates the walk
    and the B×pages grid serializes it; fewer, bigger steps recover the
    single-sequence kernel's chunked shape.  The gather stays page-granular
    (the reference's predicated per-16B gather, `kernel_batch_sglang.cuh:
    356-433`, at TPU DMA granularity).
    """
    if interpret is None:
        interpret = interpret_mode()
    B, kv_heads, group, hd = q.shape
    L, n_pages, _, page, _ = k_pool.shape
    assert page % 8 == 0, page
    max_pages = block_table.shape[1]
    npp = pages_per_step or max(1, min(max_pages, kcfg.kv_chunk // page, 64))
    chunk = npp * page
    n_steps = cdiv(max_pages, npp)
    scale = (1.0 / math.sqrt(hd)) * _LOG2E
    q = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)

    meta = jnp.asarray(layer_id, jnp.int32).reshape(1)
    lens = seq_lens.astype(jnp.int32)
    table = block_table.astype(jnp.int32)
    pgrow = table[jnp.arange(B), lens // page]
    off = lens % page

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, kv_heads, group, hd),
                         lambda b, c, *s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_heads, hd), lambda b, c, *s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_heads, hd), lambda b, c, *s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # pools stay in HBM; the kernel gathers its own page windows
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            # [B, 1, rows*hd]: singleton keeps tiled trailing dims legal
            pl.BlockSpec((1, 1, kv_heads * group * hd),
                         lambda b, c, *s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((kv_heads * group, hd), jnp.float32),
            pltpu.VMEM((2, kv_heads * group), jnp.float32),
            pltpu.VMEM((2, kv_heads, chunk, hd), k_pool.dtype),  # K windows
            pltpu.VMEM((2, kv_heads, chunk, hd), v_pool.dtype),  # V windows
            pltpu.SemaphoreType.DMA((2, 2, npp)),                # window DMAs
            pltpu.VMEM((kv_heads, 8, hd), k_pool.dtype),
            pltpu.VMEM((kv_heads, 8, hd), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # aliased operand indices: 5 prefetch + 3 tensor inputs before the pools
    n_inputs_before_pools = 5 + 3
    out, kp, vp = pl.pallas_call(
        functools.partial(_paged_attn_kernel, kv_heads=kv_heads, group=group,
                          head_dim=hd, page=page, npp=npp, window=window,
                          softcap=softcap * _LOG2E if softcap else 0.0,
                          window_pattern=window_pattern),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, kv_heads * group * hd), q.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kcfg.vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * kv_heads * group * max_pages * page * hd,
            bytes_accessed=2 * B * kv_heads * max_pages * page * hd
            * k_pool.dtype.itemsize,
            transcendentals=B * kv_heads * group * max_pages * page),
        input_output_aliases={n_inputs_before_pools: 1,
                              n_inputs_before_pools + 1: 2},
        interpret=interpret,
    )(meta, lens, pgrow, off, table, q, k_new.astype(k_pool.dtype),
      v_new.astype(v_pool.dtype), k_pool, v_pool)
    return out.reshape(B, kv_heads * group * hd), kp, vp
