"""Multi-token whole-stack verify megakernel for speculative decoding.

``ops.stack_kernel`` fuses ALL layers of a single-token decode into one
Pallas call.  This is its n-token sibling: score ``n`` draft tokens at
positions ``pos .. pos+n-1`` — causal among themselves, attending the
whole cache — in ONE kernel call, returning logits for every row and
appending all n KV rows in place.

Why it exists: the eager multi-row verify streams the same weight bytes
as an eager decode step but pays per-layer XLA overheads — measured
31.8 ms vs 21.2 ms for the fused single-token stack at 7B (flat in n).
Fusing the verify brings a speculative round's target cost down to the
single-token stack cost, which is what makes draft acceptance nearly
free tokens.

Differences from the single-token stack kernel (`_stack_kernel`):

- every row-wise buffer ([1, hidden] → [n, hidden]); RMSNorms are
  already per-row;
- the q/softmax panels carry n tokens per (head, group) row — panel row
  order is (head-row, token), so each flash dot is
  ``[group·n, hd] × [hd, chunk]``;
- the "current token" fold becomes an n×n causal block against the n
  freshly-projected K/V rows (query token i attends draft keys j ≤ i);
- the cache append RMW window widens from 8 to ``round_up(n+7, 8)`` rows
  and scatters all n rows in one read-modify-write;
- RoPE uses per-row cos/sin (positions pos..pos+n-1).

With n=1 this computes exactly what the single-token stack computes; the
single-token kernel remains the decode hot path (no row-transpose in it).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clusterfusion_tpu.config import KernelConfig
from clusterfusion_tpu.ops._support import glu_act, cdiv, interpret_mode, round_up
from clusterfusion_tpu.ops.decoder_layer import (
    _int4_dot, _kv_tile, _m2, _rope_vec)
from clusterfusion_tpu.ops.ffn import _r3, ffn_block_size
from clusterfusion_tpu.ops.quant import Int8KV, QuantizedTensor
from clusterfusion_tpu.ops.stack_kernel import _vocab_block

_LOG2E = 1.4426950408889634
_NEG_INF = -1e30


def _verify_kernel(
    s_ref,                        # [pos]
    x_ref, an_ref, fn_ref, cos_ref, sin_ref,
    *refs,
    n: int, hg: int, group: int, head_dim: int, kv_chunk: int, nc: int,
    G: int, bf: int, nb: int, hidden: int, L: int, nv: int, Wr: int,
    rope_style: str, eps: float, wq_kind: str, gs_q: int,
    w4a8: bool = True, kv_kind: str = "none", Sr: int = 8,
    lm_kind: str = "none", window: int = 0, with_bias: bool = False,
    ffn_act: str = "silu", softcap: float = 0.0,
    window_pattern: str = "all", sandwich: bool = False,
):
    with_lm = nv > 0
    kv8 = kv_kind == "int8"
    it = iter(refs)
    wqkv_ref = next(it)
    wqkv_s_ref = next(it) if wq_kind != "none" else None
    bqkv_ref = next(it) if with_bias else None
    pa_ref, pf_ref = (next(it), next(it)) if sandwich else (None, None)
    wo_ref = next(it)
    wo_s_ref = next(it) if wq_kind != "none" else None
    w13_ref = next(it)
    w13_s_ref = next(it) if wq_kind != "none" else None
    w2_ref = next(it)
    w2_s_ref = next(it) if wq_kind != "none" else None
    if with_lm:
        fnorm_ref = next(it)
        lm_ref = next(it)
        lms_ref = next(it) if lm_kind == "int8" else None
    k_ref, v_ref = next(it), next(it)
    ks_ref, vs_ref = (next(it), next(it)) if kv8 else (None, None)
    hx_out_ref, res_out_ref = next(it), next(it)
    logits_ref = next(it) if with_lm else None
    kc_out_ref, vc_out_ref = next(it), next(it)
    ksc_out_ref, vsc_out_ref = (next(it), next(it)) if kv8 else (None, None)
    (xnorm_s, q_s, acc_s, aout_s, ml_s, kv_s, hx_s, res_s, ffn_s,
     krow_s, vrow_s, row_sem) = (next(it) for _ in range(12))
    if kv8:
        ksrow_s, vsrow_s, srow_sem = (next(it) for _ in range(3))

    TA = G * nc
    T = TA + nb
    t_all = pl.program_id(0)
    l = jnp.minimum(t_all // T, L - 1)
    t = t_all - l * T
    seq = s_ref[0]
    hd = head_dim
    rows = hg * group * n                  # softmax panel rows per group step
    f32 = jnp.float32

    # ---- pipelined n-row cache append (same scheme as ops.stack_kernel):
    # window reads prefetch at the previous layer's exit, writes drain at
    # this layer's exit — the RMW never blocks a projection step.
    cap_ = kc_out_ref.shape[2]
    # //8*8 outermost so Mosaic can prove the DMA start is tile-aligned
    row8 = (jnp.minimum(seq, cap_ - Wr) // 8) * 8
    off = seq - row8                       # in [0, Wr - n]
    if kv8:
        R_ = ksc_out_ref.shape[2]
        s0 = (jnp.minimum(seq, cap_ - 1) // 1024) * 8
        s0 = jnp.minimum(s0, R_ - Sr)

    def _append_copies(lx, g, write: bool):
        hsl = pl.ds(g * hg, hg)
        ksl = kc_out_ref.at[lx, hsl, pl.ds(row8, Wr)]
        vsl = vc_out_ref.at[lx, hsl, pl.ds(row8, Wr)]
        pairs = ([(krow_s.at[g], ksl, row_sem.at[0, g]),
                  (vrow_s.at[g], vsl, row_sem.at[1, g])] if write else
                 [(ksl, krow_s.at[g], row_sem.at[0, g]),
                  (vsl, vrow_s.at[g], row_sem.at[1, g])])
        if kv8:
            kssl = ksc_out_ref.at[lx, hsl, pl.ds(s0, Sr)]
            vssl = vsc_out_ref.at[lx, hsl, pl.ds(s0, Sr)]
            pairs += ([(ksrow_s.at[g], kssl, srow_sem.at[0, g]),
                       (vsrow_s.at[g], vssl, srow_sem.at[1, g])] if write else
                      [(kssl, ksrow_s.at[g], srow_sem.at[0, g]),
                       (vssl, vsrow_s.at[g], srow_sem.at[1, g])])
        return [pltpu.make_async_copy(s, d, sem) for s, d, sem in pairs]

    def _start_reads(lx):
        for g in range(G):
            for cp in _append_copies(lx, g, write=False):
                cp.start()

    # ---- layer entry ---------------------------------------------------------
    @pl.when(t == 0)
    def _():
        @pl.when(t_all == 0)
        def _():
            hx_s[...] = x_ref[...].astype(f32)
            res_s[...] = jnp.zeros_like(res_s)
            _start_reads(0)
        r1 = hx_s[...] + res_s[...]
        res_s[...] = r1
        var = jnp.mean(r1 * r1, axis=-1, keepdims=True)
        xnorm_s[...] = r1 * jax.lax.rsqrt(var + eps) * _m2(an_ref).astype(f32)
        aout_s[...] = jnp.zeros_like(aout_s)

    # ---- attention phases ----------------------------------------------------
    in_attn = t < TA
    tt = jnp.minimum(t, TA - 1)
    g_id = tt // nc
    c_id = tt % nc

    @pl.when(jnp.logical_and(in_attn, c_id == 0))
    def _():
        xn = xnorm_s[...].astype(jnp.bfloat16)         # [n, hidden]
        if wq_kind == "none":
            qkv = jnp.dot(xn, _m2(wqkv_ref), preferred_element_type=f32)
        elif wq_kind == "int8":
            qkv = jnp.dot(xn, _m2(wqkv_ref).astype(jnp.bfloat16),
                          preferred_element_type=f32) * _m2(wqkv_s_ref)
        else:
            qkv = _int4_dot(xn, _m2(wqkv_ref), _m2(wqkv_s_ref), gs_q,
                            w4a8)
        if with_bias:
            # Qwen2-family QKV bias, added pre-rope (part of the linear)
            qkv = qkv + _m2(bqkv_ref).astype(f32)
        cos_f = cos_ref[...].astype(f32)               # [n, hd] per-row
        sin_f = sin_ref[...].astype(f32)
        scale = (1.0 / math.sqrt(hd)) * _LOG2E
        for h in range(hg):
            base = h * (group + 2) * hd
            k = _rope_vec(qkv[:, base + group * hd: base + (group + 1) * hd],
                          cos_f, sin_f, rope_style)    # [n, hd]
            v = qkv[:, base + (group + 1) * hd: base + (group + 2) * hd]
            kv_s[h * n:(h + 1) * n, :] = k
            kv_s[(hg + h) * n:(hg + h + 1) * n, :] = v
            for i in range(group):
                qi = _rope_vec(qkv[:, base + i * hd: base + (i + 1) * hd],
                               cos_f, sin_f, rope_style)
                r0 = (h * group + i) * n
                q_s[r0:r0 + n, :] = qi * scale
        # n-row cache append: wait the prefetched RMW window, modify,
        # start the write (drained at this layer's exit step)
        for cp in _append_copies(l, g_id, write=False):
            cp.wait()
        kv_all = kv_s[...].reshape(2, hg, n, hd)
        if kv8:
            # per-(head, token) int8 scales; the n positions can straddle a
            # 128-column scale-plane row, so the RMW window is Sr rows
            # anchored at the same (seq//1024)*8 aligned start (clamped)
            sk = jnp.maximum(jnp.max(jnp.abs(kv_all[0]), axis=-1),
                             1e-8) * (1.0 / 127.0)            # [hg, n]
            sv = jnp.maximum(jnp.max(jnp.abs(kv_all[1]), axis=-1),
                             1e-8) * (1.0 / 127.0)
            sub_r = jax.lax.broadcasted_iota(jnp.int32, (hg, Sr, 128), 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (hg, Sr, 128), 2)
            for tok in range(n):
                pos_t = seq + tok
                smask = jnp.logical_and(sub_r == pos_t // 128 - s0,
                                        lane == pos_t % 128)
                ksrow_s[g_id] = jnp.where(smask, sk[:, tok][:, None, None],
                                          ksrow_s[g_id])
                vsrow_s[g_id] = jnp.where(smask, sv[:, tok][:, None, None],
                                          vsrow_s[g_id])
        sub = jax.lax.broadcasted_iota(jnp.int32, (hg, Wr, hd), 1)
        for tok in range(n):
            sel = sub == off + tok
            if kv8:
                k_tok = jnp.round(kv_all[0, :, tok] / sk[:, tok][:, None]) \
                    .astype(krow_s.dtype)
                v_tok = jnp.round(kv_all[1, :, tok] / sv[:, tok][:, None]) \
                    .astype(vrow_s.dtype)
            else:
                k_tok = kv_all[0, :, tok].astype(krow_s.dtype)  # [hg, hd]
                v_tok = kv_all[1, :, tok].astype(vrow_s.dtype)
            krow_s[g_id] = jnp.where(sel, k_tok[:, None, :], krow_s[g_id])
            vrow_s[g_id] = jnp.where(sel, v_tok[:, None, :], vrow_s[g_id])
        for cp in _append_copies(l, g_id, write=True):
            cp.start()
        acc_s[...] = jnp.zeros_like(acc_s)
        ml_s[0, :] = jnp.full((rows,), _NEG_INF, f32)
        ml_s[1, :] = jnp.zeros((rows,), f32)

    c = c_id
    chunk_live = c * kv_chunk < seq
    if window:
        # sliding window: the draft token at position seq+tok attends
        # >= seq+tok+1-window only.  Chunks entirely below token 0's
        # window (the lowest bound) are skipped — the index map aliases
        # their block, and every column is masked out below anyway.
        # Pattern "even" (gemma-2): odd layers attend the full context.
        wlo0 = seq + 1 - window
        if window_pattern == "even":
            wlo0 = jnp.where(l % 2 == 0, wlo0, 0)
        chunk_live = jnp.logical_and(
            chunk_live, (c + 1) * kv_chunk > wlo0)
    @pl.when(jnp.logical_and(in_attn, chunk_live))
    def _():
        pos_base = c * kv_chunk
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (kv_chunk, 1), 0)
        row_valid = (pos_base + row_iota) < seq
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (group * n, kv_chunk), 1)
        col_valid = (pos_base + col_iota) < seq
        if window:
            # per-row window bound: panel row -> draft token = row % n,
            # query position = seq + tok
            qpos = seq + jax.lax.broadcasted_iota(
                jnp.int32, (group * n, kv_chunk), 0) % n
            win_ok = (pos_base + col_iota) > qpos - window
            if window_pattern == "even":
                # odd (global) layers ignore the window bound (boolean
                # algebra, not where(): Mosaic rejects i1-vector selects)
                win_ok = jnp.logical_or(win_ok, l % 2 != 0)
            col_valid = jnp.logical_and(col_valid, win_ok)
        for h in range(hg):
            r0 = h * group * n
            q = q_s[r0:r0 + group * n, :].astype(jnp.bfloat16)
            kc, kfix = _kv_tile(k_ref[0, h])
            vcr, vfix = _kv_tile(v_ref[0, h])
            vc = jnp.where(row_valid, vcr, 0)
            scores = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())), preferred_element_type=f32)
            if kfix != 1.0:
                # fp8 bit-twiddle decode fixup (see ops.quant)
                scores = scores * kfix
            if kv8:
                rb = ks_ref.shape[-2]      # plane rows in this block
                skf = ks_ref[0, h].reshape(1, rb * 128)[:, :kv_chunk]
                svf = vs_ref[0, h].reshape(1, rb * 128)[:, :kv_chunk]
                scores = scores * skf
            if softcap:
                scores = softcap * jnp.tanh(scores * (1.0 / softcap))
            scores = jnp.where(col_valid, scores, _NEG_INF)
            m_old = ml_s[0, r0:r0 + group * n].reshape(group * n, 1)
            l_old = ml_s[1, r0:r0 + group * n].reshape(group * n, 1)
            m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp2(m_old - m_new)
            p = jnp.exp2(scores - m_new) * col_valid.astype(f32)
            pv_in = (p * svf if kv8 else p).astype(jnp.bfloat16)
            pv = jnp.dot(pv_in, vc, preferred_element_type=f32)
            if vfix != 1.0:
                pv = pv * vfix
            acc_s[r0:r0 + group * n, :] = \
                acc_s[r0:r0 + group * n, :] * alpha + pv
            ml_s[0, r0:r0 + group * n] = m_new[:, 0]
            ml_s[1, r0:r0 + group * n] = \
                (l_old * alpha + jnp.sum(p, axis=-1, keepdims=True))[:, 0]

    @pl.when(jnp.logical_and(in_attn, c_id == nc - 1))
    def _():
        # n x n causal block against the fresh draft K/V, then O-projection
        # panel rows: (h, i, tok) -> token index = row % n
        qtok = jax.lax.broadcasted_iota(jnp.int32, (group * n, n), 0) % n
        ktok = jax.lax.broadcasted_iota(jnp.int32, (group * n, n), 1)
        causal = ktok <= qtok
        if window:
            # (positions seq+qtok / seq+ktok; the seq offsets cancel)
            win_ok = ktok > qtok - window
            if window_pattern == "even":
                win_ok = jnp.logical_or(win_ok, l % 2 != 0)
            causal = jnp.logical_and(causal, win_ok)
        o_rows = []
        for h in range(hg):
            r0 = h * group * n
            q = q_s[r0:r0 + group * n, :]
            k_new = kv_s[h * n:(h + 1) * n, :]          # [n, hd] f32
            v_new = kv_s[(hg + h) * n:(hg + h + 1) * n, :]
            s_cur = jax.lax.dot_general(
                q, k_new, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)             # [group*n, n]
            if softcap:
                s_cur = softcap * jnp.tanh(s_cur * (1.0 / softcap))
            s_cur = jnp.where(causal, s_cur, _NEG_INF)
            m_old = ml_s[0, r0:r0 + group * n].reshape(group * n, 1)
            l_old = ml_s[1, r0:r0 + group * n].reshape(group * n, 1)
            m_f = jnp.maximum(m_old, jnp.max(s_cur, axis=-1, keepdims=True))
            alpha = jnp.exp2(m_old - m_f)
            p_cur = jnp.exp2(s_cur - m_f) * causal.astype(f32)
            pv = jnp.dot(p_cur.astype(jnp.bfloat16),
                         v_new.astype(jnp.bfloat16),
                         preferred_element_type=f32)
            acc = acc_s[r0:r0 + group * n, :] * alpha + pv
            l_f = l_old * alpha + jnp.sum(p_cur, axis=-1, keepdims=True)
            o_rows.append((acc / l_f).astype(jnp.bfloat16))  # [group*n, hd]
        # [hg*group, n, hd] -> per-token flat [n, hg*group*hd]
        o = jnp.concatenate(o_rows, axis=0).reshape(hg * group, n, hd)
        o_flat = jnp.transpose(o, (1, 0, 2)).reshape(n, hg * group * hd)
        if wq_kind == "none":
            aout_s[...] += jnp.dot(o_flat, _m2(wo_ref),
                                   preferred_element_type=f32)
        elif wq_kind == "int8":
            aout_s[...] += jnp.dot(o_flat, _m2(wo_ref).astype(jnp.bfloat16),
                                   preferred_element_type=f32) * _m2(wo_s_ref)
        else:
            aout_s[...] += _int4_dot(o_flat, _m2(wo_ref), _m2(wo_s_ref),
                                     gs_q, w4a8)

    # ---- FFN phases ----------------------------------------------------------
    in_ffn = jnp.logical_and(t >= TA, t < T)
    @pl.when(t == TA)
    def _():
        aout = aout_s[...]
        if sandwich:
            # gemma-2 post_attention_layernorm before the residual add
            av = jnp.mean(aout * aout, axis=-1, keepdims=True)
            aout = aout * jax.lax.rsqrt(av + eps) * _m2(pa_ref).astype(f32)
        r2 = aout + res_s[...]
        res_s[...] = r2
        var = jnp.mean(r2 * r2, axis=-1, keepdims=True)
        xnorm_s[...] = r2 * jax.lax.rsqrt(var + eps) * _m2(fn_ref).astype(f32)
        ffn_s[...] = jnp.zeros_like(ffn_s)

    @pl.when(in_ffn)
    def _():
        xn = xnorm_s[...].astype(jnp.bfloat16)
        w = _r3(w13_ref)
        if wq_kind == "none":
            y_g = jnp.dot(xn, w[0], preferred_element_type=f32)
            y_u = jnp.dot(xn, w[1], preferred_element_type=f32)
        elif wq_kind == "int8":
            s = _r3(w13_s_ref)
            y_g = jnp.dot(xn, w[0].astype(jnp.bfloat16),
                          preferred_element_type=f32) * s[0]
            y_u = jnp.dot(xn, w[1].astype(jnp.bfloat16),
                          preferred_element_type=f32) * s[1]
        else:
            sb = _r3(w13_s_ref)
            y_g = _int4_dot(xn, w[0], sb[0], gs_q, w4a8)
            y_u = _int4_dot(xn, w[1], sb[1], gs_q, w4a8)
        act = glu_act(y_g, y_u, ffn_act).astype(jnp.bfloat16)
        if wq_kind == "none":
            ffn_s[...] += jnp.dot(act, _m2(w2_ref),
                                  preferred_element_type=f32)
        elif wq_kind == "int8":
            ffn_s[...] += jnp.dot(act, _m2(w2_ref).astype(jnp.bfloat16),
                                  preferred_element_type=f32)
        else:
            ffn_s[...] += _int4_dot(act, _m2(w2_ref), _m2(w2_s_ref),
                                    gs_q, w4a8)

    # ---- layer exit ----------------------------------------------------------
    @pl.when(t == T - 1)
    def _():
        for g in range(G):
            for cp in _append_copies(l, g, write=True):
                cp.wait()

        @pl.when(l < L - 1)
        def _():
            _start_reads(l + 1)
        out = ffn_s[...]
        if wq_kind == "int8":
            out = out * _m2(w2_s_ref)
        if sandwich:
            # gemma-2 post_feedforward_layernorm before the next residual
            fv = jnp.mean(out * out, axis=-1, keepdims=True)
            out = out * jax.lax.rsqrt(fv + eps) * _m2(pf_ref).astype(f32)
        hx_s[...] = out

        @pl.when(l == L - 1)
        def _():
            hx_out_ref[...] = out.astype(hx_out_ref.dtype)
            res_out_ref[...] = res_s[...].astype(res_out_ref.dtype)

    # ---- LM-head phases ------------------------------------------------------
    if with_lm:
        @pl.when(t == T)
        def _():
            xf = hx_s[...] + res_s[...]
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            xnorm_s[...] = xf * jax.lax.rsqrt(var + eps) \
                * fnorm_ref[...].astype(f32)

        @pl.when(t >= T)
        def _():
            xn = xnorm_s[...].astype(jnp.bfloat16)
            if lm_kind == "int8":
                logits_ref[...] = jnp.dot(
                    xn, lm_ref[...].astype(jnp.bfloat16),
                    preferred_element_type=f32) * lms_ref[...]
                return
            logits_ref[...] = jnp.dot(xn, lm_ref[...],
                                      preferred_element_type=f32)


def fused_verify_stack(
    x, attn_norm, ffn_norm, cos, sin, wqkv_f, wo_f, w13, w2,
    k_cache, v_cache, pos,
    *,
    group: int,
    head_dim: int,
    rope_style: str,
    eps: float,
    kcfg: KernelConfig = KernelConfig(),
    interpret=None,
    final_norm=None,
    lm_head=None,
    window: int = 0,
    bias_qkv=None,
    ffn_act: str = "silu",
    softcap: float = 0.0,
    window_pattern: str = "all",
    post_attn_norm=None,
    post_ffn_norm=None,
):
    """One kernel call scoring n tokens through the whole decoder stack.

    Same operands as ``fused_decoder_stack`` except x: [n, hidden] and
    cos/sin: [n, head_dim] (rows for positions pos..pos+n-1).  Requires
    ``pos + n + 8 <= capacity`` (the append RMW window must fit).
    Returns (x_out [n, hidden] | logits [n, vocab], residual_out,
    k_cache', v_cache') with all n K/V rows appended per layer.

    ``window``: sliding-window attention (Mistral semantics, matching
    ``fused_decoder_stack``): the draft token at position pos+i attends
    positions >= pos+i+1-window only; 0 = full context.  Keeps draft
    scoring consistent with windowed decode.
    """
    if interpret is None:
        interpret = interpret_mode()
    n, hidden = x.shape
    hd = head_dim
    dt = x.dtype
    kv8 = isinstance(k_cache, Int8KV)
    if kv8:
        k_arr, ks_arr = k_cache.q, k_cache.s
        v_arr, vs_arr = v_cache.q, v_cache.s
    else:
        k_arr, v_arr = k_cache, v_cache
        ks_arr = vs_arr = None
    L_, kv_heads, cap, _ = k_arr.shape
    Wr = round_up(n + 7, 8)
    assert cap >= Wr, (cap, Wr)

    wq_kind, gs_q = "none", 0
    if isinstance(wqkv_f, QuantizedTensor):
        wq_kind, gs_q = wqkv_f.kind, wqkv_f.group_size
        sdt = jnp.bfloat16 if wqkv_f.kind == "int4" else jnp.float32
        wqkv_q, wqkv_s = wqkv_f.q, wqkv_f.s.astype(sdt)
        wo_q, wo_s = wo_f.q, wo_f.s.astype(sdt)
        w13_q, w13_s = w13.q, w13.s.astype(sdt)
        w2_q, w2_s = w2.q, w2.s.astype(sdt)
        G = wqkv_f.shape[1]
        qkv_cols = wqkv_f.shape[-1]
        f_pad = w2.shape[-2]
    else:
        wqkv_q, wo_q, w13_q, w2_q = wqkv_f, wo_f, w13, w2
        wqkv_s = wo_s = w13_s = w2_s = None
        G = wqkv_f.shape[1]
        qkv_cols = wqkv_f.shape[-1]
        f_pad = w2.shape[-2]
    hg = kv_heads // G
    assert qkv_cols == hg * (group + 2) * hd
    pack = 2 if wq_kind == "int4" else 1

    chunk = min(kcfg.chunk_for(cap), max(round_up(cap, 16), 16))
    if kv8:
        assert cap % 128 == 0 or cap <= 128, \
            f"int8 KV capacity must be 128-aligned (or <=128), got {cap}"
        # Mosaic: a scale-plane BLOCK's sublane dim (chunk/128 rows) must
        # be a multiple of 8 or equal the whole plane.  cap <= 1024: one
        # chunk covering the cache (the scale spec then fetches the full
        # plane).  Larger caps: chunk rounds up to a multiple of 1024
        # (8 plane rows per chunk) — kv_chunk < 1024 would not compile.
        chunk = cap if cap <= 1024 else round_up(chunk, 1024)
        assert chunk % 128 == 0 or chunk == cap, (chunk, cap)
    Sr = 16 if (kv8 and ks_arr.shape[2] >= 16) else 8
    nc = max(cdiv(cap, chunk), 1)
    bf = ffn_block_size(f_pad, kcfg.ffn_block_target)
    nb = f_pad // bf
    TA = G * nc
    T = TA + nb

    with_lm = lm_head is not None
    lm_kind = "none"
    lm_q, lm_s = lm_head, None
    if with_lm and isinstance(lm_head, QuantizedTensor):
        assert lm_head.kind == "int8", "LM head supports int8 only"
        lm_kind = "int8"
        lm_q, lm_s = lm_head.q, lm_head.s.astype(jnp.float32)
    if with_lm:
        V = lm_q.shape[-1]
        bv = _vocab_block(V)
        assert bv > 0, f"vocab {V} has no lane-aligned block <= 2048"
        nv = V // bv
    else:
        nv = bv = 0
    total = L_ * T + nv
    wo_rows = hg * group * hd

    def l_of(ta):
        return jnp.minimum(ta // T, L_ - 1)

    def g_of(ta):
        lx = l_of(ta)
        t = ta - lx * T
        return jnp.minimum(t, TA - 1) // nc

    def j_of(ta):
        lx = l_of(ta)
        t = ta - lx * T
        return jnp.clip(t - TA, 0, nb - 1)

    def jv_of(ta):
        return jnp.clip(ta - L_ * T, 0, max(nv - 1, 0))

    def kv_index_map(ta, s):
        lx = l_of(ta)
        t = ta - lx * T
        tt = jnp.minimum(t, TA - 1)
        c_i = tt % nc
        last = jnp.maximum(pl.cdiv(s[0], chunk) - 1, 0)
        cix = jnp.minimum(c_i, last)
        if window:
            # chunks entirely below draft token 0's window (the lowest
            # bound of the n queries) alias the first in-window chunk —
            # Pallas elides the repeat fetch and the kernel body masks
            # their columns out (`_verify_kernel` chunk_live/col_valid).
            # Pattern "even": odd (global) layers keep the full walk.
            first = jnp.maximum(s[0] + 1 - window, 0) // chunk
            if window_pattern == "even":
                first = jnp.where(lx % 2 == 0, first, 0)
            cix = jnp.maximum(cix, jnp.minimum(first, last))
        return (lx, g_of(ta), cix, 0)

    in_specs = [
        pl.BlockSpec((n, hidden), lambda ta, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hidden), lambda ta, s: (l_of(ta), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hidden), lambda ta, s: (l_of(ta), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, hd), lambda ta, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, hd), lambda ta, s: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [x, attn_norm[:, None], ffn_norm[:, None], cos, sin]

    def add(arr, spec):
        in_specs.append(spec)
        inputs.append(arr)

    add(wqkv_q, pl.BlockSpec((1, 1, hidden // pack, qkv_cols),
                             lambda ta, s: (l_of(ta), g_of(ta), 0, 0),
                             memory_space=pltpu.VMEM))
    if wq_kind != "none":
        add(wqkv_s, pl.BlockSpec((1, 1, wqkv_s.shape[-2], qkv_cols),
                                 lambda ta, s: (l_of(ta), g_of(ta), 0, 0),
                                 memory_space=pltpu.VMEM))
    if bias_qkv is not None:
        add(bias_qkv, pl.BlockSpec((1, 1, qkv_cols),
                                   lambda ta, s: (l_of(ta), g_of(ta), 0),
                                   memory_space=pltpu.VMEM))
    sandwich = post_attn_norm is not None
    assert sandwich == (post_ffn_norm is not None)
    if sandwich:
        nspec = pl.BlockSpec((1, 1, hidden), lambda ta, s: (l_of(ta), 0, 0),
                             memory_space=pltpu.VMEM)
        add(post_attn_norm[:, None], nspec)
        add(post_ffn_norm[:, None], nspec)
    add(wo_q, pl.BlockSpec((1, 1, wo_rows // pack, hidden),
                           lambda ta, s: (l_of(ta), g_of(ta), 0, 0),
                           memory_space=pltpu.VMEM))
    if wq_kind != "none":
        add(wo_s, pl.BlockSpec((1, 1, wo_s.shape[-2], hidden),
                               lambda ta, s: (l_of(ta), g_of(ta), 0, 0),
                               memory_space=pltpu.VMEM))
    add(w13_q, pl.BlockSpec((1, 2, hidden // pack, bf),
                            lambda ta, s: (l_of(ta), 0, 0, j_of(ta)),
                            memory_space=pltpu.VMEM))
    if wq_kind != "none":
        add(w13_s, pl.BlockSpec((1, 2, w13_s.shape[-2], bf),
                                lambda ta, s: (l_of(ta), 0, 0, j_of(ta)),
                                memory_space=pltpu.VMEM))
    add(w2_q, pl.BlockSpec((1, bf // pack, hidden),
                           lambda ta, s: (l_of(ta), j_of(ta), 0),
                           memory_space=pltpu.VMEM))
    if wq_kind == "int8":
        add(w2_s, pl.BlockSpec((1, 1, hidden), lambda ta, s: (l_of(ta), 0, 0),
                               memory_space=pltpu.VMEM))
    elif wq_kind == "int4":
        add(w2_s, pl.BlockSpec((1, bf // gs_q, hidden),
                               lambda ta, s: (l_of(ta), j_of(ta), 0),
                               memory_space=pltpu.VMEM))
    if with_lm:
        add(final_norm.reshape(1, hidden),
            pl.BlockSpec((1, hidden), lambda ta, s: (0, 0),
                         memory_space=pltpu.VMEM))
        add(lm_q, pl.BlockSpec((hidden, bv),
                               lambda ta, s: (0, jv_of(ta)),
                               memory_space=pltpu.VMEM))
        if lm_kind == "int8":
            add(lm_s, pl.BlockSpec((1, bv), lambda ta, s: (0, jv_of(ta)),
                                   memory_space=pltpu.VMEM))
    k_alias_idx = 1 + len(inputs)
    add(k_arr, pl.BlockSpec((1, hg, chunk, hd), kv_index_map,
                            memory_space=pltpu.VMEM))
    add(v_arr, pl.BlockSpec((1, hg, chunk, hd), kv_index_map,
                            memory_space=pltpu.VMEM))
    if kv8:
        # full plane when single-chunk (cap <= 1024), else chunk/128 rows
        rb = ks_arr.shape[-2] if chunk == cap else chunk // 128
        s_spec = pl.BlockSpec((1, hg, rb, 128), kv_index_map,
                              memory_space=pltpu.VMEM)
        add(ks_arr, s_spec)
        add(vs_arr, s_spec)

    out_specs = [
        pl.BlockSpec((n, hidden), lambda ta, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, hidden), lambda ta, s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_lm:
        out_specs.append(pl.BlockSpec((n, bv),
                                      lambda ta, s: (0, jv_of(ta)),
                                      memory_space=pltpu.VMEM))
    out_specs += [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if kv8:
        out_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((n, hidden), jnp.float32),            # xnorm
            pltpu.VMEM((hg * group * n, hd), jnp.float32),   # q panel
            pltpu.VMEM((hg * group * n, hd), jnp.float32),   # softmax acc
            pltpu.VMEM((n, hidden), jnp.float32),            # attn out
            pltpu.VMEM((2, hg * group * n), jnp.float32),    # (m, l)
            pltpu.VMEM((2 * hg * n, hd), jnp.float32),       # fresh k/v rows
            pltpu.VMEM((n, hidden), jnp.float32),            # hx carry
            pltpu.VMEM((n, hidden), jnp.float32),            # residual carry
            pltpu.VMEM((n, hidden), jnp.float32),            # ffn acc
            pltpu.VMEM((G, hg, Wr, hd), k_arr.dtype),        # K append RMW
            pltpu.VMEM((G, hg, Wr, hd), v_arr.dtype),        # V append RMW
            pltpu.SemaphoreType.DMA((2, G)),
        ] + ([
            pltpu.VMEM((G, hg, Sr, 128), jnp.float32),       # K-scale RMW
            pltpu.VMEM((G, hg, Sr, 128), jnp.float32),       # V-scale RMW
            pltpu.SemaphoreType.DMA((2, G)),
        ] if kv8 else []),
    )

    kernel = functools.partial(
        _verify_kernel, n=n, hg=hg, group=group, head_dim=hd, kv_chunk=chunk,
        nc=nc, G=G, bf=bf, nb=nb, hidden=hidden, L=L_, nv=nv, Wr=Wr,
        rope_style=rope_style, eps=eps, wq_kind=wq_kind, gs_q=gs_q,
        w4a8=kcfg.int4_w4a8, kv_kind="int8" if kv8 else "none", Sr=Sr,
        lm_kind=lm_kind, window=window, with_bias=bias_qkv is not None,
        ffn_act=ffn_act, softcap=softcap * _LOG2E if softcap else 0.0,
        window_pattern=window_pattern, sandwich=sandwich)

    wbytes = sum(w.size * w.dtype.itemsize
                 for w in (wqkv_q, wo_q, w13_q, w2_q))
    flops = 2 * n * L_ * (hidden * (group + 2) * hd * kv_heads
                          + kv_heads * group * (cap + n) * hd * 2
                          + kv_heads * group * hd * hidden
                          + 3 * hidden * f_pad)
    nbytes = wbytes + 2 * L_ * kv_heads * cap * hd * k_arr.dtype.itemsize
    if kv8:
        nbytes += 2 * ks_arr.size * 4

    out_shape = [
        jax.ShapeDtypeStruct((n, hidden), dt),
        jax.ShapeDtypeStruct((n, hidden), dt),
    ]
    if with_lm:
        out_shape.append(jax.ShapeDtypeStruct((n, V), jnp.float32))
    out_shape += [
        jax.ShapeDtypeStruct(k_arr.shape, k_arr.dtype),
        jax.ShapeDtypeStruct(v_arr.shape, v_arr.dtype),
    ]
    n_pre = 3 if with_lm else 2
    aliases = {k_alias_idx: n_pre, k_alias_idx + 1: n_pre + 1}
    if kv8:
        out_shape += [
            jax.ShapeDtypeStruct(ks_arr.shape, jnp.float32),
            jax.ShapeDtypeStruct(vs_arr.shape, jnp.float32),
        ]
        aliases[k_alias_idx + 2] = n_pre + 2
        aliases[k_alias_idx + 3] = n_pre + 3

    seq_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kcfg.vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nbytes,
            transcendentals=n * L_ * (kv_heads * cap + f_pad)),
        input_output_aliases=aliases,
        interpret=interpret,
    )(seq_arr, *inputs)
    if kv8:
        *head, kc, vc, ks, vs = results
        kc, vc = Int8KV(kc, ks), Int8KV(vc, vs)
    else:
        *head, kc, vc = results
    if with_lm:
        x_out, res_out, logits = head
        return logits, res_out, kc, vc
    x_out, res_out = head
    return x_out, res_out, kc, vc
