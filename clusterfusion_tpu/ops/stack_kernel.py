"""Whole-stack decoder megakernel: ALL transformer layers — attention half
AND SwiGLU FFN — as ONE Pallas kernel call per decode step.

The reference's contribution is one kernel launch per *layer's attention
half* (`kernel.cuh:20-619`), with FFN and the layer loop left to the host
framework.  On TPU the same design principle (widen the fusion scope until
communication disappears) goes further: weights for every layer live in
stacked [L, ...] arrays, so one kernel with grid (L, phases) walks the
entire stack while Pallas's pipeline streams each phase's weight block —
the next layer's QKV tile is in flight while this layer's FFN still
computes.  One launch per token removes every kernel-boundary bubble
(measured: 32 x 2 kernel launches/token leave ~7% of decode time in
boundaries where no weight DMA is in flight).

Phase layout within a layer (grid dim 1, T = G*nc + nb steps):

  t = 0:                residual-add + attn RMSNorm (+ g=0 QKV projection)
  t in [0, G*nc):       attention: g = t//nc head groups, per group nc
                        KV-chunk flash-decode steps with the online-softmax
                        state in scratch; each group's FIRST step also runs
                        its QKV projection + rope + append RMW (the chunk-0
                        KV block was prefetched during the previous step),
                        and its LAST step folds the current token and
                        accumulates the O-projection partial
  t = G*nc:             attn-out residual-add + FFN RMSNorm
  t in [TA, TA + nb):   FFN: gate/up dot on w13 block j, SiLU*up, w2
                        down-projection partial accumulation
  last t of layer L-1:  write (x_out, residual_out)

The hidden-state pair (x, residual) is carried across layers in VMEM
scratch — layers never round-trip through HBM.  The new token's K/V is
appended to the input_output_aliased cache by an in-kernel RMW DMA, and
during FFN phases every attention operand's index map pins its last block
so nothing is re-fetched.  INT8/INT4 weights dequantize in-kernel exactly
as in ops.decoder_layer / ops.ffn; fp8 KV caches decode via the
bit-twiddle re-bias (ops.quant.fp8_decode_scaled) with the 2**56 fixup
folded into the scores/pv products.
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
    _dequant_int4_tile, _int4_dot, _kv_tile, _m2, _oproj_dot, _rope_vec)
from clusterfusion_tpu.ops.ffn import _r3, ffn_block_size
from clusterfusion_tpu.ops.quant import Int8KV, QuantizedTensor

_LOG2E = 1.4426950408889634
_NEG_INF = -1e30


def _stack_kernel(
    s_ref,                        # [pos]
    x_ref, an_ref, fn_ref, cos_ref, sin_ref,
    *refs,
    hg: int, group: int, head_dim: int, kv_chunk: int, nc: int, G: int,
    bf: int, nb: int, hidden: int, L: int, nv: int,
    rope_style: str, eps: float, wq_kind: str, gs_q: int, w4a8: bool = True,
    kv_kind: str = "none", reduce_axis=None, lm_kind: str = "none",
    window: int = 0, with_bias: bool = False,
    ffn_act: str = "silu",
    softcap: float = 0.0,   # attn logit softcap, PRE-multiplied by log2(e)
    window_pattern: str = "all",  # "all": every layer windowed; "even":
                                  # gemma-2 interleaved local/global —
                                  # window applies to even layers only
    sandwich: bool = False,       # gemma-2 post-attn / post-FFN RMSNorms
    defer_append: bool = False,   # hd < 128: the in-kernel RMW append DMA
                                  # cannot slice a sub-128-lane cache minor
                                  # dim (Mosaic (8,128) tiling) — emit the
                                  # new K/V rows as outputs instead and let
                                  # the caller do ONE whole-stack XLA
                                  # dynamic-update (in-place under donation)
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
    if defer_append:
        knew_ref, vnew_ref = next(it), next(it)
        kc_out_ref = vc_out_ref = ksc_out_ref = vsc_out_ref = None
        (xnorm_s, q_s, acc_s, aout_s, ml_s, kv_s, hx_s, res_s, ffn_s) = \
            (next(it) for _ in range(9))
        krow_s = vrow_s = row_sem = None
    else:
        kc_out_ref, vc_out_ref = next(it), next(it)
        ksc_out_ref, vsc_out_ref = (next(it), next(it)) if kv8 \
            else (None, None)
        (xnorm_s, q_s, acc_s, aout_s, ml_s, kv_s, hx_s, res_s, ffn_s,
         krow_s, vrow_s, row_sem) = (next(it) for _ in range(12))
        if kv8:
            ksrow_s, vsrow_s, srow_sem = (next(it) for _ in range(3))
    if reduce_axis is not None:
        rrecv_s, rsend_sem, rrecv_sem, rack_sem = (next(it) for _ in range(4))

    # 1D grid flattened over (layer, phase) + trailing LM-head phases
    TA = G * nc
    T = TA + nb
    t_all = pl.program_id(0)
    l = jnp.minimum(t_all // T, L - 1)
    t = t_all - l * T                      # in [0, T) for layers; >= T in LM
    seq = s_ref[0]
    hd = head_dim
    rows = hg * group
    f32 = jnp.float32

    # ---- pipelined in-kernel cache append ------------------------------------
    # The append is an aligned 8-row RMW DMA into the aliased cache (see
    # ops.decoder_layer for why an XLA-level update is not an option).  A
    # blocking read-modify-write costs 2 serial DMA roundtrips per head
    # group (4 with int8-KV scale planes) — measured ~25-30 µs/layer of the
    # ~50 µs/layer gap to the byte floor.  So the RMW is pipelined across
    # phases: every group's window READ prefetches at the PREVIOUS layer's
    # exit step (t_all == 0 for layer 0), the projection step only waits
    # that long-landed read, modifies, and STARTS the write, and the writes
    # drain at this layer's exit step — no append DMA is ever waited while
    # it is still in flight.
    if not defer_append:
        cap_ = kc_out_ref.shape[2]
        row = jnp.minimum(seq, cap_ - 1)
        row8 = (row // 8) * 8
        off = row - row8
        srow8 = (row // 1024) * 8 if kv8 else 0

    def _append_copies(lx, g, write: bool):
        if defer_append:
            return []
        """(start|wait)-able RMW copies for group g of layer lx."""
        hsl = pl.ds(g * hg, hg)
        ksl = kc_out_ref.at[lx, hsl, pl.ds(row8, 8)]
        vsl = vc_out_ref.at[lx, hsl, pl.ds(row8, 8)]
        pairs = ([(krow_s.at[g], ksl, row_sem.at[0, g]),
                  (vrow_s.at[g], vsl, row_sem.at[1, g])] if write else
                 [(ksl, krow_s.at[g], row_sem.at[0, g]),
                  (vsl, vrow_s.at[g], row_sem.at[1, g])])
        if kv8:
            kssl = ksc_out_ref.at[lx, hsl, pl.ds(srow8, 8)]
            vssl = vsc_out_ref.at[lx, hsl, pl.ds(srow8, 8)]
            pairs += ([(ksrow_s.at[g], kssl, srow_sem.at[0, g]),
                       (vsrow_s.at[g], vssl, srow_sem.at[1, g])] if write else
                      [(kssl, ksrow_s.at[g], srow_sem.at[0, g]),
                       (vssl, vsrow_s.at[g], srow_sem.at[1, g])])
        return [pltpu.make_async_copy(s, d, sem) for s, d, sem in pairs]

    def _start_reads(lx):
        for g in range(G):
            for cp in _append_copies(lx, g, write=False):
                cp.start()

    # ---- layer entry: residual add + attention RMSNorm ----------------------
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
        xn = xnorm_s[...].astype(jnp.bfloat16)
        if wq_kind == "none":
            qkv = jnp.dot(xn, _m2(wqkv_ref), preferred_element_type=f32)
        elif wq_kind == "int8":
            qkv = jnp.dot(xn, _m2(wqkv_ref).astype(jnp.bfloat16),
                          preferred_element_type=f32) * _m2(wqkv_s_ref)
        else:
            qkv = _int4_dot(xn, _m2(wqkv_ref), _m2(wqkv_s_ref), gs_q, w4a8)
        if with_bias:
            # Qwen2-family QKV bias, added pre-rope (part of the linear)
            qkv = qkv + _m2(bqkv_ref).astype(f32)
        cos_f = cos_ref[...].astype(f32)
        sin_f = sin_ref[...].astype(f32)
        scale = (1.0 / math.sqrt(hd)) * _LOG2E
        for h in range(hg):
            base = h * (group + 2) * hd
            k = _rope_vec(qkv[:, base + group * hd: base + (group + 1) * hd],
                          cos_f, sin_f, rope_style)
            v = qkv[:, base + (group + 1) * hd: base + (group + 2) * hd]
            kv_s[h:h + 1, :] = k
            kv_s[hg + h:hg + h + 1, :] = v
            for i in range(group):
                qi = _rope_vec(qkv[:, base + i * hd: base + (i + 1) * hd],
                               cos_f, sin_f, rope_style)
                q_s[h * group + i: h * group + i + 1, :] = qi * scale
        # append: wait the long-prefetched RMW window read, modify, start
        # the write (drained at this layer's exit step — never blocks here)
        if defer_append:
            # no in-kernel append at hd < 128 — emit this layer/group's new
            # rows as (l, g)-blocked outputs; the caller's whole-stack XLA
            # dynamic-update lands them (one update per token, in place)
            knew_ref[0, 0] = kv_s[:hg, :].astype(knew_ref.dtype)
            vnew_ref[0, 0] = kv_s[hg:, :].astype(vnew_ref.dtype)
            acc_s[...] = jnp.zeros_like(acc_s)
            ml_s[0, :] = jnp.full((rows,), _NEG_INF, f32)
            ml_s[1, :] = jnp.zeros((rows,), f32)
            return
        for cp in _append_copies(l, g_id, write=False):
            cp.wait()
        if kv8:
            # quantize the new K/V rows (symmetric absmax/127 per head) and
            # RMW their per-position scales into the [R, 128] scale planes:
            # position `row` lives at plane (row//128, row%128); the window
            # start (row//1024)*8 is the same 8-sublane-aligned dynamic-DMA
            # proof form the KV rows use
            k_cur = kv_s[:hg, :]
            v_cur = kv_s[hg:, :]
            sk = jnp.maximum(jnp.max(jnp.abs(k_cur), axis=-1, keepdims=True),
                             1e-8) * (1.0 / 127.0)           # [hg, 1]
            sv = jnp.maximum(jnp.max(jnp.abs(v_cur), axis=-1, keepdims=True),
                             1e-8) * (1.0 / 127.0)
            soff_r = row // 128 - srow8
            scol = row - (row // 128) * 128
            k_new = jnp.round(k_cur / sk)
            v_new = jnp.round(v_cur / sv)
            sub_r = jax.lax.broadcasted_iota(jnp.int32, (hg, 8, 128), 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (hg, 8, 128), 2)
            smask = jnp.logical_and(sub_r == soff_r, lane == scol)
            ksrow_s[g_id] = jnp.where(smask, sk[:, :, None], ksrow_s[g_id])
            vsrow_s[g_id] = jnp.where(smask, sv[:, :, None], vsrow_s[g_id])
        else:
            k_new = kv_s[:hg, :]
            v_new = kv_s[hg:, :]
        # per-head 2D selects: the 3D form (k_new[:, None, :] against an
        # [hg, 8, hd] iota) needs a rank-expanding vector reshape that
        # Mosaic rejects for sub-128-lane head dims (hd=64:
        # vector<Nx64> -> vector<Nx1x64> "unsupported shape cast")
        sub2 = jax.lax.broadcasted_iota(jnp.int32, (8, hd), 0)
        for h in range(hg):
            krow_s[g_id, h] = jnp.where(
                sub2 == off, k_new[h:h + 1].astype(krow_s.dtype),
                krow_s[g_id, h])
            vrow_s[g_id, h] = jnp.where(
                sub2 == off, v_new[h:h + 1].astype(vrow_s.dtype),
                vrow_s[g_id, h])
        for cp in _append_copies(l, g_id, write=True):
            cp.start()
        acc_s[...] = jnp.zeros_like(acc_s)
        ml_s[0, :] = jnp.full((rows,), _NEG_INF, f32)
        ml_s[1, :] = jnp.zeros((rows,), f32)

    c = c_id
    live = c * kv_chunk < seq
    if window:
        # sliding window (Mistral semantics: attend positions >= seq+1-window
        # only).  Chunks entirely below the window are skipped — the index
        # map clamps their block to the first in-window chunk so they fetch
        # no KV bytes, and this predicate skips their compute.  Pattern
        # "even" (gemma-2 interleaved local/global): odd layers attend the
        # full context (their lower bound collapses to 0).
        wlo = seq + 1 - window
        if window_pattern == "even":
            wlo = jnp.where(l % 2 == 0, wlo, 0)
        live = jnp.logical_and(live, (c + 1) * kv_chunk > wlo)
    @pl.when(jnp.logical_and(in_attn, live))
    def _():
        pos_base = c * kv_chunk
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (kv_chunk, 1), 0)
        row_valid = (pos_base + row_iota) < seq
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (group, kv_chunk), 1)
        col_valid = (pos_base + col_iota) < seq
        if window:
            row_valid = jnp.logical_and(row_valid, (pos_base + row_iota) >= wlo)
            col_valid = jnp.logical_and(col_valid, (pos_base + col_iota) >= wlo)
        for h in range(hg):
            q = q_s[h * group:(h + 1) * group, :].astype(jnp.bfloat16)
            kc, kfix = _kv_tile(k_ref[0, h])
            vcr, vfix = _kv_tile(v_ref[0, h])
            vc = jnp.where(row_valid, vcr, 0)
            scores = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())), preferred_element_type=f32)
            if kfix != 1.0:
                # fp8 bit-twiddle decode fixup (see ops.quant): one multiply
                # on the [group, chunk] scores instead of a software convert
                # on the [chunk, hd] tile
                scores = scores * kfix
            if kv8:
                # int8 KV: per-position K scales commute to a row scale on
                # the scores; V scales fold into p before the p·V dot.  The
                # int8→bf16 cast above is the native VPU convert (unlike
                # fp8's software convert) — the whole point of this format.
                rb = ks_ref.shape[-2]      # plane rows in this block
                skf = ks_ref[0, h].reshape(1, rb * 128)[:, :kv_chunk]
                svf = vs_ref[0, h].reshape(1, rb * 128)[:, :kv_chunk]
                scores = scores * skf
            if softcap:
                # gemma-2 logit softcapping: cap*tanh(s/cap) on the REAL
                # logits == (cap*log2e)*tanh(s/(cap*log2e)) in the exp2
                # domain the kernel scores live in
                scores = softcap * jnp.tanh(scores * (1.0 / softcap))
            scores = jnp.where(col_valid, scores, _NEG_INF)
            m_old = ml_s[0, h * group:(h + 1) * group].reshape(group, 1)
            l_old = ml_s[1, h * group:(h + 1) * group].reshape(group, 1)
            m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp2(m_old - m_new)
            p = jnp.exp2(scores - m_new) * col_valid.astype(f32)
            pv_in = (p * svf if kv8 else p).astype(jnp.bfloat16)
            pv = jnp.dot(pv_in, vc, preferred_element_type=f32)
            if vfix != 1.0:
                pv = pv * vfix
            acc_s[h * group:(h + 1) * group, :] = \
                acc_s[h * group:(h + 1) * group, :] * alpha + pv
            ml_s[0, h * group:(h + 1) * group] = m_new[:, 0]
            ml_s[1, h * group:(h + 1) * group] = \
                (l_old * alpha + jnp.sum(p, axis=-1, keepdims=True))[:, 0]

    @pl.when(jnp.logical_and(in_attn, c_id == nc - 1))
    def _():
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
        o = (acc / l_f).astype(jnp.bfloat16)
        if hd % 128 == 0:
            o_flat = o.reshape(1, rows * hd)
            if wq_kind == "none":
                aout_s[...] += jnp.dot(o_flat, _m2(wo_ref),
                                       preferred_element_type=f32)
            elif wq_kind == "int8":
                aout_s[...] += jnp.dot(o_flat,
                                       _m2(wo_ref).astype(jnp.bfloat16),
                                       preferred_element_type=f32) \
                    * _m2(wo_s_ref)
            else:
                aout_s[...] += _int4_dot(o_flat, _m2(wo_ref), _m2(wo_s_ref),
                                         gs_q, w4a8)
        else:
            # hd=64: per-row contraction (see _oproj_dot); int4 takes the
            # exact tile dequant (w4a8's grouped reshape needs the flat x)
            if wq_kind == "none":
                w = _m2(wo_ref)
            elif wq_kind == "int8":
                w = _m2(wo_ref).astype(jnp.bfloat16)
            else:
                w = _dequant_int4_tile(_m2(wo_ref), _m2(wo_s_ref), gs_q)
            part = _oproj_dot(o, w, hd)
            if wq_kind == "int8":
                part = part * _m2(wo_s_ref)
            aout_s[...] += part

    # ---- FFN phases ------------------------------------------------------------
    in_ffn = jnp.logical_and(t >= TA, t < T)
    @pl.when(t == TA)
    def _():
        if reduce_axis is not None:
            # In-kernel ICI all-reduce of the tp-partial attention output
            # (the reference's Stage::ATTN DSM reduce, `dsm.cuh:89-169`,
            # fused into the megakernel): the N-1 remote-DMA hops fly while
            # the pipeline is already streaming this layer's next w13/w2
            # blocks from HBM — overlap a between-kernel psum cannot get.
            from clusterfusion_tpu.parallel.collective import \
                ring_reduce_scratch
            ring_reduce_scratch(aout_s, rrecv_s, rsend_sem, rrecv_sem,
                                rack_sem, reduce_axis,
                                first=(l == 0), last=False)
        aout = aout_s[...]
        if sandwich:
            # gemma-2 post_attention_layernorm: normed attn output enters
            # the residual add (applied after the tp reduce above — the
            # norm is nonlinear and must see the full sum)
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

    # ---- layer exit ------------------------------------------------------------
    @pl.when(t == T - 1)
    def _():
        # drain this layer's append writes (started >= nb steps ago), then
        # prefetch the next layer's RMW windows so its projection steps
        # never wait on a read
        for g in range(G):
            for cp in _append_copies(l, g, write=True):
                cp.wait()

        @pl.when(l < L - 1)
        def _():
            _start_reads(l + 1)
        out = ffn_s[...]
        if wq_kind == "int8":
            # per-output-column scale is identical on every chip, so it
            # commutes with the cross-chip sum: scale the partial
            out = out * _m2(w2_s_ref)
        hx_s[...] = out
        if reduce_axis is not None:
            # Stage::LINEAR reduce of the row-parallel FFN down-projection,
            # in-kernel: hops overlap the NEXT layer's wqkv block prefetch
            # (already in flight for grid step t+1).
            from clusterfusion_tpu.parallel.collective import \
                ring_reduce_scratch
            ring_reduce_scratch(hx_s, rrecv_s, rsend_sem, rrecv_sem,
                                rack_sem, reduce_axis,
                                first=False, last=(l == L - 1))
        if sandwich:
            # gemma-2 post_feedforward_layernorm: the normed FFN output is
            # what the next layer's residual add consumes
            hv = hx_s[...]
            fv = jnp.mean(hv * hv, axis=-1, keepdims=True)
            hx_s[...] = hv * jax.lax.rsqrt(fv + eps) * _m2(pf_ref).astype(f32)

        @pl.when(l == L - 1)
        def _():
            hx_out_ref[...] = hx_s[...].astype(hx_out_ref.dtype)
            res_out_ref[...] = res_s[...].astype(res_out_ref.dtype)

    # ---- LM-head phases: final RMSNorm + vocab-blocked logits ---------------
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
                # per-output-column int8 LM head: dequant commutes with the
                # dot, scale the [1, bv] logits block (halves the 0.26 GB
                # bf16 LM-head stream at 7B — ~4% of int4 decode bytes)
                logits_ref[...] = jnp.dot(
                    xn, lm_ref[...].astype(jnp.bfloat16),
                    preferred_element_type=f32) * lms_ref[...]
            else:
                logits_ref[...] = jnp.dot(xn, lm_ref[...],
                                          preferred_element_type=f32)


def _vocab_block(V: int, target: int = 1024) -> int:
    """Largest lane-aligned divisor of V at most ``target`` (0 if none)."""
    best = 0
    for d in range(1, target // 128 + 1):
        if V % (d * 128) == 0:
            best = d * 128
    return best


def fused_decoder_stack(
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
    reduce_axis=None,
    window: int = 0,
    bias_qkv=None,
    ffn_act: str = "silu",
    softcap: float = 0.0,
    window_pattern: str = "all",
    post_attn_norm=None,   # [L, hidden] gemma-2 sandwich norms (both or
    post_ffn_norm=None,    #  neither)
):
    """One kernel call for the whole decoder stack (bs=1 decode).

    x: [1, hidden]; attn_norm/ffn_norm: [L, hidden];
    wqkv_f: [L, G, hidden, hg*(group+2)*hd]; wo_f: [L, G, hg*group*hd, hidden]
    (or QuantizedTensors); w13: [L, 2, hidden, f_pad]; w2: [L, f_pad, hidden];
    k_cache/v_cache: [L, kv_heads, capacity, head_dim]; pos: int32 scalar.

    Returns (x_out [1, hidden], residual_out [1, hidden], k_cache', v_cache')
    with the new token's K/V appended in place for every layer.

    If ``final_norm`` [hidden] and ``lm_head`` [hidden, vocab] are given
    (vocab must have a lane-aligned divisor <= 2048), the kernel appends
    final-RMSNorm + vocab-blocked LM-head phases after the last layer —
    logits leave the same single kernel call — and the return becomes
    (logits [1, vocab], residual_out, k_cache', v_cache').  The LM weight
    blocks prefetch while the last layers still compute.

    ``reduce_axis``: a shard_map mesh axis name — the TENSOR-PARALLEL mode.
    Weights/caches enter as the chip's local shard (kv-head-sharded
    wqkv_f/wo_f/caches, column/row-sharded w13/w2; see
    parallel.sharding.param_pspecs) and the kernel fuses the two reference
    reduction points as IN-KERNEL ring all-reduces over ICI remote DMA:
    Stage::ATTN at the attn→FFN boundary (hops overlap this layer's FFN
    weight streaming) and Stage::LINEAR at layer exit (hops overlap the
    next layer's QKV prefetch) — `dsm.cuh:89-169` fused into the megakernel.
    With ``lm_head`` given it must be the local vocab shard (logits return
    vocab-sharded).

    ``window``: sliding-window attention size (Mistral semantics — the new
    token attends positions ``>= seq+1-window`` only; 0 = full context).
    Out-of-window KV chunks cost no HBM bytes: the index map aliases their
    block to the first in-window chunk (Pallas elides the repeat fetch)
    and the kernel body skips their compute.  ``window >= seq+1`` must
    equal full attention exactly (tested).

    ``bias_qkv`` [L, G, hg·(group+2)·hd]: optional QKV projection bias in
    the grouped-column layout (Qwen2 family), added pre-rope in the QKV
    phase.
    """
    if interpret is None:
        interpret = interpret_mode()
    hidden = x.shape[-1]
    hd = head_dim
    dt = x.dtype
    # hd < 128 (TinyLlama / Qwen2-0.5B): the in-kernel RMW append cannot
    # DMA-slice the sub-128-lane cache minor dim (Mosaic (8,128) tiling)
    # — defer the append to one whole-stack XLA update after the kernel
    defer = hd % 128 != 0
    kv8 = isinstance(k_cache, Int8KV)
    if kv8:
        k_arr, ks_arr = k_cache.q, k_cache.s
        v_arr, vs_arr = v_cache.q, v_cache.s
    else:
        k_arr, v_arr = k_cache, v_cache
        ks_arr = vs_arr = None
    L_, kv_heads, cap, _ = k_arr.shape

    wq_kind, gs_q = "none", 0
    wqkv_q = wqkv_s = wo_q = wo_s = w13_q = w13_s = w2_q = w2_s = None
    if isinstance(wqkv_f, QuantizedTensor):
        wq_kind, gs_q = wqkv_f.kind, wqkv_f.group_size
        # int4 group scales stream bf16 (~3% of the weight stream saved;
        # kernels cast after load); int8 per-column scales stay f32
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
        G = wqkv_f.shape[1]
        qkv_cols = wqkv_f.shape[-1]
        f_pad = w2.shape[-2]
    hg = kv_heads // G
    assert qkv_cols == hg * (group + 2) * hd
    pack = 2 if wq_kind == "int4" else 1

    chunk = min(kcfg.chunk_for(cap), max(round_up(cap, 16), 16))
    if kv8:
        # scale planes tile positions 128 per row: chunks must cover whole
        # plane rows (or the single-chunk small-cap case)
        assert cap % 128 == 0 or cap <= 128, \
            f"int8 KV capacity must be 128-aligned (or <=128), got {cap}"
        # Mosaic: a scale-plane BLOCK's sublane dim (chunk/128 rows) must
        # be a multiple of 8 or equal the whole plane.  cap <= 1024: one
        # chunk covering the cache (the scale spec then fetches the full
        # plane).  Larger caps: chunk rounds up to a multiple of 1024
        # (8 plane rows per chunk) — kv_chunk < 1024 would not compile.
        chunk = cap if cap <= 1024 else round_up(chunk, 1024)
        assert chunk % 128 == 0 or chunk == cap, (chunk, cap)
    nc = max(cdiv(cap, chunk), 1)
    bf = ffn_block_size(f_pad, kcfg.ffn_block_target)
    nb = f_pad // bf
    TA = G * nc
    T = TA + nb

    with_lm = lm_head is not None
    lm_kind = "none"
    lm_q = lm_head
    lm_s = None
    if with_lm and isinstance(lm_head, QuantizedTensor):
        assert lm_head.kind == "int8", "LM head supports int8 only"
        lm_kind = "int8"
        lm_q, lm_s = lm_head.q, lm_head.s.astype(jnp.float32)  # [1, V]
    if with_lm:
        V = lm_q.shape[-1]
        bv = _vocab_block(V)
        assert bv > 0, f"vocab {V} has no lane-aligned block <= 2048"
        nv = V // bv
    else:
        nv = bv = 0
    total = L_ * T + nv
    wo_rows = hg * group * hd

    # ---- index maps over the flattened 1D grid: attention operands pin
    # their last block during FFN/LM phases (no re-fetch); w13/w2 pin block
    # 0 during attention and the LM blocks pin 0 until the LM phases
    # (both prefetch while earlier phases compute)
    def lt_of(ta):
        lx = jnp.minimum(ta // T, L_ - 1)
        return lx, ta - lx * T

    def g_of(ta):
        lx, t = lt_of(ta)
        return jnp.minimum(t, TA - 1) // nc

    def j_of(ta):
        lx, t = lt_of(ta)
        return jnp.clip(t - TA, 0, nb - 1)

    def l_of(ta):
        return jnp.minimum(ta // T, L_ - 1)

    def jv_of(ta):
        return jnp.clip(ta - L_ * T, 0, max(nv - 1, 0))

    def kv_index_map(ta, s):
        lx, t = lt_of(ta)
        tt = jnp.minimum(t, TA - 1)
        c_i = tt % nc
        last = jnp.maximum(pl.cdiv(s[0], chunk) - 1, 0)
        cix = jnp.minimum(c_i, last)
        if window:
            # pre-window chunks alias the first in-window chunk's block —
            # Pallas elides the repeat fetch, so out-of-window KV costs no
            # HBM bytes (the kernel body skips their compute too).  Under
            # pattern "even", odd (global) layers keep the full walk.
            first = jnp.maximum(s[0] + 1 - window, 0) // chunk
            if window_pattern == "even":
                first = jnp.where(lx % 2 == 0, first, 0)
            cix = jnp.maximum(cix, jnp.minimum(first, last))
        return (lx, g_of(ta), cix, 0)

    in_specs = [
        pl.BlockSpec((1, hidden), lambda ta, s: (0, 0),
                     memory_space=pltpu.VMEM),                    # x
        pl.BlockSpec((1, 1, hidden), lambda ta, s: (l_of(ta), 0, 0),
                     memory_space=pltpu.VMEM),                    # attn_norm
        pl.BlockSpec((1, 1, hidden), lambda ta, s: (l_of(ta), 0, 0),
                     memory_space=pltpu.VMEM),                    # ffn_norm
        pl.BlockSpec((1, hd), lambda ta, s: (0, 0),
                     memory_space=pltpu.VMEM),                    # cos
        pl.BlockSpec((1, hd), lambda ta, s: (0, 0),
                     memory_space=pltpu.VMEM),                    # sin
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
        pl.BlockSpec((1, hidden), lambda ta, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda ta, s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_lm:
        out_specs.append(pl.BlockSpec((1, bv),
                                      lambda ta, s: (0, jv_of(ta)),
                                      memory_space=pltpu.VMEM))
    if defer:
        # new K/V rows as (layer, group)-blocked outputs (no cache alias)
        newkv_spec = pl.BlockSpec(
            (1, 1, hg, hd), lambda ta, s: (l_of(ta), g_of(ta), 0, 0),
            memory_space=pltpu.VMEM)
        out_specs += [newkv_spec, newkv_spec]
    else:
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
            pltpu.VMEM((1, hidden), jnp.float32),        # xnorm
            pltpu.VMEM((hg * group, hd), jnp.float32),   # q
            pltpu.VMEM((hg * group, hd), jnp.float32),   # softmax acc
            pltpu.VMEM((1, hidden), jnp.float32),        # attn out
            pltpu.VMEM((2, hg * group), jnp.float32),    # (m, l)
            pltpu.VMEM((2 * hg, hd), jnp.float32),       # current k/v
            pltpu.VMEM((1, hidden), jnp.float32),        # hx carry
            pltpu.VMEM((1, hidden), jnp.float32),        # residual carry
            pltpu.VMEM((1, hidden), jnp.float32),        # ffn acc
        ] + ([] if defer else [
            pltpu.VMEM((G, hg, 8, hd), k_arr.dtype),     # K append RMW (per g)
            pltpu.VMEM((G, hg, 8, hd), v_arr.dtype),     # V append RMW
            pltpu.SemaphoreType.DMA((2, G)),
        ]) + ([
            pltpu.VMEM((G, hg, 8, 128), jnp.float32),    # K-scale RMW
            pltpu.VMEM((G, hg, 8, 128), jnp.float32),    # V-scale RMW
            pltpu.SemaphoreType.DMA((2, G)),
        ] if kv8 and not defer else []) + ([
            pltpu.VMEM((2, 1, hidden), jnp.float32),     # ring ping-pong
            pltpu.SemaphoreType.DMA(()),                 # ring send
            pltpu.SemaphoreType.DMA(()),                 # ring recv
            pltpu.SemaphoreType.REGULAR,                 # ring ack
        ] if reduce_axis is not None else []),
    )

    kernel = functools.partial(
        _stack_kernel, hg=hg, group=group, head_dim=hd, kv_chunk=chunk,
        nc=nc, G=G, bf=bf, nb=nb, hidden=hidden, L=L_, nv=nv,
        rope_style=rope_style, eps=eps, wq_kind=wq_kind, gs_q=gs_q,
        w4a8=kcfg.int4_w4a8, kv_kind="int8" if kv8 else "none",
        reduce_axis=reduce_axis, lm_kind=lm_kind, window=window,
        with_bias=bias_qkv is not None, ffn_act=ffn_act,
        softcap=softcap * _LOG2E if softcap else 0.0,
        window_pattern=window_pattern, sandwich=sandwich,
        defer_append=defer)

    wbytes = sum(w.size * w.dtype.itemsize
                 for w in (wqkv_q, wo_q, w13_q, w2_q))
    flops = 2 * L_ * (hidden * (group + 2) * hd * kv_heads
                      + kv_heads * group * cap * hd * 2
                      + kv_heads * group * hd * hidden
                      + 3 * hidden * f_pad)
    nbytes = wbytes + 2 * L_ * kv_heads * cap * hd * k_arr.dtype.itemsize
    if kv8:
        nbytes += 2 * ks_arr.size * 4

    out_shape = [
        jax.ShapeDtypeStruct((1, hidden), dt),
        jax.ShapeDtypeStruct((1, hidden), dt),
    ]
    if with_lm:
        out_shape.append(jax.ShapeDtypeStruct((1, V), jnp.float32))
    n_pre = 3 if with_lm else 2
    if defer:
        out_shape += [
            jax.ShapeDtypeStruct((L_, G, hg, hd), dt),
            jax.ShapeDtypeStruct((L_, G, hg, hd), dt),
        ]
        aliases = {}
    else:
        out_shape += [
            jax.ShapeDtypeStruct(k_arr.shape, k_arr.dtype),
            jax.ShapeDtypeStruct(v_arr.shape, v_arr.dtype),
        ]
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
            transcendentals=L_ * (kv_heads * cap + f_pad)),
        input_output_aliases=aliases,
        interpret=interpret,
    )(seq_arr, *inputs)
    if defer:
        # whole-stack XLA append of the new rows (position `pos`) — ONE
        # dynamic-update per token on the (donated) caches; the in-scan
        # carry keeps it in place.
        from clusterfusion_tpu.ops.quant import cache_fill_rows
        *head, k_new, v_new = results
        kc = cache_fill_rows(k_cache, k_new.reshape(L_, kv_heads, 1, hd),
                             pos)
        vc = cache_fill_rows(v_cache, v_new.reshape(L_, kv_heads, 1, hd),
                             pos)
    elif kv8:
        *head, kc, vc, ks, vs = results
        kc, vc = Int8KV(kc, ks), Int8KV(vc, vs)
    else:
        *head, kc, vc = results
    if with_lm:
        x_out, res_out, logits = head
        return logits, res_out, kc, vc
    x_out, res_out = head
    return x_out, res_out, kc, vc
