"""Fused Llama decoder-layer attention megakernel (single sequence, bs=1).

TPU-native re-design of ClusterFusion's core contribution: the whole
attention half of a decoder layer — residual-add + RMSNorm + QKV projection +
RoPE + KV read + flash-decoding + O-projection — as ONE Pallas kernel
(reference: `include/H100/llama/kernel.cuh:20-619` for the GPT-J-RoPE
variant, `kernel_sglang.cuh:20-633` for the NEOX/fused-residual variant).

How the GPU design maps to TPU (SURVEY.md §7):

- The reference splits the hidden dim over a 4-CTA cluster and sums partial
  QKV with a DSM all-reduce (`kernel.cuh:269-276`); one TPU core sees all of
  VMEM, so the QKV projection is a single MXU matmul per *head group* and
  the all-reduce disappears.
- The reference splits the KV cache over the cluster's CTAs and merges
  per-CTA online-softmax states via DSM scalar reduces
  (`kernel.cuh:479-547`); here the KV cache is walked by a *sequential*
  grid dimension with the (m, l, acc) softmax state carried in VMEM
  scratch — the merge is free.
- The cross-head `atomicAdd` O-projection reduction (`kernel.cuh:600,618`)
  becomes accumulation into a VMEM scratch across head-group grid steps.
- TMA double-buffered weight tile streaming (`kernel.cuh:143-165`) is
  subsumed by Pallas BlockSpec pipelining.
- The exp2-domain online softmax (`ptx_exp2`, softmax_scale·log2(e),
  `kernel.cuh:58`) is kept: the scale is folded into q once.
- The current token's K/V is folded into the softmax state exactly once at
  the final chunk step, mirroring the reference's rank-0-warp insertion
  (`kernel.cuh:444-477`).
- Sequence length is a *prefetched scalar*: KV block index maps clamp to the
  last needed chunk, so steps past the sequence end issue no DMA; the
  kernel compiles per cache *capacity*, not per length.

Performance note (measured on v5e): an M=1 GEMV is MXU-pipeline-bound, so
the projection matmul must be N-wide to reach HBM speed-of-light — a
per-head dot (N = 3·head_dim = 384) runs ~4× slower than an N≥1536 dot.
The kernel therefore processes ``head_group`` KV heads per grid step
(wqkv block N = head_group·(group+2)·head_dim), the O-projection is one
flattened [1, head_group·group·head_dim] @ [·, hidden] dot per head group,
and the grid is (kv_heads/head_group, 1 + kv_chunks): step 0 projects,
steps 1.. walk KV chunks.

The kernel natively supports GQA (``group`` query heads per KV head); the
reference parity API is MHA (group=1).
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
from clusterfusion_tpu.ops.quant import (
    FP8_DECODE_FIX, QuantizedTensor, expand_group_scales, fp8_decode_scaled,
    unpack_int4_bitcast)

_LOG2E = 1.4426950408889634
_NEG_INF = -1e30


def _m2(ref):
    """Load a weight block and squeeze leading singleton block dims to 2D
    (stacked [L, G, ...] weights add a leading 1 to every block)."""
    w = ref[...]
    return w.reshape(w.shape[-2], w.shape[-1])


def _dequant_int4_tile(w_ref_val, s_val, gs: int):
    """Packed int4 tile [K/2, N] + group scales [K/gs, N] → bf16 [K, N].
    One bitcast unpack + bf16 scale multiply; used when the scale varies
    along the reduction axis so dequant can't commute with the dot.  The
    scale multiply runs in bf16 — int4 values are exact in bf16 and the
    product feeds a bf16 MXU dot anyway, so the f32 detour would only cost
    VPU passes."""
    w = unpack_int4_bitcast(w_ref_val).astype(jnp.bfloat16)
    s = expand_group_scales(s_val.astype(jnp.bfloat16), 0, gs)
    return w * s


def _int4_dot(x, w_val, s_val, gs: int, w4a8: bool):
    """INT4 fused-dequant matmul for the megakernels: W4A8 int8-MXU fast
    path (``KernelConfig.int4_w4a8``, default) or the exact bf16 tile
    dequant.  ``x`` is [M, K] bf16, ``w_val`` [K/2, N] packed along the
    sublane axis; returns f32 [M, N]."""
    if w4a8 and gs % 128 == 0:
        # Mosaic lane-legality: the grouped reshape [M, K] -> [(ng,)M, gs]
        # needs the minor (lane) dim gs to be a multiple of 128; smaller
        # group sizes fall through to the exact bf16 dequant below.
        from clusterfusion_tpu.ops.quant import w4a8_int4_dot
        return w4a8_int4_dot(x, w_val, s_val.astype(jnp.float32), gs)
    wb = _dequant_int4_tile(w_val, s_val, gs)
    return jnp.dot(x, wb, preferred_element_type=jnp.float32)


def _oproj_dot(o, wo_val, hd: int):
    """O-projection contraction: o [rows, hd] x wo [rows·hd, hidden] ->
    f32 [1, hidden].

    At hd % 128 == 0 this is one MXU dot over the lane-collapsed
    [1, rows·hd] view.  For sub-128-lane head dims (hd=64 — TinyLlama /
    Qwen2-0.5B) Mosaic rejects that collapse ("unsupported shape cast"
    vector<Rx64> -> vector<1xR·64>), so the contraction runs as per-row
    [1, hd] x [hd, hidden] dots summed — same math, weights stay
    VMEM-resident, only MXU row occupancy drops (negligible at M=1)."""
    rows = o.shape[0]
    if hd % 128 == 0:
        return jnp.dot(o.reshape(1, rows * hd), wo_val,
                       preferred_element_type=jnp.float32)
    acc = None
    for r in range(rows):
        part = jnp.dot(o[r:r + 1], wo_val[r * hd:(r + 1) * hd],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _kv_tile(tile):
    """Loaded KV tile -> (bf16 tile, static f32 dot fixup).

    fp8 e4m3 caches decode via the bit-twiddle re-bias
    (:func:`clusterfusion_tpu.ops.quant.fp8_decode_scaled` — the tile holds
    value * 2**-56 and the fixup multiplies the DOT RESULT); every other
    dtype is the native VPU cast with fixup 1 (statically elided)."""
    if tile.dtype == jnp.float8_e4m3fn:
        return fp8_decode_scaled(tile), FP8_DECODE_FIX
    return tile.astype(jnp.bfloat16), 1.0


def _rope_vec(x, cos_f, sin_f, style: str):
    """Vectorized RoPE on [rows, d] with full-dim cos/sin [1, d].

    NEOX: rotate(x) = roll(x, d/2) with sign (-1 on first half);
    GPT-J: rotate(x) = swap adjacent lanes with sign (-1 on even lanes).
    Pure VPU: rolls + selects, no gathers."""
    d = x.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=x.ndim - 1)
    if style == "neox":
        rot = pltpu.roll(x, d // 2, axis=x.ndim - 1)
        sign = jnp.where(lanes < d // 2, -1.0, 1.0)
    elif style == "gptj":
        fwd = pltpu.roll(x, d - 1, axis=x.ndim - 1)   # x[j+1] at lane j
        bwd = pltpu.roll(x, 1, axis=x.ndim - 1)       # x[j-1] at lane j
        even = (lanes % 2) == 0
        rot = jnp.where(even, fwd, bwd)
        sign = jnp.where(even, -1.0, 1.0)
    else:
        raise ValueError(f"unknown rope style {style!r}")
    return x * cos_f + rot * sign * sin_f


def _decoder_layer_kernel(
    # scalar prefetch: [seq_len, layer_id]
    s_ref,
    # inputs: x, res, rmsw, cos, sin, wqkv[, wqkv_s], wo[, wo_s], k, v
    # then outputs (out, res_out, knew, vnew) and scratch — parsed from
    # *refs because the scale operands exist only for quantized weights
    x_ref, res_ref, rmsw_ref, cos_ref, sin_ref,
    *refs,
    hg: int,          # KV heads per grid step
    group: int,       # query heads per KV head (GQA)
    head_dim: int,
    kv_chunk: int,
    rope_style: str,
    fuse_residual: bool,
    eps: float,
    wq_kind: str,     # "none" | "int8" | "int4" (weight-only quantization)
    gs_q: int,        # int4 group size along the reduction axis
    w4a8: bool = True,  # int4 fast path: int8-quantized activation + MXU dot
    emit_partials: bool = False,  # emit (acc, m, l) pre-O-proj for cross-
                                  # chip sequence-parallel softmax merge
    append_kv: bool = False,      # write the new token's K/V into the cache
                                  # in-kernel (input_output_aliased)
    window: int = 0,              # sliding-window attention: attend only the
                                  # last `window` positions (0 = full context)
    with_bias: bool = False,      # QKV projection bias operand (Qwen2)
    softcap: float = 0.0,         # attn logit softcap, pre-multiplied log2e
    window_pattern: str = "all",  # "even": gemma-2 — window on even layers
):
    it = iter(refs)
    wqkv_ref = next(it)
    wqkv_s_ref = next(it) if wq_kind != "none" else None
    bqkv_ref = next(it) if with_bias else None
    wo_ref = next(it) if not emit_partials else None
    wo_s_ref = next(it) if (wq_kind != "none" and not emit_partials) else None
    k_ref, v_ref = next(it), next(it)
    if emit_partials:
        acc_out_ref, ml_out_ref, res_out_ref, knew_ref, vnew_ref = \
            (next(it) for _ in range(5))
        out_ref = None
    else:
        out_ref, res_out_ref, knew_ref, vnew_ref = (next(it) for _ in range(4))
    kc_out_ref = next(it) if append_kv else None
    vc_out_ref = next(it) if append_kv else None
    xnorm_s, q_s, acc_s, out_s, ml_s, kv_s = (next(it) for _ in range(6))
    if append_kv:
        krow_s, vrow_s, row_sem = (next(it) for _ in range(3))
    hg_id = pl.program_id(0)
    c_id = pl.program_id(1)
    n_chunks = pl.num_programs(1) - 1
    seq = s_ref[0]
    hd = head_dim
    rows = hg * group                                  # q rows per step
    f32 = jnp.float32

    # ---- step (0, 0): residual add + RMSNorm, shared by all heads ----------
    @pl.when(jnp.logical_and(hg_id == 0, c_id == 0))
    def _():
        x = x_ref[...].astype(f32)
        if fuse_residual:
            x = x + res_ref[...].astype(f32)
            res_out_ref[...] = x.astype(res_out_ref.dtype)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        xnorm_s[...] = x * jax.lax.rsqrt(var + eps) * _m2(rmsw_ref).astype(f32)
        out_s[...] = jnp.zeros_like(out_s)

    # ---- per head group, step 0: QKV projection + RoPE + new-KV export -----
    @pl.when(c_id == 0)
    def _():
        xn = xnorm_s[...].astype(jnp.bfloat16)           # [1, hidden]
        # one N-wide MXU dot: N = hg*(group+2)*hd.  INT8 dequant commutes
        # with the dot (per-output-column scale) → scale the [1, N] result;
        # INT4 group scales vary along the reduction → dequant the tile.
        if wq_kind == "none":
            qkv = jnp.dot(xn, _m2(wqkv_ref), preferred_element_type=f32)
        elif wq_kind == "int8":
            qkv = jnp.dot(xn, _m2(wqkv_ref).astype(jnp.bfloat16),
                          preferred_element_type=f32) * _m2(wqkv_s_ref)
        else:  # int4
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
            knew_ref[0, h:h + 1, :] = k.astype(knew_ref.dtype)
            vnew_ref[0, h:h + 1, :] = v.astype(vnew_ref.dtype)
            kv_s[h:h + 1, :] = k
            kv_s[hg + h:hg + h + 1, :] = v
            for i in range(group):
                qi = _rope_vec(qkv[:, base + i * hd: base + (i + 1) * hd],
                               cos_f, sin_f, rope_style)
                q_s[h * group + i: h * group + i + 1, :] = qi * scale
        if append_kv:
            # In-kernel cache append (the reference also writes KV
            # in-kernel, `kernel_batch_sglang.cuh:340-346`): an explicit
            # read-modify-write DMA of the 8-row tile containing position
            # seq into the input_output_aliased HBM cache.  Keeping the
            # append inside the kernel lets XLA keep the GB-scale cache
            # buffer in place — an XLA-level dynamic_update_slice next to
            # the opaque kernel call copies the whole cache per layer
            # (measured 3x decode slowdown at 7B).  The RMW is 8 rows
            # because HBM DMA slices must be sublane-aligned; rows < seq in
            # the tile are rewritten unchanged and the new row at seq is
            # excluded by every score mask, so in-flight chunk reads of the
            # same buffer can't observe a torn value that matters.
            cap_ = kc_out_ref.shape[2]
            row = jnp.minimum(s_ref[0], cap_ - 1)
            row8 = (row // 8) * 8
            off = row - row8
            layer = s_ref[1]
            ksl = kc_out_ref.at[layer, pl.ds(hg_id * hg, hg), pl.ds(row8, 8)]
            vsl = vc_out_ref.at[layer, pl.ds(hg_id * hg, hg), pl.ds(row8, 8)]
            k_in = pltpu.make_async_copy(ksl, krow_s, row_sem.at[0])
            v_in = pltpu.make_async_copy(vsl, vrow_s, row_sem.at[1])
            k_in.start()
            v_in.start()
            k_in.wait()
            v_in.wait()
            sub = jax.lax.broadcasted_iota(jnp.int32, (hg, 8, hd), 1)
            k_new8 = kv_s[:hg, :].astype(krow_s.dtype)[:, None, :]
            v_new8 = kv_s[hg:, :].astype(vrow_s.dtype)[:, None, :]
            krow_s[...] = jnp.where(sub == off, k_new8, krow_s[...])
            vrow_s[...] = jnp.where(sub == off, v_new8, vrow_s[...])
            k_out = pltpu.make_async_copy(krow_s, ksl, row_sem.at[0])
            v_out = pltpu.make_async_copy(vrow_s, vsl, row_sem.at[1])
            k_out.start()
            v_out.start()
            k_out.wait()
            v_out.wait()
        acc_s[...] = jnp.zeros_like(acc_s)
        ml_s[0, :] = jnp.full((rows,), _NEG_INF, f32)    # running max
        ml_s[1, :] = jnp.zeros((rows,), f32)             # running sum

    # ---- chunk steps: online-softmax accumulation over the KV cache --------
    c = c_id - 1   # chunk index for steps >= 1
    live = jnp.logical_and(c_id >= 1, c * kv_chunk < seq)
    if window:
        # sliding window: the query attends only positions >= lo (Mistral
        # semantics — the current token counts inside the window).  lo is
        # the prefetched s[3] in THIS kernel's local KV coordinates: the
        # single-device caller passes seq+1-window; the sequence-parallel
        # caller translates the global bound into each chip's slice
        # (sp_decode.py), which is what makes windows + sp composable.
        # Chunks entirely below lo are skipped: no compute here, and
        # kv_index_map clamps their block index up to the first in-window
        # chunk so no KV bytes are fetched for them either.
        lo = s_ref[3]
        if window_pattern == "even":
            # gemma-2 interleaved: odd (global) layers attend full context
            lo = jnp.where(s_ref[1] % 2 == 0, lo, 0)
        live = jnp.logical_and(live, (c + 1) * kv_chunk > lo)

    @pl.when(live)
    def _():
        pos_base = c * kv_chunk
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (kv_chunk, 1), 0)
        row_valid = (pos_base + row_iota) < seq
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (group, kv_chunk), 1)
        col_valid = (pos_base + col_iota) < seq
        if window:
            row_valid = jnp.logical_and(row_valid, (pos_base + row_iota) >= lo)
            col_valid = jnp.logical_and(col_valid, (pos_base + col_iota) >= lo)
        for h in range(hg):
            q = q_s[h * group:(h + 1) * group, :].astype(jnp.bfloat16)
            # fp8 KV caches decode via the bit-twiddle re-bias; the 2**56
            # fixup lands on the [group, chunk] scores / [group, hd] pv
            kc, kfix = _kv_tile(k_ref[0, h])             # [chunk, hd]
            # Rows past seq are tile padding with undefined content (NaN/Inf
            # possible on hardware): zero v so 0-weighted garbage can't
            # poison the p·V dot; scores get masked below.
            vcr, vfix = _kv_tile(v_ref[0, h])
            vc = jnp.where(row_valid, vcr, 0)
            scores = jax.lax.dot_general(                # [group, chunk]
                q, kc, (((1,), (1,)), ((), ())), preferred_element_type=f32)
            if kfix != 1.0:
                scores = scores * kfix
            if softcap:
                # gemma-2 softcap in the exp2 domain (cap pre-scaled log2e)
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

    # ---- final step: fold current token, normalize, O-projection -----------
    @pl.when(c_id == n_chunks)
    def _():
        q = q_s[...]                                     # [rows, hd] f32
        k_cur = kv_s[:hg, :]                             # [hg, hd]
        v_cur = kv_s[hg:, :]
        # expand per-kv-head current k/v to per-q-head rows
        if group == 1:
            k_rows, v_rows = k_cur, v_cur
        else:
            k_rows = jnp.concatenate(
                [pltpu.repeat(k_cur[h:h + 1, :], group, axis=0)
                 for h in range(hg)], axis=0)
            v_rows = jnp.concatenate(
                [pltpu.repeat(v_cur[h:h + 1, :], group, axis=0)
                 for h in range(hg)], axis=0)
        # fold the current token exactly once (`kernel.cuh:444-477`); under
        # sequence-parallel sharding only the chip owning position `pos`
        # folds it (prefetched flag s[2])
        fold = (s_ref[2] == 1).astype(jnp.float32)
        s_cur = jnp.sum(q * k_rows, axis=-1, keepdims=True)   # [rows, 1]
        if softcap:
            s_cur = softcap * jnp.tanh(s_cur * (1.0 / softcap))
        s_cur = jnp.where(fold == 1.0, s_cur, _NEG_INF)
        m_old = ml_s[0, :].reshape(rows, 1)
        l_old = ml_s[1, :].reshape(rows, 1)
        m_f = jnp.maximum(m_old, s_cur)
        alpha = jnp.exp2(m_old - m_f)
        p_cur = jnp.exp2(s_cur - m_f) * fold
        acc = acc_s[...] * alpha + p_cur * v_rows
        l_f = l_old * alpha + p_cur

        if emit_partials:
            acc_out_ref[0] = acc
            ml_out_ref[0, 0, :] = m_f[:, 0]
            ml_out_ref[0, 1, :] = l_f[:, 0]
            return

        o = (acc / l_f).astype(jnp.bfloat16)             # [rows, hd]
        o_flat = o.reshape(1, rows * hd)
        # one N-wide dot: [1, rows·hd] @ [rows·hd, hidden]
        if wq_kind == "none":
            out_s[...] += jnp.dot(o_flat, _m2(wo_ref),
                                  preferred_element_type=f32)
        elif wq_kind == "int8":
            out_s[...] += jnp.dot(o_flat, _m2(wo_ref).astype(jnp.bfloat16),
                                  preferred_element_type=f32) * _m2(wo_s_ref)
        else:  # int4
            out_s[...] += _int4_dot(o_flat, _m2(wo_ref), _m2(wo_s_ref),
                                    gs_q, w4a8)

        @pl.when(hg_id == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = out_s[...].astype(out_ref.dtype)


def _pick_head_group(kv_heads: int, requested: int) -> int:
    hgv = min(requested, kv_heads)
    while kv_heads % hgv:
        hgv -= 1
    return max(hgv, 1)


def _fused_decoder_layer(
    x, residual, rms_w, cos_f, sin_f, wqkv_f, wo_f, k_cache, v_cache, seq_len,
    layer_id=0,
    *,
    group: int,
    head_dim: int,
    rope_style: str,
    fuse_residual: bool,
    eps: float,
    kcfg: KernelConfig,
    interpret: bool,
    emit_partials: bool = False,
    fold_current=1,
    append_kv: bool = False,
    window: int = 0,
    window_lo=None,   # dynamic int32 scalar: first in-window position in
                      # THIS cache's local coordinates; defaults to
                      # seq_len+1-window.  Sequence-parallel callers pass
                      # pos+1-window-shard_start so a global window maps
                      # correctly onto each chip's KV slice.
    bias_qkv=None,    # [L?, G, hg·(group+2)·hd] QKV bias (Qwen2 family)
    softcap: float = 0.0,
    window_pattern: str = "all",
):
    """Core dispatch. Layouts (all pre-fused by the caller, G = kv_heads /
    head_group):

    x, residual: [1, hidden]; rms_w: [1, hidden]; cos_f/sin_f: [1, head_dim]
    wqkv_f: [G, hidden, hg·(group+2)·head_dim]
            (per KV head, columns [q_0..q_{group-1} | k | v])
    wo_f:   [G, hg·group·head_dim, hidden]
    k_cache/v_cache: [n_layers, kv_heads, capacity, head_dim] — the whole
    layer-stacked cache; ``layer_id`` (int32 scalar) picks the layer via the
    BlockSpec index maps, so a layer-scanned caller pays no per-layer cache
    slicing (the TPU answer to the reference's per-layer device pointer
    table, `kernel_batch_sglang.cuh:118-119`).  seq_len: int32 scalar.

    wqkv_f / wo_f may be ``QuantizedTensor``s (INT8 per-column or INT4
    group-wise) — dequantization then happens inside the kernel, halving /
    quartering the weight HBM traffic that dominates bs=1 decode.

    Returns (output [1,hidden], residual_out [1,hidden],
             k_new [kv_heads, head_dim], v_new [kv_heads, head_dim]).
    """
    wq_kind, gs_q = "none", 0
    wqkv_q = wqkv_s = wo_q = wo_s = None
    if isinstance(wqkv_f, QuantizedTensor):
        assert isinstance(wo_f, QuantizedTensor) and wo_f.kind == wqkv_f.kind
        wq_kind, gs_q = wqkv_f.kind, wqkv_f.group_size
        # int4 group scales are streamed bf16 (they're 8/gs of the packed
        # bytes — f32 wastes ~3% of the weight stream; kernels cast after
        # load).  int8 per-column scales are [1, N] (negligible): keep f32.
        sdt = jnp.bfloat16 if wq_kind == "int4" else jnp.float32
        wqkv_q, wqkv_s = wqkv_f.q, wqkv_f.s.astype(sdt)
        wo_q, wo_s = wo_f.q, wo_f.s.astype(sdt)
        wshape = wqkv_f.shape
    else:
        wshape = wqkv_f.shape
        wqkv_q, wo_q = wqkv_f, wo_f
    # stacked mode: whole [L, ...] weight stacks are passed and the layer is
    # picked inside the BlockSpec index maps (prefetched s[1]) — slicing the
    # stack at the XLA level would materialize a fresh copy of every layer's
    # weights per call, since a pallas operand (unlike a fused einsum) needs
    # a real buffer (measured 3x decode slowdown at 7B)
    stacked = len(wshape) == 4
    G, hidden, qkv_cols = wshape[-3:]
    kv_heads = k_cache.shape[1]
    hg = kv_heads // G
    assert qkv_cols == hg * (group + 2) * head_dim
    cap = k_cache.shape[2]
    hd = head_dim
    chunk = min(kcfg.chunk_for(cap), max(round_up(cap, 16), 16))
    n_chunks = max(cdiv(cap, chunk), 1)
    dt = x.dtype
    wo_rows = hg * group * hd
    pack = 2 if wq_kind == "int4" else 1

    def kv_index_map(g_i, c_i, s):
        last = jnp.maximum(pl.cdiv(s[0], chunk) - 1, 0)
        c = jnp.minimum(jnp.maximum(c_i - 1, 0), last)
        if window:
            # pre-window chunks re-reference the first in-window chunk's
            # block: Pallas elides the repeat fetch, so out-of-window KV
            # costs no HBM bytes (the kernel body skips their compute too).
            # s[3] is the window's first valid LOCAL position (see body).
            # Pattern "even": odd (global) layers keep the full walk.
            first = jnp.maximum(s[3], 0) // chunk
            if window_pattern == "even":
                first = jnp.where(s[1] % 2 == 0, first, 0)
            c = jnp.maximum(c, jnp.minimum(first, last))
        return (s[1], g_i, c, 0)

    if stacked:
        def _g_spec(rows, cols):
            return pl.BlockSpec((1, 1, rows, cols),
                                lambda g, c, s: (s[1], g, 0, 0),
                                memory_space=pltpu.VMEM)
        # [L, 1, hidden]: keeps the block's tiled trailing dims (1, hidden)
        rmsw_spec = pl.BlockSpec((1, 1, hidden), lambda g, c, s: (s[1], 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        def _g_spec(rows, cols):
            return pl.BlockSpec((1, rows, cols), lambda g, c, s: (g, 0, 0),
                                memory_space=pltpu.VMEM)
        rmsw_spec = pl.BlockSpec((1, hidden), lambda g, c, s: (0, 0),
                                 memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, hidden), lambda g, c, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda g, c, s: (0, 0), memory_space=pltpu.VMEM),
        rmsw_spec,
        pl.BlockSpec((1, hd), lambda g, c, s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hd), lambda g, c, s: (0, 0), memory_space=pltpu.VMEM),
        _g_spec(hidden // pack, qkv_cols),
    ]
    inputs = [x, residual, rms_w, cos_f, sin_f, wqkv_q]
    if wq_kind != "none":
        in_specs.append(_g_spec(wqkv_s.shape[-2], qkv_cols))
        inputs.append(wqkv_s)
    if bias_qkv is not None:
        if stacked:
            in_specs.append(pl.BlockSpec((1, 1, qkv_cols),
                                         lambda g, c, s: (s[1], g, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((1, qkv_cols),
                                         lambda g, c, s: (g, 0),
                                         memory_space=pltpu.VMEM))
        inputs.append(bias_qkv)
    if not emit_partials:
        in_specs.append(_g_spec(wo_rows // pack, hidden))
        inputs.append(wo_q)
        if wq_kind != "none":
            in_specs.append(_g_spec(wo_s.shape[-2], hidden))
            inputs.append(wo_s)
    in_specs += [
        pl.BlockSpec((1, hg, chunk, hd), kv_index_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, chunk, hd), kv_index_map, memory_space=pltpu.VMEM),
    ]
    # alias indices include the scalar-prefetch operand (index 0)
    k_alias_idx = 1 + len(inputs)
    inputs += [k_cache, v_cache]

    assert not (append_kv and emit_partials), \
        "sequence-parallel partials append via the caller (owner chip only)"

    if emit_partials:
        out_specs = (
            pl.BlockSpec((1, hg * group, hd), lambda g, c, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hg * group), lambda g, c, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda g, c, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, hd), lambda g, c, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, hd), lambda g, c, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        )
    else:
        out_specs = (
            pl.BlockSpec((1, hidden), lambda g, c, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda g, c, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, hd), lambda g, c, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, hd), lambda g, c, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        if append_kv:
            # whole-array HBM refs: the kernel DMAs the new row in itself
            out_specs = out_specs + (
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, n_chunks + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((1, hidden), jnp.float32),            # x_norm
            pltpu.VMEM((hg * group, hd), jnp.float32),       # q (scaled, rope'd)
            pltpu.VMEM((hg * group, hd), jnp.float32),       # softmax acc
            pltpu.VMEM((1, hidden), jnp.float32),            # output accumulator
            pltpu.VMEM((2, hg * group), jnp.float32),        # running (m, l)
            pltpu.VMEM((2 * hg, hd), jnp.float32),           # current (k, v)
        ] + ([
            pltpu.VMEM((hg, 8, hd), k_cache.dtype),          # K append RMW tile
            pltpu.VMEM((hg, 8, hd), v_cache.dtype),          # V append RMW tile
            pltpu.SemaphoreType.DMA((2,)),                   # row-append DMA
        ] if append_kv else []),
    )

    kernel = functools.partial(
        _decoder_layer_kernel,
        hg=hg, group=group, head_dim=hd, kv_chunk=chunk,
        rope_style=rope_style, fuse_residual=fuse_residual, eps=eps,
        wq_kind=wq_kind, gs_q=gs_q, w4a8=kcfg.int4_w4a8,
        emit_partials=emit_partials, append_kv=append_kv, window=window,
        with_bias=bias_qkv is not None,
        softcap=softcap * _LOG2E if softcap else 0.0,
        window_pattern=window_pattern,
    )

    flops = 2 * hidden * (group + 2) * hd * kv_heads \
        + 2 * kv_heads * group * cap * hd * 2 \
        + 2 * kv_heads * group * hd * hidden
    nbytes = (wqkv_q.size * wqkv_q.dtype.itemsize
              + (0 if emit_partials else wo_q.size * wo_q.dtype.itemsize)) \
        + 2 * kv_heads * cap * hd * k_cache.dtype.itemsize

    if window_lo is None:
        window_lo = jnp.asarray(seq_len, jnp.int32) + 1 - window if window \
            else 0
    seq_arr = jnp.stack([jnp.asarray(seq_len, jnp.int32).reshape(()),
                         jnp.asarray(layer_id, jnp.int32).reshape(()),
                         jnp.asarray(fold_current, jnp.int32).reshape(()),
                         jnp.asarray(window_lo, jnp.int32).reshape(())])

    if emit_partials:
        acc, ml, res_out, k_new, v_new = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((G, hg * group, hd), jnp.float32),
                jax.ShapeDtypeStruct((G, 2, hg * group), jnp.float32),
                jax.ShapeDtypeStruct((1, hidden), dt),
                jax.ShapeDtypeStruct((G, hg, hd), dt),
                jax.ShapeDtypeStruct((G, hg, hd), dt),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=kcfg.vmem_limit_bytes,
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=nbytes,
                transcendentals=kv_heads * cap),
            interpret=interpret,
        )(seq_arr, *inputs)
        rows = kv_heads * group
        return (acc.reshape(rows, hd),
                ml.transpose(1, 0, 2).reshape(2, rows),
                res_out,
                k_new.reshape(kv_heads, hd), v_new.reshape(kv_heads, hd))

    out_shape = (
        jax.ShapeDtypeStruct((1, hidden), dt),
        jax.ShapeDtypeStruct((1, hidden), dt),
        jax.ShapeDtypeStruct((G, hg, hd), dt),
        jax.ShapeDtypeStruct((G, hg, hd), dt),
    )
    aliases = {}
    if append_kv:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        )
        aliases = {k_alias_idx: 4, k_alias_idx + 1: 5}

    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kcfg.vmem_limit_bytes,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nbytes, transcendentals=kv_heads * cap),
        input_output_aliases=aliases,
        interpret=interpret,
    )(seq_arr, *inputs)
    out, res_out, k_new, v_new = results[:4]
    if append_kv:
        return (out, res_out,
                k_new.reshape(kv_heads, hd), v_new.reshape(kv_heads, hd),
                results[4], results[5])
    return (out, res_out,
            k_new.reshape(kv_heads, hd), v_new.reshape(kv_heads, hd))


def fuse_qkv_o_for_kernel(wqkv_per_head, wo_per_head, kv_heads: int,
                          group: int, head_dim: int, head_group: int):
    """[kv, hidden, (g+2)·hd] + [kv, g·hd, hidden] → head-grouped kernel
    layouts ([G, hidden, hg·(g+2)·hd], [G, hg·g·hd, hidden])."""
    hg = head_group
    G = kv_heads // hg
    kv, hidden, cols = wqkv_per_head.shape
    wqkv_g = (wqkv_per_head.reshape(G, hg, hidden, cols)
              .transpose(0, 2, 1, 3).reshape(G, hidden, hg * cols))
    wo_g = wo_per_head.reshape(G, hg * group * head_dim, hidden)
    return wqkv_g, wo_g


# --------------------------------------------------------------------------
# Reference-parity public APIs
# --------------------------------------------------------------------------


def _prep_mha(weight_qkv, weight_o, k_cache, v_cache, heads, hd, hg,
              transposed_blocks: bool):
    """Reference tensor layouts → kernel layouts (MHA).

    transposed_blocks=False: weight_qkv is torch-Linear [3·hidden, hidden]
    (sglang op).  True: stacked [in, out] blocks (``_build_cf_weights``
    layout, `chat/llama/model.py:316-322`)."""
    hidden = heads * hd
    seq = k_cache.shape[0]
    if transposed_blocks:
        per_head = (weight_qkv.reshape(3, hidden, heads, hd)
                    .transpose(2, 1, 0, 3).reshape(heads, hidden, 3 * hd))
        wo_per_head = weight_o.reshape(heads, hd, hidden)
    else:
        per_head = (weight_qkv.reshape(3, heads, hd, hidden)
                    .transpose(1, 3, 0, 2).reshape(heads, hidden, 3 * hd))
        wo_per_head = weight_o.T.reshape(heads, hd, hidden)
    wqkv_g, wo_g = fuse_qkv_o_for_kernel(per_head, wo_per_head, heads, 1, hd, hg)
    kc = k_cache.reshape(seq, heads, hd).transpose(1, 0, 2)[None]
    vc = v_cache.reshape(seq, heads, hd).transpose(1, 0, 2)[None]
    return wqkv_g, wo_g, kc, vc, seq


@functools.partial(jax.jit,
                   static_argnames=("eps", "kernel_config", "window"))
def llama_decoder_layer_sglang(
    input: jnp.ndarray,       # [1, hidden]
    residual: jnp.ndarray,    # [1, hidden]
    weight_qkv: jnp.ndarray,  # [3*hidden, hidden]  (torch Linear [out, in])
    weight_o: jnp.ndarray,    # [hidden, hidden]
    k_cache: jnp.ndarray,     # [seq, hidden]
    v_cache: jnp.ndarray,     # [seq, hidden]
    rms_w: jnp.ndarray,       # [hidden]
    eps: float,
    cos: jnp.ndarray,         # [head_dim/2]
    sin: jnp.ndarray,         # [head_dim/2]
    kernel_config: Optional[KernelConfig] = None,
    window: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused layer, sglang variant: NEOX RoPE + fused residual-add + runtime
    eps, weights in torch Linear [out, in] layout.  Twin of the reference op
    `clusterfusion.llama_decoder_layer_sglang` (`pybind.cpp:14-25,111`).

    ``window`` > 0 enables sliding-window attention (Mistral semantics: the
    token at position seq attends positions >= seq+1-window only; the
    reference is full-context-only).  Out-of-window KV chunks are skipped
    in-kernel — no HBM fetch, no compute — so long-context decode cost is
    bounded by the window, not the cache length.

    Returns (output, residual_out, k_new, v_new), each [1, hidden]
    (k_new/v_new flattened from [heads, head_dim])."""
    kcfg = kernel_config or KernelConfig()
    hidden = input.shape[-1]
    hd = 2 * cos.shape[-1]
    heads = hidden // hd
    hg = _pick_head_group(heads, kcfg.head_group)
    wqkv_g, wo_g, kc, vc, seq = _prep_mha(
        weight_qkv, weight_o, k_cache, v_cache, heads, hd, hg, False)
    cos_f = jnp.concatenate([cos, cos])[None, :]
    sin_f = jnp.concatenate([sin, sin])[None, :]

    out, res_out, k_new, v_new = _fused_decoder_layer(
        input, residual, rms_w[None, :], cos_f, sin_f, wqkv_g, wo_g, kc, vc,
        seq, group=1, head_dim=hd, rope_style="neox", fuse_residual=True,
        eps=eps, kcfg=kcfg, interpret=interpret_mode(), window=window)
    return out, res_out, k_new.reshape(1, hidden), v_new.reshape(1, hidden)


@functools.partial(jax.jit, static_argnames=("eps", "kernel_config"))
def llama_decoder_layer(
    input: jnp.ndarray,       # [1, hidden]
    weight_qkv: jnp.ndarray,  # [3*hidden, hidden] of stacked W.T ([in, out]) blocks
    weight_o: jnp.ndarray,    # [hidden, hidden] = wo.T ([in, out])
    k_cache: jnp.ndarray,     # [seq, hidden]
    v_cache: jnp.ndarray,     # [seq, hidden]
    rms_w: jnp.ndarray,       # [hidden]
    cos: jnp.ndarray,         # [1, head_dim] repeat_interleaved
    sin: jnp.ndarray,         # [1, head_dim]
    eps: float = 1e-6,
    kernel_config: Optional[KernelConfig] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused layer, meta-llama variant: GPT-J interleaved RoPE, no residual
    add (caller adds, `chat/llama/model.py:492`), eps=1e-6
    (`kernel.cuh:58`), weights in the transposed [in, out] layout built by
    ``_build_cf_weights`` (`chat/llama/model.py:316-322`).  Twin of the
    reference op `clusterfusion.llama_decoder_layer` (`pybind.cpp:3-12,110`).

    Returns (output, k_new, v_new), each [1, hidden]."""
    kcfg = kernel_config or KernelConfig()
    hidden = input.shape[-1]
    hd = cos.shape[-1]
    heads = hidden // hd
    hg = _pick_head_group(heads, kcfg.head_group)
    wqkv_g, wo_g, kc, vc, seq = _prep_mha(
        weight_qkv, weight_o, k_cache, v_cache, heads, hd, hg, True)

    out, _, k_new, v_new = _fused_decoder_layer(
        input, input, rms_w[None, :], cos.reshape(1, hd), sin.reshape(1, hd),
        wqkv_g, wo_g, kc, vc, seq, group=1, head_dim=hd,
        rope_style="gptj", fuse_residual=False, eps=eps, kcfg=kcfg,
        interpret=interpret_mode())
    return out, k_new.reshape(1, hidden), v_new.reshape(1, hidden)
