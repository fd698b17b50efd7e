"""Flash-attention prefill kernel (causal, GQA, chunked-prefill ready).

The reference never fuses prefill: both its paths build the full [T, S]
score matrix eagerly (`chat/llama/model.py:254-260,589-603`), which is
O(T·S) HBM traffic and memory per layer.  This Pallas kernel computes the
same causal attention with online softmax over key blocks, so peak memory
is O(block_q · block_k) per core and long prompts (8K+) neither spill nor
materialize score tensors.

Design (TPU-first, mirroring the decode kernel's softmax algebra in
`ops/decoder_layer.py`):

- Grid ``(kv_heads, q_blocks, k_blocks)`` with the key-block dimension
  innermost: the (m, l, acc) online-softmax state for one (head, q-block)
  lives in VMEM scratch across the sequential k-block steps — the decode
  kernel's carry pattern applied to a [block_q·group] row panel instead of
  a single token row.
- GQA is handled *inside* the panel: a q block loads ``[bq, group, hd]``
  and flattens to ``[bq·group, hd]`` rows so every MXU dot is
  ``(bq·group) × hd × bk`` — K/V blocks stream from HBM once per KV head,
  not once per query head.
- Causality is enforced two ways: fully-masked key blocks above the
  diagonal are *skipped* (their compute is guarded out and their DMA index
  is clamped to the last needed block), and the diagonal block applies an
  elementwise position mask.
- ``q_offset`` (static) shifts query positions for chunked prefill: the
  chunk's queries at absolute positions ``q_offset .. q_offset+T-1``
  attend to keys ``0 .. q_offset+T-1`` — the serving engine can prefill a
  long prompt in fixed-size chunks against the growing cache.

The softmax runs in the exp2 domain with the 1/sqrt(d)·log2(e) factor
folded into the scores once, matching the reference's `ptx_exp2` trick
(`include/H100/llama/kernel.cuh:58`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clusterfusion_tpu.ops._support import cdiv, interpret_mode, round_up

_LOG2E = 1.4426950408889634
_NEG_INF = -1e30


def _flash_prefill_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                          *, bq: int, bk: int, group: int, head_dim: int,
                          n_kb: int, q_offset: int, scale: float,
                          window: int = 0, softcap: float = 0.0):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    rows = bq * group

    @pl.when(kb == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # A key block is needed iff its first key position is <= the last query
    # position of this q block (causal upper-triangle blocks are skipped;
    # their DMA is clamped to the last needed block by the index maps) and,
    # under sliding-window attention, its last key position is inside the
    # window of the block's FIRST query — the query with the lowest window
    # bound (blocks entirely below every query's window are skipped; the
    # index maps alias their DMA to the first needed block so they cost no
    # HBM bytes).
    needed = kb * bk <= q_offset + (qb + 1) * bq - 1
    if window:
        needed = jnp.logical_and(
            needed,
            (kb + 1) * bk - 1 >= q_offset + qb * bq + 1 - window)

    @pl.when(needed)
    def _():
        q = q_ref[...].reshape(rows, head_dim)
        k = k_ref[...].reshape(bk, head_dim)
        v = v_ref[...].reshape(bk, head_dim)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * _LOG2E)
        if softcap:
            # gemma-2 logit softcap (exp2 domain; cap pre-scaled by log2e)
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))
        # row r of the panel is query index r // group of this block
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)
        qpos = q_offset + qb * bq + r // group
        kpos = kb * bk + c
        live = kpos <= qpos
        if window:
            # Mistral semantics: query p attends keys >= p+1-window only
            live = jnp.logical_and(live, kpos > qpos - window)
        scores = jnp.where(live, scores, _NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(scores - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kb == n_kb - 1)
    def _():
        # every REAL row has l > 0: its diagonal key (kpos == qpos) always
        # contributed (in-window for any window >= 1).  Padded tail rows
        # under a small window can end with l == 0 (their diagonal lies
        # beyond the padded key range); guard the divide — those rows are
        # sliced off by the caller.
        l = l_ref[:, :1]
        out = acc_ref[...] / (jnp.maximum(l, 1e-30) if window else l)
        o_ref[...] = out.reshape(1, bq, group, head_dim).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("q_offset", "block_q", "block_k", "window",
                     "softcap", "interpret"))
def flash_prefill_attention(
    q: jnp.ndarray,             # [kv_heads, T, group, head_dim]
    k: jnp.ndarray,             # [kv_heads, S, head_dim], S >= q_offset + T
    v: jnp.ndarray,             # [kv_heads, S, head_dim]
    *,
    q_offset: int = 0,
    block_q: int = 256,
    block_k: int = 512,
    window: int = 0,
    softcap: float = 0.0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Causal (chunk-offset) GQA attention over full K/V context.

    Query i (absolute position ``q_offset + i``) attends to key positions
    ``0 .. q_offset + i``.  Keys beyond ``q_offset + T - 1`` are never
    read (causality), so callers may pass a padded K/V buffer.
    Returns ``[kv_heads, T, group, head_dim]`` in q's dtype.

    ``window`` > 0 = sliding-window attention (Mistral semantics: query p
    attends keys ``p+1-window .. p`` only; 0 = full causal).  Key blocks
    entirely below every query's window are skipped AND their DMA aliases
    the first needed block, so long-prompt prefill cost is O(T·window),
    not O(T²).
    """
    if interpret is None:
        interpret = interpret_mode()
    kv_heads, T, group, hd = q.shape
    S = k.shape[1]
    assert k.shape == (kv_heads, S, hd) and v.shape == (kv_heads, S, hd)
    assert S >= q_offset + T, (S, q_offset, T)

    bq = min(block_q, round_up(T, 8))
    bk = min(block_k, round_up(q_offset + T, 16))
    Tp = round_up(T, bq)
    Sp = round_up(q_offset + T, bk)        # keys past the last query: unread
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    if Sp > S:
        pad = ((0, 0), (0, Sp - S), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    elif Sp < S:
        k = k[:, :Sp]
        v = v[:, :Sp]
    n_qb, n_kb = Tp // bq, Sp // bk

    def kv_im(h, qb, kb):
        last = (q_offset + (qb + 1) * bq - 1) // bk
        kb = jnp.minimum(kb, last)
        if window:
            # below-window blocks alias the first needed block (Pallas
            # elides the repeat fetch → no HBM bytes for skipped history)
            first = jnp.maximum(q_offset + qb * bq + 1 - window, 0) // bk
            kb = jnp.maximum(kb, jnp.minimum(first, last))
        return (h, kb, 0)

    out = pl.pallas_call(
        functools.partial(
            _flash_prefill_kernel, bq=bq, bk=bk, group=group, head_dim=hd,
            n_kb=n_kb, q_offset=q_offset, scale=1.0 / (hd ** 0.5),
            window=window, softcap=softcap * _LOG2E if softcap else 0.0),
        grid=(kv_heads, n_qb, n_kb),
        in_specs=[
            pl.BlockSpec((1, bq, group, hd), lambda h, qb, kb: (h, qb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), kv_im, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), kv_im, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, group, hd),
                               lambda h, qb, kb: (h, qb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kv_heads, Tp, group, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq * group, 128), jnp.float32),   # running max m
            pltpu.VMEM((bq * group, 128), jnp.float32),   # running sum l
            pltpu.VMEM((bq * group, hd), jnp.float32),    # output acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * kv_heads * group * Tp * Sp * hd,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=kv_heads * group * Tp * Sp),
        interpret=interpret,
    )(q, k, v)
    return out[:, :T]
