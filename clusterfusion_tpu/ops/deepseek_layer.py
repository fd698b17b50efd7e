"""DeepSeek-V2 MLA fused decoder-layer megakernel.

TPU twin of `DeepSeekDecoderLayerKernel`
(`include/H100/deepseek/kernel.cuh:9-697` + dispatch
`deepseek_kernel_dispatch.cu`): matrix-absorbed MLA decode — RMSNorm,
q_nope/q_pe/ckv/k_pe projections, partial NEOX RoPE on the rope slices
(`kernel.cuh:299-316`), ckv RMSNorm (`:318-350`), q@W_UK absorption into the
compressed space (`:352-388`), flash-decoding over the compressed ckv cache
(`:399-516`), @W_UV expansion (`:601-645`), O-projection (`:647-696`) — one
Pallas kernel.

Platform mapping: at DeepSeek-V2-lite geometry every weight of the layer
(~28 MB bf16) fits in VMEM at once, so unlike the Llama kernel there is no
weight-streaming dimension — the grid walks KV chunks only, and the four
projections fuse into ONE N-wide MXU dot (N = heads·(nope+rope) + lora +
rope = 3648), which the reference computes as 4 separate GEMV stages
followed by a DSM all-reduce (`:128-297`).  The absorbed per-head attention
becomes a single [heads, lora+rope] × [chunk, lora+rope]ᵀ dot per chunk —
the reference's `QUK_DEEPSEEK` all-gather (`:390-397`) disappears.

Improvements over the reference prototype (SURVEY.md §2.1): sequence length
is a runtime scalar (the reference hardcodes SEQ_LEN 4096,
`deepseek/config.h:9`); the current token IS attended and its compressed KV
row is returned for cache append (the reference overwrites the last cache
slot in-register and never appends, `kernel.cuh:519-521`).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clusterfusion_tpu.config import KernelConfig
from clusterfusion_tpu.ops._support import cdiv, interpret_mode, round_up
from clusterfusion_tpu.ops.decoder_layer import (_int4_dot, _kv_tile,
    _rope_vec)
from clusterfusion_tpu.ops.quant import QuantizedTensor

_LOG2E = 1.4426950408889634
_NEG_INF = -1e30


def _mla_kernel(
    # scalar prefetch: [seq_len, layer_id]
    s_ref,
    # inputs
    x_ref, rms_in_ref, rms_ckv_ref, cos_ref, sin_ref,
    # then (from *refs): wproj[, wproj_s], wuk[, wuk_s], wuv[, wuv_s],
    # wo[, wo_s], cache — scale operands exist only for quantized weights —
    # outputs (+ aliased cache out and RMW scratch when append=True)
    *refs,
    heads: int,
    nope: int,
    rope: int,
    lora: int,
    kv_chunk: int,
    eps: float,
    softmax_scale: float,
    append: bool = False,
    mla_pad: int = 0,   # cache minor dim, = round_up(lora+rope, 128): HBM
                        # tiling demands 128-aligned minor dims for the
                        # chunk blocks and the append RMW DMA (Mosaic
                        # rejects e.g. V2's 576); pad columns carry zeros
    wq_kind: str = "none",   # "none" | "int8" | "int4": in-kernel dequant
                             # of the 4 fused projections (the reference's
                             # five GEMVs, `deepseek/kernel.cuh:128-288`)
    gs_q: int = 0,
    w4a8: bool = True,
):
    it = iter(refs)
    quant = wq_kind != "none"
    wproj_ref = next(it)
    wproj_s_ref = next(it) if quant else None
    wuk_ref = next(it)
    wuk_s_ref = next(it) if quant else None
    wuv_ref = next(it)
    wuv_s_ref = next(it) if quant else None
    wo_ref = next(it)
    wo_s_ref = next(it) if quant else None
    cache_ref = next(it)
    out_ref = next(it)
    ckv_new_ref = next(it)
    cache_out_ref = next(it) if append else None
    q_s, acc_s, ml_s, cur_s = (next(it) for _ in range(4))
    if append:
        row_s, row_sem = next(it), next(it)
    c_id = pl.program_id(0)
    n_chunks = pl.num_programs(0) - 1
    seq = s_ref[0]
    mla = lora + rope
    mla_pad = mla_pad or mla
    f32 = jnp.float32
    scale = softmax_scale * _LOG2E

    def qdot(x_bf, w_ref, s_ref2, sl=None):
        """Fused-dequant dot for one projection: x [1|M, K] bf16 against a
        (possibly quantized) weight block; ``sl`` slices a per-head weight
        out of a stacked [1, h, ...] block."""
        wv = w_ref[...] if sl is None else w_ref[sl]
        wv = wv.reshape(wv.shape[-2], wv.shape[-1])
        if wq_kind == "none":
            return jnp.dot(x_bf, wv, preferred_element_type=f32)
        sv = s_ref2[...] if sl is None else s_ref2[sl]
        sv = sv.reshape(sv.shape[-2], sv.shape[-1])
        if wq_kind == "int8":
            return jnp.dot(x_bf, wv.astype(jnp.bfloat16),
                           preferred_element_type=f32) * sv
        return _int4_dot(x_bf, wv, sv, gs_q, w4a8)

    # ---- step 0: norm + fused projections + rope + absorb -------------------
    @pl.when(c_id == 0)
    def _():
        x = x_ref[...].astype(f32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        rms_in = rms_in_ref[...].reshape(1, rms_in_ref.shape[-1])
        xn = (x * jax.lax.rsqrt(var + eps)
              * rms_in.astype(f32)).astype(jnp.bfloat16)
        # one N-wide dot: [q_nope (h·nope) | q_pe (h·rope) | ckv (lora) | k_pe]
        proj = qdot(xn, wproj_ref, wproj_s_ref)
        qn_off, qp_off = 0, heads * nope
        ckv_off = qp_off + heads * rope
        kpe_off = ckv_off + lora

        cos_f = cos_ref[...].astype(f32)
        sin_f = sin_ref[...].astype(f32)

        ckv = proj[:, ckv_off:ckv_off + lora]
        cvar = jnp.mean(ckv * ckv, axis=-1, keepdims=True)
        rms_ckv = rms_ckv_ref[...].reshape(1, rms_ckv_ref.shape[-1])
        ckv = ckv * jax.lax.rsqrt(cvar + eps) * rms_ckv.astype(f32)
        k_pe = _rope_vec(proj[:, kpe_off:kpe_off + rope], cos_f, sin_f, "neox")
        ckv_new_ref[0, 0:1, :lora] = ckv.astype(ckv_new_ref.dtype)
        ckv_new_ref[0, 0:1, lora:] = k_pe.astype(ckv_new_ref.dtype)
        cur_s[0:1, :lora] = ckv
        cur_s[0:1, lora:mla] = k_pe
        if mla_pad > mla:
            cur_s[0:1, mla:] = jnp.zeros((1, mla_pad - mla), f32)

        # per-head: absorb q_nope through W_UK; q rows = [q_lora | q_pe]
        for h in range(heads):
            qn = proj[:, qn_off + h * nope: qn_off + (h + 1) * nope]
            ql = qdot(qn.astype(jnp.bfloat16), wuk_ref, wuk_s_ref,
                      sl=(0, h))                             # [1, lora]
            qp = _rope_vec(proj[:, qp_off + h * rope: qp_off + (h + 1) * rope],
                           cos_f, sin_f, "neox")
            q_s[h:h + 1, :lora] = ql * scale
            q_s[h:h + 1, lora:mla] = qp * scale
            if mla_pad > mla:   # zero q pads so garbage cache pads can't score
                q_s[h:h + 1, mla:] = jnp.zeros((1, mla_pad - mla), f32)
        acc_s[...] = jnp.zeros_like(acc_s)
        ml_s[0, :] = jnp.full((heads,), _NEG_INF, f32)
        ml_s[1, :] = jnp.zeros((heads,), f32)

    # ---- chunk steps: flash-decode over the compressed cache ----------------
    c = c_id - 1
    @pl.when(jnp.logical_and(c_id >= 1, c * kv_chunk < seq))
    def _():
        pos_base = c * kv_chunk
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (kv_chunk, 1), 0)
        row_valid = (pos_base + row_iota) < seq
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (heads, kv_chunk), 1)
        col_valid = (pos_base + col_iota) < seq

        q = q_s[...].astype(jnp.bfloat16)                    # [heads, mla_pad]
        # fp8 e4m3 compressed caches decode via the bit-twiddle re-bias
        # (ops.quant.fp8_decode_scaled): the tile holds value·2^-56 and the
        # fixup lands once on each dot result
        kc, kfix = _kv_tile(cache_ref[0])                    # [chunk, mla_pad]
        # ckv doubles as V (first lora dims); zero padded rows
        vc = jnp.where(row_valid, kc[:, :lora], 0)
        scores = jax.lax.dot_general(                        # [heads, chunk]
            q, kc, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        if kfix != 1.0:
            scores = scores * kfix
        scores = jnp.where(col_valid, scores, _NEG_INF)

        m_old = ml_s[0, :].reshape(heads, 1)
        l_old = ml_s[1, :].reshape(heads, 1)
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_old - m_new)
        p = jnp.exp2(scores - m_new) * col_valid.astype(f32)
        pv = jnp.dot(p.astype(jnp.bfloat16), vc, preferred_element_type=f32)
        if kfix != 1.0:
            pv = pv * kfix
        acc_s[...] = acc_s[...] * alpha + pv
        ml_s[0, :] = m_new[:, 0]
        ml_s[1, :] = (l_old * alpha + jnp.sum(p, axis=-1, keepdims=True))[:, 0]

    # ---- final: current token + W_UV expansion + O-projection ---------------
    @pl.when(c_id == n_chunks)
    def _():
        q = q_s[...]                                         # [heads, mla] f32
        cur = cur_s[0:1, :]                                  # [1, mla]
        s_cur = jnp.sum(q * cur, axis=-1, keepdims=True)     # [heads, 1]
        m_old = ml_s[0, :].reshape(heads, 1)
        l_old = ml_s[1, :].reshape(heads, 1)
        m_f = jnp.maximum(m_old, s_cur)
        alpha = jnp.exp2(m_old - m_f)
        p_cur = jnp.exp2(s_cur - m_f)
        acc = acc_s[...] * alpha + p_cur * cur[:, :lora]
        l_f = l_old * alpha + p_cur
        o = (acc / l_f).astype(jnp.bfloat16)                 # [heads, lora]
        # per-head W_UV expansion, then one N-wide O-projection
        rows = []
        for h in range(heads):
            rows.append(qdot(o[h:h + 1], wuv_ref, wuv_s_ref,
                             sl=(0, h)))                      # [1, nope]
        o_nope = jnp.concatenate(rows, axis=-1).astype(jnp.bfloat16)
        out_ref[...] = qdot(o_nope, wo_ref,
                            wo_s_ref).astype(out_ref.dtype)
        if append:
            # in-place compressed-row append via an aligned RMW DMA into
            # the aliased [L, cap, mla] cache (an XLA-level DUS next to
            # this kernel would copy the cache per layer — the
            # ops.stack_kernel pitfall)
            cap_ = cache_out_ref.shape[1]
            row8 = (jnp.minimum(seq, cap_ - 8) // 8) * 8
            off = seq - row8
            sl = cache_out_ref.at[s_ref[1], pl.ds(row8, 8)]
            d_in = pltpu.make_async_copy(sl, row_s, row_sem)
            d_in.start()
            d_in.wait()
            sub = jax.lax.broadcasted_iota(jnp.int32, (8, mla_pad), 0)
            row_s[...] = jnp.where(sub == off,
                                   cur_s[0:1, :].astype(row_s.dtype),
                                   row_s[...])
            d_out = pltpu.make_async_copy(row_s, sl, row_sem)
            d_out.start()
            d_out.wait()


@functools.partial(jax.jit, static_argnames=(
    "n_heads", "nope_dim", "rope_dim", "lora_rank", "eps", "kernel_config"))
def deepseek_decoder_layer(
    input: jnp.ndarray,          # [1, hidden]
    weight_q_nope: jnp.ndarray,  # [heads*nope_dim, hidden]  ([out, in])
    weight_q_pe: jnp.ndarray,    # [heads*rope_dim, hidden]
    weight_uk: jnp.ndarray,      # [heads, nope_dim, lora_rank]
    weight_kv_nope: jnp.ndarray, # [lora_rank, hidden]
    weight_k_pe: jnp.ndarray,    # [rope_dim, hidden]
    weight_uv: jnp.ndarray,      # [heads, lora_rank, nope_dim]
    weight_o: jnp.ndarray,       # [hidden, heads*nope_dim]  ([out, in])
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
    kernel_config: KernelConfig = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Twin of the reference op `clusterfusion.deepseek_decoder_layer`
    (`pybind.cpp:45-59,113`).  Returns (output [1, hidden],
    ckv_new [1, lora_rank + rope_dim]) — the reference returns output only
    and never appends to the cache; ckv_new fixes that."""
    # fuse the four projections into one [hidden, N] matrix
    wproj = jnp.concatenate([
        weight_q_nope.T, weight_q_pe.T, weight_kv_nope.T, weight_k_pe.T,
    ], axis=-1)                                            # [hidden, 3648]
    return deepseek_decoder_layer_fused(
        input, wproj, weight_uk, weight_uv, weight_o.T, ckv_cache,
        ckv_cache.shape[0], rms_input_weight, rms_ckv_weight, cos, sin,
        n_heads=n_heads, nope_dim=nope_dim, rope_dim=rope_dim,
        lora_rank=lora_rank, eps=eps, kernel_config=kernel_config)


@functools.partial(jax.jit, static_argnames=(
    "n_heads", "nope_dim", "rope_dim", "lora_rank", "eps", "kernel_config",
    "softmax_scale"))
def deepseek_decoder_layer_fused(
    input: jnp.ndarray,          # [1, hidden]
    wproj: jnp.ndarray,          # [hidden, h·nope + h·rope + lora + rope]
    weight_uk: jnp.ndarray,      # [heads, nope_dim, lora_rank]
    weight_uv: jnp.ndarray,      # [heads, lora_rank, nope_dim]
    wo_t: jnp.ndarray,           # [heads·nope_dim, hidden]  (pre-transposed)
    ckv_cache: jnp.ndarray,      # [capacity, lora_rank + rope_dim]
    seq_len,                     # [] int32 — past rows in use (dynamic)
    rms_input_weight: jnp.ndarray,
    rms_ckv_weight: jnp.ndarray,
    cos: jnp.ndarray,            # [rope_dim/2]
    sin: jnp.ndarray,            # [rope_dim/2]
    n_heads: int = 16,
    nope_dim: int = 128,
    rope_dim: int = 64,
    lora_rank: int = 512,
    eps: float = 1e-6,
    kernel_config: KernelConfig = None,
    softmax_scale: float = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Model-path variant: weights arrive pre-fused (no per-call concat /
    transpose of ~15 MB of projections), the cache is a fixed *capacity*
    buffer, and ``seq_len`` is a dynamic scalar — the kernel compiles once
    per capacity, not per length (the reference recompiles per SEQ_LEN
    macro, `deepseek/config.h:9`)."""
    kcfg = kernel_config or KernelConfig()
    hidden = input.shape[-1]
    h, nope, rope, lora = n_heads, nope_dim, rope_dim, lora_rank
    mla = lora + rope
    # cache minor dim must be 128-aligned for the kernel's chunk DMA
    # (V2's 576 is not): pad here (a copy — the parity-op price; the model
    # path keeps its cache natively padded and never copies)
    mla_pad = round_up(mla, 128)
    if ckv_cache.shape[-1] == mla:
        if mla_pad > mla:
            ckv_cache = jnp.pad(ckv_cache, ((0, 0), (0, mla_pad - mla)))
    else:
        assert ckv_cache.shape[-1] == mla_pad, ckv_cache.shape
    seq = ckv_cache.shape[0]                               # capacity
    dt = input.dtype
    n_proj = wproj.shape[-1]
    wo = wo_t

    chunk = min(kcfg.kv_chunk, max(round_up(seq, 16), 16))
    n_chunks = max(cdiv(seq, chunk), 1)
    cos_f = jnp.concatenate([cos, cos])[None, :].astype(jnp.float32)
    sin_f = jnp.concatenate([sin, sin])[None, :].astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks + 1,),
        in_specs=[
            pl.BlockSpec((1, hidden), lambda c, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda c, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lora), lambda c, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rope), lambda c, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rope), lambda c, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden, n_proj), lambda c, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, nope, lora), lambda c, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lora, nope), lambda c, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * nope, hidden), lambda c, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, chunk, mla_pad),
                lambda c, s: (0, jnp.minimum(
                    jnp.maximum(c - 1, 0),
                    jnp.maximum(pl.cdiv(s[0], chunk) - 1, 0)), 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hidden), lambda c, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mla), lambda c, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, mla_pad), jnp.float32),  # q = [q_lora | q_pe], scaled
            pltpu.VMEM((h, lora), jnp.float32),     # softmax acc
            pltpu.VMEM((2, h), jnp.float32),        # running (m, l)
            pltpu.VMEM((1, mla_pad), jnp.float32),  # current [ckv | k_pe]
        ],
    )

    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(nope + rope)
    kernel = functools.partial(
        _mla_kernel, heads=h, nope=nope, rope=rope, lora=lora,
        kv_chunk=chunk, eps=eps, softmax_scale=softmax_scale,
        mla_pad=mla_pad)

    out, ckv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, hidden), dt),
            jax.ShapeDtypeStruct((1, 1, mla), dt),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kcfg.vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=2 * hidden * n_proj + 2 * h * seq * mla * 2
            + 2 * h * nope * (lora + hidden),
            bytes_accessed=(wproj.size + wo.size + ckv_cache.size) * dt.itemsize,
            transcendentals=h * seq),
        interpret=interpret_mode(),
    )(jnp.stack([jnp.asarray(seq_len, jnp.int32).reshape(()),
                 jnp.asarray(0, jnp.int32)]), input,
      rms_input_weight[None, :],
      rms_ckv_weight[None, :], cos_f, sin_f,
      wproj[None], weight_uk[None], weight_uv[None], wo[None],
      ckv_cache[None])
    return out, ckv_new.reshape(1, mla)


@functools.partial(jax.jit, static_argnames=(
    "n_heads", "nope_dim", "rope_dim", "lora_rank", "eps", "kernel_config",
    "softmax_scale"))
def deepseek_decoder_stack_layer(
    input: jnp.ndarray,          # [1, hidden]
    wproj_s: jnp.ndarray,        # [L, hidden, n_proj]
    wuk_s: jnp.ndarray,          # [L, heads, nope, lora]
    wuv_s: jnp.ndarray,          # [L, heads, lora, nope]
    wo_s: jnp.ndarray,           # [L, heads*nope, hidden]
    ckv_cache: jnp.ndarray,      # [L, capacity, lora + rope]
    seq_len,                     # [] int32 dynamic
    layer_id,                    # [] int32 dynamic
    rms_in_s: jnp.ndarray,       # [L, hidden]
    rms_ckv_s: jnp.ndarray,      # [L, lora]
    cos: jnp.ndarray,            # [rope/2]
    sin: jnp.ndarray,
    n_heads: int = 16,
    nope_dim: int = 128,
    rope_dim: int = 64,
    lora_rank: int = 512,
    eps: float = 1e-6,
    kernel_config: KernelConfig = None,
    softmax_scale: float = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Layer-stacked MLA op for the model's decode scan: the WHOLE weight
    stacks and the [L, cap, mla] cache enter as operands and the layer is
    picked by a prefetched scalar in the BlockSpec index maps — scanning
    per-layer slices through pallas operands would copy every layer's
    weights (and the cache slice) per call (the ops.stack_kernel pitfall).
    The new compressed row is appended IN-KERNEL through the aliased cache
    output (donate the cache under jit).  Returns (out [1, hidden],
    ckv_cache')."""
    kcfg = kernel_config or KernelConfig()
    hidden = input.shape[-1]
    h, nope, rope, lora = n_heads, nope_dim, rope_dim, lora_rank
    mla = lora + rope
    mla_pad = round_up(mla, 128)
    L, cap = ckv_cache.shape[0], ckv_cache.shape[1]
    assert cap % 8 == 0, cap
    # the cache is aliased in/out: the CALLER allocates it 128-aligned
    # (models.deepseek.init_cache) — padding here would copy it per call
    assert ckv_cache.shape[-1] == mla_pad, \
        (f"stacked MLA cache minor dim must be round_up(lora+rope, 128)="
         f"{mla_pad}, got {ckv_cache.shape[-1]}")
    dt = input.dtype
    n_proj = wproj_s.shape[-1]

    # quantized projections: int8 per-column / int4 grouped, dequantized
    # in-kernel (the reference's five MLA GEMVs are fp16-only)
    wq_kind, gs_q = "none", 0
    if isinstance(wproj_s, QuantizedTensor):
        assert all(isinstance(w, QuantizedTensor)
                   and w.kind == wproj_s.kind
                   for w in (wuk_s, wuv_s, wo_s))
        wq_kind, gs_q = wproj_s.kind, wproj_s.group_size
        sdt = jnp.bfloat16 if wq_kind == "int4" else jnp.float32
        wq = {n: w.q for n, w in
              (("proj", wproj_s), ("uk", wuk_s), ("uv", wuv_s),
               ("o", wo_s))}
        ws = {n: w.s.astype(sdt) for n, w in
              (("proj", wproj_s), ("uk", wuk_s), ("uv", wuv_s),
               ("o", wo_s))}
    else:
        wq = {"proj": wproj_s, "uk": wuk_s, "uv": wuv_s, "o": wo_s}
        ws = {}
    pack = 2 if wq_kind == "int4" else 1

    chunk = min(kcfg.chunk_for(cap), max(round_up(cap, 16), 16))
    n_chunks = max(cdiv(cap, chunk), 1)
    cos_f = jnp.concatenate([cos, cos])[None, :].astype(jnp.float32)
    sin_f = jnp.concatenate([sin, sin])[None, :].astype(jnp.float32)

    def lmap(*trail):
        return lambda c, s: (s[1],) + trail

    def vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    in_specs = [
        vspec((1, hidden), lambda c, s: (0, 0)),
        # [L, 1, d] with (1, 1, d) blocks: a 2-D [L, d] stack with (1, d)
        # blocks is invalid Mosaic when L % 8 != 0 (the last two BLOCK
        # dims must divide 8/128 or equal the array dims)
        vspec((1, 1, hidden), lmap(0, 0)),
        vspec((1, 1, lora), lmap(0, 0)),
        vspec((1, rope), lambda c, s: (0, 0)),
        vspec((1, rope), lambda c, s: (0, 0)),
        vspec((1, hidden // pack, n_proj), lmap(0, 0)),
    ]
    inputs = [input, rms_in_s[:, None], rms_ckv_s[:, None], cos_f, sin_f,
              wq["proj"]]

    def add_scale(name):
        if wq_kind != "none":
            s = ws[name]
            in_specs.append(vspec((1,) + s.shape[1:],
                                  lmap(*([0] * (s.ndim - 1)))))
            inputs.append(s)

    add_scale("proj")
    in_specs.append(vspec((1, h, nope // pack, lora), lmap(0, 0, 0)))
    inputs.append(wq["uk"])
    add_scale("uk")
    in_specs.append(vspec((1, h, lora // pack, nope), lmap(0, 0, 0)))
    inputs.append(wq["uv"])
    add_scale("uv")
    in_specs.append(vspec((1, h * nope // pack, hidden), lmap(0, 0)))
    inputs.append(wq["o"])
    add_scale("o")
    in_specs.append(pl.BlockSpec(
        (1, chunk, mla_pad),
        lambda c, s: (s[1], jnp.minimum(
            jnp.maximum(c - 1, 0),
            jnp.maximum(pl.cdiv(s[0], chunk) - 1, 0)), 0),
        memory_space=pltpu.VMEM))
    # alias operand index counts the scalar-prefetch arg (0), so the cache
    # (appended last) sits at 1 + len(inputs)
    cache_idx = 1 + len(inputs)
    inputs.append(ckv_cache)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks + 1,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hidden), lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mla), lambda c, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # aliased cache
        ),
        scratch_shapes=[
            pltpu.VMEM((h, mla_pad), jnp.float32),
            pltpu.VMEM((h, lora), jnp.float32),
            pltpu.VMEM((2, h), jnp.float32),
            pltpu.VMEM((1, mla_pad), jnp.float32),
            pltpu.VMEM((8, mla_pad), ckv_cache.dtype),  # append RMW tile
            pltpu.SemaphoreType.DMA,
        ],
    )

    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(nope + rope)
    kernel = functools.partial(
        _mla_kernel, heads=h, nope=nope, rope=rope, lora=lora,
        kv_chunk=chunk, eps=eps, softmax_scale=softmax_scale, append=True,
        mla_pad=mla_pad, wq_kind=wq_kind, gs_q=gs_q, w4a8=kcfg.int4_w4a8)

    wbytes = sum(wq[n].size * wq[n].dtype.itemsize // L for n in wq)
    seq_arr = jnp.stack([jnp.asarray(seq_len, jnp.int32).reshape(()),
                         jnp.asarray(layer_id, jnp.int32).reshape(())])
    out, ckv_new, cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, hidden), dt),
            jax.ShapeDtypeStruct((1, 1, mla), dt),
            jax.ShapeDtypeStruct(ckv_cache.shape, ckv_cache.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kcfg.vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=2 * hidden * n_proj + 2 * h * cap * mla * 2
            + 2 * h * nope * (lora + hidden),
            bytes_accessed=wbytes
            + cap * mla * ckv_cache.dtype.itemsize,
            transcendentals=h * cap),
        input_output_aliases={cache_idx: 2},
        interpret=interpret_mode(),
    )(seq_arr, *inputs)
    return out, cache
