"""Fused SwiGLU FFN megakernel: residual-add + RMSNorm + gate/up projection
+ SiLU·up + down projection, one Pallas kernel, bs=1 decode.

The reference never shipped a fused FFN — its decoder fuses only the
attention half, leaving FFN to eager torch (`chat/llama/model.py:518-520`),
though vestiges of a fused-FFN prototype remain (`dsm.cuh:140-153`
Stage::FFN, `H100/llama/config.h:28-30` FFN macros).  On TPU the FFN is
where most decode bytes move (w1/w3/w2 ≈ 2× the attention weights), and the
stock-XLA M=1 GEMV runs ~4× off HBM speed-of-light (MXU pipeline bound), so
fusing it is the single biggest end-to-end win.

Structure: grid over ``ffn`` column blocks.  Step j streams w13 block
[2, hidden, BF] and w2 block [BF, hidden]; computes the gate/up slice, the
activation, and accumulates the down-projection partial — both dots are
N-wide, so the kernel is HBM-bound.  The ffn dim is padded to a multiple of
the block at weight-build time (zero columns are exact no-ops through
silu(0)·0 = 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clusterfusion_tpu.config import KernelConfig
from clusterfusion_tpu.ops._support import cdiv, glu_act, interpret_mode, round_up
from clusterfusion_tpu.ops.quant import (
    QuantizedTensor, expand_group_scales, unpack_int4_bitcast)


def ffn_block_size(ffn_dim: int, target: int = 1024) -> int:
    """Largest lane-aligned divisor of ``ffn_dim`` ≤ target (callers pad
    ffn to a multiple of 1024 at build time so this is normally =target,
    but tp-sharded local shapes may force a smaller divisor)."""
    assert ffn_dim % 128 == 0, ffn_dim
    ks = ffn_dim // 128
    best = max(k for k in range(1, ks + 1) if ks % k == 0 and k * 128 <= target)
    return best * 128


def pad_ffn_weights(w13, w2, block: int):
    """Zero-pad [2, h, f] / [f, h] so ``block`` divides f."""
    f = w2.shape[0]
    f_pad = round_up(f, block)
    if f_pad != f:
        w13 = jnp.pad(w13, ((0, 0), (0, 0), (0, f_pad - f)))
        w2 = jnp.pad(w2, ((0, f_pad - f), (0, 0)))
    return w13, w2


def _r3(ref):
    """Load a block and squeeze leading singleton dims to 3D (stacked
    [L, ...] weights add a leading 1 to every block)."""
    w = ref[...]
    return w.reshape(w.shape[-3], w.shape[-2], w.shape[-1])


def _r2(ref):
    w = ref[...]
    return w.reshape(w.shape[-2], w.shape[-1])


def _ffn_kernel(s_ref, x_ref, res_ref, normw_ref, *refs,
                hidden: int, bf: int, eps: float, fuse_residual: bool,
                wq_kind: str, gs_q: int, ffn_act: str = "silu"):
    it = iter(refs)
    w13_ref = next(it)
    w13_s_ref = next(it) if wq_kind != "none" else None
    w2_ref = next(it)
    w2_s_ref = next(it) if wq_kind != "none" else None
    out_ref, res_out_ref, xnorm_s, out_s = (next(it) for _ in range(4))
    j = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(j == 0)
    def _():
        x = x_ref[...].astype(f32)
        if fuse_residual:
            x = x + res_ref[...].astype(f32)
            res_out_ref[...] = x.astype(res_out_ref.dtype)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        xnorm_s[...] = (x * jax.lax.rsqrt(var + eps)
                        * _r2(normw_ref).astype(f32)).astype(jnp.bfloat16)
        out_s[...] = jnp.zeros_like(out_s)

    xn = xnorm_s[...]                                     # [1, hidden] bf16
    # gate/up projection, one dot per plane of w13 [2, hidden, bf] (the
    # gate/up axis leads — in tiled position a size-2 dim pads 2-8x in HBM).
    # INT8 per-column scale commutes with the dot (applied to the [1, bf]
    # results); INT4 group scales don't — tiles are dequantized on the VPU.
    w = _r3(w13_ref)
    if wq_kind == "none":
        y_g = jnp.dot(xn, w[0], preferred_element_type=f32)   # [1, bf]
        y_u = jnp.dot(xn, w[1], preferred_element_type=f32)
    elif wq_kind == "int8":
        s = _r3(w13_s_ref)                                # [2, 1, bf]
        y_g = jnp.dot(xn, w[0].astype(jnp.bfloat16),
                      preferred_element_type=f32) * s[0]
        y_u = jnp.dot(xn, w[1].astype(jnp.bfloat16),
                      preferred_element_type=f32) * s[1]
    else:  # int4: adjacent-pair packing → one bitcast unpack per tile
        s = _r3(w13_s_ref)                                # [2, h/gs, bf]
        sb = s.astype(jnp.bfloat16)
        wg = unpack_int4_bitcast(w[0]).astype(jnp.bfloat16) \
            * expand_group_scales(sb[0], 0, gs_q)
        wu = unpack_int4_bitcast(w[1]).astype(jnp.bfloat16) \
            * expand_group_scales(sb[1], 0, gs_q)
        y_g = jnp.dot(xn, wg, preferred_element_type=f32)
        y_u = jnp.dot(xn, wu, preferred_element_type=f32)
    act = glu_act(y_g, y_u, ffn_act).astype(jnp.bfloat16)
    # down projection: INT4 packs adjacent rows along f (the reduction
    # axis), so each even-sized f-block stays self-contained; its group
    # scales live along f (rows).
    if wq_kind == "none":
        out_s[...] += jnp.dot(act, _r2(w2_ref), preferred_element_type=f32)
    elif wq_kind == "int8":
        # per-output-column scale is constant across f-blocks → applied once
        # at the final store below
        out_s[...] += jnp.dot(act, _r2(w2_ref).astype(jnp.bfloat16),
                              preferred_element_type=f32)
    else:  # int4
        w2 = unpack_int4_bitcast(_r2(w2_ref)).astype(jnp.bfloat16) \
            * expand_group_scales(_r2(w2_s_ref).astype(jnp.bfloat16), 0, gs_q)
        out_s[...] += jnp.dot(act, w2, preferred_element_type=f32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out = out_s[...]
        if wq_kind == "int8":
            out = out * _r2(w2_s_ref)
        out_ref[...] = out.astype(out_ref.dtype)


def fused_ffn(x, residual, norm_w, w13, w2,
              *, eps: float, kcfg: KernelConfig = KernelConfig(),
              fuse_residual: bool = True, interpret=None, layer_id=0,
              ffn_act: str = "silu"):
    """h = x (+ residual); returns (ffn(rmsnorm(h)·w), h).

    x/residual: [1, hidden]; norm_w: [1, hidden]; w13: [2, hidden, f_pad]
    (stacked (w1, w3), block-padded — see ``pad_ffn_weights``);
    w2: [f_pad, hidden].

    ``ffn_act`` selects the GLU gate activation and defaults to "silu"
    (SwiGLU — llama/mistral/qwen2/deepseek).  Callers running a GeGLU
    model (gemma-2) MUST pass ``ffn_act=cfg.ffn_act`` ("gelu_tanh")
    explicitly — this standalone op has no model config to read it from
    (the in-tree model paths route through the whole-stack kernel, which
    threads ``cfg.ffn_act`` itself).

    Stacked mode: pass the whole per-layer weight stacks (w13 [L, 2, h, f],
    w2 [L, f, h], norm_w [L, h]) plus ``layer_id`` — the layer is picked in
    the BlockSpec index maps, so a layer-scanned caller never slices the
    stack at the XLA level (a pallas operand needs a real buffer, so an XLA
    slice materializes a full copy of the layer's weights per call)."""
    if interpret is None:
        interpret = interpret_mode()
    hidden = x.shape[-1]
    dt = x.dtype

    wq_kind, gs_q = "none", 0
    w13_s = w2_s = None
    if isinstance(w13, QuantizedTensor):
        assert isinstance(w2, QuantizedTensor) and w2.kind == w13.kind
        wq_kind, gs_q = w13.kind, w13.group_size
        sdt = jnp.bfloat16 if w13.kind == "int4" else jnp.float32
        w13_s = w13.s.astype(sdt)
        w2_s = w2.s.astype(sdt)
        stacked = len(w2.shape) == 3
        f_pad = w2.shape[-2]
        w13, w2 = w13.q, w2.q
    else:
        stacked = w2.ndim == 3
        f_pad = w2.shape[-2]
    bf = ffn_block_size(f_pad, kcfg.ffn_block_target)
    assert f_pad % bf == 0, (f_pad, bf)
    nb = f_pad // bf
    pack = 2 if wq_kind == "int4" else 1

    if stacked:
        def L(idx_fn):
            return lambda j, s: (s[0],) + idx_fn(j)
    else:
        def L(idx_fn):
            return lambda j, s: idx_fn(j)

    def vec_spec(stk):
        # stacked norms arrive as [L, 1, hidden] so the block's tiled
        # trailing dims are (1, hidden)
        if stk:
            return pl.BlockSpec((1, 1, hidden), lambda j, s: (s[0], 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, hidden), lambda j, s: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        vec_spec(False),                       # x
        vec_spec(False),                       # residual
        vec_spec(stacked),                     # norm_w
        pl.BlockSpec(((1,) if stacked else ()) + (2, hidden // pack, bf),
                     L(lambda j: (0, 0, j)), memory_space=pltpu.VMEM),
    ]
    inputs = [x, residual, norm_w, w13]
    if wq_kind != "none":
        in_specs.append(pl.BlockSpec(
            ((1,) if stacked else ()) + (2, w13_s.shape[-2], bf),
            L(lambda j: (0, 0, j)), memory_space=pltpu.VMEM))
        inputs.append(w13_s)
    in_specs.append(pl.BlockSpec(
        ((1,) if stacked else ()) + (bf // pack, hidden),
        L(lambda j: (j, 0)), memory_space=pltpu.VMEM))
    inputs.append(w2)
    if wq_kind == "int8":
        in_specs.append(pl.BlockSpec(
            ((1,) if stacked else ()) + (1, hidden),
            L(lambda j: (0, 0)), memory_space=pltpu.VMEM))
        inputs.append(w2_s)
    elif wq_kind == "int4":
        in_specs.append(pl.BlockSpec(
            ((1,) if stacked else ()) + (bf // gs_q, hidden),
            L(lambda j: (j, 0)), memory_space=pltpu.VMEM))
        inputs.append(w2_s)

    meta = jnp.asarray(layer_id, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hidden), lambda j, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda j, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, hidden), jnp.bfloat16),
            pltpu.VMEM((1, hidden), jnp.float32),
        ],
    )

    out, res_out = pl.pallas_call(
        functools.partial(_ffn_kernel, hidden=hidden, bf=bf, eps=eps,
                          fuse_residual=fuse_residual,
                          wq_kind=wq_kind, gs_q=gs_q, ffn_act=ffn_act),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, hidden), dt),
            jax.ShapeDtypeStruct((1, hidden), dt),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kcfg.vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=2 * hidden * 3 * f_pad,
            bytes_accessed=3 * hidden * f_pad * dt.itemsize // pack,
            transcendentals=f_pad),
        interpret=interpret,
    )(meta, *inputs)
    return out, res_out
