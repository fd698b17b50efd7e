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
[hidden, 2, BF] and w2 block [BF, hidden]; computes the gate/up slice, the
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
from clusterfusion_tpu.ops._support import cdiv, interpret_mode, round_up


def ffn_block_size(ffn_dim: int, target: int = 1024) -> int:
    """Largest lane-aligned divisor of ``ffn_dim`` ≤ target (callers pad
    ffn to a multiple of 1024 at build time so this is normally =target,
    but tp-sharded local shapes may force a smaller divisor)."""
    assert ffn_dim % 128 == 0, ffn_dim
    ks = ffn_dim // 128
    best = max(k for k in range(1, ks + 1) if ks % k == 0 and k * 128 <= target)
    return best * 128


def pad_ffn_weights(w13, w2, block: int):
    """Zero-pad [h, 2, f] / [f, h] so ``block`` divides f."""
    f = w2.shape[0]
    f_pad = round_up(f, block)
    if f_pad != f:
        w13 = jnp.pad(w13, ((0, 0), (0, 0), (0, f_pad - f)))
        w2 = jnp.pad(w2, ((0, f_pad - f), (0, 0)))
    return w13, w2


def _ffn_kernel(x_ref, res_ref, normw_ref, w13_ref, w2_ref,
                out_ref, res_out_ref, xnorm_s, out_s,
                *, hidden: int, bf: int, eps: float, fuse_residual: bool):
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
                        * normw_ref[...].astype(f32)).astype(jnp.bfloat16)
        out_s[...] = jnp.zeros_like(out_s)

    xn = xnorm_s[...]                                     # [1, hidden] bf16
    w13 = w13_ref[...].reshape(hidden, 2 * bf)            # [gate cols | up cols]
    y = jnp.dot(xn, w13, preferred_element_type=f32)      # [1, 2·bf]
    act = (jax.nn.silu(y[:, :bf]) * y[:, bf:]).astype(jnp.bfloat16)
    out_s[...] += jnp.dot(act, w2_ref[...], preferred_element_type=f32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = out_s[...].astype(out_ref.dtype)


def fused_ffn(x, residual, norm_w, w13, w2,
              *, eps: float, kcfg: KernelConfig = KernelConfig(),
              fuse_residual: bool = True, interpret=None):
    """h = x (+ residual); returns (ffn(rmsnorm(h)·w), h).

    x/residual: [1, hidden]; norm_w: [1, hidden]; w13: [hidden, 2, f_pad]
    (block-padded, see ``pad_ffn_weights``); w2: [f_pad, hidden]."""
    if interpret is None:
        interpret = interpret_mode()
    hidden = x.shape[-1]
    f_pad = w2.shape[0]
    bf = ffn_block_size(f_pad)
    assert f_pad % bf == 0, (f_pad, bf)
    nb = f_pad // bf
    dt = x.dtype

    out, res_out = pl.pallas_call(
        functools.partial(_ffn_kernel, hidden=hidden, bf=bf, eps=eps,
                          fuse_residual=fuse_residual),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 2, bf), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, hidden), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, hidden), dt),
            jax.ShapeDtypeStruct((1, hidden), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, hidden), jnp.bfloat16),
            pltpu.VMEM((1, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kcfg.vmem_limit_bytes),
        cost_estimate=pl.CostEstimate(
            flops=2 * hidden * 3 * f_pad,
            bytes_accessed=3 * hidden * f_pad * dt.itemsize,
            transcendentals=f_pad),
        interpret=interpret,
    )(x, residual, norm_w, w13, w2)
    return out, res_out
