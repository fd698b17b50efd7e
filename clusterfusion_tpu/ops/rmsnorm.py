"""Standalone batched RMSNorm Pallas kernels.

TPU-native re-design of the reference's pedagogical cluster kernel
(`include/H100/norm/kernel.cuh:8-77` + `norm_kernel_dispatch.cu`): there, one
2-CTA cluster per row exchanges partial sum-of-squares over DSM; on TPU a
row's reduction is a single VPU pass over VMEM, so the kernel is a plain
row-tiled map with fp32 accumulation.  The fused-add variant supplies the
flashinfer ``fused_add_rmsnorm`` semantics that the sglang decoder kernel
absorbs (`kernel_sglang.cuh:98-106`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clusterfusion_tpu.ops._support import cdiv, interpret_mode


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[...] = (x * jax.lax.rsqrt(var + eps)
                  * w_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _fused_add_rmsnorm_kernel(x_ref, r_ref, w_ref, o_ref, h_ref, *, eps: float):
    h = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    h_ref[...] = h.astype(h_ref.dtype)
    var = jnp.mean(h * h, axis=-1, keepdims=True)
    o_ref[...] = (h * jax.lax.rsqrt(var + eps)
                  * w_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _row_tile(batch: int, dtype) -> int:
    base = 16 if dtype == jnp.bfloat16 else 8
    return min(max(base, 64), max(batch, 1))


@functools.partial(jax.jit, static_argnames=("eps",))
def rmsnorm(input: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """y = x * rsqrt(mean(x², axis=-1) + eps) * w for a [batch, hidden] input.

    Public-API twin of the reference op ``clusterfusion.rmsnorm``
    (`pybind.cpp:61-64,114`)."""
    batch, hidden = input.shape
    tile = _row_tile(batch, input.dtype)
    return pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(input.shape, input.dtype),
        grid=(cdiv(batch, tile),),
        in_specs=[
            pl.BlockSpec((tile, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, hidden), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(input, weight)


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_add_rmsnorm(input: jnp.ndarray, residual: jnp.ndarray,
                      weight: jnp.ndarray, eps: float = 1e-5):
    """h = input + residual; returns (rmsnorm(h), h)."""
    batch, hidden = input.shape
    tile = _row_tile(batch, input.dtype)
    return pl.pallas_call(
        functools.partial(_fused_add_rmsnorm_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct(input.shape, input.dtype),
            jax.ShapeDtypeStruct(input.shape, input.dtype),
        ),
        grid=(cdiv(batch, tile),),
        in_specs=[
            pl.BlockSpec((tile, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret_mode(),
    )(input, residual, weight)
