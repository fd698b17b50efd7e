"""HBM-speed GEMV: y = x @ W for M=1 decode, gridded over N blocks.

Stock XLA lowers an M=1 dot to a single MXU op whose pipeline-refill cost
caps it ~4× below HBM bandwidth on v5e (measured: 194 GB/s vs ~800 GB/s for
the N-blocked form).  Used for the LM head (the biggest single GEMV in a
decode step: [hidden, vocab]) and anywhere else a lone projection remains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clusterfusion_tpu.ops._support import cdiv, interpret_mode, round_up


def _gemv_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32)


def gemv(x: jnp.ndarray, w: jnp.ndarray, block_n: int = 1024,
         interpret=None) -> jnp.ndarray:
    # block_n > 1024 with K=4096 crashes the Mosaic compiler on v5e
    # (empirical); 1024-wide blocks already reach HBM speed.
    """x [1, K] @ w [K, N] → [1, N] fp32.  N is processed in ``block_n``
    lane-aligned blocks (N must be a multiple of 128; pad the weight —
    zero columns give zero logits, slice them off)."""
    if interpret is None:
        interpret = interpret_mode()
    K, N = w.shape
    bn = min(round_up(min(block_n, N), 128), N)
    while N % bn:
        bn -= 128
    nb = N // bn
    return pl.pallas_call(
        _gemv_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N, bytes_accessed=K * N * w.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, w)
