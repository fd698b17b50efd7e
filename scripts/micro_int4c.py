"""Probe: Mosaic-native jnp.int4 refs in pallas + int8 MXU dots."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from micro_int4 import K, N, NB, NG, GS, timed, expand

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(1, K), jnp.bfloat16)
scales = jnp.asarray(rng.rand(NG, N) * 0.01 + 0.001, jnp.float32)
hbm_us = (K / 2 * N + NG * N * 4) / 819e9 * 1e6

# int4 array creation on host
try:
    w4 = jnp.asarray(rng.randint(-7, 8, (K, N)).astype(np.int8)).astype(jnp.int4)
    w4 = jax.block_until_ready(w4)
    print("int4 array created:", w4.shape, w4.dtype, flush=True)
except Exception as e:
    print("int4 creation FAILED:", type(e).__name__, str(e)[:200])
    raise SystemExit


def kern(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...].astype(jnp.bfloat16) * expand(s_ref[...].astype(jnp.bfloat16))
    o_ref[...] = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)


@jax.jit
def call(x, w, s):
    return pl.pallas_call(
        kern,
        grid=(N // NB,),
        in_specs=[
            pl.BlockSpec((1, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NB), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((NG, NB), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
    )(x, w, s)


try:
    us = timed(functools.partial(call, w=w4, s=scales), x)
    print(f"native_int4_pallas  {us:7.1f} us ({us/hbm_us:.2f}x SoL)", flush=True)
    us = timed(functools.partial(call, w=w4, s=scales), x)
    print(f"native_int4_pallas  {us:7.1f} us ({us/hbm_us:.2f}x SoL)", flush=True)
except Exception as e:
    print("native_int4_pallas FAILED:", type(e).__name__, str(e)[:300])


# XLA (non-pallas) int4 dot for reference
@jax.jit
def xla_call(x, w, s):
    wf = w.astype(jnp.bfloat16) * expand(s.astype(jnp.bfloat16))
    return jnp.dot(x, wf, preferred_element_type=jnp.float32)

try:
    us = timed(functools.partial(xla_call, w=w4, s=scales), x)
    print(f"native_int4_xla     {us:7.1f} us ({us/hbm_us:.2f}x SoL)", flush=True)
except Exception as e:
    print("native_int4_xla FAILED:", type(e).__name__, str(e)[:300])
