"""Probe round 2: int4 dequant strategies beyond the f32-magic chain.

V_bitcast4 : pltpu.bitcast packed int8 -> int4 in-kernel, astype(bf16)
             (hardware nibble unpack, if Mosaic supports it)
V_halfdot  : offset-encoding trick, no concat: y = x_lo@(lou*slo) +
             x_hi@(hi*shi) - 8*(xg_lo@s_lo)   [8 VPU passes]
V_colscale : per-column scales (commute with dot): 6 VPU passes + [1,N] scale
V_int8dot  : unpack to int8 (i32 ops + downcast), int8 MXU dot, col rescale
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from micro_int4 import K, N, NB, NG, GS, timed, expand, make_call

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(1, K), jnp.bfloat16)
packed = jnp.asarray(rng.randint(-128, 128, (K // 2, N)), jnp.int8)
scales = jnp.asarray(rng.rand(NG, N) * 0.01 + 0.001, jnp.float32)
col_scales = jnp.asarray(rng.rand(1, N) * 0.01 + 0.001, jnp.float32)
hbm_us = (K / 2 * N + NG * N * 4) / 819e9 * 1e6
print(f"HBM SoL ~{hbm_us:.1f} us", flush=True)


# -- V_bitcast4: in-kernel int8 -> int4 bitcast --------------------------
def body_bitcast4(xv, p, s):
    w4 = pltpu.bitcast(p, jnp.int4)            # [K/2, 2N]?
    w = w4.astype(jnp.bfloat16)
    # whatever the layout is, just dot something shape-compatible to time it
    w = w.reshape(K, N)
    return jnp.dot(xv, w * expand(s.astype(jnp.bfloat16)),
                   preferred_element_type=jnp.float32)


# -- V_halfdot: offset encoding, 2 half dots, group-sum correction ------
def body_halfdot(xv, p, s):
    pf = p.astype(jnp.float32)
    hi = jnp.floor(pf * 0.0625)
    lo_u = pf - hi * 16.0
    sf = s
    s_lo, s_hi = expand(sf[: NG // 2]), expand(sf[NG // 2:])
    t_lo = (lo_u * s_lo).astype(jnp.bfloat16)
    t_hi = (hi * s_hi).astype(jnp.bfloat16)
    x_lo, x_hi = xv[:, : K // 2], xv[:, K // 2:]
    y = jnp.dot(x_lo, t_lo, preferred_element_type=jnp.float32)
    y += jnp.dot(x_hi, t_hi, preferred_element_type=jnp.float32)
    xg = jnp.sum(x_lo.astype(jnp.float32).reshape(NG // 2, GS), axis=1)[None]
    y -= 8.0 * jnp.dot(xg, sf[: NG // 2], preferred_element_type=jnp.float32)
    return y


# -- V_colscale: per-column scales (s_ref is [1, N] here: reuse NG rows,
#    take row 0) ---------------------------------------------------------
def body_colscale(xv, p, s):
    pf = p.astype(jnp.float32)
    hi = jnp.floor(pf * 0.0625)
    lo_u = pf - hi * 16.0
    w = jnp.concatenate([(lo_u - 8.0).astype(jnp.bfloat16),
                         hi.astype(jnp.bfloat16)], axis=0)
    y = jnp.dot(xv, w, preferred_element_type=jnp.float32)
    return y * s[0][None, :]


# -- V_int8dot: int8 MXU dot, quantized activations ----------------------
def body_int8dot(xv, p, s):
    p32 = p.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    w8 = jnp.concatenate([lo, hi], axis=0)
    # quantize x once per block (tiny [1,K])
    xa = xv.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xa)) / 127.0
    x8 = jnp.round(xa / xs).astype(jnp.int8)
    y = jax.lax.dot_general(
        x8, w8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (xs * s[0][None, :])


def main():
    for name, body in [("V_halfdot", body_halfdot),
                       ("V_colscale", body_colscale),
                       ("V_int8dot", body_int8dot),
                       ("V_bitcast4", body_bitcast4)]:
        call = make_call(body, K // 2, K)
        for rnd in range(2):
            try:
                us = timed(functools.partial(call, p=packed, s=scales), x)
                print(f"r{rnd} {name:12s} {us:7.1f} us ({us/hbm_us:.2f}x)",
                      flush=True)
            except Exception as e:
                print(f"r{rnd} {name:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                break


if __name__ == "__main__":
    main()
