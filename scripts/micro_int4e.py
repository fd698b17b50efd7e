"""Probe round 3: int8-dot variants with correctness checks.

V_bitcast4g : pltpu.bitcast int8 [K/2,N] -> int4 [K,N] + astype(bf16)
              + group-scale mult + bf16 dot (checks nibble order)
V_int8_col  : int8 unpack + int8 MXU dot + per-column rescale (winner so far)
V_int8_grp  : int8 unpack + GROUP-batched int8 dot [NG,1,GS]x[NG,GS,N]
              -> [NG,1,N] int32, f32 scale-weighted sum over NG
              (keeps group-scale accuracy, W4A8)
Each checked against a numpy oracle (atol relative).
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
packed_np = rng.randint(-128, 128, (K // 2, N)).astype(np.int8)
packed = jnp.asarray(packed_np)
scales_np = (rng.rand(NG, N) * 0.01 + 0.001).astype(np.float32)
scales = jnp.asarray(scales_np)
hbm_us = (K / 2 * N + NG * N * 4) / 819e9 * 1e6

# oracle: current unpack semantics — byte b -> row b (lo: ((p&15)^8)-8),
# row b+K/2 (hi: p>>4)
p32 = packed_np.astype(np.int32)
lo = ((p32 & 15) ^ 8) - 8
hi = p32 >> 4
w_np = np.concatenate([lo, hi], axis=0).astype(np.float32)
s_exp = np.repeat(scales_np, GS, axis=0)
y_ref = (np.asarray(x, np.float32) @ (w_np * s_exp))


def check(name, y):
    y = np.asarray(y, np.float32)
    denom = np.abs(y_ref).mean()
    err = np.abs(y - y_ref).mean() / denom
    print(f"    {name} rel-err {err:.4f}", flush=True)


# -- V_bitcast4g: what IS the bitcast layout? ---------------------------
def body_bitcast4g(xv, p, s):
    w4 = pltpu.bitcast(p, jnp.int4)            # [K, N] — sublane-doubled
    w = w4.astype(jnp.bfloat16)
    return jnp.dot(xv, w * expand(s.astype(jnp.bfloat16)),
                   preferred_element_type=jnp.float32)


# -- V_int8_col ----------------------------------------------------------
def body_int8_col(xv, p, s):
    p32 = p.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    w8 = jnp.concatenate([lo, hi], axis=0)
    xa = xv.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xa)) / 127.0
    x8 = jnp.round(xa / xs).astype(jnp.int8)
    y = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (xs * s[0][None, :])


# -- V_int8_grp ----------------------------------------------------------
def body_int8_grp(xv, p, s):
    p32 = p.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    w8 = jnp.concatenate([lo, hi], axis=0)          # [K, NB]
    xa = xv.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xa)) / 127.0
    x8 = jnp.round(xa / xs).astype(jnp.int8)
    wg = w8.reshape(NG, GS, w8.shape[1])            # [NG, GS, NB]
    xg = x8.reshape(NG, 1, GS)                      # [NG, 1, GS]
    part = jax.lax.dot_general(
        xg, wg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)           # [NG, 1, NB]
    y = jnp.sum(part[:, 0, :].astype(jnp.float32) * s, axis=0)
    return (y * xs)[None, :]


def main():
    for name, body in [("V_int8_col", body_int8_col),
                       ("V_int8_grp", body_int8_grp),
                       ("V_bitcast4g", body_bitcast4g)]:
        call = make_call(body, K // 2, K)
        try:
            y = call(x, packed, scales)
            check(name, y)
        except Exception as e:
            print(f"{name} check FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        for rnd in range(2):
            try:
                us = timed(functools.partial(call, p=packed, s=scales), x)
                print(f"r{rnd} {name:12s} {us:7.1f} us ({us/hbm_us:.2f}x)",
                      flush=True)
            except Exception as e:
                print(f"r{rnd} {name:12s} FAILED: {str(e)[:160]}", flush=True)
                break


if __name__ == "__main__":
    main()
