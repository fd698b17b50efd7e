"""Microbench: variants of the fused W4A8 int4 dequant-dot on one tile.

The whole-stack int4 decode sits at ~63% of its HBM speed-of-light because
the per-tile unpack chain in ``ops.quant.w4a8_int4_dot`` is VPU-issue-bound
(round-1 measured 17.0 µs on a 4096x4096 tile vs the 10.8 µs HBM floor).
This sweeps encodings/op-mixes for the unpack so the kernel change is
data-driven, mirroring how round 1 chose the mask/xor/sub nibble form.

Run on the real chip:  python scripts/microbench_int4.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = N = 4096
GS = 128
BN = 512          # output-column block per grid step (weights stream in)


def _timeit(fn, *args, n=50):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e6


def _mk_kernel(body):
    """Wrap a per-tile dequant-dot body into a column-blocked Pallas kernel
    mirroring the stack kernel's FFN-phase structure: x pinned in VMEM,
    packed weight + scale blocks streaming via BlockSpec."""
    def kern(x_ref, w_ref, s_ref, o_ref):
        o_ref[...] = body(x_ref[...], w_ref[...], s_ref[...])

    @jax.jit
    def run(x, wp, s):
        return pl.pallas_call(
            kern,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((1, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K // 2, BN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K // GS, BN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BN), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        )(x, wp, s)
    return run


def _x8(x):
    xa = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xa), axis=-1, keepdims=True),
                     1e-8) * (1.0 / 127.0)
    return jnp.round(xa / xs).astype(jnp.int8), xs


# ---- v0: current w4a8_int4_dot body (int32 widen, concat, grouped dot) ----
def body_v0(x, wp, s):
    p32 = wp.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    w8 = jnp.concatenate([lo, hi], axis=0)                 # [K, BN]
    ng = K // GS
    x8, xs = _x8(x)
    xg = x8.reshape(ng, 1, GS)
    wg = w8.reshape(ng, GS, BN)
    part = jax.lax.dot_general(xg, wg, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    y = jnp.sum(part.astype(jnp.float32) * s[:, None, :], axis=0)
    return y * xs


# ---- v1: split lo/hi group dots — no concat copy -------------------------
def body_v1(x, wp, s):
    p32 = wp.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)           # rows [0, K/2)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)          # rows [K/2, K)
    ng2 = K // 2 // GS
    x8, xs = _x8(x)
    xg = x8.reshape(2 * ng2, 1, GS)
    pa = jax.lax.dot_general(xg[:ng2], lo.reshape(ng2, GS, BN),
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    pb = jax.lax.dot_general(xg[ng2:], hi.reshape(ng2, GS, BN),
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    y = jnp.sum(pa.astype(jnp.float32) * s[:ng2, None, :], axis=0) \
        + jnp.sum(pb.astype(jnp.float32) * s[ng2:, None, :], axis=0)
    return y * xs


# ---- v2: int8-native elementwise (no int32 widen) + split dots ------------
def body_v2(x, wp, s):
    lo = ((wp & jnp.int8(15)) ^ jnp.int8(8)) - jnp.int8(8)
    hi = jnp.right_shift(wp, 4)                            # int8 arith shift
    ng2 = K // 2 // GS
    x8, xs = _x8(x)
    xg = x8.reshape(2 * ng2, 1, GS)
    pa = jax.lax.dot_general(xg[:ng2], lo.reshape(ng2, GS, BN),
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    pb = jax.lax.dot_general(xg[ng2:], hi.reshape(ng2, GS, BN),
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    y = jnp.sum(pa.astype(jnp.float32) * s[:ng2, None, :], axis=0) \
        + jnp.sum(pb.astype(jnp.float32) * s[ng2:, None, :], axis=0)
    return y * xs


# ---- v3: one MXU dot on the RAW PACKED bytes + lo-only correction ---------
# Encode at pack time (quantizer change): byte = 16*hi + lo with hi,lo in
# [-8,7] can overflow int8, but byte = 16*hi + lo_u with lo_u = lo+8 in
# [0,15] gives byte in [-128, 127] EXACTLY (16*hi in [-128,112], +15).
# Then for x split as (x_lo rows [0,K/2), x_hi rows [K/2,K)):
#   x_hi . byte = 16*(x_hi.hi) + (x_hi.lo_u)
# so  x_hi.hi = (x_hi.byte - x_hi.lo_u) / 16   — still needs x_hi.lo_u.
# Instead use TWO dots on (byte, lo_u) where lo_u = byte & 15 (1 VPU op):
#   hi = (byte - lo_u) >> 4  algebraically, so
#   x_hi.hi = (x_hi.byte - x_hi.lo_u) * (1/16)       (exact: int32 partials)
#   x_lo.lo = x_lo.lo_u - 8*sum(x_lo)                (per-group x sums)
# One & per byte + two int8 dots; group-sums of x8 are [ng,1] — free.
def body_v3(x, wp, s):
    lo_u = wp & jnp.int8(15)                               # ONE VPU op
    ng2 = K // 2 // GS
    x8, xs = _x8(x)
    xg = x8.reshape(2 * ng2, 1, GS)
    d_b = jax.lax.dot_general(xg[ng2:], wp.reshape(ng2, GS, BN),
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    d_bu = jax.lax.dot_general(xg[ng2:], lo_u.reshape(ng2, GS, BN),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    d_lu = jax.lax.dot_general(xg[:ng2], lo_u.reshape(ng2, GS, BN),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    xsum = jnp.sum(xg[:ng2].astype(jnp.int32), axis=2,
                   keepdims=True)                          # [ng2,1,1]
    hi_part = (d_b - d_bu).astype(jnp.float32) * (1.0 / 16.0)
    lo_part = (d_lu - 8 * xsum).astype(jnp.float32)
    y = jnp.sum(lo_part * s[:ng2, None, :], axis=0) \
        + jnp.sum(hi_part * s[ng2:, None, :], axis=0)
    return y * xs


# ---- v4: native jnp.int4 weights — Mosaic's own packed-int4 load/convert
def body_v4(x, wp, s):
    w8 = wp.astype(jnp.int8)
    ng = K // GS
    x8, xs = _x8(x)
    xg = x8.reshape(ng, 1, GS)
    part = jax.lax.dot_general(xg, w8.reshape(ng, GS, BN),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    y = jnp.sum(part.astype(jnp.float32) * s[:, None, :], axis=0)
    return y * xs


# ---- v5: direct mixed int8 x int4 dot (if the MXU path lowers) ------------
def body_v5(x, wp, s):
    ng = K // GS
    x8, xs = _x8(x)
    xg = x8.reshape(ng, 1, GS)
    part = jax.lax.dot_general(xg, wp.reshape(ng, GS, BN),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    y = jnp.sum(part.astype(jnp.float32) * s[:, None, :], axis=0)
    return y * xs


def _mk_kernel_i4(body):
    """Same harness with a full-[K, BN] int4 weight block."""
    def kern(x_ref, w_ref, s_ref, o_ref):
        o_ref[...] = body(x_ref[...], w_ref[...], s_ref[...])

    @jax.jit
    def run(x, wp, s):
        return pl.pallas_call(
            kern,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((1, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, BN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K // GS, BN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BN), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        )(x, wp, s)
    return run


def main():
    rng = np.random.RandomState(0)
    w = rng.randn(K, N).astype(np.float32) * 0.02
    # group-quantize along K
    wg = w.reshape(K // GS, GS, N)
    s = (np.abs(wg).max(axis=1) / 7.0).astype(np.float32)  # [K/GS, N]
    q = np.clip(np.round(wg / s[:, None, :]), -8, 7).astype(np.int8)
    q = q.reshape(K, N)
    lo, hi = q[: K // 2], q[K // 2:]
    packed_std = ((lo & 15) | (hi << 4)).astype(np.int8)   # current format
    packed_v3 = (16 * hi.astype(np.int32)
                 + (lo.astype(np.int32) + 8)).astype(np.int8)

    x = rng.randn(1, K).astype(np.float32)
    xj = jnp.asarray(x, jnp.bfloat16)
    sj = jnp.asarray(s)
    ref = (x.astype(np.float64) @ (q.astype(np.float64)
           * np.repeat(s, GS, axis=0))).astype(np.float32)

    hbm_bytes = K // 2 * N + K // GS * N * 4
    print(f"# tile {K}x{N} gs={GS}; packed+scales = {hbm_bytes/1e6:.1f} MB"
          f" -> HBM floor ~{hbm_bytes/819e9*1e6:.1f} us")
    cases = [("v0_current", _mk_kernel(body_v0), jnp.asarray(packed_std)),
             ("v1_split", _mk_kernel(body_v1), jnp.asarray(packed_std)),
             ("v2_int8elem", _mk_kernel(body_v2), jnp.asarray(packed_std)),
             ("v3_packed_dot", _mk_kernel(body_v3), jnp.asarray(packed_v3))]
    try:
        w4 = jnp.asarray(q).astype(jnp.int4)
        cases.append(("v4_native_int4", _mk_kernel_i4(body_v4), w4))
        cases.append(("v5_mixed_dot", _mk_kernel_i4(body_v5), w4))
    except Exception as e:
        print(f"# int4 dtype unavailable: {e!r}")
    for name, run, wj in cases:
        try:
            y = np.asarray(run(xj, wj, sj))
            rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
            us = _timeit(run, xj, wj, sj)
            print(f"{name:16s} {us:7.1f} us   relerr {rel:.4f}")
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
