"""Microbench: variants of the fused W4A8 int4 dequant-dot on one tile.

The whole-stack int4 decode sits at ~63% of its HBM speed-of-light because
the per-tile unpack chain in ``ops.quant.w4a8_int4_dot`` is VPU-issue-bound
(round-1 measured 17.0 µs on a 4096x4096 tile vs the 10.9 µs HBM floor).
This sweeps encodings/op-mixes for the unpack so the kernel change is
data-driven, mirroring how round 1 chose the mask/xor/sub nibble form.

Timing is an on-device fori_loop chain with differential closure (reps vs
2*reps) — per-call host dispatch through the tunnel is ~650 µs and would
swamp the 10-20 µs kernel otherwise.

Run on the real chip:  python scripts/microbench_int4.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = N = 4096
GS = 128
BN = 512          # output-column block per grid step (weights stream in)
NG = K // GS
NG2 = K // 2 // GS
REPS = 1024


def timed(call, *args, reps=REPS):
    """µs per call: on-device chain (data-dependent perturbation so the
    compiler can't hoist), differential reps vs 2*reps closure.  Pairs are
    measured back-to-back and the MEDIAN of 5 pair-differences taken —
    tunnel dispatch and clock drift showed ±5 µs swings with min-of-3."""
    @jax.jit
    def run(x0, rest, n):
        def body(i, c):
            out = call(x0 * (1.0 + c * 1e-30), *rest)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    x0, rest = args[0], args[1:]
    np.asarray(jax.device_get(run(x0, rest, 2)))

    def once(n):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(x0, rest, n)))
        return time.perf_counter() - t0

    once(reps), once(2 * reps)                 # warm both trace paths
    diffs = [once(2 * reps) - once(reps) for _ in range(5)]
    return float(np.median(diffs)) / reps * 1e6


def make_call(body, packed_rows, s_rows=NG, bn=BN):
    """Pipelined: grid over N-blocks; packed block [packed_rows, bn],
    scales [s_rows, bn], x full row, out [1, bn]."""
    def kern(x_ref, p_ref, s_ref, o_ref):
        o_ref[...] = body(x_ref[...], p_ref[...], s_ref[...])

    def call(x, p, s):
        return pl.pallas_call(
            kern,
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((1, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((packed_rows, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_rows, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        )(x, p, s)
    return call


def _x8(x):
    xa = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xa), axis=-1, keepdims=True),
                     1e-8) * (1.0 / 127.0)
    return jnp.round(xa / xs).astype(jnp.int8), xs


def _grp_dot(x8_row, w8_half, s_half, bn):
    """[1, K/2] int8 · [K/2, bn] int8 with NG2 group scales → f32 [1, bn]."""
    xg = x8_row.reshape(NG2, 1, GS)
    wg = w8_half.reshape(NG2, GS, bn)
    part = jax.lax.dot_general(xg, wg, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    return jnp.sum(part.astype(jnp.float32) * s_half[:, None, :], axis=0)


# ---- v0: current w4a8_int4_dot body (int32 widen, concat, grouped dot) ----
def body_v0(x, wp, s):
    p32 = wp.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    w8 = jnp.concatenate([lo, hi], axis=0)                 # [K, BN]
    x8, xs = _x8(x)
    xg = x8.reshape(NG, 1, GS)
    wg = w8.reshape(NG, GS, BN)
    part = jax.lax.dot_general(xg, wg, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    y = jnp.sum(part.astype(jnp.float32) * s[:, None, :], axis=0)
    return y * xs


# ---- v1: split lo/hi group dots — no concat copy -------------------------
def body_v1(x, wp, s):
    p32 = wp.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)           # rows [0, K/2)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)          # rows [K/2, K)
    x8, xs = _x8(x)
    y = _grp_dot(x8[:, : K // 2], lo, s[:NG2], BN) \
        + _grp_dot(x8[:, K // 2:], hi, s[NG2:], BN)
    return y * xs


# ---- v2: int8-native elementwise (no int32 widen) + split dots ------------
def body_v2(x, wp, s):
    lo = ((wp & jnp.int8(15)) ^ jnp.int8(8)) - jnp.int8(8)
    hi = jnp.right_shift(wp, 4)                            # int8 arith shift
    x8, xs = _x8(x)
    y = _grp_dot(x8[:, : K // 2], lo, s[:NG2], BN) \
        + _grp_dot(x8[:, K // 2:], hi, s[NG2:], BN)
    return y * xs


# ---- v3: biased-lo ENCODING (byte = 16*hi + lo + 8): 2 cheap nibble ops ---
# lo = (byte & 15) - 8  →  fold the -8 into a per-group x-sum correction so
# the weight tile takes ONE op for lo (&15) and ONE for hi (>>4).
def body_v3(x, wp, s):
    lo_u = wp & jnp.int8(15)                               # [K/2, BN]
    hi = jnp.right_shift(wp, 4)                            # exact: see pack
    x8, xs = _x8(x)
    x_lo = x8[:, : K // 2]
    xg = x_lo.reshape(NG2, 1, GS)
    xsum = jnp.sum(xg.astype(jnp.int32), axis=2)[:, :, None]  # [NG2,1,1]
    d_lu = jax.lax.dot_general(xg, lo_u.reshape(NG2, GS, BN),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    lo_part = jnp.sum((d_lu - 8 * xsum).astype(jnp.float32)
                      * s[:NG2, None, :], axis=0)
    y = lo_part + _grp_dot(x8[:, K // 2:], hi, s[NG2:], BN)
    return y * xs


# ---- v3b: biased-lo encoding, plain 2-op unpack (no correction dot) -------
def body_v3b(x, wp, s):
    lo = (wp & jnp.int8(15)) - jnp.int8(8)
    hi = jnp.right_shift(wp, 4)
    x8, xs = _x8(x)
    y = _grp_dot(x8[:, : K // 2], lo, s[:NG2], BN) \
        + _grp_dot(x8[:, K // 2:], hi, s[NG2:], BN)
    return y * xs


# ---- v6: BLOCK-DIAGONAL activation — one M=NG2 matmul per nibble half -----
# The grouped batched dot ([NG,1,GS]x[NG,GS,BN]) is overhead-bound: 256
# M=1 matmuls per tile (floor_dot shows the dot alone costs ~2x the HBM
# floor).  Instead place each group's x8 slice on the diagonal of
# X_bd [NG2, K/2] and do ONE [NG2, K/2]x[K/2, BN] int8 matmul per half:
# P[g, n] = sum_{k in g} x_k w_kn, then y = sum_g P[g,n] * s[g,n].
# 32x redundant MACs on zeros, but decode is HBM-bound and the MXU is
# ~30x under-occupied at M=1 — overhead trades for free FLOPs.
def _bd(x8_half):
    # mask/where in int32 (Mosaic rejects int8 elementwise select), cast last
    row = jax.lax.broadcasted_iota(jnp.int32, (NG2, K // 2), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (NG2, K // 2), 1) // GS
    x32 = jnp.broadcast_to(x8_half.astype(jnp.int32), (NG2, K // 2))
    return jnp.where(row == grp, x32, 0).astype(jnp.int8)


def _bd_dot(x8_half, w8_half, s_half, bn):
    p = jax.lax.dot_general(_bd(x8_half), w8_half, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)  # [NG2, bn]
    return jnp.sum(p.astype(jnp.float32) * s_half, axis=0, keepdims=True)


def body_v6(x, wp, s):
    p32 = wp.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    x8, xs = _x8(x)
    y = _bd_dot(x8[:, : K // 2], lo, s[:NG2], BN) \
        + _bd_dot(x8[:, K // 2:], hi, s[NG2:], BN)
    return y * xs


# ---- v7: block-diagonal + concat (one [NG, K] x [K, BN] matmul) ------------
def body_v7(x, wp, s):
    p32 = wp.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    w8 = jnp.concatenate([lo, hi], axis=0)                 # [K, BN]
    x8, xs = _x8(x)
    row = jax.lax.broadcasted_iota(jnp.int32, (NG, K), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (NG, K), 1) // GS
    xbd = jnp.where(row == grp,
                    jnp.broadcast_to(x8.astype(jnp.int32), (NG, K)),
                    0).astype(jnp.int8)
    p = jax.lax.dot_general(xbd, w8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = jnp.sum(p.astype(jnp.float32) * s, axis=0, keepdims=True)
    return y * xs


# ---- v9: power-of-2 group scales folded into int8 codes — ONE FLAT DOT ----
# Encoding (quantize-time): per column n, s_bar_n = max_g s_gn; per group
# exponent e_gn = clip(ceil(log2(s_bar/s_gn)), 0, 3) and codes chosen
# against s_gn' = s_bar * 2^-e (within 2x of the optimal group scale).
# Unpack: w8 = nibble << e (|w8| <= 7*8 = 56), then y = (x8 . w8) * s_bar/8
# — per-column scale commutes with ONE flat int8 dot like the int8 path.
# e streams as an int8 [NG, N] plane (1/128 of the weight bytes).
# Harness packs [s_bar; t] into one f32 [NG+1, BN] operand: row 0 = s_bar,
# rows 1..NG = shift t = 3 - e (exact small ints in f32).
def body_v9(x, wp, sc):
    s_bar = sc[0:1]                                       # [1, BN]
    t32 = sc[1:].astype(jnp.int32)                        # [NG, BN]
    p32 = wp.astype(jnp.int32)
    lo = ((p32 & 15) ^ 8) - 8
    hi = jnp.right_shift(p32, 4)
    w_lo = jnp.left_shift(lo, _expand_rows(t32[:NG2], GS)).astype(jnp.int8)
    w_hi = jnp.left_shift(hi, _expand_rows(t32[NG2:], GS)).astype(jnp.int8)
    x8, xs = _x8(x)
    d = jax.lax.dot_general(x8[:, : K // 2], w_lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32) \
        + jax.lax.dot_general(x8[:, K // 2:], w_hi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return d.astype(jnp.float32) * (s_bar * 0.125 * xs)


def _expand_rows(a, rep):
    """[G, N] → [G*rep, N] with each row repeated rep times."""
    g, n = a.shape
    return jnp.broadcast_to(a[:, None, :], (g, rep, n)).reshape(g * rep, n)


# ---- v10: exact grouped, gs=512 (4x fewer batched-dot entries) -------------
def body_v10(x, wp, s):
    p32 = wp.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    x8, xs = _x8(x)
    gs2 = 512
    ng = K // 2 // gs2
    def gd(x8h, w8, sh):
        xg = x8h.reshape(ng, 1, gs2)
        wg = w8.reshape(ng, gs2, BN)
        part = jax.lax.dot_general(xg, wg, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)
        return jnp.sum(part.astype(jnp.float32) * sh[:, None, :], axis=0)
    # reuse gs=128 scales by taking every 4th row (timing-only shape proxy)
    y = gd(x8[:, : K // 2], lo, s[:NG2:4]) \
        + gd(x8[:, K // 2:], hi, s[NG2::4])
    return y * xs


# ---- v11: pltpu.bitcast int8→int4 + hardware astype(int8), grouped dot ----
# If Mosaic lowers int4→int8 conversion as a native lane unpack (1 VPU
# pass), the whole mask/xor/shift chain disappears.  Pack order must match
# the bitcast's layout — probed at runtime in main().
def body_v11(x, wp, s):
    w4 = pltpu.bitcast(wp, jnp.int4)                       # [K, BN]
    w8 = w4.astype(jnp.int8)
    x8, xs = _x8(x)
    xg = x8.reshape(NG, 1, GS)
    wg = w8.reshape(NG, GS, BN)
    part = jax.lax.dot_general(xg, wg, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
    y = jnp.sum(part.astype(jnp.float32) * s[:, None, :], axis=0)
    return y * xs


# ---- v12: bitcast int4 → bf16 exact-dequant path ---------------------------
def body_v12(x, wp, s):
    w4 = pltpu.bitcast(wp, jnp.int4)
    w = w4.astype(jnp.bfloat16) * _expand_rows(s.astype(jnp.bfloat16), GS)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def probe_bitcast_order():
    """Which original rows does byte b of a bitcast-int4 array hold?"""
    def kern(p_ref, o_ref):
        o_ref[...] = pltpu.bitcast(p_ref[...], jnp.int4).astype(jnp.int32)

    p = np.arange(32 * 128, dtype=np.uint8).reshape(32, 128)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )(jnp.asarray(p.view(np.int8)))
    out = np.asarray(out)
    b0 = int(p[0, 0])                 # byte 0: lo=b0&15, hi=b0>>4
    lo0, hi0 = ((b0 & 15) ^ 8) - 8, (b0 >> 4) - (16 if b0 >> 4 > 7 else 0)
    print(f"# bitcast probe: byte0={b0} -> out[0,0]={out[0, 0]}"
          f" out[1,0]={out[1, 0]} out[32,0]={out[32, 0]}"
          f" (lo={lo0} hi={hi0})", flush=True)
    return out


# ---- floor probes ----------------------------------------------------------
def body_floor_dot(x, wp, s):
    """No unpack at all (wrong math, right bytes): grouped int8 dot straight
    on the packed bytes — isolates the dot+scale cost."""
    x8, xs = _x8(x)
    return _grp_dot(x8[:, : K // 2], wp, s[:NG2], BN) * xs


# ---- v8: unpack + TWO FLAT dots, per-COLUMN scales (fast-mode semantics) --
# Per-column int4 scales commute with the dot like int8 — no grouped
# algebra at all.  Times the unpack cost on top of floor_flat.
def body_v8(x, wp, s):
    p32 = wp.astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    x8, xs = _x8(x)
    d = jax.lax.dot_general(x8[:, : K // 2], lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32) \
        + jax.lax.dot_general(x8[:, K // 2:], hi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return d.astype(jnp.float32) * (s[0] * xs)


def body_floor_flat(x, wp, s):
    """No unpack, single flat int8 dot on packed bytes (wrong math): the
    cheapest possible dot structure at these HBM bytes."""
    x8, xs = _x8(x)
    y = jax.lax.dot_general(x8[:, : K // 2], wp, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s[0] * xs)


def make_call_pre(body, bn):
    """PRE-BLOCKED weight layout: packed [NB, K/2, bn] so each streamed
    block is one fully CONTIGUOUS 1-4 MB DMA (the [K/2, BN]-of-[K/2, N]
    column block above reads 512-byte bursts with a 4 KB stride — if the
    floor gap is DMA burst efficiency, this closes it)."""
    def kern(x_ref, p_ref, s_ref, o_ref):
        o_ref[...] = body(x_ref[...], p_ref[0], s_ref[...])

    def call(x, p, s):
        return pl.pallas_call(
            kern,
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((1, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K // 2, bn), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NG, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        )(x, p, s)
    return call


def mk_body_floor_flat_bn(bn):
    def body(x, wp, s):
        x8, xs = _x8(x)
        y = jax.lax.dot_general(x8[:, : K // 2], wp,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (s[0, :] * xs)
    return body


def main():
    rng = np.random.RandomState(0)
    w = rng.randn(K, N).astype(np.float32) * 0.02
    wg = w.reshape(NG, GS, N)
    s = (np.abs(wg).max(axis=1) / 7.0).astype(np.float32)  # [NG, N]
    q = np.clip(np.round(wg / s[:, None, :]), -7, 7).astype(np.int32)
    q = q.reshape(K, N)
    lo, hi = q[: K // 2], q[K // 2:]
    packed_std = ((lo & 15) | (hi << 4)).astype(np.int8)   # current format
    packed_b = ((hi << 4) | (lo + 8)).astype(np.int8)      # biased-lo

    x = rng.randn(1, K).astype(np.float32)
    xj = jnp.asarray(x, jnp.bfloat16)
    sj = jnp.asarray(s)
    # oracle through the same A8 activation quantization the variants use
    xa = x.astype(np.float64)
    xs = max(np.abs(xa).max(), 1e-8) / 127.0
    x8 = np.round(xa / xs)
    ref = (x8 @ (q.astype(np.float64)
                 * np.repeat(s, GS, axis=0))) * xs

    hbm_bytes = K // 2 * N + NG * N * 4
    print(f"# tile {K}x{N} gs={GS}; packed+scales = {hbm_bytes/1e6:.1f} MB"
          f" -> HBM floor ~{hbm_bytes/819e9*1e6:.1f} us", flush=True)
    # ---- v9 encoding: po2 group scales vs the column max ----
    s_bar = s.max(axis=0, keepdims=True)                   # [1, N]
    e = np.clip(np.floor(np.log2(s_bar / np.maximum(s, 1e-12))),
                0, 3).astype(np.int32)                     # [NG, N]
    s_p = s_bar * np.exp2(-e.astype(np.float64))           # s' >= s (e<3)
    q9 = np.clip(np.round(wg / s_p[:, None, :]), -7, 7).astype(np.int32)
    q9 = q9.reshape(K, N)
    lo9, hi9 = q9[: K // 2], q9[K // 2:]
    packed_9 = ((lo9 & 15) | (hi9 << 4)).astype(np.int8)
    sc9 = np.concatenate([s_bar.astype(np.float32),
                          (3 - e).astype(np.float32)], axis=0)  # [NG+1, N]
    ref9 = (x8 @ (q9.astype(np.float64)
                  * np.repeat(s_p, GS, axis=0))) * xs
    # how much accuracy does po2 give up vs exact grouped? (weight-domain)
    werr = np.abs(q9.astype(np.float64) * np.repeat(s_p, GS, axis=0)
                  - w).mean() / np.abs(w).mean()
    werr_x = np.abs(q.astype(np.float64) * np.repeat(s, GS, axis=0)
                    - w).mean() / np.abs(w).mean()
    print(f"# po2 weight-quant rel-MAE {werr:.4f} vs exact-grouped"
          f" {werr_x:.4f}", flush=True)

    try:
        probe_bitcast_order()
    except Exception as e:
        print(f"# bitcast probe FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
    # adjacent-row pack candidates for the bitcast path (order self-selects
    # by relerr below)
    packed_adj_a = ((q[0::2] & 15) | (q[1::2] << 4)).astype(np.int8)
    packed_adj_b = ((q[1::2] & 15) | (q[0::2] << 4)).astype(np.int8)

    cases = [
        ("v0_current", body_v0, packed_std, sj, NG, ref),
        ("v6_blockdiag", body_v6, packed_std, sj, NG, ref),
        ("v9_po2_flat", body_v9, packed_9, jnp.asarray(sc9), NG + 1, ref9),
        ("v11_bitcast_a", body_v11, packed_adj_a, sj, NG, ref),
        ("v11_bitcast_b", body_v11, packed_adj_b, sj, NG, ref),
        ("v12_bc_bf16_a", body_v12, packed_adj_a, sj, NG, ref),
        ("floor_dot", body_floor_dot, packed_std, sj, NG, None),
        ("floor_flat", body_floor_flat, packed_std, sj, NG, None),
    ]
    for name, body, packed, sv, s_rows, oracle in cases:
        run = make_call(body, K // 2, s_rows)
        wj = jnp.asarray(packed)
        try:
            y = np.asarray(jax.jit(run)(xj, wj, sv), np.float64)
            rel = (np.abs(y - oracle).max() / (np.abs(oracle).max() + 1e-9)
                   if oracle is not None else float("nan"))
            us = timed(run, xj, wj, sv)
            print(f"{name:16s} {us:7.1f} us   relerr {rel:.4f}", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # ---- DMA-layout probes: BN sweep (strided column blocks) ----
    for bn in (1024, 2048, 4096):
        run = make_call(mk_body_floor_flat_bn(bn), K // 2, NG, bn)
        try:
            us = timed(run, xj, jnp.asarray(packed_std), sj)
            print(f"floor_col_bn{bn:<5d} {us:7.1f} us", flush=True)
        except Exception as e:
            print(f"floor_col_bn{bn} FAILED: {type(e).__name__}:"
                  f" {str(e)[:160]}", flush=True)

    # ---- DMA-layout probes: pre-blocked contiguous blocks ----
    for bn in (512, 1024, 2048):
        pre = np.ascontiguousarray(
            packed_std.reshape(K // 2, N // bn, bn).transpose(1, 0, 2))
        run = make_call_pre(mk_body_floor_flat_bn(bn), bn)
        try:
            us = timed(run, xj, jnp.asarray(pre), sj)
            print(f"floor_pre_bn{bn:<5d} {us:7.1f} us", flush=True)
        except Exception as e:
            print(f"floor_pre_bn{bn} FAILED: {type(e).__name__}:"
                  f" {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
