"""Decisive head-to-head for the int4 dequant-dot production variant.

Round-robin interleaved timing (3 rounds x median-of-5 differential pairs
per variant) to beat the ±2 µs run-to-run drift seen in microbench_int4.

  python scripts/micro_head2head.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from microbench_int4 import (BN, GS, K, N, NG, NG2, _expand_rows, _x8,
                             body_v0, body_v9, body_v11, body_floor_flat,
                             make_call, timed)


# ---- v13: bitcast unpack + po2 shift + ONE flat int8 dot -------------------
# bitcast(1 conv) + variable shift(1 pass) + flat dot + per-column scale:
# the minimum-VPU-pass po2 formulation.
def body_v13(x, wp, sc):
    s_bar = sc[0:1]
    t32 = _expand_rows(sc[1:].astype(jnp.int32), GS)       # [K, BN]
    w8 = pltpu.bitcast(wp, jnp.int4).astype(jnp.int8)      # [K, BN]
    w8 = jnp.left_shift(w8.astype(jnp.int32), t32).astype(jnp.int8)
    x8, xs = _x8(x)
    d = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return d.astype(jnp.float32) * (s_bar * 0.125 * xs)


# ---- v14: bitcast + grouped dot but BLOCK-DIAG X (exact grouped, 1 matmul)
def body_v14(x, wp, s):
    w8 = pltpu.bitcast(wp, jnp.int4).astype(jnp.int8)      # [K, BN]
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


def main():
    rng = np.random.RandomState(0)
    w = rng.randn(K, N).astype(np.float32) * 0.02
    wg = w.reshape(NG, GS, N)
    s = (np.abs(wg).max(axis=1) / 7.0).astype(np.float32)
    q = np.clip(np.round(wg / s[:, None, :]), -7, 7).astype(np.int32)
    q = q.reshape(K, N)
    lo, hi = q[: K // 2], q[K // 2:]
    packed_std = ((lo & 15) | (hi << 4)).astype(np.int8)
    packed_adj = ((q[0::2] & 15) | (q[1::2] << 4)).astype(np.int8)

    # po2 encoding (adjacent pack order for v13)
    s_bar = s.max(axis=0, keepdims=True)
    e = np.clip(np.floor(np.log2(s_bar / np.maximum(s, 1e-12))),
                0, 3).astype(np.int32)
    s_p = s_bar * np.exp2(-e.astype(np.float64))
    q9 = np.clip(np.round(wg / s_p[:, None, :]), -7, 7).astype(np.int32)
    q9 = q9.reshape(K, N)
    packed9_std = ((q9[: K // 2] & 15) | (q9[K // 2:] << 4)).astype(np.int8)
    packed9_adj = ((q9[0::2] & 15) | (q9[1::2] << 4)).astype(np.int8)
    sc9 = np.concatenate([s_bar.astype(np.float32),
                          (3 - e).astype(np.float32)], axis=0)

    x = rng.randn(1, K).astype(np.float32)
    xj = jnp.asarray(x, jnp.bfloat16)
    xa = x.astype(np.float64)
    xs = max(np.abs(xa).max(), 1e-8) / 127.0
    x8 = np.round(xa / xs)
    ref = (x8 @ (q.astype(np.float64) * np.repeat(s, GS, axis=0))) * xs
    ref9 = (x8 @ (q9.astype(np.float64)
                  * np.repeat(s_p, GS, axis=0))) * xs

    cases = {
        "v0_current": (make_call(body_v0, K // 2, NG),
                       jnp.asarray(packed_std), jnp.asarray(s), ref),
        "v11_bitcast": (make_call(body_v11, K // 2, NG),
                        jnp.asarray(packed_adj), jnp.asarray(s), ref),
        "v14_bc_blockdiag": (make_call(body_v14, K // 2, NG),
                             jnp.asarray(packed_adj), jnp.asarray(s), ref),
        "v9_po2_flat": (make_call(body_v9, K // 2, NG + 1),
                        jnp.asarray(packed9_std), jnp.asarray(sc9), ref9),
        "v13_bc_po2": (make_call(body_v13, K // 2, NG + 1),
                       jnp.asarray(packed9_adj), jnp.asarray(sc9), ref9),
        "floor_flat": (make_call(body_floor_flat, K // 2, NG),
                       jnp.asarray(packed_std), jnp.asarray(s), None),
    }
    # correctness first
    for name, (run, wj, sv, oracle) in cases.items():
        y = np.asarray(jax.jit(run)(xj, wj, sv), np.float64)
        rel = (np.abs(y - oracle).max() / (np.abs(oracle).max() + 1e-9)
               if oracle is not None else float("nan"))
        print(f"{name:18s} relerr {rel:.4f}", flush=True)
    # interleaved timing
    results = {name: [] for name in cases}
    for rnd in range(3):
        for name, (run, wj, sv, _) in cases.items():
            results[name].append(timed(run, xj, wj, sv))
        print(f"# round {rnd}: " + "  ".join(
            f"{n}={results[n][-1]:.1f}" for n in cases), flush=True)
    print("# medians:", flush=True)
    for name in cases:
        print(f"{name:18s} {float(np.median(results[name])):7.1f} us",
              flush=True)


if __name__ == "__main__":
    main()
