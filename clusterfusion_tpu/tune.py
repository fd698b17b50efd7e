"""Kernel autotuner — the generalized, runtime-tunable statement of the
reference's tiling knobs.

The reference hardcodes its tiling as compile-time macros
(`H100/llama/config.h:8-21`: `TMA_LOAD_ONCE 64 // 8 16 32 64 128 256`,
`CLUSTER_SIZE 4 // 2 4`) and its TileLang port generalizes them into
runtime kernel-build parameters with a per-config compile cache
(`tilelang_llama.py:165,441-452`) — but ships no tuner.  This module closes
the loop: sweep the ``KernelConfig`` space on the device, time the fused
decoder layer, and persist the winner per (model geometry, cache capacity,
device kind) so later runs load it instantly.

Timing methodology matches bench.py: kernels are chained on device under a
``lax.scan`` with a data dependency (the compiler can't hoist), closed by a
host fetch, and differenced between N and 2N chains so dispatch overhead
cancels.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import json
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clusterfusion_tpu.config import KernelConfig, LlamaConfig

_CACHE_ENV = "CLUSTERFUSION_TUNE_CACHE"
_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".tune_cache.json")


def _cache_path() -> str:
    return os.environ.get(_CACHE_ENV, _DEFAULT_CACHE)


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except RuntimeError:  # pragma: no cover
        return "unknown"


def _key(cfg: LlamaConfig, seq: int) -> str:
    return (f"{_device_kind()}|h{cfg.hidden_dim}|q{cfg.n_heads}"
            f"|kv{cfg.kv_heads}|d{cfg.head_dim_}|s{seq}")


def _load_cache() -> Dict[str, dict]:
    path = _cache_path()
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return {}
    return {}


def _store_cache(cache: Dict[str, dict]) -> None:
    path = _cache_path()
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def candidate_space(cfg: LlamaConfig, seq: int,
                    fixed_head_group: Optional[int] = None):
    """(kv_chunk, head_group) grid — the TPU analogues of TMA_LOAD_ONCE and
    CLUSTER_SIZE.  kv_chunk trades VMEM residency against grid-step count;
    head_group widens the projection dots (N = hg·(g+2)·hd must stay MXU-
    efficient) against weight-tile VMEM.

    ``fixed_head_group`` pins the hg axis: the fused weight layout bakes the
    head grouping in at load/init time (``fused_decoder_stack`` derives G
    from ``wqkv_f.shape``), so when tuning for an engine whose params
    already exist, only kv_chunk is actionable — sweeping other hg values
    would spend minutes-long compiles timing layouts the engine cannot use."""
    kv = cfg.kv_heads
    if cfg.hidden_dim >= 4096:
        # big models: each stack-kernel compile is expensive (minutes via a
        # remote-compile relay) — sweep only the knee of the curve.  Long
        # contexts add the 2K/4K chunks: at 8K ctx the grid-step fixed
        # cost (~1.5 us/step) dominates the gap to the byte floor, and
        # bigger chunks quarter the step count (scripts/bench_8k_chunk.py)
        chunks = [c for c in (512, 1024, 2048, 4096)
                  if c <= max(seq, 128) and (c <= 1024 or seq >= 4096)]
        hgs = [h for h in (2, 4, 8) if h <= kv and kv % h == 0]
    else:
        chunks = [c for c in (128, 256, 512, 1024) if c <= max(seq, 128)]
        hgs = [h for h in (1, 2, 4, 8, 16) if h <= kv and kv % h == 0]
    if fixed_head_group is not None:
        hgs = [fixed_head_group]
    return [(c, h) for c, h in itertools.product(chunks, hgs)]


def _time_layer_config(cfg: LlamaConfig, seq: int, kcfg: KernelConfig,
                       reps: int = 128) -> float:
    """Median-of-3 per-LAYER latency (µs) of the whole-stack megakernel
    (what the production decode path runs) under ``kcfg`` at KV capacity
    ``seq``, measured on a 2-layer stack and divided by 2."""
    from clusterfusion_tpu.ops._support import interpret_mode
    from clusterfusion_tpu.ops.stack_kernel import fused_decoder_stack

    kv, g, hd, h = cfg.kv_heads, cfg.n_heads // cfg.kv_heads, \
        cfg.head_dim_, cfg.hidden_dim
    from clusterfusion_tpu.models.llama import padded_ffn_dim
    f = padded_ffn_dim(cfg)
    hg = kcfg.head_group
    G = kv // hg
    nl = 2
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    bf = jnp.bfloat16
    x = jax.random.normal(ks[0], (1, h), bf)
    wqkv = jax.random.normal(ks[2], (nl, G, h, hg * (g + 2) * hd), bf) * 0.02
    wo = jax.random.normal(ks[3], (nl, G, hg * g * hd, h), bf) * 0.02
    w13 = jax.random.normal(ks[6], (nl, 2, h, f), bf) * 0.02
    w2 = jax.random.normal(ks[7], (nl, f, h), bf) * 0.02
    kc = jax.random.normal(ks[4], (nl, kv, seq, hd), bf)
    vc = jax.random.normal(ks[5], (nl, kv, seq, hd), bf)
    an = jnp.ones((nl, h), bf)
    fn = jnp.ones((nl, h), bf)
    cos = jnp.ones((1, hd), jnp.float32)
    sin = jnp.zeros((1, hd), jnp.float32)

    def step(xd):
        out, _, _, _ = fused_decoder_stack(
            xd, an, fn, cos, sin, wqkv, wo, w13, w2, kc, vc, seq - 1,
            group=g, head_dim=hd, rope_style="neox", eps=1e-5, kcfg=kcfg,
            interpret=interpret_mode())
        return out

    # dynamic trip count: ONE compile per config serves both chain lengths
    # (each stack-kernel compile costs minutes through the relay)
    @jax.jit
    def run(x0, n):
        def body(i, c):
            out = step(x0 * (1.0 + c * 1e-30))
            return jnp.sum(out.astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def timed(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(run(x, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    np.asarray(jax.device_get(run(x, 2)))           # compile + warm
    t1 = timed(reps)
    t2 = timed(2 * reps)
    return max(t2 - t1, 1e-7) / reps * 1e6 / 2   # per layer (2-layer stack)


def tune_decoder_layer(cfg: LlamaConfig, seq: int = 1024,
                       reps: int = 128, verbose: bool = True,
                       use_cache: bool = True,
                       fixed_head_group: Optional[int] = None) -> KernelConfig:
    """Sweep the candidate space, return (and persist) the fastest
    ``KernelConfig`` for this geometry on this device.  Pass
    ``fixed_head_group`` when the params' fused layout already exists (see
    ``candidate_space``)."""
    cache = _load_cache()
    key = _key(cfg, seq)
    if fixed_head_group is not None:
        key += f"|hg{fixed_head_group}"
    if use_cache and key in cache:
        best = cache[key]
        return KernelConfig(kv_chunk=best["kv_chunk"],
                            head_group=best["head_group"])

    results = []
    for chunk, hg in candidate_space(cfg, seq, fixed_head_group):
        kcfg = KernelConfig(kv_chunk=chunk, head_group=hg)
        try:
            us = _time_layer_config(cfg, seq, kcfg, reps)
        except Exception as e:   # config compiles may exceed VMEM etc.
            if verbose:
                print(f"tune: chunk={chunk} hg={hg} failed: {type(e).__name__}")
            continue
        results.append((us, chunk, hg))
        if verbose:
            print(f"tune: chunk={chunk:5d} hg={hg:2d} -> {us:8.1f} us/layer",
                  flush=True)
        if use_cache:
            # incremental: a partial sweep interrupted by a timeout still
            # leaves the best-so-far behind (stack compiles cost minutes)
            us_b, ch_b, hg_b = min(results)
            cache[key] = {"kv_chunk": ch_b, "head_group": hg_b, "us": us_b,
                          "reps": reps, "partial": True}
            _store_cache(cache)
    if not results:
        return KernelConfig()
    us, chunk, hg = min(results)
    best = KernelConfig(kv_chunk=chunk, head_group=hg)
    if use_cache:
        cache[key] = {"kv_chunk": chunk, "head_group": hg, "us": us,
                      "reps": reps}
        _store_cache(cache)
    if verbose:
        print(f"tune: best chunk={chunk} hg={hg} ({us:.1f} us/layer)")
    return best


def main():  # pragma: no cover - CLI
    import argparse
    ap = argparse.ArgumentParser(description="Autotune the fused decoder layer")
    ap.add_argument("--model", default="llama2_7b",
                    choices=["llama2_7b", "llama2_13b", "llama2_70b", "tiny"])
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=128)
    args = ap.parse_args()
    cfg = getattr(LlamaConfig, args.model)()
    best = tune_decoder_layer(cfg, args.seq, args.reps)
    print(json.dumps(dataclasses.asdict(best)))


if __name__ == "__main__":
    main()
