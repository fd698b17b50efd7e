"""Decompose the int4+int8kv decode token time (the headline config).

Differential measurements on the real chip:
- marginal layer cost: stack kernel at L vs L/2 (slope = per-layer time,
  intercept = fixed cost: LM-head phases, prologue, argmax/scan glue)
- append cost: per-layer time with the in-kernel RMW append vs the
  append-free verify path at n=1 (same phases minus append)

Usage: python scripts/profile_decode.py [--kind int4] [--kv int8]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B
from clusterfusion_tpu.config import LlamaConfig
from clusterfusion_tpu.models import llama as model


def _fetch(x):
    return np.asarray(jax.device_get(x))


def time_decode_ms(params, cfg, kv_dtype):
    """ms per token via the differential decode loop."""
    tps = B._time_decode(params, cfg, 256, fused=True, kv_dtype=kv_dtype)
    return 1e3 / tps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="int4")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--ctx", type=int, default=1024)
    args = ap.parse_args()
    kv_dtype = args.kv if args.kv == "int8" else (
        jnp.bfloat16 if args.kv == "bf16" else jnp.float8_e4m3fn)

    for L in (32, 16):
        cfg = LlamaConfig(hidden_dim=4096, n_heads=32, ffn_dim=11008,
                          n_layers=L, vocab_size=32000,
                          max_seq_len=args.ctx)
        qp = B._synth_quant_params(cfg, args.kind)
        jax.block_until_ready(qp["embed"])
        ms = time_decode_ms(qp, cfg, kv_dtype)
        print(f"L={L}: {ms:.3f} ms/token", flush=True)
        del qp
        import gc
        gc.collect()


if __name__ == "__main__":
    main()
