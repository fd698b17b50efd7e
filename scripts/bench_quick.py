"""Focused decode bench: one operating point per run (fast iteration on the
int4 path without re-running the full bench.py sweep).

  python scripts/bench_quick.py int4
  python scripts/bench_quick.py int4 --kv int8
  python scripts/bench_quick.py int8 --ctx 4096
  python scripts/bench_quick.py bf16
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from bench import _synth_quant_params, _time_decode  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["bf16", "int8", "int4"])
    ap.add_argument("--kv", default="bf16", choices=["bf16", "int8", "fp8"])
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--long", action="store_true",
                    help="prefill so the timed decode runs at ~ctx live "
                         "tokens (otherwise live length is ~16..1.5K "
                         "regardless of --ctx: kernels only read the live "
                         "KV prefix)")
    args = ap.parse_args()

    from clusterfusion_tpu.config import LlamaConfig
    from clusterfusion_tpu.models import llama as model

    cfg = LlamaConfig(hidden_dim=4096, n_heads=32, ffn_dim=11008,
                      n_layers=args.layers, vocab_size=32000,
                      max_seq_len=args.ctx)
    if args.kind == "bf16":
        params = model.init_params(cfg, jax.random.PRNGKey(0))
    else:
        params = _synth_quant_params(cfg, args.kind)
    jax.block_until_ready(params["embed"])
    import jax.numpy as jnp
    kv_dtype = {"int8": "int8", "fp8": jnp.float8_e4m3fn}.get(args.kv)
    kw = {"kv_dtype": kv_dtype} if kv_dtype else {}
    if args.long:
        kw["prompt_len"] = max(16, args.ctx - 12 * max(args.gen // 4, 8) - 64)
    tps = _time_decode(params, cfg, args.gen, fused=True, **kw)
    live = kw.get("prompt_len", 16)
    print(f"{args.kind}+{args.kv}kv ctx={args.ctx} live>={live}: "
          f"{tps:.2f} tok/s", flush=True)


if __name__ == "__main__":
    main()
