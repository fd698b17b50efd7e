"""Gemma-2-9B-geometry decode point (int4 + int8 KV): softcap + sandwich
norms + GeGLU + interleaved local/global windows through the whole-stack
megakernel.  Standalone (not part of bench.py's driver line — the 256K
vocab embed/LM tables make it the heaviest synth model here).

Usage: python scripts/bench_gemma.py   [BENCH_LAYERS=42 BENCH_GEN=256]
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import _synth_quant_params, _time_decode  # noqa: E402
from clusterfusion_tpu.config import LlamaConfig  # noqa: E402
from clusterfusion_tpu.models import llama as model  # noqa: E402

n_gen = int(os.environ.get("BENCH_GEN", "256"))
cfg = dataclasses.replace(
    LlamaConfig.gemma2_9b(),
    n_layers=int(os.environ.get("BENCH_LAYERS", "42")),
    max_seq_len=4096)
qparams = _synth_quant_params(cfg, "int4")
if cfg.sandwich_norms:
    import jax.numpy as jnp
    L, h = cfg.n_layers, cfg.hidden_dim
    qparams["layers"]["post_attn_norm"] = jnp.ones((L, h), jnp.bfloat16)
    qparams["layers"]["post_ffn_norm"] = jnp.ones((L, h), jnp.bfloat16)
jax.block_until_ready(qparams["embed"])
out = {"gemma2_9b_int4_int8kv_4kctx": round(
    _time_decode(qparams, cfg, n_gen, fused=True, kv_dtype="int8",
                 prompt_len=2048), 2)}
print(json.dumps(out))
