"""Judge adjudication: re-measure the int4+int8kv / int4+fp8kv 8K-ctx points
that diverge between README (149-152 / 136-150) and BENCH_r03 (110.65 / 80.13)."""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench import _synth_quant_params, _time_decode
from clusterfusion_tpu.config import LlamaConfig

n_gen = int(os.environ.get("BENCH_GEN", "512"))
cfg = LlamaConfig(hidden_dim=4096, n_heads=32, ffn_dim=11008,
                  n_layers=int(os.environ.get("BENCH_LAYERS", "32")),
                  vocab_size=32000, max_seq_len=1024)
qparams = _synth_quant_params(cfg, "int4")
jax.block_until_ready(qparams["embed"])
cfg8k = dataclasses.replace(cfg, max_seq_len=8192)
pl8 = 8192 - 12 * max(n_gen // 4, 8) - 64
out = {}
for trial in range(2):
    out[f"int4_int8kv_8k_t{trial}"] = round(
        _time_decode(qparams, cfg8k, n_gen, fused=True, kv_dtype="int8",
                     prompt_len=pl8), 2)
out["int4_1k"] = round(_time_decode(qparams, cfg, n_gen, fused=True,
                                    kv_dtype="int8"), 2)
print(json.dumps(out))
