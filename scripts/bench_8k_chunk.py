"""Long-context chunk-size sweep: the 8K-ctx decode gap is ~1.5 us/grid-step
of fixed cost (1504 steps/token at kv_chunk 1024 ~= 2.3 ms on top of the
6.7 ms byte floor).  Bigger KV chunks cut the step count; sweep to find the
long-context sweet spot.  Usage: python scripts/bench_8k_chunk.py
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _synth_quant_params, _time_decode  # noqa: E402
import bench as _bench  # noqa: E402
import jax  # noqa: E402

from clusterfusion_tpu.config import KernelConfig, LlamaConfig  # noqa: E402
from clusterfusion_tpu.models import llama as model  # noqa: E402

n_gen = int(os.environ.get("BENCH_GEN", "256"))
cfg = LlamaConfig(hidden_dim=4096, n_heads=32, ffn_dim=11008,
                  n_layers=int(os.environ.get("BENCH_LAYERS", "32")),
                  vocab_size=32000, max_seq_len=8192)
qparams = _synth_quant_params(
    dataclasses.replace(cfg, max_seq_len=1024), "int4")
jax.block_until_ready(qparams["embed"])
pl8 = 8192 - 12 * max(n_gen // 4, 8) - 64

# monkeypatch: thread a kcfg through bench's _time_decode via decode_loop
out = {}
for chunk in (1024, 2048, 4096):
    kcfg = KernelConfig(kv_chunk=chunk, head_group=8)
    orig = model.decode_loop

    def dl(params, kc, vc, tok, pos, cfg_, fused=True, n_steps=32,
           _k=kcfg):
        return orig(params, kc, vc, tok, pos, cfg_, kcfg=_k, fused=fused,
                    n_steps=n_steps)

    model.decode_loop = dl
    try:
        out[f"chunk{chunk}"] = round(
            _time_decode(qparams, cfg, n_gen, fused=True, kv_dtype="int8",
                         prompt_len=pl8), 2)
    except Exception as e:  # noqa: BLE001
        out[f"chunk{chunk}"] = f"failed: {e!r}"
    finally:
        model.decode_loop = orig
    print(json.dumps(out), flush=True)
