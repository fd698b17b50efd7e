"""Autotuner tests (tiny geometry so the sweep stays fast)."""

import json
import os

import jax

from clusterfusion_tpu.config import KernelConfig, LlamaConfig
from clusterfusion_tpu.tune import candidate_space, tune_decoder_layer


def test_candidate_space_divisibility():
    cfg = LlamaConfig.llama2_7b()
    for chunk, hg in candidate_space(cfg, 1024):
        assert cfg.kv_heads % hg == 0
        assert chunk <= 1024
    cfg = LlamaConfig.llama2_70b()        # GQA: 8 kv heads, big-model sweep
    hgs = {h for _, h in candidate_space(cfg, 512)}
    assert hgs == {2, 4, 8}
    hgs = {h for _, h in candidate_space(LlamaConfig.tiny(), 256)}
    assert hgs == {1, 2, 4}


def test_tune_tiny_and_cache(tmp_path):
    os.environ["CLUSTERFUSION_TUNE_CACHE"] = str(tmp_path / "cache.json")
    try:
        cfg = LlamaConfig.tiny(max_seq_len=128)
        best = tune_decoder_layer(cfg, seq=128, reps=4, verbose=False)
        assert isinstance(best, KernelConfig)
        assert cfg.kv_heads % best.head_group == 0
        with open(os.environ["CLUSTERFUSION_TUNE_CACHE"]) as f:
            cache = json.load(f)
        assert len(cache) == 1
        entry = next(iter(cache.values()))
        assert entry["kv_chunk"] == best.kv_chunk
        # second call hits the cache (same result, no sweep)
        again = tune_decoder_layer(cfg, seq=128, reps=4, verbose=False)
        assert again == best
    finally:
        del os.environ["CLUSTERFUSION_TUNE_CACHE"]
