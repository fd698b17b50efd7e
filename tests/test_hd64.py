"""head_dim=64 geometries (TinyLlama-1.1B, Qwen2-0.5B) through the
whole-stack megakernel.

Sub-128-lane head dims hit three Mosaic limits the hd=128/256 paths never
see (round-5 fixes, ops/stack_kernel.py):

- rank-expanding vector reshapes (vector<Nx64> -> vector<Nx1x64>) in the
  append-RMW select -> replaced by per-head 2D selects;
- the [rows, 64] -> [1, rows*64] lane-collapse before the O-projection ->
  per-row summed dots (ops.decoder_layer._oproj_dot);
- the append RMW DMA itself, whose cache slice can never align to the
  (8, 128) tiling -> the kernel defers the append (defer_append), emitting
  new K/V rows as outputs for ONE whole-stack XLA dynamic-update.

On this machine these tests COMPILE ON THE REAL CHIP (the round-4 bug was
exactly that interpret mode passed while Mosaic compile failed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clusterfusion_tpu.config import LlamaConfig
from clusterfusion_tpu.models import llama as model
from clusterfusion_tpu.ops.quant import quantize_llama_params

CFG = LlamaConfig.tiny(head_dim=64, n_kv_heads=2, n_layers=2,
                       max_seq_len=256, rope_style="neox")


def _setup(quant, kv_dtype, seed=0):
    params = model.init_params(CFG, jax.random.PRNGKey(seed))
    if quant:
        params = quantize_llama_params(params, quant)
    kc, vc = model.init_cache(CFG, dtype=kv_dtype)
    prompt = (jnp.arange(9, dtype=jnp.int32) * 5 + 2) % CFG.vocab_size
    _, kc, vc = model.prefill(params, kc, vc, prompt, CFG)
    return params, kc, vc, 9


@pytest.mark.parametrize("quant,kv_dtype", [
    (None, jnp.bfloat16),
    ("int8", jnp.bfloat16),
    ("int4", "int8"),           # the production operating point
])
def test_hd64_fused_decode_matches_eager(quant, kv_dtype):
    params, kc, vc, pos_i = _setup(quant, kv_dtype)
    tok = jnp.asarray(3, jnp.int32)
    pos = jnp.asarray(pos_i, jnp.int32)
    lf, kf, vf = model.decode_step(params, kc, vc, tok, pos, CFG, fused=True)
    le, ke, ve = model.decode_step(params, kc, vc, tok, pos, CFG,
                                   fused=False)
    lf, le = np.asarray(lf, np.float32), np.asarray(le, np.float32)
    scale = max(float(np.max(np.abs(le))), 1.0)
    assert float(np.max(np.abs(lf - le))) < 0.05 * scale, quant
    # the deferred XLA append must land the same row the eager path writes
    if kv_dtype == "int8":
        def deq(c):
            H = c.q.shape[1]
            sf = np.asarray(c.s, np.float32).reshape(c.s.shape[0], H, -1)
            return (np.asarray(c.q[:, :, pos_i], np.float32)
                    * sf[:, :, pos_i:pos_i + 1])
        # codes may flip one unit where pre-quant rows differ by a bf16 ulp
        np.testing.assert_allclose(deq(kf), deq(ke), atol=0.08)
    else:
        # int8 weights add a bf16 dequant-rounding ulp (fused dequantizes
        # exactly int8->bf16 and scales the f32 dot; eager rounds the
        # dequantized weight tensor to bf16 before the dot)
        np.testing.assert_allclose(np.asarray(kf[:, :, pos_i], np.float32),
                                   np.asarray(ke[:, :, pos_i], np.float32),
                                   atol=0.045 if quant else 0.03)


def test_hd64_decode_loop_multistep():
    """Teacher-forced 3-step fused-vs-eager at hd=64 — proves appended rows
    feed later steps correctly through the donated-cache scan path."""
    params, kc, vc, pos_i = _setup("int4", "int8")
    tok = jnp.asarray(7, jnp.int32)
    cf, ce = (kc, vc), (kc, vc)
    for step in range(3):
        pos = jnp.asarray(pos_i + step, jnp.int32)
        lf, kf, vf = model.decode_step(params, *cf, tok, pos, CFG,
                                       fused=True)
        le, ke, ve = model.decode_step(params, *ce, tok, pos, CFG,
                                       fused=False)
        scale = max(float(jnp.max(jnp.abs(le))), 1.0)
        assert float(jnp.max(jnp.abs(lf - le))) < 0.06 * scale, step
        cf, ce = (kf, vf), (ke, ve)
        tok = jnp.argmax(le).astype(jnp.int32)


def test_hd64_windowed():
    """Sliding window at hd=64 (the Qwen2-0.5B/TinyLlama geometries can be
    windowed too — window math must compose with the deferred append)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, sliding_window=6)
    params = model.init_params(cfg, jax.random.PRNGKey(4))
    kc, vc = model.init_cache(cfg)
    prompt = (jnp.arange(12, dtype=jnp.int32) * 3 + 1) % cfg.vocab_size
    _, kc, vc = model.prefill(params, kc, vc, prompt, cfg)
    tok = jnp.asarray(5, jnp.int32)
    pos = jnp.asarray(12, jnp.int32)
    lf, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg, fused=True)
    le, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg, fused=False)
    scale = max(float(jnp.max(jnp.abs(le))), 1.0)
    assert float(jnp.max(jnp.abs(lf - le))) < 0.05 * scale


def test_hd64_serving_matches_single_seq():
    """Paged serving at hd=64: the engine routes to the fused per-layer
    impl, whose gather=False fallback reads pages via BlockSpec and
    appends via the XLA scatter (the explicit page-gather DMAs cannot
    slice a 64-lane pool minor under Mosaic's (8,128) tiling)."""
    from clusterfusion_tpu.runtime.serving import ServingEngine

    params = model.init_params(CFG, jax.random.PRNGKey(6))

    def ref_greedy(prompt, n_gen):
        kc, vc = model.init_cache(CFG)
        logits, kc, vc = model.prefill(params, kc, vc,
                                       jnp.asarray(prompt, jnp.int32), CFG)
        toks = [int(jnp.argmax(logits[len(prompt) - 1]))]
        pos = len(prompt)
        for _ in range(n_gen - 1):
            lg, kc, vc = model.decode_step(
                params, kc, vc, jnp.asarray(toks[-1], jnp.int32),
                jnp.asarray(pos, jnp.int32), CFG, fused=True)
            toks.append(int(jnp.argmax(lg)))
            pos += 1
        return toks

    prompts = {0: list(range(1, 22)), 1: [9, 4, 17]}
    eng = ServingEngine(params, CFG, page_size=8, num_pages=64, max_batch=4)
    assert eng.step_impl == "fused"
    for rid, p in prompts.items():
        eng.submit(rid, p, max_gen_len=4, temperature=0.0)
    out = eng.run()
    for rid, p in prompts.items():
        assert out[rid] == ref_greedy(p, 4), rid


def test_hd64_spec_verify_falls_back_to_eager():
    """Speculative verify at hd=64 auto-falls back to the eager scorer
    (the n-row verify megakernel keeps the hd>=128 contract) and still
    produces greedy-exact verification against decode_step."""
    from clusterfusion_tpu.models import speculative as spec

    params, kc, vc, pos_i = _setup(None, jnp.bfloat16, seed=8)
    draft = (jnp.arange(4, dtype=jnp.int32) * 3 + 2) % CFG.vocab_size
    pos = jnp.asarray(pos_i, jnp.int32)
    lv, kv2, vv2 = spec.verify_step(params, kc, vc, draft, pos, CFG,
                                    fused=True)   # auto-eager at hd=64
    # row 0 must equal the single-token decode logits at the same state
    l0, _, _ = model.decode_step(params, kc, vc, draft[0], pos, CFG,
                                 fused=False)
    np.testing.assert_allclose(np.asarray(lv[0], np.float32),
                               np.asarray(l0, np.float32),
                               atol=0.03, rtol=0.02)
