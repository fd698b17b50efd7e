"""INT8 KV cache (`ops.quant.Int8KV`) — the TPU-native fast 8-bit KV format.

Checks, all through the production paths (fused stack megakernel with
in-kernel quantized append; eager path as the exact oracle of the same
quantized cache):

- fused decode over an int8 cache == eager decode over the same int8 cache
  (same quantization math, so tolerances are the usual fused-vs-eager ones);
- int8-KV decode tracks the bf16-KV decode within the quantization error
  bound (the Δ that bench_ppl.py quantifies as perplexity);
- prefill fills int8 caches (payload + scale planes) consistently with
  per-row quantization of the bf16 prefill;
- the n-row verify megakernel scores/appends over int8 caches consistently
  with n single-token fused steps;
- multi-chunk capacities (cap > kv_chunk) exercise the scale-plane chunk
  indexing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clusterfusion_tpu.config import KernelConfig, LlamaConfig
from clusterfusion_tpu.models import llama as model
from clusterfusion_tpu.ops.quant import Int8KV, kv_scales_flat

CFG = LlamaConfig.tiny(max_seq_len=64)


def _prefilled(cfg, dtype, toks, seed=0):
    params = model.init_params(cfg, jax.random.PRNGKey(seed))
    kc, vc = model.init_cache(cfg, dtype=dtype)
    logits, kc, vc = model.prefill(params, kc, vc,
                                   jnp.asarray(toks, jnp.int32), cfg)
    return params, logits, kc, vc


def test_int8kv_fused_matches_eager():
    toks = [5, 17, 42, 9, 3]
    params, _, kc, vc = _prefilled(CFG, "int8", toks)
    tok = jnp.asarray(7, jnp.int32)
    pos = jnp.asarray(len(toks), jnp.int32)
    lf, kf, vf = model.decode_step(params, kc, vc, tok, pos, CFG, fused=True)
    le, ke, ve = model.decode_step(params, kc, vc, tok, pos, CFG, fused=False)
    assert isinstance(kf, Int8KV) and isinstance(ke, Int8KV)
    err = float(jnp.max(jnp.abs(lf - le)))
    assert err < 0.1, f"fused vs eager logits max err {err}"
    # the appended int8 rows and their scales must agree.  Codes may differ
    # by a couple of ulps: the two paths compute the pre-quantization K/V
    # rows with different matmul orders (fused megakernel vs eager XLA), so
    # values near a rounding boundary can land on adjacent codes — the
    # dequantized VALUES are what matter (scales agree to 2e-2 below).
    np.testing.assert_allclose(
        np.asarray(kf.q[:, :, len(toks)], np.int32),
        np.asarray(ke.q[:, :, len(toks)], np.int32), atol=2)
    np.testing.assert_allclose(
        np.asarray(kv_scales_flat(kf.s, 64)[..., len(toks)]),
        np.asarray(kv_scales_flat(ke.s, 64)[..., len(toks)]),
        rtol=2e-2)


def test_int8kv_tracks_bf16():
    toks = [1, 2, 3, 4]
    params, _, k8, v8 = _prefilled(CFG, "int8", toks, seed=1)
    _, _, kb, vb = _prefilled(CFG, jnp.bfloat16, toks, seed=1)
    tok = jnp.asarray(11, jnp.int32)
    pos = jnp.asarray(len(toks), jnp.int32)
    l8, _, _ = model.decode_step(params, k8, v8, tok, pos, CFG, fused=True)
    lb, _, _ = model.decode_step(params, kb, vb, tok, pos, CFG, fused=True)
    scale = max(float(jnp.max(jnp.abs(lb))), 1.0)
    assert float(jnp.max(jnp.abs(l8 - lb))) < 0.05 * scale


def test_int8kv_prefill_scales_match_rowwise_quant():
    toks = [9, 8, 7, 6, 5]
    params, _, k8, v8 = _prefilled(CFG, "int8", toks, seed=2)
    _, _, kb, vb = _prefilled(CFG, jnp.float32, toks, seed=2)
    # dequantized int8 rows must reproduce the f32 rows to int8 precision
    sflat = np.asarray(kv_scales_flat(k8.s, 64))[:, :, :len(toks), None]
    deq = np.asarray(k8.q, np.float32)[:, :, :len(toks)] * sflat
    ref = np.asarray(kb, np.float32)[:, :, :len(toks)]
    amax = np.abs(ref).max(axis=-1, keepdims=True)
    np.testing.assert_allclose(deq, ref, atol=float(amax.max()) / 127 + 1e-5)


def test_int8kv_verify_matches_single_steps():
    from clusterfusion_tpu.models.speculative import verify_step
    toks = [3, 1, 4, 1, 5]
    draft = [9, 2, 6, 5]
    params, _, kc, vc = _prefilled(CFG, "int8", toks, seed=3)
    lg_v, kv_, vv_ = verify_step(params, kc, vc,
                                 jnp.asarray(draft, jnp.int32),
                                 jnp.asarray(len(toks), jnp.int32), CFG,
                                 fused=True)
    kc1, vc1 = kc, vc
    for i, t in enumerate(draft):
        lg1, kc1, vc1 = model.decode_step(
            params, kc1, vc1, jnp.asarray(t, jnp.int32),
            jnp.asarray(len(toks) + i, jnp.int32), CFG, fused=True)
        err = float(jnp.max(jnp.abs(lg_v[i] - lg1)))
        assert err < 0.15, f"row {i}: verify vs step err {err}"
    np.testing.assert_allclose(np.asarray(kv_.q, np.int32),
                               np.asarray(kc1.q, np.int32), atol=1)


@pytest.mark.parametrize("cap", [256, 1024])
def test_int8kv_multichunk_capacity(cap):
    """cap > kv_chunk exercises scale-plane chunk indexing (rb blocks)."""
    cfg = LlamaConfig.tiny(max_seq_len=cap)
    kcfg = KernelConfig(kv_chunk=128)
    toks = list(range(1, 140))          # fills beyond one chunk
    params, _, kc, vc = _prefilled(cfg, "int8", toks, seed=4)
    tok = jnp.asarray(7, jnp.int32)
    pos = jnp.asarray(len(toks), jnp.int32)
    lf, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg, kcfg,
                                 fused=True)
    le, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg, kcfg,
                                 fused=False)
    err = float(jnp.max(jnp.abs(lf - le)))
    assert err < 0.1, f"cap={cap}: fused vs eager err {err}"
