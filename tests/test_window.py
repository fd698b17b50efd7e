"""Sliding-window attention (Mistral semantics) across every path that
takes a ``window``: the single-layer megakernel, the whole-stack decode
megakernel, the flash prefill kernel, and the n-row verify megakernel.

The round-3 advisor found the stack kernel silently ran window=0 (the
kernel partial omitted the parameter) while the KV index map already
aliased pre-window chunks — ~80% output error.  These tests pin the
wiring: every windowed path vs a windowed eager oracle, including a
window spanning a partial kv_chunk and the ``window >= seq+1`` ==
full-attention identity.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clusterfusion_tpu.config import KernelConfig, LlamaConfig
from clusterfusion_tpu.models import llama as model
from clusterfusion_tpu.models import speculative as spec
from clusterfusion_tpu.ops import llama_decoder_layer_sglang
from clusterfusion_tpu.ops.reference import llama_decoder_layer_sglang_ref

HIDDEN = 512
HEADS = 4
HEAD_DIM = 128


def _max_err(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def _make_inputs(key, seqlen, hidden=HIDDEN, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 8)
    rnd = lambda k, shape, s=1.0: (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)
    return dict(
        input=rnd(ks[0], (1, hidden)),
        residual=rnd(ks[1], (1, hidden)),
        w_qkv=rnd(ks[2], (3 * hidden, hidden), 0.1),
        w_o=rnd(ks[3], (hidden, hidden), 0.1),
        k_cache=rnd(ks[4], (seqlen, hidden)),
        v_cache=rnd(ks[5], (seqlen, hidden)),
        rms_w=rnd(ks[6], (hidden,), 0.1),
    )


# window values straddle the kv_chunk boundaries: 1 (only the new token),
# 64 (inside one chunk), 130 (spans a partial chunk at chunk=128), and
# seq+1 (must equal full attention)
@pytest.mark.parametrize("seqlen,window", [
    (37, 1), (37, 64), (256, 64), (256, 130), (256, 257), (400, 100),
])
def test_single_layer_window_matches_oracle(seqlen, window):
    d = _make_inputs(jax.random.PRNGKey(seqlen * 7 + window), seqlen)
    angle = jax.random.uniform(jax.random.PRNGKey(99), (HEAD_DIM // 2,),
                               jnp.float32) * math.pi
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    eps = 1e-5
    kcfg = KernelConfig(kv_chunk=128)

    got = llama_decoder_layer_sglang(
        d["input"], d["residual"], d["w_qkv"], d["w_o"],
        d["k_cache"], d["v_cache"], d["rms_w"], eps, cos, sin,
        kernel_config=kcfg, window=window)
    want = llama_decoder_layer_sglang_ref(
        d["input"], d["residual"], d["w_qkv"], d["w_o"],
        d["k_cache"], d["v_cache"], d["rms_w"], eps, cos, sin,
        n_heads=HEADS, head_dim=HEAD_DIM, window=window)

    assert _max_err(got[1], want[1]) < 2e-2, "residual"
    assert _max_err(got[0], want[0]) < 1e-1, "output"


def test_single_layer_full_window_equals_no_window():
    """window >= seq+1 must reproduce full attention exactly (the index-map
    clamp degenerates to a no-op and every mask is all-true)."""
    seqlen = 256
    d = _make_inputs(jax.random.PRNGKey(3), seqlen)
    angle = jax.random.uniform(jax.random.PRNGKey(99), (HEAD_DIM // 2,),
                               jnp.float32) * math.pi
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    kcfg = KernelConfig(kv_chunk=128)
    args = (d["input"], d["residual"], d["w_qkv"], d["w_o"],
            d["k_cache"], d["v_cache"], d["rms_w"], 1e-5, cos, sin)
    full = llama_decoder_layer_sglang(*args, kernel_config=kcfg, window=0)
    wide = llama_decoder_layer_sglang(*args, kernel_config=kcfg,
                                      window=seqlen + 1)
    np.testing.assert_array_equal(np.asarray(full[0], np.float32),
                                  np.asarray(wide[0], np.float32))


# --- whole-stack megakernel (the round-3 advisor's bug site) --------------

def _stack_setup(window, cap=512, pos_i=400, seed=11):
    cfg = LlamaConfig.tiny(max_seq_len=cap, sliding_window=window)
    params = model.init_params(cfg, jax.random.PRNGKey(seed))
    shape = (cfg.n_layers, cfg.kv_heads, cap, cfg.head_dim_)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 2)
    mask = (jnp.arange(cap) < pos_i)[None, None, :, None]
    kc = jnp.where(mask, jax.random.normal(ks[0], shape, jnp.bfloat16) * 0.5, 0)
    vc = jnp.where(mask, jax.random.normal(ks[1], shape, jnp.bfloat16) * 0.5, 0)
    return cfg, params, kc, vc, pos_i


# the advisor's repro geometry: seq=400, chunk=128, window=100 — the
# window starts mid-chunk (first in-window chunk is partially masked)
@pytest.mark.parametrize("window", [100, 130, 256])
def test_stack_window_fused_matches_eager(window):
    cfg, params, kc, vc, pos_i = _stack_setup(window)
    kcfg = KernelConfig(kv_chunk=128)
    tok = jnp.asarray(7, jnp.int32)
    pos = jnp.asarray(pos_i, jnp.int32)
    lf, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg, kcfg=kcfg,
                                 fused=True)
    le, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg, kcfg=kcfg,
                                 fused=False)
    a, b = np.asarray(lf, np.float32), np.asarray(le, np.float32)
    scale = max(float(np.max(np.abs(b))), 1.0)
    assert np.max(np.abs(a - b)) < 0.08 * scale, window


def test_stack_window_differs_from_full_attention():
    """Guard against the wiring bug recurring in the OTHER direction: a
    small window must actually change the logits vs full attention."""
    cfg, params, kc, vc, pos_i = _stack_setup(window=100)
    cfg_full = dataclasses.replace(cfg, sliding_window=0)
    kcfg = KernelConfig(kv_chunk=128)
    tok = jnp.asarray(7, jnp.int32)
    pos = jnp.asarray(pos_i, jnp.int32)
    lw, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg, kcfg=kcfg,
                                 fused=True)
    lfull, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg_full,
                                    kcfg=kcfg, fused=True)
    assert float(jnp.max(jnp.abs(lw - lfull))) > 1e-3


def test_stack_full_window_equals_no_window():
    """window >= seq+1 == full attention on the stack megakernel."""
    cfg, params, kc, vc, pos_i = _stack_setup(window=512)
    cfg_full = dataclasses.replace(cfg, sliding_window=0)
    kcfg = KernelConfig(kv_chunk=128)
    tok = jnp.asarray(7, jnp.int32)
    pos = jnp.asarray(pos_i, jnp.int32)     # pos_i=400: window 512 >= seq+1
    lw, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg, kcfg=kcfg,
                                 fused=True)
    lfull, _, _ = model.decode_step(params, kc, vc, tok, pos, cfg_full,
                                    kcfg=kcfg, fused=True)
    np.testing.assert_array_equal(np.asarray(lw), np.asarray(lfull))


# --- flash prefill ---------------------------------------------------------

@pytest.mark.parametrize("window", [64, 130, 1000])
def test_prefill_flash_window_matches_eager(window):
    cfg = LlamaConfig.tiny(max_seq_len=512, sliding_window=window)
    params = model.init_params(cfg, jax.random.PRNGKey(5))
    kc, vc = model.init_cache(cfg)
    toks = (jnp.arange(300, dtype=jnp.int32) * 13 + 1) % cfg.vocab_size
    lf, kf, vf = model.prefill(params, kc, vc, toks, cfg, flash=True)
    le, ke, ve = model.prefill(params, kc, vc, toks, cfg, flash=False)
    a, b = np.asarray(lf, np.float32), np.asarray(le, np.float32)
    scale = max(float(np.max(np.abs(b))), 1.0)
    assert np.max(np.abs(a - b)) < 0.08 * scale
    np.testing.assert_allclose(np.asarray(kf, np.float32),
                               np.asarray(ke, np.float32), atol=0.05)


def test_prefill_then_windowed_decode_consistency():
    """End-to-end Mistral-style flow: windowed prefill then windowed fused
    decode must track the eager path step by step."""
    cfg = LlamaConfig.tiny(max_seq_len=512, sliding_window=100)
    params = model.init_params(cfg, jax.random.PRNGKey(6))
    kc, vc = model.init_cache(cfg)
    toks = (jnp.arange(150, dtype=jnp.int32) * 11 + 2) % cfg.vocab_size
    _, kc, vc = model.prefill(params, kc, vc, toks, cfg)
    kcf, vcf, kce, vce = kc, vc, kc, vc
    tok = jnp.asarray(9, jnp.int32)
    for step in range(3):
        pos = jnp.asarray(len(toks) + step, jnp.int32)
        lf, kcf, vcf = model.decode_step(params, kcf, vcf, tok, pos, cfg,
                                         fused=True)
        le, kce, vce = model.decode_step(params, kce, vce, tok, pos, cfg,
                                         fused=False)
        err = float(jnp.max(jnp.abs(lf - le)))
        assert err < 0.1, f"step {step}: {err}"
        tok = jnp.argmax(le).astype(jnp.int32)


# --- n-row verify megakernel ----------------------------------------------

@pytest.mark.parametrize("window", [100, 401])
def test_verify_window_fused_matches_eager(window):
    cfg, params, kc, vc, pos_i = _stack_setup(window, seed=21)
    toks = (jnp.arange(4, dtype=jnp.int32) * 3 + 2) % cfg.vocab_size
    pos = jnp.asarray(pos_i, jnp.int32)
    lf, kf, vf = spec.verify_step(params, kc, vc, toks, pos, cfg, fused=True)
    le, ke, ve = spec.verify_step(params, kc, vc, toks, pos, cfg, fused=False)
    scale = max(float(jnp.max(jnp.abs(le))), 1.0)
    assert float(jnp.max(jnp.abs(lf - le))) < 0.06 * scale, window
    np.testing.assert_allclose(np.asarray(kf, np.float32),
                               np.asarray(ke, np.float32), atol=0.08)
