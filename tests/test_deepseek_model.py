"""End-to-end DeepSeek MLA model: fused kernel decode vs eager oracle.
The reference has no model around its deepseek kernel at all (SURVEY.md
§2.1 — single-layer prototype); these tests cover the full stack:
prefill → cached fused decode → logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clusterfusion_tpu.config import DeepSeekConfig
from clusterfusion_tpu.models import deepseek as model

CFG = DeepSeekConfig.tiny()


@pytest.fixture(scope="module")
def setup():
    params = model.init_params(CFG, jax.random.PRNGKey(0))
    cache = model.init_cache(CFG)
    return params, cache


def test_fused_decode_matches_eager(setup):
    params, cache = setup
    toks = jnp.asarray([5, 17, 42, 9], jnp.int32)
    logits, cache = model.prefill(params, cache, toks, CFG)
    tok = jnp.asarray(7, jnp.int32)
    pos = jnp.asarray(4, jnp.int32)
    lf, cf = model.decode_step(params, cache, tok, pos, CFG, fused=True)
    le, ce = model.decode_step(params, cache, tok, pos, CFG, fused=False)
    scale = max(float(jnp.max(jnp.abs(le))), 1.0)
    assert float(jnp.max(jnp.abs(lf - le))) < 0.05 * scale
    # the appended compressed row must agree
    np.testing.assert_allclose(np.asarray(cf[:, 4], np.float32),
                               np.asarray(ce[:, 4], np.float32), atol=0.05)


def test_prefill_then_decode_matches_all_prefill(setup):
    """prefill(T) + decode == prefill(T+1) logits at the last position."""
    params, cache = setup
    toks = jnp.asarray([3, 1, 4, 1, 5, 9], jnp.int32)
    l_all, _ = model.prefill(params, cache, toks, CFG)
    l_pre, c = model.prefill(params, cache, toks[:-1], CFG)
    l_dec, c = model.decode_step(params, c, toks[-1],
                                 jnp.asarray(5, jnp.int32), CFG, fused=False)
    scale = max(float(jnp.max(jnp.abs(l_all[-1]))), 1.0)
    assert float(jnp.max(jnp.abs(l_dec - l_all[-1]))) < 0.05 * scale


def test_multistep_fused_vs_eager(setup):
    """Teacher-forced 3-step decode: fused tracks eager."""
    params, cache = setup
    toks = jnp.asarray([2, 7, 18], jnp.int32)
    logits, c0 = model.prefill(params, cache, toks, CFG)
    tok = jnp.argmax(logits[-1]).astype(jnp.int32)
    cf, ce = c0, c0
    for step in range(3):
        pos = jnp.asarray(3 + step, jnp.int32)
        lf, cf = model.decode_step(params, cf, tok, pos, CFG, fused=True)
        le, ce = model.decode_step(params, ce, tok, pos, CFG, fused=False)
        scale = max(float(jnp.max(jnp.abs(le))), 1.0)
        err = float(jnp.max(jnp.abs(lf - le)))
        assert err < 0.05 * scale, (step, err)
        tok = jnp.argmax(le).astype(jnp.int32)


def test_generate_greedy_runs(setup):
    params, _ = setup
    out = model.generate_greedy(params, CFG, [1, 2, 3], n_gen=5)
    assert len(out) == 5 and all(0 <= t < CFG.vocab_size for t in out)
    # determinism (replaces the reference's 10k-repetition race sweep)
    out2 = model.generate_greedy(params, CFG, [1, 2, 3], n_gen=5)
    assert out == out2
