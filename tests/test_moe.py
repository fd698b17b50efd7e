"""MoE FFN: router properties, decode-vs-dense parity, and the DeepSeek
model with routed experts end-to-end (capability beyond the reference,
which has no FFN/MoE path — `include/H100/deepseek/` is attention-only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clusterfusion_tpu.config import DeepSeekConfig
from clusterfusion_tpu.models import deepseek as model
from clusterfusion_tpu.ops.moe import (moe_ffn_decode, moe_ffn_dense,
                                       route_top_k)

E, H, F = 8, 256, 128


def _weights(key):
    ks = jax.random.split(key, 4)
    r = lambda k, s, f: (jax.random.normal(k, s, jnp.float32) / np.sqrt(f)
                         ).astype(jnp.bfloat16)
    return (r(ks[0], (H, E), H), r(ks[1], (E, 2, H, F), H),
            r(ks[2], (E, F, H), F))


def test_router_top_k():
    router_w, _, _ = _weights(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, H), jnp.bfloat16)
    for k in (1, 2, 4):
        g, sel = route_top_k(x, router_w, k)
        nz = np.count_nonzero(np.asarray(g), axis=-1)
        np.testing.assert_array_equal(nz, k)
        np.testing.assert_allclose(np.asarray(jnp.sum(g, -1)), 1.0,
                                   rtol=1e-5)
        assert sel.shape == (5, k)


@pytest.mark.parametrize("top_k", [1, 2])
def test_decode_matches_dense(top_k):
    """The gathered-expert decode formulation == the masked-dense one."""
    router_w, w13, w2 = _weights(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, H), jnp.bfloat16)
    a = moe_ffn_decode(x, router_w, w13, w2, top_k)
    b = moe_ffn_dense(x, router_w, w13, w2, top_k)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=0.02)


MOE_CFG = DeepSeekConfig.tiny(n_experts=4, moe_top_k=2, moe_ffn_dim=256)


def test_deepseek_moe_fused_vs_eager():
    params = model.init_params(MOE_CFG, jax.random.PRNGKey(4))
    cache = model.init_cache(MOE_CFG)
    toks = jnp.asarray([5, 17, 42], jnp.int32)
    logits, cache = model.prefill(params, cache, toks, MOE_CFG)
    tok = jnp.argmax(logits[-1]).astype(jnp.int32)
    pos = jnp.asarray(3, jnp.int32)
    lf, _ = model.decode_step(params, cache, tok, pos, MOE_CFG, fused=True)
    le, _ = model.decode_step(params, cache, tok, pos, MOE_CFG, fused=False)
    scale = max(float(jnp.max(jnp.abs(le))), 1.0)
    assert float(jnp.max(jnp.abs(lf - le))) < 0.05 * scale


def test_deepseek_moe_prefill_decode_consistency():
    """prefill(T) [masked-dense MoE] + decode [gathered MoE] == prefill(T+1)
    — the two MoE formulations must agree through the model."""
    params = model.init_params(MOE_CFG, jax.random.PRNGKey(5))
    cache = model.init_cache(MOE_CFG)
    toks = jnp.asarray([3, 1, 4, 1, 5], jnp.int32)
    l_all, _ = model.prefill(params, cache, toks, MOE_CFG)
    l_pre, c = model.prefill(params, cache, toks[:-1], MOE_CFG)
    l_dec, _ = model.decode_step(params, c, toks[-1],
                                 jnp.asarray(4, jnp.int32), MOE_CFG,
                                 fused=False)
    scale = max(float(jnp.max(jnp.abs(l_all[-1]))), 1.0)
    assert float(jnp.max(jnp.abs(l_dec - l_all[-1]))) < 0.05 * scale


def test_deepseek_moe_generate():
    params = model.init_params(MOE_CFG, jax.random.PRNGKey(6))
    out = model.generate_greedy(params, MOE_CFG, [1, 2, 3], n_gen=4)
    assert len(out) == 4 and all(0 <= t < MOE_CFG.vocab_size for t in out)
    assert out == model.generate_greedy(params, MOE_CFG, [1, 2, 3], n_gen=4)
