"""Flash prefill kernel vs a self-contained fp32 oracle.

Covers the reference test plan's odd/edge sequence lengths (seqlens
{1, 37, 256} of `tests/test_llama_tilelang.py:69-77`) plus what the
reference cannot do: GQA panels and chunked-prefill query offsets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clusterfusion_tpu.ops.flash_prefill import flash_prefill_attention


def oracle(q, k, v, q_offset):
    kv, T, g, hd = q.shape
    S = k.shape[1]
    scores = jnp.einsum("ktgd,ksd->ktgs", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / np.sqrt(hd)
    qpos = q_offset + jnp.arange(T)[None, :, None, None]
    kpos = jnp.arange(S)[None, None, None, :]
    scores = jnp.where(kpos <= qpos, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("ktgs,ksd->ktgd", p, v.astype(jnp.float32))


def _run(kv, T, g, hd, q_offset=0, extra_keys=0, bq=32, bk=32, seed=0):
    rng = np.random.RandomState(seed)
    S = q_offset + T + extra_keys
    q = jnp.asarray(rng.randn(kv, T, g, hd), jnp.bfloat16)
    k = jnp.asarray(rng.randn(kv, S, hd), jnp.bfloat16)
    v = jnp.asarray(rng.randn(kv, S, hd), jnp.bfloat16)
    o = flash_prefill_attention(q, k, v, q_offset=q_offset,
                                block_q=bq, block_k=bk)
    ref = oracle(q, k, v, q_offset)
    np.testing.assert_allclose(np.asarray(o, np.float32), np.asarray(ref),
                               atol=0.03, rtol=0.05)
    return o


@pytest.mark.parametrize("T", [1, 37, 256])
def test_seqlens(T):
    _run(kv=2, T=T, g=1, hd=128)


def test_gqa_panel():
    _run(kv=2, T=64, g=4, hd=128)


def test_blocks_smaller_than_seq():
    # multiple q and k blocks, diagonal crossing block boundaries
    _run(kv=1, T=130, g=2, hd=64, bq=32, bk=16)


@pytest.mark.parametrize("q_offset,extra", [(93, 0), (70, 30), (1, 1)])
def test_chunked_offsets(q_offset, extra):
    # chunk continuation: queries shifted, padded keys beyond the chunk
    # must never influence the output
    _run(kv=2, T=33, g=2, hd=64, q_offset=q_offset, extra_keys=extra)


def test_padded_keys_ignored():
    # same inputs, garbage vs zeros in the never-read key tail -> identical
    rng = np.random.RandomState(3)
    kv, T, hd, S = 1, 40, 64, 64
    q = jnp.asarray(rng.randn(kv, T, 1, hd), jnp.bfloat16)
    k = jnp.asarray(rng.randn(kv, S, hd), jnp.bfloat16)
    v = jnp.asarray(rng.randn(kv, S, hd), jnp.bfloat16)
    tail = jnp.zeros((kv, S - T, hd), jnp.bfloat16)
    k2 = jnp.concatenate([k[:, :T], tail + 37.0], axis=1)
    v2 = jnp.concatenate([v[:, :T], tail - 11.0], axis=1)
    o1 = flash_prefill_attention(q, k, v, block_q=16, block_k=16)
    o2 = flash_prefill_attention(q, k2, v2, block_q=16, block_k=16)
    np.testing.assert_array_equal(np.asarray(o1, np.float32),
                                  np.asarray(o2, np.float32))


def test_deterministic():
    # TPU/XLA determinism replaces the reference's 10k-repetition race sweep
    # (`tests/test_llama.py:22`): two runs must be bit-equal
    o1 = _run(kv=2, T=37, g=2, hd=64, seed=5)
    o2 = _run(kv=2, T=37, g=2, hd=64, seed=5)
    np.testing.assert_array_equal(np.asarray(o1, np.float32),
                                  np.asarray(o2, np.float32))
