"""Paged batch-decode fused kernel vs oracles.

Covers both entries: the reference-parity sglang indptr/indices (page=1)
API against the fp32 paged oracle, and the TPU-native block-table API
(page>1) against the single-sequence oracle applied per request."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clusterfusion_tpu.config import KernelConfig
from clusterfusion_tpu.ops import llama_decoder_layer_batch_decode_sglang
from clusterfusion_tpu.ops.paged_decoder_layer import llama_decoder_layer_paged
from clusterfusion_tpu.ops.decoder_layer import fuse_qkv_o_for_kernel
from clusterfusion_tpu.ops.reference import (
    llama_decoder_layer_batch_paged_ref,
    llama_decoder_layer_sglang_ref,
)

HIDDEN = 512
HEADS = 4
HEAD_DIM = 128


def _mx(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def _mk_weights(key, dtype=jnp.bfloat16):
    k1, k2, k3 = jax.random.split(key, 3)
    w_qkv = (jax.random.normal(k1, (3 * HIDDEN, HIDDEN), jnp.float32) * 0.1).astype(dtype)
    w_o = (jax.random.normal(k2, (HIDDEN, HIDDEN), jnp.float32) * 0.1).astype(dtype)
    rms_w = (jax.random.normal(k3, (HIDDEN,), jnp.float32) * 0.1).astype(dtype)
    return w_qkv, w_o, rms_w


def test_sglang_paged_parity():
    """3 requests with lengths 5/17/1 in a shuffled token pool."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    dtype = jnp.bfloat16
    B, L, layer_id = 3, 2, 1
    lens = [5, 17, 1]                       # cached tokens per request
    total = sum(lens) + B                   # + one new slot each
    num_pages = total + 7                   # a few unused pool rows

    rng = np.random.RandomState(0)
    perm = rng.permutation(num_pages)[:total].astype(np.int32)
    indices = jnp.asarray(perm)
    indptr = jnp.asarray(np.cumsum([0] + [l + 1 for l in lens]), jnp.int32)

    w_qkv, w_o, rms_w = _mk_weights(ks[0])
    x = jax.random.normal(ks[1], (B, HIDDEN), dtype)
    res = jax.random.normal(ks[2], (B, HIDDEN), dtype)
    k_cache = jax.random.normal(ks[3], (L, num_pages, HIDDEN), dtype)
    v_cache = jax.random.normal(ks[4], (L, num_pages, HIDDEN), dtype)
    positions = jnp.asarray(lens, jnp.int32)
    max_pos = max(lens) + 1
    angle = np.outer(np.arange(max_pos), 0.3 * np.arange(HEAD_DIM // 2) + 0.1)
    cos_sin = jnp.asarray(
        np.concatenate([np.cos(angle), np.sin(angle)], axis=-1), jnp.float32)
    eps = 1e-5

    got = llama_decoder_layer_batch_decode_sglang(
        x, res, w_qkv, w_o, indptr, indices, k_cache, v_cache, layer_id,
        rms_w, eps, positions, cos_sin, n_heads=HEADS, head_dim=HEAD_DIM)
    want = llama_decoder_layer_batch_paged_ref(
        x, res, w_qkv, w_o, indptr, indices, k_cache[layer_id],
        v_cache[layer_id], rms_w, eps, positions, cos_sin,
        n_heads=HEADS, head_dim=HEAD_DIM)

    assert _mx(got[0], want[0]) < 1e-1, "output"
    assert _mx(got[1], want[1]) < 2e-2, "residual"
    assert _mx(got[2][layer_id], want[2]) < 5e-2, "k pool"
    assert _mx(got[3][layer_id], want[3]) < 5e-2, "v pool"
    # untouched layer must be bit-identical
    np.testing.assert_array_equal(np.asarray(got[2][0]), np.asarray(k_cache[0]))


@pytest.mark.parametrize("page", [16, 64])
def test_block_table_paged_vs_single_seq_oracle(page):
    """Native block-table entry: each request checked against the
    single-sequence fp32 oracle on its gathered contiguous cache."""
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 8)
    dtype = jnp.bfloat16
    B = 2
    lens = [page + 3, 2 * page]             # crosses page boundaries
    max_pages = 4
    num_pages = 16
    L = 1

    w_qkv, w_o, rms_w = _mk_weights(ks[0])
    hg = HEADS  # one head group
    per_head = (w_qkv.reshape(3, HEADS, HEAD_DIM, HIDDEN)
                .transpose(1, 3, 0, 2).reshape(HEADS, HIDDEN, 3 * HEAD_DIM))
    wo_per_head = w_o.T.reshape(HEADS, HEAD_DIM, HIDDEN)
    wqkv_g, wo_g = fuse_qkv_o_for_kernel(per_head, wo_per_head, HEADS, 1,
                                         HEAD_DIM, hg)

    x = jax.random.normal(ks[1], (B, HIDDEN), dtype)
    res = jax.random.normal(ks[2], (B, HIDDEN), dtype)
    k_pool = jax.random.normal(ks[3], (L, num_pages, HEADS, page, HEAD_DIM), dtype)
    v_pool = jax.random.normal(ks[4], (L, num_pages, HEADS, page, HEAD_DIM), dtype)

    rng = np.random.RandomState(1)
    table = jnp.asarray(rng.permutation(num_pages)[: B * max_pages]
                        .reshape(B, max_pages).astype(np.int32))
    seq_lens = jnp.asarray(lens, jnp.int32)
    positions = seq_lens

    max_pos = max(lens) + 1
    angle = np.outer(np.arange(max_pos), 0.2 * np.arange(HEAD_DIM // 2) + 0.05)
    cos_h, sin_h = np.cos(angle), np.sin(angle)
    cos_t = jnp.asarray(np.concatenate([cos_h, cos_h], -1), jnp.float32)
    sin_t = jnp.asarray(np.concatenate([sin_h, sin_h], -1), jnp.float32)

    out, res_out, kp2, vp2 = jax.jit(
        lambda *a: llama_decoder_layer_paged(
            *a, layer_id=0, rms_w=rms_w[None], eps=1e-5, cos_t=cos_t,
            sin_t=sin_t))(x, res, wqkv_g, wo_g, table, seq_lens, positions,
                          k_pool, v_pool)

    for b in range(B):
        s = lens[b]
        rows = []
        for t in range(s):
            pg, off = int(table[b, t // page]), t % page
            rows.append(np.asarray(k_pool[0, pg, :, off]).reshape(HIDDEN))
        kc = jnp.asarray(np.stack(rows))
        rows = [np.asarray(v_pool[0, int(table[b, t // page]), :, t % page])
                .reshape(HIDDEN) for t in range(s)]
        vc = jnp.asarray(np.stack(rows))
        want = llama_decoder_layer_sglang_ref(
            x[b:b + 1], res[b:b + 1], w_qkv, w_o, kc, vc, rms_w, 1e-5,
            jnp.asarray(cos_h[s], jnp.float32), jnp.asarray(sin_h[s], jnp.float32),
            n_heads=HEADS, head_dim=HEAD_DIM)
        assert _mx(out[b:b + 1], want[0]) < 1e-1, f"req {b} output"
        assert _mx(res_out[b:b + 1], want[1]) < 2e-2, f"req {b} residual"
        # new kv landed in the right pool slot
        pg, off = int(table[b, s // page]), s % page
        assert _mx(kp2[0, pg, :, off].reshape(1, HIDDEN), want[2]) < 5e-2
        assert _mx(vp2[0, pg, :, off].reshape(1, HIDDEN), want[3]) < 5e-2


def test_block_table_paged_multi_window():
    """Force n_steps > 1 in the fused paged kernel (kv_chunk = 2 pages →
    npp=2 over 4 pages = 2 windows): exercises the double-buffered window
    gather and cross-window online-softmax accumulation that production
    contexts > kv_chunk rows hit."""
    page = 16
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 8)
    dtype = jnp.bfloat16
    B = 2
    lens = [3 * page + 5, 4 * page - 1]     # spans both windows
    max_pages = 4
    num_pages = 16
    L = 1

    w_qkv, w_o, rms_w = _mk_weights(ks[0])
    hg = HEADS
    per_head = (w_qkv.reshape(3, HEADS, HEAD_DIM, HIDDEN)
                .transpose(1, 3, 0, 2).reshape(HEADS, HIDDEN, 3 * HEAD_DIM))
    wo_per_head = w_o.T.reshape(HEADS, HEAD_DIM, HIDDEN)
    wqkv_g, wo_g = fuse_qkv_o_for_kernel(per_head, wo_per_head, HEADS, 1,
                                         HEAD_DIM, hg)

    x = jax.random.normal(ks[1], (B, HIDDEN), dtype)
    res = jax.random.normal(ks[2], (B, HIDDEN), dtype)
    k_pool = jax.random.normal(ks[3], (L, num_pages, HEADS, page, HEAD_DIM), dtype)
    v_pool = jax.random.normal(ks[4], (L, num_pages, HEADS, page, HEAD_DIM), dtype)

    rng = np.random.RandomState(5)
    table = jnp.asarray(rng.permutation(num_pages)[: B * max_pages]
                        .reshape(B, max_pages).astype(np.int32))
    seq_lens = jnp.asarray(lens, jnp.int32)
    positions = seq_lens

    max_pos = max(lens) + 1
    angle = np.outer(np.arange(max_pos), 0.2 * np.arange(HEAD_DIM // 2) + 0.05)
    cos_h, sin_h = np.cos(angle), np.sin(angle)
    cos_t = jnp.asarray(np.concatenate([cos_h, cos_h], -1), jnp.float32)
    sin_t = jnp.asarray(np.concatenate([sin_h, sin_h], -1), jnp.float32)

    kcfg = KernelConfig(kv_chunk=2 * page)      # npp=2 → 2 windows
    out, res_out, kp2, vp2 = jax.jit(
        lambda *a: llama_decoder_layer_paged(
            *a, layer_id=0, rms_w=rms_w[None], eps=1e-5, cos_t=cos_t,
            sin_t=sin_t, kcfg=kcfg))(x, res, wqkv_g, wo_g, table, seq_lens,
                                     positions, k_pool, v_pool)

    for b in range(B):
        s = lens[b]
        kc = jnp.asarray(np.stack(
            [np.asarray(k_pool[0, int(table[b, t // page]), :, t % page])
             .reshape(HIDDEN) for t in range(s)]))
        vc = jnp.asarray(np.stack(
            [np.asarray(v_pool[0, int(table[b, t // page]), :, t % page])
             .reshape(HIDDEN) for t in range(s)]))
        want = llama_decoder_layer_sglang_ref(
            x[b:b + 1], res[b:b + 1], w_qkv, w_o, kc, vc, rms_w, 1e-5,
            jnp.asarray(cos_h[s], jnp.float32),
            jnp.asarray(sin_h[s], jnp.float32),
            n_heads=HEADS, head_dim=HEAD_DIM)
        assert _mx(out[b:b + 1], want[0]) < 1e-1, f"req {b} output"
        pg, off = int(table[b, s // page]), s % page
        assert _mx(kp2[0, pg, :, off].reshape(1, HIDDEN), want[2]) < 5e-2


def test_paged_attention_multi_window():
    """Lean paged attention with pages_per_step=2 over 4 pages: the
    ping-pong buffers alternate and window prefetch overlaps compute."""
    from clusterfusion_tpu.ops.paged_decoder_layer import paged_attention

    rng = np.random.RandomState(9)
    B, kv, g, hd, page, P, L = 2, 4, 2, 128, 8, 4, 2
    num_pages = B * P + 1
    q = jnp.asarray(rng.randn(B, kv, g, hd), jnp.bfloat16)
    k_new = jnp.asarray(rng.randn(B, kv, hd), jnp.bfloat16)
    v_new = jnp.asarray(rng.randn(B, kv, hd), jnp.bfloat16)
    kp = jnp.asarray(rng.randn(L, num_pages, kv, page, hd), jnp.bfloat16)
    vp = jnp.asarray(rng.randn(L, num_pages, kv, page, hd), jnp.bfloat16)
    table = jnp.asarray(rng.permutation(num_pages - 1)[: B * P]
                        .reshape(B, P).astype(np.int32) + 1) % num_pages
    lens = jnp.asarray([3 * page + 2, 2 * page], jnp.int32)
    layer = 0

    o, kp2, vp2 = jax.jit(
        lambda *a: paged_attention(*a, pages_per_step=2))(
        q, k_new, v_new, kp, vp, table, lens, layer)

    for b in range(2):
        s = int(lens[b])
        rows_k = [np.asarray(kp[layer, int(table[b, t // page]), :, t % page],
                             np.float32) for t in range(s)]
        rows_v = [np.asarray(vp[layer, int(table[b, t // page]), :, t % page],
                             np.float32) for t in range(s)]
        rows_k.append(np.asarray(k_new[b], np.float32))
        rows_v.append(np.asarray(v_new[b], np.float32))
        K, V = np.stack(rows_k), np.stack(rows_v)
        qb = np.asarray(q[b], np.float32)
        scores = np.einsum("kgd,skd->kgs", qb, K) / np.sqrt(hd)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("kgs,skd->kgd", p, V).reshape(kv * g * hd)
        np.testing.assert_allclose(np.asarray(o[b], np.float32), want,
                                   atol=0.03)


def test_paged_attention_matches_oracle():
    """The lean batched paged-attention kernel (batched-step building
    block) vs dense masked attention on the gathered pages, including the
    in-kernel append of the current token."""
    from clusterfusion_tpu.ops.paged_decoder_layer import paged_attention

    rng = np.random.RandomState(3)
    B, kv, g, hd, page, P, L = 2, 4, 2, 128, 8, 4, 2
    num_pages = B * P + 1
    q = jnp.asarray(rng.randn(B, kv, g, hd), jnp.bfloat16)
    k_new = jnp.asarray(rng.randn(B, kv, hd), jnp.bfloat16)
    v_new = jnp.asarray(rng.randn(B, kv, hd), jnp.bfloat16)
    kp = jnp.asarray(rng.randn(L, num_pages, kv, page, hd), jnp.bfloat16)
    vp = jnp.asarray(rng.randn(L, num_pages, kv, page, hd), jnp.bfloat16)
    table = jnp.asarray(rng.permutation(num_pages - 1)[: B * P]
                        .reshape(B, P).astype(np.int32) + 1) % num_pages
    lens = jnp.asarray([11, 26], jnp.int32)
    layer = 1

    o, kp2, vp2 = jax.jit(paged_attention, static_argnames=())(
        q, k_new, v_new, kp, vp, table, lens, layer)

    for b in range(2):
        s = int(lens[b])
        rows_k, rows_v = [], []
        for t in range(s):
            pg, off = int(table[b, t // page]), t % page
            rows_k.append(np.asarray(kp[layer, pg, :, off], np.float32))
            rows_v.append(np.asarray(vp[layer, pg, :, off], np.float32))
        rows_k.append(np.asarray(k_new[b], np.float32))
        rows_v.append(np.asarray(v_new[b], np.float32))
        K = np.stack(rows_k)                       # [s+1, kv, hd]
        V = np.stack(rows_v)
        qb = np.asarray(q[b], np.float32)          # [kv, g, hd]
        scores = np.einsum("kgd,skd->kgs", qb, K) / np.sqrt(hd)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("kgs,skd->kgd", p, V).reshape(kv * g * hd)
        got = np.asarray(o[b], np.float32)
        np.testing.assert_allclose(got, want, atol=0.03)
        # appended row landed in the right slot
        pg, off = int(table[b, s // page]), s % page
        np.testing.assert_allclose(
            np.asarray(kp2[layer, pg, :, off], np.float32),
            np.asarray(k_new[b], np.float32), atol=0.02)
    # other layers untouched
    np.testing.assert_array_equal(np.asarray(kp2[0], np.float32),
                                  np.asarray(kp[0], np.float32))
