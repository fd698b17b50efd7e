"""Greedy speculative decoding: draft model + multi-token verify step.

Beyond the reference (which decodes strictly one token per step,
`chat/llama/generation.py:129-231`): a small draft model proposes
``n_draft`` tokens, the target model scores them all in ONE forward
(``verify_step`` — an n-row decode at a dynamic position), and the longest
agreeing prefix plus one bonus token is emitted.  Per round the target
runs once instead of up to ``n_draft + 1`` times; decode at bs=1 is
HBM-bound on weight streaming, and an n-row verify streams the same bytes
as a 1-row decode, so accepted drafts are nearly free target tokens.

Cache discipline (why there is NO rollback code): both caches are
append-by-position with attention masked to ``kpos <= query position``.
After accepting ``m`` of ``n`` drafts at base position ``pos``:

- rows ``pos .. pos+m`` hold KV of the emitted tokens — valid;
- stale rows (rejected drafts) sit strictly above ``pos+m`` and strictly
  below the next round's write span start + span length, so every stale
  row is overwritten before any query position ever reaches it.

Greedy acceptance means the emitted stream equals the target model's own
greedy decode (under the verify step's numerics): token i is emitted only
as the argmax of target logits given the true emitted prefix.

Measured (Llama-2-7B bf16, v5e, 1K ctx): the fused whole-stack verify
(``ops.stack_verify``) is 21.4 ms at n=4 AND n=8 — equal to the fused
single-token decode (21.2 ms) and 1.5x the eager n-row verify (32.2 ms).
Scoring n draft tokens costs the same weight streaming as generating
one, so with a draft ~10x smaller a round emits up to n+1 tokens for
~1.1 decode-steps of target time: ~3.4x at full acceptance (n=8), ~2x
at 60%.

Memory note: when ``spec_decode_loop`` runs MULTIPLE rounds inside one
dispatch at large bf16 scales, XLA hoists a layout-transposed copy of the
whole stacked wqkv out of the rounds scan (+3 GB HBM at 7B — enough to
OOM next to 13.4 GB of params).  A single-round dispatch compiles with
0.09 GB temp.  ``Llama.spec_generate`` therefore defaults to
``rounds_per_dispatch=1``; raise it to amortize dispatch overhead when
the target is quantized or small enough to leave headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from clusterfusion_tpu.config import KernelConfig, LlamaConfig
from clusterfusion_tpu.models.llama import (
    LlamaParams, _apply_rope, _decode_step_impl, _ffn, _qkv_eager,
    maybe_dequantize, rope_table)
from clusterfusion_tpu.ops.reference import fused_add_rmsnorm_ref
from clusterfusion_tpu.ops._support import interpret_mode


@functools.partial(jax.jit, static_argnames=("cfg", "kcfg", "fused"))
def verify_step(params: LlamaParams, k_cache, v_cache, tokens: jnp.ndarray,
                pos: jnp.ndarray, cfg: LlamaConfig,
                kcfg: KernelConfig = KernelConfig(), fused: bool = True):
    """Score ``n`` tokens at dynamic positions ``pos .. pos+n-1`` in one
    forward, appending their K/V.  tokens: [n] int32 (the last emitted
    token followed by the draft proposals).  Returns (logits [n, vocab],
    k_cache', v_cache').

    fused=True → the n-row whole-stack megakernel
    (``ops.stack_verify.fused_verify_stack``): one kernel call for all
    layers, the same weight-streaming cost as a single-token decode.
    fused=False → the eager oracle: the multi-token sibling of
    ``_decode_step_impl`` fused=False — same math per row, n rows wide.
    Either way the n·cap attention masks by position, so ``pos`` stays
    dynamic — no per-position recompiles.

    Sub-128 head dims (TinyLlama / Qwen2-0.5B) auto-fall back to the
    eager verify: the n-row megakernel's o-flattening and append-RMW
    DMAs hit Mosaic's (8, 128) tiling limits at hd=64 (the single-token
    stack kernel handles them via defer_append; the verify twin keeps
    the simpler hd >= 128 contract — spec decode for tiny models scores
    drafts eagerly, which is still one forward per round)."""
    n = tokens.shape[0]
    if cfg.head_dim_ % 128 != 0:
        fused = False
    g = cfg.n_heads // cfg.kv_heads
    hd, kv = cfg.head_dim_, cfg.kv_heads
    cos_t, sin_t = rope_table(cfg)
    cos2 = jax.lax.dynamic_slice(cos_t, (pos, 0), (n, hd))        # [n, hd]
    sin2 = jax.lax.dynamic_slice(sin_t, (pos, 0), (n, hd))
    cos, sin = cos2[None], sin2[None]                             # [1,n,hd]

    x = params["embed"][tokens]                                   # [n, hidden]
    residual = jnp.zeros_like(x)

    if fused:
        from clusterfusion_tpu.ops.stack_kernel import _vocab_block
        from clusterfusion_tpu.ops.stack_verify import fused_verify_stack
        lw = params["layers"]
        common = dict(group=g, head_dim=hd, rope_style=cfg.rope_style,
                      eps=cfg.norm_eps, kcfg=kcfg,
                      interpret=interpret_mode(),
                      window=cfg.sliding_window,
                      bias_qkv=lw.get("bqkv_f"),
                      ffn_act=cfg.ffn_act,
                      softcap=cfg.attn_logit_softcap,
                      window_pattern=cfg.window_pattern,
                      post_attn_norm=lw.get("post_attn_norm"),
                      post_ffn_norm=lw.get("post_ffn_norm"))
        if _vocab_block(cfg.vocab_size) > 0:
            logits, _, k_cache, v_cache = fused_verify_stack(
                x, lw["attn_norm"], lw["ffn_norm"], cos2, sin2,
                lw["wqkv_f"], lw["wo_f"], lw["w13"], lw["w2"],
                k_cache, v_cache, pos, final_norm=params["final_norm"],
                lm_head=params["lm_head"], **common)
            if cfg.final_logit_softcap:
                cc = cfg.final_logit_softcap
                logits = cc * jnp.tanh(logits / cc)
            return logits, k_cache, v_cache
        xo, res, k_cache, v_cache = fused_verify_stack(
            x, lw["attn_norm"], lw["ffn_norm"], cos2, sin2,
            lw["wqkv_f"], lw["wo_f"], lw["w13"], lw["w2"],
            k_cache, v_cache, pos, **common)
        xn, _ = fused_add_rmsnorm_ref(xo.astype(x.dtype),
                                      res.astype(x.dtype),
                                      params["final_norm"], cfg.norm_eps)
        logits = jnp.dot(xn, params["lm_head"],
                         preferred_element_type=jnp.float32)
        if cfg.final_logit_softcap:
            cc = cfg.final_logit_softcap
            logits = cc * jnp.tanh(logits / cc)
        return logits, k_cache, v_cache

    def layer(carry, l):
        x, residual, kc, vc = carry
        # slice the layer INSIDE the body (scanning weight stacks as xs lets
        # XLA hoist a layout-changing copy of the WHOLE stack out of the
        # loop — observed: a 3 GB transposed wqkv copy → OOM at 7B; a
        # per-layer slice bounds any such copy to one layer)
        p = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
            params["layers"])
        xn, residual = fused_add_rmsnorm_ref(x, residual, p["attn_norm"],
                                             cfg.norm_eps)
        q, k, v = _qkv_eager(xn[None], p["wqkv_f"], cfg, p.get("bqkv_f"))   # q [1,n,kv,g,hd]
        q = _apply_rope(q, cos[..., None, None, :], sin[..., None, None, :],
                        cfg.rope_style)
        k = _apply_rope(k, cos[..., None, :], sin[..., None, :],
                        cfg.rope_style)
        kc = jax.lax.dynamic_update_slice(
            kc, k[0].transpose(1, 0, 2)[None].astype(kc.dtype),
            (l, 0, pos, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v[0].transpose(1, 0, 2)[None].astype(vc.dtype),
            (l, 0, pos, 0))
        kl = jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False)
        scale = 1.0 / jnp.sqrt(jnp.float32(hd))
        scores = jnp.einsum("tkgd,ksd->kgts", q[0].astype(jnp.float32),
                            kl.astype(jnp.float32)) * scale
        if cfg.attn_logit_softcap:
            c = cfg.attn_logit_softcap
            scores = c * jnp.tanh(scores / c)
        qpos = pos + jnp.arange(n)[None, None, :, None]
        kpos = jnp.arange(kl.shape[1])[None, None, None, :]
        valid = kpos <= qpos
        if cfg.sliding_window:
            wlo = qpos + 1 - cfg.sliding_window
            if cfg.window_pattern == "even":
                wlo = jnp.where(l % 2 == 0, wlo, 0)
            valid &= kpos >= wlo
        scores = jnp.where(valid, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("kgts,ksd->tkgd", probs,
                       vl.astype(jnp.float32)).astype(x.dtype)
        G = p["wo_f"].shape[0]
        attn = jnp.einsum("tGc,Gco->to", o.reshape(n, G, (kv // G) * g * hd),
                          maybe_dequantize(p["wo_f"], x.dtype),
                          preferred_element_type=jnp.float32).astype(x.dtype)
        if cfg.sandwich_norms:
            from clusterfusion_tpu.ops.reference import rmsnorm_ref
            attn = rmsnorm_ref(attn, p["post_attn_norm"], cfg.norm_eps)
        xn2, residual = fused_add_rmsnorm_ref(attn, residual, p["ffn_norm"],
                                              cfg.norm_eps)
        x = _ffn(xn2, p["w13"], p["w2"], cfg.ffn_act)
        if cfg.sandwich_norms:
            x = rmsnorm_ref(x, p["post_ffn_norm"], cfg.norm_eps)
        return (x, residual, kc, vc), None

    layer_idx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    (x, residual, k_cache, v_cache), _ = jax.lax.scan(
        layer, (x, residual, k_cache, v_cache), layer_idx)
    xn, _ = fused_add_rmsnorm_ref(x, residual, params["final_norm"],
                                  cfg.norm_eps)
    logits = jnp.dot(xn, params["lm_head"],
                     preferred_element_type=jnp.float32)
    if cfg.final_logit_softcap:
        cc = cfg.final_logit_softcap
        logits = cc * jnp.tanh(logits / cc)
    return logits, k_cache, v_cache


def _spec_round(params, draft_params, carry, cfg: LlamaConfig,
                draft_cfg: LlamaConfig, n_draft: int, kcfg: KernelConfig,
                draft_fused: bool, target_fused: bool):
    """One speculative round.  carry = (tok, pos, kc_t, vc_t, kc_d, vc_d).
    Returns (carry', (targets [n_draft+1], n_emitted))."""
    tok, pos, kc_t, vc_t, kc_d, vc_d = carry

    # -- draft n_draft tokens with its own cache.  One EXTRA step feeds the
    # last proposal too: on full acceptance the emitted history includes
    # d_n at position pos+n, and without this step the draft cache would
    # have a zero row there — a gap that silently poisons every subsequent
    # round's drafts (observed: acceptance collapses to 1/round).
    def draft_body(c, i):
        t, kc, vc = c
        lg, kc, vc = _decode_step_impl(draft_params, kc, vc, t, pos + i,
                                       draft_cfg, kcfg, draft_fused)
        nxt = jnp.argmax(lg).astype(jnp.int32)
        return (nxt, kc, vc), nxt

    (_, kc_d, vc_d), drafts = jax.lax.scan(
        draft_body, (tok, kc_d, vc_d),
        jnp.arange(n_draft + 1, dtype=jnp.int32))
    drafts = drafts[:n_draft]

    # -- target scores [tok, d1..dn] in one forward -> t1..t_{n+1}
    vtoks = jnp.concatenate([tok[None], drafts])
    logits, kc_t, vc_t = verify_step(params, kc_t, vc_t, vtoks, pos, cfg,
                                     kcfg, target_fused)
    targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [n_draft+1]

    # longest agreeing prefix: drafts[:m] == targets[:m]; emit targets[:m+1]
    eq = (drafts == targets[:-1]).astype(jnp.int32)
    m = jnp.sum(jnp.cumprod(eq))
    n_emit = m + 1
    tok_next = targets[m]
    return (tok_next, pos + n_emit, kc_t, vc_t, kc_d, vc_d), \
        (targets, n_emit)


def _spec_decode_impl(params, k_cache, v_cache, draft_params, kd_cache,
                      vd_cache, first_token, start_pos,
                      cfg: LlamaConfig, draft_cfg: LlamaConfig,
                      kcfg: KernelConfig = KernelConfig(),
                      n_draft: int = 4, n_rounds: int = 16,
                      draft_fused: bool = True, target_fused: bool = True):
    """On-device speculative decode: ``n_rounds`` rounds of draft+verify in
    one dispatch.  The draft's cache must be prefilled with the same
    prompt.  Returns (targets [n_rounds, n_draft+1], counts [n_rounds],
    target caches, draft caches); round r emits ``targets[r, :counts[r]]``.
    Total emitted tokens vary per round (1..n_draft+1); callers flatten
    with the counts and stop at their length budget."""
    def body(carry, _):
        carry, out = _spec_round(params, draft_params, carry, cfg, draft_cfg,
                                 n_draft, kcfg, draft_fused, target_fused)
        return carry, out

    carry = (first_token, start_pos, k_cache, v_cache, kd_cache, vd_cache)
    (tok, pos, kc_t, vc_t, kc_d, vc_d), (targets, counts) = jax.lax.scan(
        body, carry, None, length=n_rounds)
    return targets, counts, kc_t, vc_t, kc_d, vc_d


spec_decode_loop = jax.jit(
    _spec_decode_impl,
    static_argnames=("cfg", "draft_cfg", "kcfg", "n_draft", "n_rounds",
                     "draft_fused", "target_fused"),
    donate_argnums=(1, 2, 4, 5))


def flatten_rounds(targets, counts, max_tokens=None):
    """Host helper: [rounds, n+1] targets + per-round counts -> emitted
    token list (optionally truncated to ``max_tokens``)."""
    out = []
    for r in range(targets.shape[0]):
        out.extend(int(t) for t in targets[r, : int(counts[r])])
    return out[:max_tokens] if max_tokens is not None else out
