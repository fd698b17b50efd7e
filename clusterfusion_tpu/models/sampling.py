"""Token sampling — twin of the reference's ``sample_top_p``
(`chat/llama/generation.py:439-462`), as jittable JAX."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_top_p(key, logits: jnp.ndarray, temperature: float,
                 top_p: float) -> jnp.ndarray:
    """Nucleus sampling.  logits: [vocab] fp32.  Returns [] int32.

    Matches the reference semantics: probs sorted descending, tokens beyond
    cumulative mass ``top_p`` masked (the first token always kept),
    renormalize, sample (`generation.py:439-462`)."""
    probs = jax.nn.softmax(logits / jnp.maximum(temperature, 1e-6))
    sorted_probs, sorted_idx = jax.lax.top_k(probs, probs.shape[-1])
    cum = jnp.cumsum(sorted_probs)
    # reference: mask where (cumsum - prob) > p, i.e. keep while the mass
    # *before* this token is <= p
    keep = (cum - sorted_probs) <= top_p
    masked = jnp.where(keep, sorted_probs, 0.0)
    masked = masked / jnp.sum(masked)
    choice = jax.random.categorical(key, jnp.log(jnp.maximum(masked, 1e-30)))
    return sorted_idx[choice]


def sample(key, logits: jnp.ndarray, temperature: float = 0.6,
           top_p: float = 0.9) -> jnp.ndarray:
    """Greedy when temperature == 0 (`generation.py:168-173`), else top-p."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return sample_top_p(key, logits, temperature, top_p).astype(jnp.int32)


def sample_batch(key, logits, temperatures, top_ps):
    """Per-row sampling for a batch: logits [B, vocab] fp32,
    temperatures/top_ps [B] fp32.  Rows with temperature <= 0 decode
    greedily; others nucleus-sample — all traced (no per-config recompile),
    so a continuous-batching engine can mix sampling params freely."""
    import jax

    B = logits.shape[0]
    keys = jax.random.split(key, B)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def one(k, lg, t, p):
        return sample_top_p(k, lg, jnp.maximum(t, 1e-6), p).astype(jnp.int32)

    sampled = jax.vmap(one)(keys, logits, temperatures, top_ps)
    return jnp.where(temperatures <= 0.0, greedy, sampled)
