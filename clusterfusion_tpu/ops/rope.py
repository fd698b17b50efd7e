"""Rotary position embedding helpers.

Two styles, matching the reference's two fused kernels:

- NEOX rotate-half (``kernel_sglang.cuh:292-309``): pairs are (i, i+d/2),
  cos/sin tables have d/2 entries per position.
- GPT-J interleaved (``kernel.cuh:298-315``, the meta-llama complex-mult
  formulation of ``chat/llama/model.py:134-163``): pairs are (2i, 2i+1),
  cos/sin tables are repeat_interleaved to d entries per position
  (``chat/llama/model.py:276-282``).

Both are expressed as ``x * cos + rotate(x) * sin`` with a fully vectorized
rotate so they lower to pure VPU ops inside Pallas kernels (no gathers):

- NEOX:  rotate(x)  = roll(x, d/2) * [-1]*d/2 ++ [+1]*d/2
- GPT-J: rotate(x)  = swap-adjacent-lanes(x) * (-1, +1, -1, +1, ...)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_freqs(head_dim: int, max_pos: int, theta: float = 10000.0) -> jnp.ndarray:
    """Per-(position, freq) angles, shape [max_pos, head_dim // 2], fp32.

    Equivalent to the angle of ``precompute_freqs_cis`` in the reference
    (`chat/llama/model.py:82-110`)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim))
    t = np.arange(max_pos)
    angles = np.outer(t, inv_freq).astype(np.float32)
    return jnp.asarray(angles)


def rope_tables_neox(head_dim: int, max_pos: int, theta: float = 10000.0):
    """(cos, sin) of shape [max_pos, head_dim/2] — the sglang-kernel layout
    (`kernel_sglang.cuh:12,27` takes cos/sin of HEAD_DIM/2)."""
    a = rope_freqs(head_dim, max_pos, theta)
    return jnp.cos(a), jnp.sin(a)


def rope_tables_gptj(head_dim: int, max_pos: int, theta: float = 10000.0):
    """(cos, sin) of shape [max_pos, head_dim], repeat_interleaved —
    the layout fed to ``llama_decoder_layer`` (`chat/llama/model.py:278-280`)."""
    a = rope_freqs(head_dim, max_pos, theta)
    c, s = jnp.cos(a), jnp.sin(a)
    return (jnp.repeat(c, 2, axis=-1), jnp.repeat(s, 2, axis=-1))


def _neox_sign_and_full(cos_half, sin_half):
    """Expand half-size tables to full-dim (cos|cos, sin|sin) and the NEOX
    rotation sign vector."""
    cos_f = jnp.concatenate([cos_half, cos_half], axis=-1)
    sin_f = jnp.concatenate([sin_half, sin_half], axis=-1)
    return cos_f, sin_f


def apply_rope_neox(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """NEOX rotate-half RoPE.

    x: [..., d]; cos/sin: broadcastable [..., d/2] (half tables).
    out[:d/2] = x1*cos - x2*sin ; out[d/2:] = x2*cos + x1*sin
    (matches the fp32 oracle in reference `tests/test_llama_tilelang.py:32-35`).
    """
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def apply_rope_neox_vec(x: jnp.ndarray, cos_full: jnp.ndarray,
                        sin_full: jnp.ndarray, sign: jnp.ndarray) -> jnp.ndarray:
    """Roll-based NEOX RoPE for use inside Pallas kernels (no lane slicing).

    cos_full/sin_full: [..., d] (= half tables duplicated);
    sign: [d] = (-1,)*d/2 + (+1,)*d/2.
    rotate(x) = roll(x, d/2, axis=-1) * sign, so
    x*cos + rotate(x)*sin == the rotate-half formula.
    """
    d = x.shape[-1]
    rot = jnp.roll(x, d // 2, axis=-1) * sign
    return x * cos_full + rot * sin_full


def apply_rope_gptj(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """GPT-J interleaved RoPE.

    x: [..., d]; cos/sin broadcastable [..., d] (repeat_interleaved tables,
    so cos[2i] == cos[2i+1]).
    out[2i]   = x[2i]  *cos[2i]   - x[2i+1]*sin[2i]
    out[2i+1] = x[2i+1]*cos[2i+1] + x[2i]  *sin[2i+1]
    (matches reference `kernel.cuh:299-315`).

    Implemented as x*cos + swap_pairs(x)*alt_sign*sin, which vectorizes as a
    reshape-free lane permute: swap_pairs via de-interleave/interleave.
    """
    d = x.shape[-1]
    shape = x.shape[:-1] + (d // 2, 2)
    xp = x.reshape(shape)
    swapped = jnp.stack([xp[..., 1], xp[..., 0]], axis=-1).reshape(x.shape)
    alt_sign = jnp.tile(jnp.asarray([-1.0, 1.0], dtype=x.dtype), d // 2)
    return x * cos + swapped * alt_sign * sin
