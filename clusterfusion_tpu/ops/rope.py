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


def llama3_scaled_inv_freq(inv_freq: np.ndarray, factor: float,
                           low_freq_factor: float, high_freq_factor: float,
                           orig_max_pos: int) -> np.ndarray:
    """Llama-3.1/3.2 frequency rescale (HF ``rope_type: "llama3"``).

    Wavelengths shorter than ``orig/high`` keep their frequency, longer
    than ``orig/low`` divide by ``factor``, and the band between them
    interpolates smoothly — a one-time per-frequency rescale (unlike YaRN
    there is no attention-scale correction).  Matches transformers'
    ``_compute_llama3_parameters``; the reference predates Llama 3.1 and
    has no analogue."""
    low_wl = orig_max_pos / low_freq_factor
    high_wl = orig_max_pos / high_freq_factor
    wavelen = 2.0 * np.pi / inv_freq
    smooth = (orig_max_pos / wavelen - low_freq_factor) \
        / (high_freq_factor - low_freq_factor)
    mid = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = np.where(wavelen > low_wl, inv_freq / factor,
                   np.where(wavelen < high_wl, inv_freq, mid))
    return out.astype(inv_freq.dtype)


def rope_freqs(head_dim: int, max_pos: int, theta: float = 10000.0,
               llama3_scaling=None) -> jnp.ndarray:
    """Per-(position, freq) angles, shape [max_pos, head_dim // 2], fp32.

    Equivalent to the angle of ``precompute_freqs_cis`` in the reference
    (`chat/llama/model.py:82-110`).  ``llama3_scaling``: optional
    (factor, low_freq_factor, high_freq_factor, orig_max_pos) tuple for
    Llama-3.1-style frequency rescaling."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim))
    if llama3_scaling is not None and llama3_scaling[0] > 1.0:
        inv_freq = llama3_scaled_inv_freq(inv_freq, *llama3_scaling)
    t = np.arange(max_pos)
    angles = np.outer(t, inv_freq).astype(np.float32)
    return jnp.asarray(angles)


def rope_tables_neox(head_dim: int, max_pos: int, theta: float = 10000.0,
                     llama3_scaling=None):
    """(cos, sin) of shape [max_pos, head_dim/2] — the sglang-kernel layout
    (`kernel_sglang.cuh:12,27` takes cos/sin of HEAD_DIM/2)."""
    a = rope_freqs(head_dim, max_pos, theta, llama3_scaling)
    return jnp.cos(a), jnp.sin(a)


def rope_tables_gptj(head_dim: int, max_pos: int, theta: float = 10000.0,
                     llama3_scaling=None):
    """(cos, sin) of shape [max_pos, head_dim], repeat_interleaved —
    the layout fed to ``llama_decoder_layer`` (`chat/llama/model.py:278-280`)."""
    a = rope_freqs(head_dim, max_pos, theta, llama3_scaling)
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


def rope_tables_yarn(head_dim: int, max_pos: int, theta: float, *,
                     factor: float, orig_max: int, beta_fast: float = 32.0,
                     beta_slow: float = 1.0, mscale: float = 1.0,
                     mscale_all_dim: float = 0.0):
    """YaRN-scaled NEOX (cos, sin) tables [max_pos, head_dim/2], following
    the DeepSeek-V2 HF implementation (`DeepseekV2YarnRotaryEmbedding`):
    interpolated frequencies below the ``beta_fast`` correction dim, the
    original frequencies above ``beta_slow``, a linear ramp between, and
    the cos/sin magnitude scaled by get_mscale(factor, mscale) /
    get_mscale(factor, mscale_all_dim) (== 1 when the two mscales match,
    as in the shipped V2/V2-Lite configs — the attention-entropy
    correction then lives entirely in the softmax scale; see
    ``yarn_softmax_scale_mult``)."""
    import math

    half = head_dim // 2
    i = jnp.arange(half, dtype=jnp.float32)
    freq_extra = 1.0 / (theta ** (2.0 * i / head_dim))
    freq_inter = freq_extra / factor

    def corr_dim(n_rot):
        return (head_dim * math.log(orig_max / (n_rot * 2 * math.pi))
                / (2 * math.log(theta)))

    low = max(math.floor(corr_dim(beta_fast)), 0)
    high = min(math.ceil(corr_dim(beta_slow)), half - 1)
    ramp = jnp.clip((i - low) / max(high - low, 1), 0.0, 1.0)
    extrapolation_mask = 1.0 - ramp                       # 1 → original freq
    inv_freq = (freq_inter * ramp + freq_extra * extrapolation_mask)

    a = jnp.arange(max_pos, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    m = (_yarn_get_mscale(factor, mscale)
         / _yarn_get_mscale(factor, mscale_all_dim))
    return jnp.cos(a) * m, jnp.sin(a) * m


def _yarn_get_mscale(scale: float, mscale: float) -> float:
    import math
    if scale <= 1.0 or mscale <= 0.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def yarn_softmax_scale_mult(factor: float, mscale_all_dim: float) -> float:
    """Multiplier on the attention softmax scale under YaRN: the HF
    DeepSeek-V2 attention multiplies ``head_dim**-0.5`` by
    ``get_mscale(factor, mscale_all_dim)**2``."""
    m = _yarn_get_mscale(factor, mscale_all_dim)
    return m * m
