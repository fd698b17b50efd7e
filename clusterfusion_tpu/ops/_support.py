"""Shared helpers for the Pallas op layer."""

from __future__ import annotations

import functools
import os

import jax


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.lru_cache(maxsize=None)
def _backend() -> str:
    return jax.default_backend()


def interpret_mode() -> bool:
    """Pallas TPU kernels run compiled on TPU, interpreted elsewhere.

    Tests run on a CPU host (optionally with a virtual multi-device mesh),
    where interpret=True gives bit-accurate semantics without Mosaic.
    Set CLUSTERFUSION_FORCE_INTERPRET=1 to force interpretation on TPU too.
    """
    if os.environ.get("CLUSTERFUSION_FORCE_INTERPRET", "0") == "1":
        return True
    return _backend() != "tpu"


def glu_act(y_gate, y_up, act: str = "silu"):
    """Gated-linear-unit activation for the SwiGLU/GeGLU FFN families:
    ``act(gate) * up`` in f32.  "silu" = llama/mistral/qwen SwiGLU;
    "gelu_tanh" = gemma GeGLU (HF gelu_pytorch_tanh)."""
    import jax
    if act == "silu":
        g = jax.nn.silu(y_gate)
    elif act == "gelu_tanh":
        g = jax.nn.gelu(y_gate, approximate=True)
    else:
        raise ValueError(f"unknown ffn activation {act!r}")
    return g * y_up
