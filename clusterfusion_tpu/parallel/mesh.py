"""Device mesh construction.

Axes: dp (data), tp (tensor: attention heads + ffn columns), sp (sequence).
The reference's only multi-device mechanism is fairscale TP over NCCL on the
*unfused* path (`chat/llama/generation.py:86-89`); here the mesh drives both
paths via jax.sharding."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from clusterfusion_tpu.config import MeshConfig

AXES = ("dp", "tp", "sp")


def build_mesh(mcfg: Optional[MeshConfig] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp, sp) mesh.  Default: all of ``jax.devices()`` on tp
    (decode-oriented: weights sharded, batch usually 1)."""
    devices = list(devices if devices is not None else jax.devices())
    if mcfg is None:
        mcfg = MeshConfig(tp=len(devices))
    assert mcfg.n_devices == len(devices), \
        f"mesh {mcfg.shape} needs {mcfg.n_devices} devices, got {len(devices)}"
    arr = np.array(devices).reshape(mcfg.dp, mcfg.tp, mcfg.sp)
    return Mesh(arr, AXES)
