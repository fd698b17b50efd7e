"""Profiling and tracing — the TPU equivalent of the reference's NVTX
ranges (`tests/test_llama.py:5,180-182` `nvtx.range_push("llama_decode")`)
and tokens/s wall-clock harness (`chat/chat.py:30-50`), as reusable
primitives:

- ``trace(name)`` / ``trace_context(name)``: `jax.profiler` trace
  annotations (named ranges in the TensorBoard/XProf timeline).
- ``time_fn``: robust on-device latency measurement — chained under
  ``lax.scan`` with a data dependency so XLA can't hoist, closed by a host
  fetch (``block_until_ready`` alone is unreliable on tunneled backends),
  and differenced between N and 2N chains so dispatch/relay overhead
  cancels.  This is the methodology bench.py and the autotuner share.
- ``LatencyStats``: running latency aggregator for serving loops.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np


def trace(name: str):
    """Decorator: annotate a function with a named profiler trace range."""
    def deco(fn):
        return jax.named_scope(name)(fn)
    return deco


@contextlib.contextmanager
def trace_context(name: str):
    """Named range in the device profile (use under `jax.profiler.trace`)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def time_fn(step_fn: Callable, x0: jnp.ndarray, reps: int = 64,
            tries: int = 3) -> float:
    """Microseconds per call of ``step_fn(x)`` (x-shaped -> array), measured
    by differential chained-scan timing on the current default device."""

    def make(n):
        @jax.jit
        def run(x):
            def body(c, _):
                out = step_fn(x * (1 + c * 1e-30))
                return jnp.sum(out.astype(jnp.float32)) * 1e-30, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return run

    def timed(run):
        np.asarray(jax.device_get(run(x0)))        # compile + warm
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(run(x0)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make(reps))
    t2 = timed(make(2 * reps))
    return max(t2 - t1, 1e-9) / reps * 1e6


@dataclasses.dataclass
class LatencyStats:
    """Streaming latency aggregator (serving loops, decode steps)."""

    samples: List[float] = dataclasses.field(default_factory=list)

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)

    @property
    def count(self) -> int:
        return len(self.samples)

    @property
    def mean_s(self) -> float:
        return float(np.mean(self.samples)) if self.samples else 0.0

    def percentile_s(self, p: float) -> float:
        return float(np.percentile(self.samples, p)) if self.samples else 0.0

    def summary(self) -> dict:
        return {
            "count": self.count,
            "mean_ms": self.mean_s * 1e3,
            "p50_ms": self.percentile_s(50) * 1e3,
            "p99_ms": self.percentile_s(99) * 1e3,
        }
