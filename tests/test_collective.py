"""Tests for the chip-scope collective layer (the DSM `cluster_reduce`
equivalent, `dsm.cuh:20-171`).

Runs in a CPU subprocess (8 virtual devices) like tests/test_parallel.py.
The XLA backend is checked numerically; the Pallas ring backend executes
under the TPU interpret simulation (threads + simulated remote DMA +
semaphores) **with race detection enabled** — the TPU answer to the
reference's 10,000-repetition race hunt (`tests/test_llama.py:22,191-215`,
SURVEY.md §5 "race detection").
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cpu(code: str) -> str:
    env = dict(os.environ)
    # the axon sitecustomize force-registers the TPU backend when this var
    # is present; drop it so the subprocess is a clean CPU JAX
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "RACE DETECTED" not in r.stdout + r.stderr, \
        f"data race in ring collective:\n{r.stdout}\n{r.stderr}"
    return r.stdout


SCRIPT = r"""
import jax, jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.pallas import tpu as pltpu

from clusterfusion_tpu.parallel.collective import (
    Stage, cluster_gather, cluster_reduce,
    _pallas_all_gather, _pallas_all_reduce)

N = 4
mesh = Mesh(np.array(jax.devices()[:N]), ("tp",))
assert jax.devices()[0].platform == "cpu"
x = jnp.arange(N * 8 * 128, dtype=jnp.float32).reshape(N * 8, 128) / 100 - 1.0
want = np.asarray(x).reshape(N, 8, 128).sum(0)

def run(fn, out_specs=P("tp")):
    return np.asarray(jax.jit(shard_map(
        fn, mesh=mesh, in_specs=P("tp"), out_specs=out_specs,
        check_vma=False))(x))

# --- XLA backend numerics ---------------------------------------------------
out = run(lambda v: cluster_reduce(v, "tp", Stage.LINEAR, backend="xla"))
assert np.allclose(out, np.tile(want, (N, 1))), "xla LINEAR reduce"

out = run(lambda v: cluster_reduce(v, "tp", Stage.FFN, backend="xla"))
assert np.allclose(out, np.tile(np.maximum(want, 0), (N, 1))), "xla FFN relu"

out = run(lambda v: cluster_gather(v, "tp", backend="xla"), P(None, None))
assert np.array_equal(out, np.asarray(x)), "xla gather"

# --- Pallas ring backend, interpret simulation with race detection ----------
detect = pltpu.InterpretParams(detect_races=True)

out = run(lambda v: _pallas_all_reduce(
    v, "tp", final_op=None, interpret=detect))
assert np.allclose(out, np.tile(want, (N, 1)), atol=1e-4), "ring all-reduce"

out = run(lambda v: _pallas_all_reduce(
    v, "tp", final_op="relu", interpret=detect))
assert np.allclose(out, np.tile(np.maximum(want, 0), (N, 1)), atol=1e-4), \
    "ring all-reduce + fused relu"

out = run(lambda v: _pallas_all_gather(v, "tp", N, interpret=detect),
          P(None, None))
assert np.array_equal(out, np.asarray(x)), "ring all-gather"

# determinism: two runs bit-equal (SURVEY.md §4c)
a = run(lambda v: _pallas_all_reduce(v, "tp", final_op=None, interpret=detect))
b = run(lambda v: _pallas_all_reduce(v, "tp", final_op=None, interpret=detect))
assert np.array_equal(a, b), "ring all-reduce nondeterministic"

# the public API routes through XLA off-TPU under backend="auto"
out = run(lambda v: cluster_reduce(v, "tp", Stage.ATTN, backend="auto"))
assert np.allclose(out, np.tile(want, (N, 1))), "auto backend"

print("COLLECTIVE_OK")
"""


def test_collectives_on_virtual_mesh():
    out = _run_cpu(SCRIPT)
    assert "COLLECTIVE_OK" in out
