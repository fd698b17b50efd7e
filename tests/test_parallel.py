"""Multi-chip validation on a virtual 8-device CPU mesh — what the reference
never tests (it pins --nproc_per_node 1, `scripts/llama2.sh:4`; SURVEY.md
§4d calls for exactly this).  Runs in a subprocess so the CPU platform
doesn't clash with the ambient TPU backend."""

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
    return r.stdout


def test_dryrun_multichip_8():
    out = _run_cpu("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert "dryrun_multichip OK" in out


def test_sharded_decode_matches_single_device():
    """tp=4 sharded fused decode must produce the same logits as the
    unsharded fused decode step."""
    code = """
import jax, jax.numpy as jnp
from clusterfusion_tpu.config import LlamaConfig, MeshConfig
from clusterfusion_tpu.models import llama as model
from clusterfusion_tpu.parallel import (build_mesh, shard_params,
                                        cache_shardings,
                                        make_sharded_decode_step)

cfg = LlamaConfig.tiny(max_seq_len=64)
params = model.init_params(cfg, jax.random.PRNGKey(0), head_group=1)  # G=4 | tp=4
k_cache, v_cache = model.init_cache(cfg)
tok = jnp.asarray(9, jnp.int32)
pos = jnp.asarray(0, jnp.int32)

ref_logits, ref_k, _ = model.decode_step(params, k_cache, v_cache, tok, pos,
                                         cfg, fused=True)

mesh = build_mesh(MeshConfig(dp=1, tp=4, sp=2),
                  devices=jax.devices()[:8])
sp = shard_params(params, cfg, mesh)
kc = jax.device_put(k_cache, cache_shardings(mesh))
vc = jax.device_put(v_cache, cache_shardings(mesh))
step = make_sharded_decode_step(cfg, mesh)
logits, kc, vc = step(sp, kc, vc, tok, pos)

err = float(jnp.max(jnp.abs(logits - ref_logits)))
assert err < 5e-2, f"sharded vs single logits err {err}"
kerr = float(jnp.max(jnp.abs(jnp.asarray(kc, jnp.float32)
                             - jnp.asarray(ref_k, jnp.float32))))
assert kerr < 5e-2, f"cache err {kerr}"
print("SHARDED_DECODE_OK", err)
"""
    out = _run_cpu(code)
    assert "SHARDED_DECODE_OK" in out
