"""Test env.

Kernel/model tests run on whatever platform is ambient — on this machine a
real TPU chip (Mosaic-compiled kernels); elsewhere Pallas auto-selects
interpret mode (see clusterfusion_tpu.ops._support.interpret_mode).

Multi-chip sharding tests (tests/test_parallel.py) run in a subprocess with
JAX_PLATFORMS=cpu and a virtual 8-device host mesh, matching how the driver
validates dryrun_multichip.  The XLA flag is set here so any in-process CPU
usage also sees 8 devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: tunneled Mosaic compiles dominate suite
# wall-clock (~20-40 s each, first run); cache them to disk so reruns are
# seconds.  Cache entries key on HLO + compile flags, so correctness is
# unaffected.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
