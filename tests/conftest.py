"""Test configuration: force an 8-device virtual CPU mesh + float64.

Multi-chip TPU hardware is not available in this environment, so sharding
tests run on XLA's host-platform virtual devices (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
Must run before jax is imported anywhere.
"""
import os

# FORCE cpu (not setdefault): the driver environment presets
# JAX_PLATFORMS=axon, and safeincave_tpu.jax_setup re-asserts the env var
# over any jax.config.update - with setdefault the whole suite silently ran
# on the tunneled TPU (r05 post-mortem: ~10x slower, and the traffic
# congested the tunnel for concurrent benchmark runs).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon terminal hook forces jax_platforms="axon,cpu" at import time, so
# the env var alone is not enough - override the config explicitly.
jax.config.update("jax_platforms", "cpu")

import safeincave_tpu  # noqa: E402,F401  (enables x64)
