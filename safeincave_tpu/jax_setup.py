"""Global JAX configuration for safeincave_tpu.

The reference solver (SafeInCave) runs float64 end-to-end
(/root/reference/safeincave/Utils.py:248, MaterialProps.py:74-78); the 1e-8
field-parity target requires f64, so we enable x64 at import time, before any
tracing happens.  TPU supports f64 for all elementwise/matmul ops; LAPACK-style
ops (LU, eigh) are f32-only on TPU, which is why :mod:`safeincave_tpu.linalg`
provides custom batched kernels instead of ``jnp.linalg``.
"""
import os

import jax

jax.config.update("jax_enable_x64", True)

# TPU matmul precision: XLA's DEFAULT lowers f32 contractions to bf16 MXU
# passes (~8 mantissa bits).  The f32 Krylov path needs true f32 arithmetic
# (BiCGStab breaks down around the bf16 noise floor), so force full-precision
# accumulation for all einsum/dot lowering.
jax.config.update("jax_default_matmul_precision", "highest")

# Respect an explicit JAX_PLATFORMS from the user.  Some hosts install
# terminal hooks that force jax_platforms to the accelerator at interpreter
# startup, AFTER the env var is read - so `JAX_PLATFORMS=cpu python main.py`
# silently lands on the TPU (and blocks on whatever it is running).  The
# env var is the documented contract; re-assert it here.
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

# Persistent compilation cache: first-compile through the TPU toolchain is
# slow (minutes per program through the tunneled backend); cached reloads are
# near-instant.  The default location is REPO-LOCAL (.jax_cache next to the
# package), not /tmp: /tmp does not survive between tool sessions on this
# deployment, while the repo checkout does - a /tmp cache warmed in one
# session is gone when the benchmark actually runs (r04 post-mortem: the
# driver's bench run found a cold cache and died inside its first 300 s
# compile).  Falls back to /tmp/jax_cache when the package dir is read-only
# (installed into site-packages).
def _default_cache_dir():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cand = os.path.join(repo, ".jax_cache")
    try:
        os.makedirs(cand, exist_ok=True)
        probe = os.path.join(cand, ".wtest")
        with open(probe, "w"):
            pass
        os.remove(probe)
        return cand
    except OSError:
        return "/tmp/jax_cache"


_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _default_cache_dir())
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without these options
    pass

DTYPE = "float64"

_d2h_warmed = False


def warm_transfer():
    """Kick the device->host transfer path asynchronously.

    On the tunneled ``axon`` TPU platform the FIRST blocking device->host
    transfer of a process stalls for ~380 s (one-time path initialisation;
    measured 2026-08-17, any array size, host->device unaffected).  Starting
    the same path with ``copy_to_host_async()`` right after backend init
    makes the cost vanish entirely - the init completes in the background
    while the host builds/compiles.  Call this once early in any driver
    that will later read results back (bench.py, simulators, examples).
    Safe no-op on CPU/standard TPU backends.
    """
    global _d2h_warmed
    if _d2h_warmed:
        return
    _d2h_warmed = True
    try:
        import jax.numpy as jnp
        x = jnp.zeros(8, jnp.float32)
        x.copy_to_host_async()
    except Exception:
        pass
