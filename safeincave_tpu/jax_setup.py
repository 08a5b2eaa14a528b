"""Global JAX configuration for safeincave_tpu.

The reference solver (SafeInCave) runs float64 end-to-end
(/root/reference/safeincave/Utils.py:248, MaterialProps.py:74-78); the 1e-8
field-parity target requires f64, so we enable x64 at import time, before any
tracing happens.  TPU supports f64 for all elementwise/matmul ops; LAPACK-style
ops (LU, eigh) are f32-only on TPU, which is why :mod:`safeincave_tpu.linalg`
provides custom batched kernels instead of ``jnp.linalg``.
"""
import jax

jax.config.update("jax_enable_x64", True)

DTYPE = "float64"
