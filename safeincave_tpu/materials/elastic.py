"""Elastic and thermoelastic elements (batched Voigt operators).

Reference: Spring at /root/reference/safeincave/MaterialProps.py:385-539,
Thermoelastic at :333-382.  Stiffness inverses are closed-form (isotropic), so
no LU factorization is needed anywhere in the elastic layer.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import dotdot, tensor_to_voigt, voigt_to_tensor
from .base import _as_voigt


def isotropic_C(E, nu) -> jnp.ndarray:
    """Isotropic stiffness in tensorial Voigt: shear diagonal = a0(1-2nu) = 2G.

    Matches reference MaterialProps.py:459-487.  Built host-side in numpy
    (constructor path - avoids staging dozens of tiny XLA ops per setup).
    """
    E = np.asarray(E, dtype=np.float64)
    nu = np.asarray(nu, dtype=np.float64)
    n = E.shape[0]
    a0 = E / ((1 + nu) * (1 - 2 * nu))
    C = np.zeros((n, 6, 6))
    for k in range(3):
        C[:, k, k] = a0 * (1 - nu)
        C[:, k + 3, k + 3] = a0 * (1 - 2 * nu)
    for i in range(3):
        for j in range(3):
            if i != j:
                C[:, i, j] = a0 * nu
    return C


def isotropic_C_inv(E, nu) -> jnp.ndarray:
    """Closed-form compliance: 1/E on normal block, 1/(2G) on shear diagonal."""
    E = np.asarray(E, dtype=np.float64)
    nu = np.asarray(nu, dtype=np.float64)
    n = E.shape[0]
    Ci = np.zeros((n, 6, 6))
    G2 = E / (1 + nu)  # 2G
    for k in range(3):
        Ci[:, k, k] = 1.0 / E
        Ci[:, k + 3, k + 3] = 1.0 / G2
    for i in range(3):
        for j in range(3):
            if i != j:
                Ci[:, i, j] = -nu / E
    return Ci


class Spring:
    """Linear isotropic elastic element (reference MaterialProps.py:385-539)."""

    def __init__(self, E, nu, name: str = "spring"):
        self.E = np.asarray(E, dtype=np.float64)
        self.nu = np.asarray(nu, dtype=np.float64)
        self.name = name
        self.n_elems = self.E.shape[0]
        self.eps_e = None

    def initialize(self):
        n = self.n_elems
        self.C = isotropic_C(self.E, self.nu)
        self.C_inv = isotropic_C_inv(self.E, self.nu)
        G2 = np.asarray(self.E) / (1 + np.asarray(self.nu))  # 2G
        Ct = np.zeros((n, 6, 6))
        Cti = np.zeros((n, 6, 6))
        for k in range(6):
            Ct[:, k, k] = G2
            Cti[:, k, k] = 1.0 / G2
        self.C_tilde = Ct
        self.C_tilde_inv = Cti
        self.K = self.E / (3 * (1 - 2 * self.nu))

    def compute_eps_e(self, stress):
        """Elastic strain from stress via compliance (reference :440-457)."""
        sv = _as_voigt(stress)
        self.eps_e = voigt_to_tensor(dotdot(self.C_inv, sv))


class Thermoelastic:
    """Thermal strain eps_th = alpha * dT * I (reference :333-382)."""

    # float32 constant (exact values): float64 inputs still promote to
    # float64; float32 (mixed-precision phase) inputs stay float32
    _ISO = np.asarray([1., 1., 1., 0., 0., 0.], dtype=np.float32)

    def __init__(self, alpha, name: str = "thermoelastic"):
        self.alpha = np.asarray(alpha, dtype=np.float64)
        self.name = name
        self.n_elems = self.alpha.shape[0]
        self.eps_th_v = np.zeros((self.n_elems, 6))

    def eps_th_voigt(self, dT) -> jnp.ndarray:
        dT = jnp.asarray(dT)
        alpha = (self.alpha.astype(np.float32)
                 if dT.dtype == jnp.float32 else self.alpha)
        return (alpha * dT)[:, None] * self._ISO

    def compute_eps_th(self, dT):
        self.eps_th_v = self.eps_th_voigt(jnp.asarray(dT, dtype=jnp.float64))

    @property
    def eps_th(self):
        return voigt_to_tensor(self.eps_th_v)
