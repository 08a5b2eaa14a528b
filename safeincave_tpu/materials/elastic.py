"""Elastic and thermoelastic elements (batched Voigt operators).

Reference: Spring at /root/reference/safeincave/MaterialProps.py:385-539,
Thermoelastic at :333-382.  Stiffness inverses are closed-form (isotropic), so
no LU factorization is needed anywhere in the elastic layer.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils import dotdot, tensor_to_voigt, voigt_to_tensor
from .base import _as_voigt


def isotropic_C(E: jnp.ndarray, nu: jnp.ndarray) -> jnp.ndarray:
    """Isotropic stiffness in tensorial Voigt: shear diagonal = a0(1-2nu) = 2G.

    Matches reference MaterialProps.py:459-487.
    """
    n = E.shape[0]
    a0 = E / ((1 + nu) * (1 - 2 * nu))
    C = jnp.zeros((n, 6, 6), dtype=jnp.float64)
    diag_n = a0 * (1 - nu)
    diag_s = a0 * (1 - 2 * nu)
    off = a0 * nu
    for k in range(3):
        C = C.at[:, k, k].set(diag_n)
        C = C.at[:, k + 3, k + 3].set(diag_s)
    for i in range(3):
        for j in range(3):
            if i != j:
                C = C.at[:, i, j].set(off)
    return C


def isotropic_C_inv(E: jnp.ndarray, nu: jnp.ndarray) -> jnp.ndarray:
    """Closed-form compliance: 1/E on normal block, 1/(2G) on shear diagonal."""
    n = E.shape[0]
    Ci = jnp.zeros((n, 6, 6), dtype=jnp.float64)
    G2 = E / (1 + nu)  # 2G
    for k in range(3):
        Ci = Ci.at[:, k, k].set(1.0 / E)
        Ci = Ci.at[:, k + 3, k + 3].set(1.0 / G2)
    for i in range(3):
        for j in range(3):
            if i != j:
                Ci = Ci.at[:, i, j].set(-nu / E)
    return Ci


class Spring:
    """Linear isotropic elastic element (reference MaterialProps.py:385-539)."""

    def __init__(self, E, nu, name: str = "spring"):
        self.E = jnp.asarray(E, dtype=jnp.float64)
        self.nu = jnp.asarray(nu, dtype=jnp.float64)
        self.name = name
        self.n_elems = self.E.shape[0]
        self.eps_e = None

    def initialize(self):
        n = self.n_elems
        self.C = isotropic_C(self.E, self.nu)
        self.C_inv = isotropic_C_inv(self.E, self.nu)
        G2 = self.E / (1 + self.nu)  # 2G
        Ct = jnp.zeros((n, 6, 6), dtype=jnp.float64)
        Cti = jnp.zeros((n, 6, 6), dtype=jnp.float64)
        for k in range(6):
            Ct = Ct.at[:, k, k].set(G2)
            Cti = Cti.at[:, k, k].set(1.0 / G2)
        self.C_tilde = Ct
        self.C_tilde_inv = Cti
        self.K = self.E / (3 * (1 - 2 * self.nu))

    def compute_eps_e(self, stress):
        """Elastic strain from stress via compliance (reference :440-457)."""
        sv = _as_voigt(stress)
        self.eps_e = voigt_to_tensor(dotdot(self.C_inv, sv))


class Thermoelastic:
    """Thermal strain eps_th = alpha * dT * I (reference :333-382)."""

    _ISO = jnp.asarray([1., 1., 1., 0., 0., 0.])

    def __init__(self, alpha, name: str = "thermoelastic"):
        self.alpha = jnp.asarray(alpha, dtype=jnp.float64)
        self.name = name
        self.n_elems = self.alpha.shape[0]
        self.eps_th_v = jnp.zeros((self.n_elems, 6), dtype=jnp.float64)

    def eps_th_voigt(self, dT: jnp.ndarray) -> jnp.ndarray:
        return (self.alpha * dT)[:, None] * self._ISO

    def compute_eps_th(self, dT):
        self.eps_th_v = self.eps_th_voigt(jnp.asarray(dT, dtype=jnp.float64))

    @property
    def eps_th(self):
        return voigt_to_tensor(self.eps_th_v)
