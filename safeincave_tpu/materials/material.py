"""Composite material container.

Reference: ``Material`` at /root/reference/safeincave/MaterialProps.py:22-330.
Aggregates elastic stiffness, thermoelastic strain, and inelastic G/B
operators, and builds the consistent tangent CT = (C_inv + dt(1-theta) G)^-1
with the reference's per-element elastic fallback on singular tangents
(MaterialProps.py:292-309) expressed as a vectorized mask.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..linalg import inv6x6, inv6x6_fast
from .base import _as_voigt


class Material:
    def __init__(self, n_elems: int):
        self.n_elems = n_elems
        self.elems_ne = []
        self.elems_th = []
        self.elems_e = []
        z66 = np.zeros((n_elems, 6, 6))
        self.C_inv = z66
        self.C = z66
        self.C_tilde_inv = z66
        self.C_tilde = z66

    # -- scalar property setters (reference :80-122) ---------------------- #
    def set_density(self, density):
        self.density = np.asarray(density, dtype=np.float64)

    def set_specific_heat_capacity(self, cp):
        self.cp = np.asarray(cp, dtype=np.float64)

    def set_thermal_conductivity(self, k):
        self.k = np.asarray(k, dtype=np.float64)

    def set_thermal_expansion(self, alpha_th):
        self.alpha_th = np.asarray(alpha_th, dtype=np.float64)

    # -- element registration (reference :125-170) ------------------------ #
    def add_to_elastic(self, elem):
        elem.initialize()
        self._CT_el = None   # invalidate cached elastic fallback tangent
        self._C_inv32 = None  # and its float32 shadow
        self.C_inv = self.C_inv + elem.C_inv
        self.C = self.C + elem.C
        self.C_tilde_inv = self.C_tilde_inv + elem.C_tilde_inv
        self.C_tilde = self.C_tilde + elem.C_tilde
        self.elems_e.append(elem)
        self.K = elem.K
        self.E = elem.E
        self.ShearMod = 3 * self.K * self.E / (9 * self.K - self.E)

    def add_to_non_elastic(self, elem):
        self.elems_ne.append(elem)

    def add_to_thermoelastic(self, elem):
        self.elems_th.append(elem)

    # -- pure-functional core --------------------------------------------- #
    def f_tangent_all(self, states, sv6, T, dt, theta):
        """Per-element tangents + summed (G, B) - reference compute_G_B :172-200."""
        G = jnp.zeros((self.n_elems, 6, 6), dtype=sv6.dtype)
        B = jnp.zeros((self.n_elems, 6), dtype=sv6.dtype)
        new_states = []
        for elem, st in zip(self.elems_ne, states):
            st = elem.f_tangent(st, sv6, T, dt, theta)
            G = G + st["G"]
            B = B + st["B"]
            new_states.append(st)
        return new_states, G, B

    def _elastic_CT(self):
        """inv(C_inv), cached - the reference's singular-tangent fallback.

        Computed under ensure_compile_time_eval so the cached array is always
        concrete, even when first touched inside a jit trace (a traced cache
        entry would leak into later traces)."""
        if getattr(self, "_CT_el", None) is None:
            # host-side numpy inverse: C_inv is a concrete well-conditioned
            # compliance, and doing this off-device keeps it out of traces
            self._CT_el = np.linalg.inv(np.asarray(self.C_inv))
        return self._CT_el

    def f_CT(self, G, dt, theta):
        """CT = (C_inv + dt(1-theta) G)^-1 with elastic fallback (reference :273-309)."""
        if G.dtype == jnp.float32:
            if not hasattr(self, "_C_inv32") or self._C_inv32 is None:
                self._C_inv32 = np.asarray(self.C_inv, dtype=np.float32)
            C_inv = self._C_inv32
            fallback = self._elastic_CT().astype(np.float32)
        else:
            C_inv = self.C_inv
            fallback = self._elastic_CT()
        mat = C_inv + dt * (1 - theta) * G
        CT, ok = inv6x6_fast(mat)
        return jnp.where(ok[:, None, None], CT, fallback)

    # -- reference-compatible mutating API -------------------------------- #
    def compute_G_B(self, stress, dt, theta, T):
        sv6 = _as_voigt(stress)
        states = [e.state for e in self.elems_ne]
        states, G, B6 = self.f_tangent_all(states, sv6, jnp.asarray(T), dt, theta)
        for e, st in zip(self.elems_ne, states):
            e.state = st
        self.G = G
        self.B6 = B6

    def compute_CT(self, dt, theta):
        self.CT = self.f_CT(self.G, dt, theta)

    def compute_T_IT(self):
        IT = jnp.zeros((self.n_elems, 6, 6), dtype=jnp.float64)
        T6 = jnp.zeros((self.n_elems, 6), dtype=jnp.float64)
        for e in self.elems_ne:
            e.compute_T_IT()
            IT = IT + e.state["IT"]
            T6 = T6 + e.state["T"]
        self.IT = IT
        self.T6 = T6

    def compute_Bvol_Tvol(self, stress=None, dt=None):
        B_vol = jnp.zeros(self.n_elems, dtype=jnp.float64)
        T_vol = jnp.zeros(self.n_elems, dtype=jnp.float64)
        for e in self.elems_ne:
            e.compute_Bvol_Tvol()
            B_vol = B_vol + e.state["B_vol"]
            T_vol = T_vol + e.state["T_vol"]
        self.B_vol = B_vol
        self.T_vol = T_vol

    def compute_Gtilde_Btilde(self, stress=None, dt=None):
        Gt = jnp.zeros((self.n_elems, 6, 6), dtype=jnp.float64)
        Bt = jnp.zeros((self.n_elems, 6), dtype=jnp.float64)
        for e in self.elems_ne:
            e.compute_Gtilde_Btilde()
            Gt = Gt + e.state["G_tilde"]
            Bt = Bt + e.state["B_tilde"]
        self.G_tilde = Gt
        self.B_tilde6 = Bt

    def compute_CT_tilde(self, dt, theta):
        mat = self.C_tilde_inv + dt * (1 - theta) * self.G_tilde
        CT, ok = inv6x6(mat)
        self.CT_tilde = jnp.where(ok[:, None, None], CT, self.C_tilde)
