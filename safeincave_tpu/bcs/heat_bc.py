"""Heat-equation boundary conditions (Dirichlet / Neumann flux / Robin).

Reference: /root/reference/safeincave/HeatBC.py.  Robin conditions contribute
both a bilinear facet-mass term ``h (dT, v)_Gamma`` (part of the operator) and
a linear term ``h T_inf (v)_Gamma`` (RHS), assembled exactly on boundary
triangles:

    facet mass   M_ab = A (1 + delta_ab) / 12
    facet load   b_a  = A / 3 * value      (constant integrand)
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class GeneralBC:
    def __init__(self, boundary_name, values, time_values):
        self.boundary_name = boundary_name
        self.values = np.asarray(values, dtype=np.float64)
        self.time_values = np.asarray(time_values, dtype=np.float64)
        self.type = None


class DirichletBC(GeneralBC):
    def __init__(self, boundary_name, values, time_values):
        super().__init__(boundary_name, values, time_values)
        self.type = "dirichlet"


class NeumannBC(GeneralBC):
    def __init__(self, boundary_name, values, time_values):
        super().__init__(boundary_name, values, time_values)
        self.type = "neumann"


class RobinBC(GeneralBC):
    def __init__(self, boundary_name, values, h, time_values):
        super().__init__(boundary_name, values, time_values)
        self.type = "robin"
        self.h = h


class BcHandler:
    """Heat BC handler (reference HeatBC.py:138-334)."""

    def __init__(self, equation):
        self.eq = equation
        self.grid = equation.grid
        self.dirichlet_boundaries = []
        self.neumann_boundaries = []
        self.robin_boundaries = []
        self._dirichlet_meta = []
        self._neumann_meta = []
        self._robin_meta = []

    def reset_boundary_conditions(self):
        self.__init__(self.eq)

    def _facet_meta(self, bc):
        # host-resident (numpy) meta: captured by jitted closures, where a
        # device array would force a d2h fetch at lowering time (see
        # momentum_bc.BcHandler.add_boundary_condition)
        grid = self.grid
        facets = np.asarray(grid.get_boundary_tags(bc.boundary_name))
        tris = grid.tris[facets]
        return dict(tris=np.asarray(tris),
                    areas=np.asarray(grid.tri_areas[facets]),
                    times=np.asarray(bc.time_values),
                    values=np.asarray(bc.values))

    def add_boundary_condition(self, bc: GeneralBC):
        self._jit_cache = {}
        if bc.type == "dirichlet":
            self.dirichlet_boundaries.append(bc)
            facets = self.grid.get_boundary_tags(bc.boundary_name)
            nodes = np.unique(self.grid.tris[facets].reshape(-1))
            self._dirichlet_meta.append(
                (np.asarray(nodes), np.asarray(bc.time_values),
                 np.asarray(bc.values)))
        elif bc.type == "neumann":
            self.neumann_boundaries.append(bc)
            self._neumann_meta.append(self._facet_meta(bc))
        elif bc.type == "robin":
            self.robin_boundaries.append(bc)
            m = self._facet_meta(bc)
            m["h"] = bc.h
            self._robin_meta.append(m)
        else:
            raise Exception(f"Boundary type {bc.type} not supported.")

    # ------------------------------------------------------------------ #
    def dirichlet_arrays(self, t):
        n = self.grid.n_nodes
        mask = jnp.ones(n, dtype=jnp.float64)
        T_bc = jnp.zeros(n, dtype=jnp.float64)
        for nodes, times, values in self._dirichlet_meta:
            val = jnp.interp(t, times, values)
            mask = mask.at[nodes].set(0.0)
            T_bc = T_bc.at[nodes].set(val)
        return mask, T_bc

    def neumann_rhs(self, t):
        """Flux term: value * (v)_Gamma (reference HeatBC.py:283-304)."""
        n = self.grid.n_nodes
        f = jnp.zeros(n, dtype=jnp.float64)
        for m in self._neumann_meta:
            value = jnp.interp(t, m["times"], m["values"])
            w = value * m["areas"][:, None] / 3.0 * jnp.ones((1, 3))
            f = f + jax.ops.segment_sum(w.reshape(-1), m["tris"].reshape(-1),
                                        num_segments=n)
        return f

    def robin_rhs(self, t):
        """h * T_inf * (v)_Gamma (reference HeatBC.py:306-333)."""
        n = self.grid.n_nodes
        f = jnp.zeros(n, dtype=jnp.float64)
        for m in self._robin_meta:
            T_inf = jnp.interp(t, m["times"], m["values"])
            w = m["h"] * T_inf * m["areas"][:, None] / 3.0 * jnp.ones((1, 3))
            f = f + jax.ops.segment_sum(w.reshape(-1), m["tris"].reshape(-1),
                                        num_segments=n)
        return f

    def robin_operator_apply(self, T):
        """Facet-mass action sum_bc h (T, v)_Gamma (bilinear Robin term)."""
        n = self.grid.n_nodes
        f = jnp.zeros(n, dtype=jnp.float64)
        for m in self._robin_meta:
            T_e = T[m["tris"]]                                     # (F, 3)
            loc = (T_e + T_e.sum(axis=1, keepdims=True)) / 12.0    # (1+d)/12
            w = m["h"] * m["areas"][:, None] * loc
            f = f + jax.ops.segment_sum(w.reshape(-1), m["tris"].reshape(-1),
                                        num_segments=n)
        return f

    def robin_diagonal(self):
        n = self.grid.n_nodes
        d = jnp.zeros(n, dtype=jnp.float64)
        for m in self._robin_meta:
            w = m["h"] * m["areas"][:, None] * jnp.full((1, 3), 2.0 / 12.0)
            d = d + jax.ops.segment_sum(w.reshape(-1), m["tris"].reshape(-1),
                                        num_segments=n)
        return d

    # ------------------------------------------------------------------ #
    # Reference-compatible mutating API
    # ------------------------------------------------------------------ #
    def update_bcs(self, t):
        self.update_dirichlet(t)
        self.update_neumann(t)
        self.update_robin(t)

    def _jit_of(self, name, fn):
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        if name not in cache:
            cache[name] = jax.jit(fn)
        return cache[name]

    def update_dirichlet(self, t):
        self.mask, self.T_bc = self._jit_of("d", self.dirichlet_arrays)(t)

    def update_neumann(self, t):
        self.b_neumann = self._jit_of("n", self.neumann_rhs)(t)

    def update_robin(self, t):
        self.b_robin = self._jit_of("r", self.robin_rhs)(t)
