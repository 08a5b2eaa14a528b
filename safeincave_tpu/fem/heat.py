"""Transient heat diffusion: P1 temperature, implicit (backward-Euler) step.

Reference: /root/reference/safeincave/HeatEquation.py:34-366.  One step:

    a(dT, v) = (rho cp / dt)(dT, v) + (k grad dT, grad v) + sum h (dT, v)_G
    L(v)     = (rho cp / dt)(T_old, v) + neumann + sum h T_inf (v)_G

solved matrix-free with Jacobi-CG (operator is SPD).
"""
from __future__ import annotations

import jax.numpy as jnp

from .kernels import HeatKernel
from .solvers import cg_solve
from .momentum import SolverSettings


class HeatDiffusion:
    def __init__(self, grid):
        self.grid = grid
        self.kernel = HeatKernel(grid)
        self.n_elems = grid.n_elems
        self.n_nodes = grid.n_nodes
        self.T = jnp.zeros(self.n_nodes, dtype=jnp.float64)
        self.T_old = jnp.zeros(self.n_nodes, dtype=jnp.float64)
        self.solver = SolverSettings(method="cg")
        self.solver_stats = (0, 0.0)

    def set_material(self, material):
        self.mat = material
        self.initialize()

    def initialize(self):
        self.k = self.mat.k
        self.rho = self.mat.density
        self.cp = self.mat.cp

    def set_solver(self, solver: SolverSettings):
        self.solver = solver

    def set_boundary_conditions(self, bc):
        self.bc = bc

    def set_initial_T(self, T_field):
        T = jnp.asarray(T_field, dtype=jnp.float64)
        if T.ndim == 0:
            T = jnp.full(self.n_nodes, T)
        self.T = T
        self.T_old = T

    def update_T_old(self):
        self.T_old = self.T

    def get_T_elems(self):
        """Project nodal T to DG0 (vertex average), reference :286-301."""
        return self.kernel.nodes_to_elems(self.T)

    def solve(self, t, dt):
        """Assemble and solve one implicit step (reference :304-365)."""
        self.bc.update_bcs(t)
        mask, T_bc = self.bc.mask, self.bc.T_bc
        coef = self.rho * self.cp / dt
        kern = self.kernel
        bc = self.bc

        def A_full(x):
            return (kern.mass_apply(coef, x) + kern.stiffness_apply(self.k, x)
                    + bc.robin_operator_apply(x))

        def Aop(x):
            # masked operator with identity on Dirichlet dofs
            return mask * A_full(mask * x) + (1.0 - mask) * x

        diag = mask * (kern.mass_diagonal(coef) + kern.stiffness_diagonal(self.k)
                       + bc.robin_diagonal()) + (1.0 - mask)
        diag = jnp.where(jnp.abs(diag) > 0, diag, 1.0)

        b = (kern.mass_apply(coef, self.T_old) + bc.b_neumann + bc.b_robin)
        b_eff = mask * (b - A_full(T_bc)) + (1.0 - mask) * T_bc
        x0 = mask * self.T + (1.0 - mask) * T_bc

        x, iters, res = cg_solve(Aop, b_eff, x0, lambda r: r / diag,
                                 rtol=self.solver.rtol,
                                 maxiter=self.solver.max_it)
        self.solver_stats = (int(iters), float(res))
        self.T = x
        self.update_T_old()
