"""Matrix-free element kernels for CG1 tetrahedra.

The momentum stiffness action replaces UFL-form assembly + PETSc MatAIJ
(reference MomentumEquation.py:1008-1011): for each element,

    gather u -> strain (Voigt 6) -> sigma = CT @ eps -> nodal forces -> scatter

with everything batched over elements.  Energy bookkeeping: with tensorial
Voigt storage, sigma : eps(v) = sigma_v . diag(1,1,1,2,2,2) . eps_v, which is
handled implicitly by contracting the full symmetric tensors.

The heat kernel provides the P1 mass/stiffness actions for the implicit heat
step (reference HeatEquation.py:343-356) using exact closed-form tet
integrals: consistent mass M_ab = V (1 + delta_ab) / 20, stiffness
K_ab = k V grad_Na . grad_Nb, facet (Robin) mass  A (1 + delta_ab) / 12.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import tensor_to_voigt, voigt_to_tensor


class MomentumKernel:
    """Vector CG1 elasticity operator pieces for one mesh."""

    def __init__(self, grid):
        self.grid = grid
        self.conn = jnp.asarray(grid.conn, dtype=jnp.int32)       # (E, 4)
        self.grad_N = jnp.asarray(grid.grad_N)                    # (E, 4, 3)
        self.vol = jnp.asarray(grid.volumes)                      # (E,)
        # f32 copies of the geometry for the mixed-precision Krylov path
        # (f64 is software-emulated on TPU; see fem/solvers.py:ir_solve)
        self.grad_N32 = self.grad_N.astype(jnp.float32)
        self.vol32 = self.vol.astype(jnp.float32)
        self.n_nodes = grid.n_nodes
        self.n_elems = grid.n_elems

    def _geom(self, dtype):
        if dtype == jnp.float32:
            return self.grad_N32, self.vol32
        return self.grad_N, self.vol

    # ------------------------------------------------------------------ #
    def strain(self, u: jnp.ndarray) -> jnp.ndarray:
        """Total strain eps(u) projected to DG0, Voigt (E, 6).

        Exact for P1 displacements (the gradient is element-constant), which
        is what the reference's project(epsilon(u), DG0) computes
        (MomentumEquation.py:326-341).
        """
        grad_N, _ = self._geom(u.dtype)
        u_e = u[self.conn]                                        # (E, 4, 3)
        grad_u = jnp.einsum("eai,eaj->eij", u_e, grad_N)          # du_i/dx_j
        eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
        return tensor_to_voigt(eps)

    def internal_force(self, sigma_v: jnp.ndarray) -> jnp.ndarray:
        """Nodal forces f_ai = int sigma : eps(v_ai) = V sigma_ij dNa/dx_j."""
        grad_N, vol = self._geom(sigma_v.dtype)
        sig = voigt_to_tensor(sigma_v)                            # (E, 3, 3)
        f_e = jnp.einsum("eij,eaj,e->eai", sig, grad_N, vol)
        flat = f_e.reshape(-1, 3)
        return jax.ops.segment_sum(flat, self.conn.reshape(-1),
                                   num_segments=self.n_nodes)

    def matvec(self, CT: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """Stiffness action A(CT) @ u, no boundary conditions."""
        return self.internal_force(
            jnp.einsum("eij,ej->ei", CT, self.strain(u)))

    def diagonal(self, CT: jnp.ndarray) -> jnp.ndarray:
        """diag(A) as an (n_nodes, 3) array (Jacobi preconditioner)."""
        g = self.grad_N                                           # (E, 4, 3)
        E3 = jnp.eye(3, dtype=g.dtype)
        # unit-displacement strain basis eps6[e, a, i, :] for node a, dir i
        gi = g[:, :, None, :]                                     # (E,4,1,3)
        ei = E3[None, None, :, :]                                 # (1,1,3,3)
        xx = ei[..., 0] * gi[..., 0]
        yy = ei[..., 1] * gi[..., 1]
        zz = ei[..., 2] * gi[..., 2]
        xy = 0.5 * (ei[..., 0] * gi[..., 1] + ei[..., 1] * gi[..., 0])
        xz = 0.5 * (ei[..., 0] * gi[..., 2] + ei[..., 2] * gi[..., 0])
        yz = 0.5 * (ei[..., 1] * gi[..., 2] + ei[..., 2] * gi[..., 1])
        eps6 = jnp.stack([xx, yy, zz, xy, xz, yz], axis=-1)       # (E,4,3,6)
        sig6 = jnp.einsum("ekl,eail->eaik", CT, eps6)
        w = jnp.asarray([1., 1., 1., 2., 2., 2.])
        d_e = jnp.einsum("eaik,eaik,k,e->eai", sig6, eps6, w, self.vol)
        return jax.ops.segment_sum(d_e.reshape(-1, 3),
                                   self.conn.reshape(-1),
                                   num_segments=self.n_nodes)

    def block_diagonal(self, CT: jnp.ndarray) -> jnp.ndarray:
        """Nodal 3x3 diagonal blocks of A (block-Jacobi preconditioner).

        Roughly halves Krylov iteration counts vs scalar Jacobi on
        elasticity; stands in for the reference's PETSc ASM/ILU setup
        (examples/mechanics/4_cavern/main.py:33-37)."""
        g = self.grad_N
        E3 = jnp.eye(3, dtype=g.dtype)
        gi = g[:, :, None, :]
        ei = E3[None, None, :, :]
        xx = ei[..., 0] * gi[..., 0]
        yy = ei[..., 1] * gi[..., 1]
        zz = ei[..., 2] * gi[..., 2]
        xy = 0.5 * (ei[..., 0] * gi[..., 1] + ei[..., 1] * gi[..., 0])
        xz = 0.5 * (ei[..., 0] * gi[..., 2] + ei[..., 2] * gi[..., 0])
        yz = 0.5 * (ei[..., 1] * gi[..., 2] + ei[..., 2] * gi[..., 1])
        eps6 = jnp.stack([xx, yy, zz, xy, xz, yz], axis=-1)       # (E,4,3,6)
        sig6 = jnp.einsum("ekl,eajl->eajk", CT, eps6)
        w = jnp.asarray([1., 1., 1., 2., 2., 2.])
        blk = jnp.einsum("eajk,eaik,k,e->eaij", sig6, eps6, w, self.vol)
        return jax.ops.segment_sum(blk.reshape(-1, 3, 3),
                                   self.conn.reshape(-1),
                                   num_segments=self.n_nodes)

    def body_force(self, density: jnp.ndarray, g_vec) -> jnp.ndarray:
        """int rho g . v dx  with DG0 rho, P1 v: V rho g / 4 to each node
        (reference MomentumEquation.py:255-275)."""
        g_vec = jnp.asarray(g_vec, dtype=jnp.float64)
        f_e = (density * self.vol / 4.0)[:, None] * g_vec[None, :]  # (E, 3)
        f = jnp.repeat(f_e[:, None, :], 4, axis=1).reshape(-1, 3)
        return jax.ops.segment_sum(f, self.conn.reshape(-1),
                                   num_segments=self.n_nodes)


class HeatKernel:
    """Scalar P1 heat operator pieces."""

    def __init__(self, grid):
        self.grid = grid
        self.conn = jnp.asarray(grid.conn, dtype=jnp.int32)
        self.grad_N = jnp.asarray(grid.grad_N)
        self.vol = jnp.asarray(grid.volumes)
        self.n_nodes = grid.n_nodes
        self.n_elems = grid.n_elems
        # consistent P1 tet mass: V (1 + delta_ab) / 20
        self._mass_local = (np.ones((4, 4)) + np.eye(4)) / 20.0
        self._mass_local = jnp.asarray(self._mass_local)

    def mass_apply(self, coef: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
        """(coef * T, v) with DG0 coef, P1 T and v."""
        T_e = T[self.conn]                                        # (E, 4)
        m = jnp.einsum("ab,eb,e->ea", self._mass_local, T_e,
                       coef * self.vol)
        return jax.ops.segment_sum(m.reshape(-1), self.conn.reshape(-1),
                                   num_segments=self.n_nodes)

    def stiffness_apply(self, k: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
        """(k grad T, grad v) with DG0 conductivity."""
        T_e = T[self.conn]
        gT = jnp.einsum("ea,eai->ei", T_e, self.grad_N)           # (E, 3)
        f = jnp.einsum("ei,eai,e->ea", gT, self.grad_N, k * self.vol)
        return jax.ops.segment_sum(f.reshape(-1), self.conn.reshape(-1),
                                   num_segments=self.n_nodes)

    def mass_diagonal(self, coef: jnp.ndarray) -> jnp.ndarray:
        d = (coef * self.vol)[:, None] * jnp.full((1, 4), 2.0 / 20.0)
        return jax.ops.segment_sum(d.reshape(-1), self.conn.reshape(-1),
                                   num_segments=self.n_nodes)

    def stiffness_diagonal(self, k: jnp.ndarray) -> jnp.ndarray:
        d = jnp.einsum("eai,eai,e->ea", self.grad_N, self.grad_N,
                       k * self.vol)
        return jax.ops.segment_sum(d.reshape(-1), self.conn.reshape(-1),
                                   num_segments=self.n_nodes)

    def nodes_to_elems(self, T: jnp.ndarray) -> jnp.ndarray:
        """DG0 projection of a P1 field = vertex average
        (reference HeatEquation.py:286-301)."""
        return T[self.conn].mean(axis=1)
