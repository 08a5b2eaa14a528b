"""Matrix-free element kernels for CG1 tetrahedra, laid out for the TPU VPU.

The momentum stiffness action replaces UFL-form assembly + PETSc MatAIJ
(reference MomentumEquation.py:1008-1011): for each element,

    gather u -> strain (Voigt 6) -> sigma = CT @ eps -> nodal forces -> scatter

TPU layout notes (measured on v5e-class hardware):

* Arrays shaped (E, 3) / (E, 6, 6) put the tiny tensor dims on the vector
  lanes (128-wide), wasting ~97% of the VPU and blowing up einsums into E
  batched micro-matmuls.  The hot path therefore runs **structure-of-arrays**:
  every small tensor index is unrolled in Python and each component is a flat
  (E,) vector, so XLA fuses the whole element kernel into full-lane VPU code
  (~10x over the einsum formulation).
* XLA gathers/scatters cost ~3-10 ns *per row* regardless of row width, so
  the scatter-add (4E rows) dominated the matvec.  Assembly instead uses a
  **cumsum scatter**: contributions are gathered once into
  destination-sorted order (static permutation), prefix-summed, and each
  node's sum read off as a difference of two boundary rows - turning the
  scatter into one gather + one dense scan.
* ``prep()`` transposes CT to (6, 6, E) once per linear solve so the Krylov
  loop never touches strided (E, 6, 6) slices.

Energy bookkeeping: with tensorial Voigt storage,
sigma : eps(v) = sigma_v . diag(1,1,1,2,2,2) . eps_v, handled implicitly by
contracting the full symmetric tensors.

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

# Voigt index -> tensor (i, j), tensorial convention [xx,yy,zz,xy,xz,yz]
_V2T = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))


class MomentumKernel:
    """Vector CG1 elasticity operator pieces for one mesh."""

    def __init__(self, grid):
        self.grid = grid
        self.conn = jnp.asarray(grid.conn, dtype=jnp.int32)       # (E, 4)
        self.grad_N = jnp.asarray(grid.grad_N)                    # (E, 4, 3)
        self.vol = jnp.asarray(grid.volumes)                      # (E,)
        # SoA geometry: gN[a][i] is a flat (E,) vector (see module docstring)
        gN = np.asarray(grid.grad_N)
        self._gN = [[jnp.asarray(gN[:, a, i]) for i in range(3)]
                    for a in range(4)]
        self._gN32 = [[g.astype(jnp.float32) for g in row]
                      for row in self._gN]
        self.vol32 = self.vol.astype(jnp.float32)
        self.n_nodes = grid.n_nodes
        self.n_elems = grid.n_elems

        # static cumsum-scatter plan: (e, a) contributions sorted by
        # destination node; per-node sums are boundary differences of the
        # prefix sum.  Contribution k in sorted order is (elem, a) =
        # (perm[k] % E, perm[k] // E) for the a-major (4, E) flat layout.
        flat = np.asarray(grid.conn).T.reshape(-1)                # a-major
        perm = np.argsort(flat, kind="stable")
        flat_sorted = flat[perm]
        starts = np.searchsorted(flat_sorted, np.arange(grid.n_nodes))
        ends = np.searchsorted(flat_sorted, np.arange(grid.n_nodes),
                               side="right")
        self._scat_perm = jnp.asarray(perm, dtype=jnp.int32)
        self._scat_starts = jnp.asarray(starts, dtype=jnp.int32)
        self._scat_ends = jnp.asarray(ends + 0, dtype=jnp.int32)

    def _geom(self, dtype):
        if dtype == jnp.float32:
            return self._gN32, self.vol32
        return self._gN, self.vol

    # -- SoA building blocks ------------------------------------------- #
    def _gather_u(self, u):
        """u at element nodes as nested lists ue[a][i] of (E,) vectors."""
        ue = u[self.conn]                                         # (E, 4, 3)
        return [[ue[:, a, i] for i in range(3)] for a in range(4)]

    def _strain_list(self, ue, gN):
        """Voigt strain components as a list of 6 (E,) vectors."""
        def grad(i, j):
            return sum(ue[a][i] * gN[a][j] for a in range(4))
        return [grad(i, j) if i == j else 0.5 * (grad(i, j) + grad(j, i))
                for (i, j) in _V2T]

    def _forces_list(self, sig, gN, vol):
        """fe[a][i] (E,) from a symmetric sig[i][j] table of (E,) vectors."""
        return [[vol * sum(sig[i][j] * gN[a][j] for j in range(3))
                 for i in range(3)] for a in range(4)]

    def _scatter(self, fe):
        """Assemble nodal forces from fe[a][i] lists via the cumsum plan."""
        # (4E, 3) in a-major order to match the static permutation
        flat = jnp.stack([jnp.stack([fe[a][i] for i in range(3)], axis=-1)
                          for a in range(4)]).reshape(-1, 3)
        fs = flat[self._scat_perm]
        cs = jnp.cumsum(fs, axis=0)
        cs = jnp.concatenate([jnp.zeros((1, 3), dtype=fs.dtype), cs], axis=0)
        return cs[self._scat_ends] - cs[self._scat_starts]

    @staticmethod
    def _sig_table(sv):
        """Symmetric 3x3 table of (E,) vectors from 6 Voigt components."""
        sig = [[None] * 3 for _ in range(3)]
        for k, (i, j) in enumerate(_V2T):
            sig[i][j] = sv[k]
            sig[j][i] = sv[k]
        return sig

    # ------------------------------------------------------------------ #
    def prep(self, CT: jnp.ndarray):
        """Transpose CT (E,6,6) to a 6x6 nested list of contiguous (E,)
        vectors, once per linear solve (Krylov iterations then run pure
        full-lane VPU code)."""
        CT_t = jnp.transpose(CT, (1, 2, 0))                       # (6, 6, E)
        return [[CT_t[i, j] for j in range(6)] for i in range(6)]

    def strain(self, u: jnp.ndarray) -> jnp.ndarray:
        """Total strain eps(u) projected to DG0, Voigt (E, 6).

        Exact for P1 displacements (the gradient is element-constant), which
        is what the reference's project(epsilon(u), DG0) computes
        (MomentumEquation.py:326-341).
        """
        gN, _ = self._geom(u.dtype)
        ev = self._strain_list(self._gather_u(u), gN)
        return jnp.stack(ev, axis=-1)

    def internal_force(self, sigma_v: jnp.ndarray) -> jnp.ndarray:
        """Nodal forces f_ai = int sigma : eps(v_ai) = V sigma_ij dNa/dx_j."""
        gN, vol = self._geom(sigma_v.dtype)
        sv = [sigma_v[:, k] for k in range(6)]
        fe = self._forces_list(self._sig_table(sv), gN, vol)
        return self._scatter(fe)

    def matvec(self, CT_soa, u: jnp.ndarray) -> jnp.ndarray:
        """Stiffness action A(CT) @ u, no boundary conditions.

        ``CT_soa`` must come from :meth:`prep`; raw (E, 6, 6) arrays are
        accepted (and transposed on the fly) for API compatibility.
        """
        if not isinstance(CT_soa, list):
            CT_soa = self.prep(CT_soa)
        gN, vol = self._geom(u.dtype)
        ev = self._strain_list(self._gather_u(u), gN)
        sv = [sum(CT_soa[i][j] * ev[j] for j in range(6)) for i in range(6)]
        fe = self._forces_list(self._sig_table(sv), gN, vol)
        return self._scatter(fe)

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
