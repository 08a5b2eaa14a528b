"""Assembled block-DIA (offset) stiffness operator: the zero-gather SpMV.

Replaces: PETSc MatAIJ assembly + MatMult in the reference
(/root/reference/safeincave/MomentumEquation.py:1008-1025) for meshes
whose node numbering is (quasi-)structured.

Why this format exists next to block-ELL (fem/blockell.py):

* Every general sparse layout on TPU pays an unstructured gather for the
  neighbour values of ``u`` — XLA lowers that to a ~serial per-row loop
  (~0.6 Grows/s), which caps block-ELL well below the HBM roofline at
  production scale, and the 3x3-block zero padding of grouped layouts
  caps the *effective* (true-nonzero) bandwidth at ~40% even if the
  streaming were perfect.
* On a structured (lexicographic) node numbering the column offsets
  ``j - i`` of ALL node pairs collapse to a handful of distinct values
  (15 for the GridBox tet split, independent of resolution, at 97% slot
  fill at 500k tets).  Storing one value plane per offset turns the
  matvec into

      y[c, i] = sum_d sum_c' vals[d, 3c+c', i] * u[c', i + off_d]

  — shifts are STATIC slices of a zero-padded ``u``; there is no gather,
  no scatter, no index traffic at all.  The whole matvec is a fused
  elementwise multiply-add over ``9 |D|`` full-lane (N,)-vector streams,
  which the VPU runs at HBM rate, and the stored bytes are within a few
  percent of the true-nonzero bytes (fill ~0.97).
* Assembly reuses the element SoA block rows (blockell.element_block_rows)
  and lands them with one row-granular scatter-add keyed by
  (offset index, node) — the same once-per-linearized-solve cost as
  block-ELL; the f32 operator is a cast of the f64 assembly.

``DIAPlan`` refuses meshes whose ordering is not offset-structured (too
many distinct offsets or low slot fill) so callers fall back to the band
or cumsum kernels — real gmsh cavern meshes stay on those; regular-box
production grids (SURVEY.md 6: the reference's 1e5-1e6-tet PETSc MPI
regime) get this one.

Padding contract: ``u`` is zero-padded by the extreme offsets on both
sides; slots for pairs that do not exist hold exact zeros from assembly,
so out-of-range shifted reads multiply against zero coefficients.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .blockell import element_block_rows


class DIAPlan:
    """Static offset tables for one mesh (host numpy, built once)."""

    def __init__(self, conn: np.ndarray, n_nodes: int,
                 max_offsets: int = 96, min_fill: float = 0.4):
        conn = np.asarray(conn, dtype=np.int64)
        E = conn.shape[0]
        self.n_nodes = n_nodes
        self.n_elems = E

        # contribution row r in (ab)-major layout: r = (4a + b) * E + e
        rows = np.arange(16 * E)
        a_r = (rows // E) // 4
        b_r = (rows // E) % 4
        e_r = rows % E
        i_r = conn[e_r, a_r]
        j_r = conn[e_r, b_r]
        d_r = j_r - i_r

        offsets = np.unique(d_r)
        n_pairs = len(np.unique(i_r * (2 * n_nodes + 1) + d_r))
        fill = n_pairs / (len(offsets) * n_nodes)
        if len(offsets) > max_offsets or fill < min_fill:
            raise ValueError(
                f"node numbering is not offset-structured: {len(offsets)} "
                f"distinct column offsets at {fill:.2f} slot fill (need "
                f"<= {max_offsets} at >= {min_fill}); keep the band/cumsum "
                f"kernels for this mesh")
        self.offsets = offsets.astype(np.int64)          # sorted
        self.Dn = len(offsets)
        self.fill = fill
        self.n_pairs = n_pairs
        d_idx = np.searchsorted(offsets, d_r)
        self.row_slot = (d_idx * n_nodes + i_r).astype(np.int32)  # (16E,)

    def nbytes(self, itemsize=8):
        return self.Dn * 9 * self.n_nodes * itemsize


class BlockDIA:
    """Device-side assembled offset operator for one mesh."""

    def __init__(self, kern, max_offsets: int = 96, min_fill: float = 0.4):
        self.plan = DIAPlan(np.asarray(kern.grid.conn), kern.n_nodes,
                            max_offsets=max_offsets, min_fill=min_fill)
        p = self.plan
        self._row_slot = jnp.asarray(p.row_slot)             # (16E,)
        # SoA geometry: gradient components (4, 3, E) and volumes (E,)
        self._gn = jnp.asarray(np.moveaxis(np.asarray(kern.grid.grad_N),
                                           0, -1))
        self._vol = jnp.asarray(np.asarray(kern.grid.volumes))
        self._lo = int(-p.offsets.min())                     # left pad
        self._hi = int(p.offsets.max())                      # right pad

    # ------------------------------------------------------------------ #
    def assemble(self, CT_soa):
        """CT (6,6,E) -> offset planes (Dn, 9, N), dtype of CT.

        One row-granular scatter-add of the (16E, 9) element block rows
        into (offset, node) slots — the only XLA scatter form that runs
        at the ~8 ns/row rate — then a transpose into the planes-last
        matvec layout.  One assembly serves all Krylov matvecs of the
        linearized solve in both precisions.
        """
        p = self.plan
        v = element_block_rows(CT_soa, self._gn, self._vol)  # (16E, 9)
        flat = jnp.zeros((p.Dn * p.n_nodes, 9), dtype=v.dtype)
        flat = flat.at[self._row_slot].add(v)
        return jnp.transpose(flat.reshape(p.Dn, p.n_nodes, 9),
                             (0, 2, 1))                      # (Dn, 9, N)

    def matvec(self, vals, u):
        """Stiffness action A @ u: pure shift-multiply-accumulate.

        ``vals`` from :meth:`assemble` (any float dtype); ``u`` (N, 3).
        No gather: each offset term is a static slice of the zero-padded
        transposed ``u``; XLA fuses the 9*Dn multiply-adds into one
        streaming pass over the value planes.
        """
        p = self.plan
        dt = vals.dtype
        N = p.n_nodes
        ut = u.astype(dt).T                                  # (3, N)
        up = jnp.pad(ut, ((0, 0), (self._lo, self._hi)))
        acc = [None, None, None]
        for di, off in enumerate(p.offsets):
            s0 = self._lo + int(off)
            ush = up[:, s0:s0 + N]                           # (3, N)
            for c in range(3):
                for c2 in range(3):
                    term = vals[di, 3 * c + c2] * ush[c2]
                    acc[c] = term if acc[c] is None else acc[c] + term
        return jnp.stack(acc, axis=-1)                       # (N, 3)
