"""Static scheduling tables for the banded Pallas matvec kernel.

The CG1 stiffness action is gather(u) -> element apply -> scatter(forces).
On TPU, XLA lowers the unstructured gather/scatter to per-row memory ops
(~30 ns/row, ~650 us for the 4E rows of a cavern-scale mesh).  Mosaic's only
shuffle primitive (``tpu.dynamic_gather``) moves data *within one vreg* along
lanes (pools of 128), and one-hot MXU matmuls measure ~0.1 us per output row
on this part - so the kernel must be built from lane shuffles and *static row
slices* only.  This module turns the mesh connectivity into that schedule:

* nodes are RCM-ordered (scipy ``reverse_cuthill_mckee``) so the node graph
  has bandwidth ~N^(2/3); elements are sorted by their minimum node.  Node n
  lives at 2D slot ``(n >> 7, n & 127)`` of an ``(Nr, 128)`` tile; element e
  at ``(e >> 7, e & 127)`` of ``(Er, 128)``.
* Because both orders follow the same band, the node-row window of element
  row ``s`` tracks the line ``b[s] = s // q`` with ``q = Er/Nr`` (~4 for
  tets) up to a small drift: ``nrow = b[s] + k0g + k`` with ``k`` in
  ``[0, Wg)``, Wg ~ 13-17 at cavern scale.
* **gather**: build ``R[t] = u2d[(t - pad0g) // q]`` (an XLA repeat + pad,
  done outside the kernel).  Then the pooled copy for offset ``k`` is the
  *static row slice* ``R[q*k + s]`` - no matmul.  Slices must start at
  multiples of 8 (f32 sublane tiles), so one shifted copy of R is passed per
  residue ``(q*k) % 8`` (2 copies for q=4).  A per-lane ``dynamic_gather``
  + k-mask selects each element's value.
* **scatter**: within an element-row, contributions hitting the same node
  are first reduced by a static lane-sort + lane prefix-sum; run totals are
  then lane-aligned to their destination lane (one shuffle per (a, k''))
  and accumulated into *shifted slab accumulators*: the contribution of
  element-row ``s`` destined to node-row ``b[s] + k0s + k''`` lands at slab
  row ``s + q*k''`` (again a static, 8-aligned slice per residue).  The
  final ``f2d[r] = sum over q consecutive slab rows`` is an XLA
  reshape-sum outside the kernel.

Everything here is host-side numpy executed once per mesh; gather_np /
scatter_np re-execute the exact kernel + XLA op sequence and are pinned
against naive scatter-add references in tests/test_bandplan.py.

Replaces: reference SafeInCave's PETSc MatAIJ assembly + SpMV
(/root/reference/safeincave/MomentumEquation.py:1008-1025) - there the
sparsity is handled by PETSc's CSR; here it is compiled into a static
shuffle/slice schedule.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

ALIGN = 8          # f32/int32 sublane tile


def _align(x, m=ALIGN):
    return -(-x // m) * m


def band_order(conn: np.ndarray, n_nodes: int):
    """RCM node permutation + min-node element order.

    Returns (node_perm, elem_order) where ``node_perm[new] = old`` and
    ``elem_order[new] = old``.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    r = np.repeat(conn, conn.shape[1], axis=1).reshape(-1)
    c = np.tile(conn, (1, conn.shape[1])).reshape(-1)
    A = coo_matrix((np.ones_like(r, dtype=np.int8), (r, c)),
                   shape=(n_nodes, n_nodes)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    inv = np.empty(n_nodes, np.int64)
    inv[perm] = np.arange(n_nodes)
    conn_new = inv[conn]
    elem_order = np.argsort(conn_new.min(axis=1), kind="stable")
    return perm, elem_order


@dataclass
class BandPlan:
    """Static tables for one mesh (all arrays concrete numpy)."""
    n_nodes: int
    n_elems: int
    Nr: int                     # node rows (aligned)
    Er: int                     # element rows (aligned)
    q: int                      # element rows per node row (repeat factor)
    Wg: int                     # gather window (slices)
    Ws: int                     # scatter window (slabs)
    k0g: int                    # gather window base offset
    k0s: int                    # scatter window base offset
    Lg: int                     # rows per gather R copy (aligned)
    Ls: int                     # rows per scatter slab block (aligned)
    g_res: list                 # residues (q*k) % 8 used by gather slices
    s_res: list                 # residues (q*k'') % 8 used by scatter slabs
    gk: np.ndarray              # (4*Er, 128) int32 gather slice index k
    gl: np.ndarray              # (4*Er, 128) int32 lane in slice row
    red_sort: np.ndarray        # (4*Er, 128) int32 lane sort by dest node
    red_prev: np.ndarray        # (4*Er, 128) int32 prev run end lane, -1=none
    sal: np.ndarray             # (4*Ws*Er, 128) int32 source lane, -1=invalid

    # -- derived static offsets ---------------------------------------- #
    @property
    def pad0g(self):            # front padding of the gather R array
        return -self.q * self.k0g

    @property
    def pad0s(self):            # front offset of the scatter compress
        return -self.q * self.k0s

    def g_slice(self, k):
        """(copy_index, row_offset_in_copy) for gather slice k."""
        off = self.q * k
        p = off % 8
        return self.g_res.index(p), off - p

    def s_slab(self, k2):
        """(block_index, row_offset_in_block) for scatter offset k''."""
        off = self.q * k2
        p = off % 8
        return self.s_res.index(p), off - p

    @staticmethod
    def build(conn: np.ndarray, n_nodes: int) -> "BandPlan":
        """conn must already be band-ordered (band_order applied)."""
        E = conn.shape[0]
        N = n_nodes
        Er = _align(-(-E // 128))
        Nr = _align(-(-N // 128))
        Ep = Er * 128
        q = max(1, int(round(Er / Nr)))

        # Padding lanes borrow the LAST real element's connectivity: their
        # CT/vol/grad_N are zero-padded so they contribute exact zeros, and
        # borrowing keeps the per-row node windows local (conn=0 padding
        # would drag every tail row's window back to node-row 0).
        conn_p = np.empty((Ep, 4), np.int64)
        conn_p[:E] = conn
        conn_p[E:] = conn[E - 1]

        nrow = conn_p >> 7                              # (Ep, 4)
        nlane = conn_p & 127
        b = np.arange(Er) // q                          # (Er,)

        # ---- gather tables ------------------------------------------------
        rows = nrow.reshape(Er, 128, 4)
        kdrift = rows - b[:, None, None]                # nrow - s//q
        k0g = int(kdrift.min())
        Wg = int(kdrift.max()) - k0g + 1
        gk = (kdrift - k0g).astype(np.int32)            # in [0, Wg)
        gk = np.transpose(gk, (2, 0, 1)).reshape(4 * Er, 128)
        gl = np.transpose(nlane.reshape(Er, 128, 4),
                          (2, 0, 1)).reshape(4 * Er, 128).astype(np.int32)
        g_res = sorted({(q * k) % 8 for k in range(Wg)})
        Lg = _align(q * (Wg - 1) + Er)

        # ---- scatter phase A: in-row reduction ---------------------------
        red_sort = np.zeros((4, Er, 128), np.int32)
        red_prev = np.full((4, Er, 128), -1, np.int32)
        uniq = [[] for _ in range(4)]       # (erow, run_end_lane, dest_node)
        for a in range(4):
            dv = conn_p[:, a].reshape(Er, 128)
            for s in range(Er):
                order = np.argsort(dv[s], kind="stable")
                red_sort[a, s] = order
                ds = dv[s][order]
                is_end = np.empty(128, bool)
                is_end[:-1] = ds[:-1] != ds[1:]
                is_end[-1] = True
                ends = np.nonzero(is_end)[0]
                prev = np.concatenate([[-1], ends[:-1]])
                red_prev[a, s, ends] = prev
                for e_ in ends:
                    uniq[a].append((s, int(e_), int(ds[e_])))

        # ---- scatter phase B: slab alignment -----------------------------
        k0s, k1s = 1 << 30, -(1 << 30)
        for a in range(4):
            for (s, lane, d) in uniq[a]:
                k2 = (d >> 7) - b[s]
                k0s = min(k0s, k2)
                k1s = max(k1s, k2)
        Ws = k1s - k0s + 1
        sal = np.full((4, Ws, Er, 128), -1, np.int32)
        for a in range(4):
            for (s, lane, d) in uniq[a]:
                k2 = (d >> 7) - b[s] - k0s
                sal[a, k2, s, d & 127] = lane
        s_res = sorted({(q * k) % 8 for k in range(Ws)})
        Ls = _align(q * (Ws - 1) + Er)

        return BandPlan(
            n_nodes=N, n_elems=E, Nr=Nr, Er=Er, q=q,
            Wg=Wg, Ws=Ws, k0g=k0g, k0s=k0s, Lg=Lg, Ls=Ls,
            g_res=g_res, s_res=s_res,
            gk=gk, gl=gl,
            red_sort=red_sort.reshape(4 * Er, 128),
            red_prev=red_prev.reshape(4 * Er, 128),
            sal=sal.reshape(4 * Ws * Er, 128))

    # ------------------------------------------------------------------ #
    # numpy re-execution of the kernel + XLA op sequence (correctness
    # oracle for the static tables)
    def build_R(self, u2d: np.ndarray) -> np.ndarray:
        """XLA-side prep: (Nr, 128) -> stacked gather copies
        (len(g_res)*Lg, 128): copy i is R_pad[g_res[i] : g_res[i]+Lg]
        with R_pad[t] = u2d[(t - pad0g) // q] (clamped)."""
        Nr, q, Lg = self.Nr, self.q, self.Lg
        t = np.arange(7 + Lg)
        src = np.clip((t - self.pad0g) // q, 0, Nr - 1)
        R_pad = u2d[src]
        return np.concatenate([R_pad[p:p + Lg] for p in self.g_res], axis=0)

    def gather_np(self, RS: np.ndarray) -> np.ndarray:
        """Kernel gather: stacked copies -> (4, Er, 128) element values."""
        Er, Lg, Wg = self.Er, self.Lg, self.Wg
        out = np.zeros((4, Er, 128), RS.dtype)
        for a in range(4):
            gk = self.gk[a * Er:(a + 1) * Er]
            gl = self.gl[a * Er:(a + 1) * Er]
            for k in range(Wg):
                ci, off = self.g_slice(k)
                sl = RS[ci * Lg + off: ci * Lg + off + Er]
                g = np.take_along_axis(sl, gl, axis=1)
                out[a] += np.where(gk == k, g, 0.0)
        return out

    def scatter_np(self, fe: np.ndarray) -> np.ndarray:
        """Kernel reduce+slab (fe (4, Er, 128)) then XLA compress
        -> nodal (Nr, 128)."""
        Er, Nr, Ws, Ls, q = self.Er, self.Nr, self.Ws, self.Ls, self.q
        blocks = np.zeros((len(self.s_res), Ls, 128), fe.dtype)
        for a in range(4):
            rsort = self.red_sort[a * Er:(a + 1) * Er]
            rprev = self.red_prev[a * Er:(a + 1) * Er]
            v = np.take_along_axis(fe[a], rsort, axis=1)
            cs = np.cumsum(v, axis=1)
            prev = np.take_along_axis(cs, np.maximum(rprev, 0), axis=1)
            red = cs - (rprev >= 0) * prev     # valid only at run-end lanes
            for k2 in range(Ws):
                sl = self.sal[(a * Ws + k2) * Er:(a * Ws + k2 + 1) * Er]
                g = np.take_along_axis(red, np.maximum(sl, 0), axis=1)
                bi, off = self.s_slab(k2)
                blocks[bi, off:off + Er] += g * (sl >= 0)
        # ---- XLA-side compress ----
        A_full = np.zeros((7 + Ls, 128), fe.dtype)
        for bi, p in enumerate(self.s_res):
            A_full[p:p + Ls] += blocks[bi]
        lead = max(0, -self.pad0s)          # k0s > 0: body starts pre-array
        if lead:
            A_full = np.concatenate(
                [np.zeros((lead, 128), fe.dtype), A_full])
        need = lead + self.pad0s + q * Nr
        if A_full.shape[0] < need:
            A_full = np.concatenate(
                [A_full, np.zeros((need - A_full.shape[0], 128), fe.dtype)])
        body = A_full[lead + self.pad0s:need]
        return body.reshape(Nr, q, 128).sum(axis=1)
