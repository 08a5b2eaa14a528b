"""Static scheduling tables for the banded Pallas matvec kernel.

The CG1 stiffness action is gather(u) -> element apply -> scatter(forces).
On TPU, XLA lowers the unstructured gather/scatter to per-row memory ops
(~7 ns/row, ~650 us for the 4E rows of a cavern-scale mesh), which round-trip
HBM between every stage.  Mosaic's only shuffle primitive
(``tpu.dynamic_gather``) moves data *within one vreg*: along lanes (pools of
128) or along sublanes (pools of 8).  This module turns the mesh connectivity
into a static schedule that expresses the whole matvec in exactly those
primitives plus small one-hot MXU matmuls:

* nodes are RCM-ordered (scipy ``reverse_cuthill_mckee``) so the node graph
  has bandwidth ``bw`` (~N^(2/3)); elements are sorted by their minimum node.
  Node n lives at 2D slot ``(n >> 7, n & 127)`` of an ``(Nr, 128)`` tile;
  element e at ``(e >> 7, e & 127)`` of ``(Er, 128)``.
* **gather**: all four nodes of the 128 elements in element-row ``s`` lie in
  node-rows ``[G0[s], G0[s] + Jg)`` with Jg = O(bw/128) (~11).  The kernel
  builds Jg pooled copies ``P_j = u2d[G0 + j]`` with one one-hot matmul
  (monotone row-gather) and selects each element's value with a per-lane
  ``dynamic_gather`` + j-mask.
* **scatter**: within an element-row, contributions that hit the same node
  are first reduced by a static lane-sort + lane prefix-sum (multiplicity
  would otherwise multiply the shuffle count); each element-row then owns at
  most one contribution per (node, a-slot), whose destination node-rows span
  ``[S0[s], S0[s] + Js)``.  A static lane-alignment shuffle puts values at
  their destination lane and a one-hot matmul accumulates rows into the
  nodal result.

``Er``/``Nr`` are padded to sublane-tile multiples (32 rows for the int8
index tables, 8 for f32) so every in-kernel row slice is tile-aligned.

Everything here is host-side numpy executed once per mesh; the tables are
validated by the numpy re-execution in gather_np/scatter_np - the exact op
sequence of the Pallas kernel - against naive scatter-add references
(tests/test_bandplan.py).

Replaces: reference SafeInCave's PETSc MatAIJ assembly + SpMV
(/root/reference/safeincave/MomentumEquation.py:1008-1025) - there the
sparsity is handled by PETSc's CSR; here it is compiled into a static
shuffle/matmul schedule.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

ER_ALIGN = 32      # int8 sublane tile
NR_ALIGN = 8       # f32 sublane tile


def _align(x, m):
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
    Jg: int                     # gather window rows
    Js: int                     # scatter window rows
    G0: np.ndarray              # (Er,)   first node-row per element-row
    gth_pool: np.ndarray        # (Jg*Er, Nr) f32 one-hot row-gather
    gth_j: np.ndarray           # (4*Er, 128) int32 pool index j
    gth_lane: np.ndarray        # (4*Er, 128) int32 lane in pool row
    red_sort: np.ndarray        # (4*Er, 128) int32 lane sort by dest node
    red_end: np.ndarray         # (4*Er, 128) f32 1.0 at run ends
    red_prev: np.ndarray        # (4*Er, 128) int32 prev run end lane, -1=none
    sct_lane: np.ndarray        # (4*Js*Er, 128) int32 source lane, -1=invalid
    sct_poolT: np.ndarray       # (4*Js*Nr, Er) f32 transposed accumulate
    #                             one-hots: f2d += sct_poolT[blk] @ V

    @staticmethod
    def build(conn: np.ndarray, n_nodes: int) -> "BandPlan":
        """conn must already be band-ordered (band_order applied)."""
        E = conn.shape[0]
        N = n_nodes
        Er = _align(-(-E // 128), ER_ALIGN)
        Nr = _align(-(-N // 128), NR_ALIGN)
        Ep = Er * 128

        conn_p = np.zeros((Ep, 4), np.int64)
        conn_p[:E] = conn
        valid_e = np.zeros(Ep, bool)
        valid_e[:E] = True

        nrow = conn_p >> 7                              # (Ep, 4)
        nlane = conn_p & 127

        # ---- gather tables ------------------------------------------------
        rows = nrow.reshape(Er, 128, 4)
        G0 = rows.reshape(Er, -1).min(axis=1)
        Jg = int((rows.reshape(Er, -1).max(axis=1) - G0).max()) + 1
        gth_j = (rows - G0[:, None, None]).astype(np.int32)   # (Er,128,4)
        gth_pool = np.zeros((Jg * Er, Nr), np.float32)
        for j in range(Jg):
            rsel = np.minimum(G0 + j, Nr - 1)
            gth_pool[j * Er + np.arange(Er), rsel] = 1.0
        gth_j = np.transpose(gth_j, (2, 0, 1)).reshape(4 * Er, 128)
        gth_lane = np.transpose(nlane.reshape(Er, 128, 4),
                                (2, 0, 1)).reshape(4 * Er, 128).astype(np.int32)

        # ---- scatter phase A: in-row reduction ---------------------------
        red_sort = np.zeros((4, Er, 128), np.int32)
        red_end = np.zeros((4, Er, 128), np.float32)
        red_prev = np.full((4, Er, 128), -1, np.int32)
        uniq = [[] for _ in range(4)]       # (erow, lane, dest_node)
        for a in range(4):
            dest = conn_p[:, a].reshape(Er, 128)
            dv = np.where(valid_e.reshape(Er, 128), dest, np.int64(1 << 40))
            for s in range(Er):
                order = np.argsort(dv[s], kind="stable")
                red_sort[a, s] = order
                ds = dv[s][order]
                is_end = np.empty(128, bool)
                is_end[:-1] = ds[:-1] != ds[1:]
                is_end[-1] = True
                ends = np.nonzero(is_end)[0]
                red_end[a, s, ends] = 1.0
                prev = np.concatenate([[-1], ends[:-1]])
                red_prev[a, s, ends] = prev
                for e_ in ends:
                    d = ds[e_]
                    if d < (1 << 40):
                        uniq[a].append((s, int(e_), int(d)))

        # ---- scatter phase B: row accumulate -----------------------------
        S0 = np.full(Er, 1 << 30, np.int64)
        Smax = np.zeros(Er, np.int64)
        for a in range(4):
            for (s, lane, d) in uniq[a]:
                S0[s] = min(S0[s], d >> 7)
                Smax[s] = max(Smax[s], d >> 7)
        S0 = np.where(S0 == 1 << 30, 0, S0)
        Js = int((Smax - S0).max()) + 1

        sct_lane = np.full((4, Js, Er, 128), -1, np.int32)
        sct_poolT = np.zeros((4 * Js * Nr, Er), np.float32)
        for a in range(4):
            for (s, lane, d) in uniq[a]:
                nu = (d >> 7) - S0[s]
                sct_lane[a, nu, s, d & 127] = lane
                sct_poolT[((a * Js) + nu) * Nr + (d >> 7), s] = 1.0
        return BandPlan(
            n_nodes=N, n_elems=E, Nr=Nr, Er=Er, Jg=Jg, Js=Js, G0=G0,
            gth_pool=gth_pool, gth_j=gth_j, gth_lane=gth_lane,
            red_sort=red_sort.reshape(4 * Er, 128),
            red_end=red_end.reshape(4 * Er, 128),
            red_prev=red_prev.reshape(4 * Er, 128),
            sct_lane=sct_lane.reshape(4 * Js * Er, 128),
            sct_poolT=sct_poolT)

    # ------------------------------------------------------------------ #
    # numpy re-execution of the kernel op sequence (correctness oracle)
    def gather_np(self, u2d: np.ndarray) -> np.ndarray:
        """u2d (Nr,128) -> (4, Er, 128) element-node values."""
        Er, Nr, Jg = self.Er, self.Nr, self.Jg
        pools = self.gth_pool @ u2d                       # (Jg*Er, 128)
        out = np.zeros((4, Er, 128), u2d.dtype)
        for a in range(4):
            gj = self.gth_j[a * Er:(a + 1) * Er]
            gl = self.gth_lane[a * Er:(a + 1) * Er]
            for j in range(Jg):
                g = np.take_along_axis(pools[j * Er:(j + 1) * Er], gl, axis=1)
                out[a] += np.where(gj == j, g, 0.0)
        return out

    def scatter_np(self, fe: np.ndarray) -> np.ndarray:
        """fe (4, Er, 128) contributions -> nodal (Nr, 128)."""
        Er, Nr, Js = self.Er, self.Nr, self.Js
        out = np.zeros((Nr, 128), fe.dtype)
        for a in range(4):
            rsort = self.red_sort[a * Er:(a + 1) * Er]
            rend = self.red_end[a * Er:(a + 1) * Er]
            rprev = self.red_prev[a * Er:(a + 1) * Er]
            v = np.take_along_axis(fe[a], rsort, axis=1)
            cs = np.cumsum(v, axis=1)
            prev = np.take_along_axis(cs, np.maximum(rprev, 0), axis=1)
            red = rend * (cs - (rprev >= 0) * prev)
            for nu in range(Js):
                blk = (a * Js) + nu
                sl = self.sct_lane[blk * Er:(blk + 1) * Er]
                g = np.take_along_axis(red, np.maximum(sl, 0), axis=1)
                V = g * (sl >= 0)
                out += self.sct_poolT[blk * Nr:(blk + 1) * Nr] @ V
        return out
