"""Owned-node domain decomposition with neighbor-only halo exchange.

Scaling v2 of the SPMD layer (see parallel/sharding.py for v1, which
replicates nodal vectors and psums full (n_nodes, 3) arrays every matvec).
Here the mesh is RCB-partitioned into spatially compact parts, nodes are
owned by the first part that touches them, and the distributed stiffness
action communicates **only part-boundary rows, only between geometric
neighbors** - the same point-to-point ghost-update semantics as the
reference's PETSc layer (MomentumEquation.py:915-922, ghost layers
Grid.py:282-283):

    forward:  the directed neighbor graph {owner -> borrower} is
              edge-colored into R rounds of ``lax.ppermute`` (R = max
              neighbor degree; RCB parts have bounded degree, so R stays
              ~6-10 at any device count).  Each round every device sends
              at most one neighbor the rows that neighbor borrows.
    element kernel: pure local gather -> dense -> local segment scatter;
    reverse:  the same rounds run with each permutation reversed, shipping
              halo partial sums back to their owners, which segment-add
              them into owned rows.

Per-matvec received volume per device is its true neighbor interface
(sum of borrowed-row counts, padded to the largest single neighbor
exchange) - NOT O(D * interface) as an all_gather would deliver - so the
asymptotic matches PETSc's VecGhost point-to-point updates at any device
count.  Krylov vectors live owner-sharded (one (S, 3) block per device);
dot products psum local partials, so no device touches global nodal
arrays inside the solve.

All exchange index tables are static numpy built once per (mesh, nparts) in
:class:`HaloPlan`; the device code is a single ``shard_map`` program whose
``ppermute`` rounds ride ICI.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..mesh.native import rcb_partition


class HaloPlan:
    """Static partition + exchange metadata for one (grid, nparts).

    Attributes (all numpy; D = nparts):
      elem_part (E,)        part of each element (RCB over centroids)
      owner (N,)            owning part of each node (first toucher in
                            part-major element order)
      node_perm (N,)        global node id -> padded slot d*S + local
      S                     owned-block size (max owned count, padded)
      E_loc                 per-device element count (padded)
      conn_local (D,E_loc,4)   element nodes as LOCAL ids (owned block
                               [0,S) then halo block [S, S+H))
      elem_pad (D,E_loc)    1.0 for real elements, 0.0 for padding
      send_idx (D,B)        local owned ids each device ships (pad: 0)
      halo_src (D,H)        flat index into the (D*B) gathered send rows
                            for each halo slot (pad: 0)
      halo_dst_count        reverse-exchange targets:
      rev_target (D,H)      for device d, the gathered halo slot (D*H flat)
                            -> local owned id it accumulates into (built
                            per OWNER device; pad -> S, a dump row)
    """

    def __init__(self, grid, nparts: int):
        conn = np.asarray(grid.conn)
        E, N = conn.shape[0], grid.n_nodes
        D = nparts
        parts, order = rcb_partition(grid.centroids, nparts)
        # elements grouped by part, padded to equal count
        elem_ids = [np.asarray(order)[parts[order] == d] for d in range(D)]
        self.E_loc = max(len(e) for e in elem_ids)

        # node ownership: first part (in part order) touching the node
        owner = np.full(N, -1, dtype=np.int64)
        for d in range(D):
            nodes_d = np.unique(conn[elem_ids[d]])
            fresh = nodes_d[owner[nodes_d] < 0]
            owner[fresh] = d
        assert (owner >= 0).all()
        self.owner = owner

        owned = [np.where(owner == d)[0] for d in range(D)]
        self.S = max(len(o) for o in owned)
        S = self.S
        # global -> (device, local) slot
        node_perm = np.zeros(N, dtype=np.int64)
        for d in range(D):
            node_perm[owned[d]] = d * S + np.arange(len(owned[d]))
        self.node_perm = node_perm
        self.n_nodes = N
        self.D = D
        self.elem_part = parts

        # halo sets: nodes referenced locally but owned elsewhere
        halos = []
        for d in range(D):
            nodes_d = np.unique(conn[elem_ids[d]])
            halos.append(nodes_d[owner[nodes_d] != d])
        self.H = max((len(h) for h in halos), default=0)
        H = max(self.H, 1)
        self.H = H

        # send sets: owned nodes that appear in someone else's halo
        send_sets = [[] for _ in range(D)]
        # (owner_dev, position in owner's send list) per (gid)
        send_pos = {}
        for d in range(D):
            for gid in halos[d]:
                o = owner[gid]
                if gid not in send_pos:
                    send_pos[gid] = (o, len(send_sets[o]))
                    send_sets[o].append(gid)
        self.B = max((len(s) for s in send_sets), default=0)
        B = max(self.B, 1)
        self.B = B

        send_idx = np.zeros((D, B), dtype=np.int64)
        for d in range(D):
            for i, gid in enumerate(send_sets[d]):
                send_idx[d, i] = node_perm[gid] - d * S   # local owned id
        self.send_idx = send_idx

        halo_local_id = []   # per device: gid -> local id (S + h)
        for d in range(D):
            table = {}
            for h, gid in enumerate(halos[d]):
                table[gid] = S + h
            halo_local_id.append(table)

        # ---- neighbor exchange rounds (ppermute edge coloring) ---------- #
        # directed pairs owner -> borrower with the rows each pair carries
        pairs = {}               # (o, d) -> list of (send_local_on_o, slot_h)
        for d in range(D):
            for h, gid in enumerate(halos[d]):
                o = owner[gid]
                pairs.setdefault((o, d), []).append(
                    (node_perm[gid] - o * S, h))
        # greedy edge coloring: per round each device sends to at most one
        # neighbor and receives from at most one (a partial permutation).
        # For a bipartite multigraph this needs exactly max-degree rounds
        # (Konig); the greedy below can exceed it slightly, which only adds
        # a round, never correctness issues.
        rounds = []              # list of {(o, d): rows}
        for (o, d), rows in sorted(pairs.items(),
                                   key=lambda kv: -len(kv[1])):
            for rd in rounds:
                if (not any(oo == o for (oo, _) in rd)
                        and not any(dd == d for (_, dd) in rd)):
                    rd[(o, d)] = rows
                    break
            else:
                rounds.append({(o, d): rows})
        self.R = R = len(rounds)

        # per-device round tables with PER-ROUND buffer sizes (the largest
        # pair in each round; descending-size greedy packing groups
        # similar-size pairs, so small neighbor exchanges are not padded up
        # to the single largest one).  pad values route to dump slots:
        #   pair_send pad = S   (one zero row appended to the owned block)
        #   pair_recv pad = H   (the halo dump slot)
        self.pair_send = []      # per round: (D, Bp_r) local owned ids
        self.pair_recv = []      # per round: (D, Bp_r) halo slots
        self.perms = []          # per round: list of (src, dst) device pairs
        self.round_sizes = []
        for rd in rounds:
            Bp_r = max(len(rows) for rows in rd.values())
            ps = np.full((D, Bp_r), S, dtype=np.int64)
            pr = np.full((D, Bp_r), H, dtype=np.int64)
            perm = []
            for (o, d), rows in sorted(rd.items()):
                perm.append((o, d))
                for i, (sid, h) in enumerate(rows):
                    ps[o, i] = sid
                    pr[d, i] = h
            self.pair_send.append(ps)
            self.pair_recv.append(pr)
            self.perms.append(perm)
            self.round_sizes.append(Bp_r)
        # true per-device neighbor interface (for diagnostics/tests)
        self.recv_rows_true = np.array(
            [sum(len(rows) for (o, dd), rows in pairs.items() if dd == d)
             for d in range(D)], dtype=np.int64)
        self.sent_rows_true = np.array(
            [sum(len(rows) for (oo, d2), rows in pairs.items() if oo == d)
             for d in range(D)], dtype=np.int64)
        self.recv_rows_padded = np.array(
            [sum(sz for rd, sz in zip(rounds, self.round_sizes)
                 for (o, dd) in rd if dd == d)
             for d in range(D)], dtype=np.int64)

        # local connectivity in local ids
        conn_local = np.zeros((D, self.E_loc, 4), dtype=np.int32)
        elem_pad = np.zeros((D, self.E_loc), dtype=np.float64)
        self.elem_gids = np.zeros((D, self.E_loc), dtype=np.int64)
        for d in range(D):
            tbl = halo_local_id[d]
            for k, e in enumerate(elem_ids[d]):
                for a in range(4):
                    gid = conn[e, a]
                    conn_local[d, k, a] = (node_perm[gid] - d * S
                                           if owner[gid] == d else tbl[gid])
                elem_pad[d, k] = 1.0
                self.elem_gids[d, k] = e
        self.conn_local = conn_local
        self.elem_pad = elem_pad

        # padded per-device geometry
        self.grad_N_local = np.zeros((D, self.E_loc, 4, 3))
        self.vol_local = np.zeros((D, self.E_loc))
        for d in range(D):
            n_e = len(elem_ids[d])
            self.grad_N_local[d, :n_e] = grid.grad_N[elem_ids[d]]
            self.vol_local[d, :n_e] = grid.volumes[elem_ids[d]]

    # -- diagnostics ------------------------------------------------------ #
    def comm_volume_per_matvec(self) -> int:
        """Rows RECEIVED per device per matvec (forward; the reverse pass
        moves the same rows back).  This is the padded wire volume of the
        ppermute rounds: true neighbor-interface rows rounded up to the
        largest single neighbor exchange - O(interface), independent of D,
        unlike an all_gather's O(D * interface)."""
        return int(self.recv_rows_padded.max(initial=0))

    def comm_rows_true(self) -> int:
        """True (unpadded) max neighbor-interface rows received per device."""
        return int(self.recv_rows_true.max(initial=0))

    def interface_fraction(self) -> float:
        """Communicated rows / total owned rows (smallness = scalability)."""
        return self.D * self.comm_volume_per_matvec() / float(self.n_nodes)


class HaloMomentumSolver:
    """Distributed masked stiffness action + Krylov vector ops over a mesh.

    Exposes ``matvec_padded`` operating on owner-sharded (D*S, 3) vectors
    and helpers to move between the global (n_nodes, 3) layout and the
    padded layout.  Used by the sharding tests as the scalable path; the
    element tangents CT are sharded per device in local element order.
    """

    def __init__(self, grid, mesh: Mesh, plan: HaloPlan | None = None,
                 axis: str = "e"):
        D = mesh.devices.size
        self.grid = grid
        self.plan = plan or HaloPlan(grid, D)
        plan = self.plan
        assert plan.D == D
        self.mesh = mesh
        self.axis = axis
        self.S = plan.S
        L = plan.S + plan.H + 1          # + dump row for reverse pads
        self.L = L

        spec_d = NamedSharding(mesh, P(axis))          # leading device axis
        put = lambda a, dt=None: jax.device_put(       # noqa: E731
            jnp.asarray(a, dtype=dt), spec_d)
        self.conn_local = put(plan.conn_local, jnp.int32)
        self.grad_N_local = put(plan.grad_N_local)
        self.vol_local = put(plan.vol_local * plan.elem_pad)
        # f32 twins for the mixed-precision Krylov path (f64 is software-
        # emulated on TPU; the inner iterations run f32)
        self.grad_N_local32 = self.grad_N_local.astype(jnp.float32)
        self.vol_local32 = self.vol_local.astype(jnp.float32)
        self.pair_send = tuple(put(a, jnp.int32) for a in plan.pair_send)
        self.pair_recv = tuple(put(a, jnp.int32) for a in plan.pair_recv)
        self.node_perm = jnp.asarray(plan.node_perm, dtype=jnp.int32)
        self.elem_gids_flat = jnp.asarray(plan.elem_gids.reshape(-1),
                                          dtype=jnp.int32)
        self.elem_pad_flat = jnp.asarray(plan.elem_pad.reshape(-1))

        ax = axis
        S, H = plan.S, plan.H
        R = plan.R
        perms = [list(p) for p in plan.perms]
        rev_perms = [[(d, o) for (o, d) in p] for p in perms]

        def _fwd_exchange(u_own, pair_send, pair_recv):
            """Neighbor rounds: borrow the halo rows from their owners.

            ``u_own`` is (S, 3) owned rows; returns (H + 1, 3) halo rows
            (+ dump slot).  Each round ships one padded neighbor buffer
            (per-round size Bp_r) via a partial-permutation ``ppermute``
            (devices without a pair this round send nothing / receive
            zeros)."""
            u_ext = jnp.concatenate(
                [u_own, jnp.zeros((1, 3), u_own.dtype)], axis=0)
            halo = jnp.zeros((H + 1, 3), u_own.dtype)
            for r in range(R):
                buf = u_ext[pair_send[r]]                    # (Bp_r, 3)
                rec = jax.lax.ppermute(buf, ax, perm=perms[r])
                halo = halo.at[pair_recv[r]].add(rec)
            return halo

        def _rev_exchange(f_halo, pair_send, pair_recv, dtype_shape):
            """Reverse rounds: ship halo partial sums back to their owners
            and accumulate into owned rows.  ``f_halo`` is (H + 1, ...)
            (with zero dump slot); returns (S, ...) owner accumulation."""
            back = jnp.zeros((S + 1,) + dtype_shape, f_halo.dtype)
            for r in range(R):
                buf = f_halo[pair_recv[r]]                   # (Bp_r, ...)
                rec = jax.lax.ppermute(buf, ax, perm=rev_perms[r])
                back = back.at[pair_send[r]].add(rec)
            return back[:S]

        def _matvec_local(CT, u_own, mask_own, conn, gradN, vol,
                          pair_send, pair_recv):
            # drop the leading device axis shard_map leaves on the blocks
            CT, u_own, mask_own = CT[0], u_own[0], mask_own[0]
            conn, gradN, vol = conn[0], gradN[0], vol[0]
            pair_send = tuple(a[0] for a in pair_send)
            pair_recv = tuple(a[0] for a in pair_recv)
            u_own = u_own * mask_own
            # forward halo exchange: neighbor-owned boundary rows only
            halo = _fwd_exchange(u_own, pair_send, pair_recv)
            u_loc = jnp.concatenate([u_own, halo], axis=0)    # dump = row S+H
            # local element kernel
            ue = u_loc[conn]                                  # (E_loc, 4, 3)
            grad_u = jnp.einsum("eai,eaj->eij", ue, gradN)
            eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
            ev = jnp.stack([eps[:, 0, 0], eps[:, 1, 1], eps[:, 2, 2],
                            eps[:, 0, 1], eps[:, 0, 2], eps[:, 1, 2]],
                           axis=-1)
            sv = jnp.einsum("eij,ej->ei", CT, ev)
            sig = jnp.zeros((ev.shape[0], 3, 3), dtype=ev.dtype)
            idx = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
            for k, (i, j) in enumerate(idx):
                sig = sig.at[:, i, j].set(sv[:, k])
                if i != j:
                    sig = sig.at[:, j, i].set(sv[:, k])
            fe = jnp.einsum("eij,eaj,e->eai", sig, gradN, vol)
            f_loc = jax.ops.segment_sum(fe.reshape(-1, 3),
                                        conn.reshape(-1),
                                        num_segments=S + H + 1)
            # reverse halo exchange: ship halo partials back to owners
            back = _rev_exchange(f_loc[S:], pair_send, pair_recv, (3,))
            f_own = (f_loc[:S] + back) * mask_own
            return f_own[None]

        self._matvec = shard_map(
            _matvec_local, mesh=mesh,
            in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax),
                      P(ax)),
            out_specs=P(ax))

        def _blockdiag_local(CT, conn, gradN, vol, pair_send, pair_recv):
            """Nodal 3x3 diagonal blocks of the stiffness, owner-assembled
            via the same reverse exchange as the matvec (the halo analog of
            ShardedMomentumKernel.block_diagonal's psum)."""
            CT, conn, gradN, vol = CT[0], conn[0], gradN[0], vol[0]
            pair_send = tuple(a[0] for a in pair_send)
            pair_recv = tuple(a[0] for a in pair_recv)
            E3 = jnp.eye(3, dtype=gradN.dtype)
            gi = gradN[:, :, None, :]
            ei = E3[None, None, :, :]
            xx = ei[..., 0] * gi[..., 0]
            yy = ei[..., 1] * gi[..., 1]
            zz = ei[..., 2] * gi[..., 2]
            xy = 0.5 * (ei[..., 0] * gi[..., 1] + ei[..., 1] * gi[..., 0])
            xz = 0.5 * (ei[..., 0] * gi[..., 2] + ei[..., 2] * gi[..., 0])
            yz = 0.5 * (ei[..., 1] * gi[..., 2] + ei[..., 2] * gi[..., 1])
            eps6 = jnp.stack([xx, yy, zz, xy, xz, yz], axis=-1)  # (E,4,3,6)
            sig6 = jnp.einsum("ekl,eajl->eajk", CT, eps6)
            w = jnp.asarray([1., 1., 1., 2., 2., 2.], dtype=gradN.dtype)
            blk = jnp.einsum("eajk,eaik,k,e->eaij", sig6, eps6, w, vol)
            d_loc = jax.ops.segment_sum(blk.reshape(-1, 3, 3),
                                        conn.reshape(-1),
                                        num_segments=S + H + 1)
            back = _rev_exchange(d_loc[S:], pair_send, pair_recv, (3, 3))
            return (d_loc[:S] + back)[None]

        self._blockdiag = shard_map(
            _blockdiag_local, mesh=mesh,
            in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax), P(ax)),
            out_specs=P(ax))

    # -- layout conversion (outside the Krylov loop) ----------------------- #
    def to_padded(self, v):
        """(n_nodes, 3) replicated -> (D*S, 3) owner-sharded layout."""
        out = jnp.zeros((self.plan.D * self.S, 3), dtype=v.dtype)
        return out.at[self.node_perm].set(v)

    def from_padded(self, vp):
        """(D*S, 3) -> (n_nodes, 3)."""
        return vp[self.node_perm]

    def matvec_padded(self, CT_local, u_pad, mask_pad):
        """Distributed A @ u on owner-sharded padded vectors.

        CT_local: (D, E_loc, 6, 6) per-device tangents (local elem order);
        u_pad / mask_pad: (D*S, 3) padded layout.
        """
        D, S = self.plan.D, self.S
        out = self._matvec(CT_local.reshape(D, -1, 6, 6),
                           u_pad.reshape(D, S, 3),
                           mask_pad.reshape(D, S, 3),
                           self.conn_local, self.grad_N_local,
                           self.vol_local, self.pair_send, self.pair_recv)
        return out.reshape(D * S, 3)

    def ct_to_local(self, CT):
        """Global (E, 6, 6) tangents -> per-device local element order."""
        gids = self.plan.elem_gids.reshape(-1)
        pad = jnp.asarray(self.plan.elem_pad.reshape(-1))
        CT_l = CT[jnp.asarray(gids)] * pad[:, None, None]
        D = self.plan.D
        return jax.device_put(CT_l.reshape(D, -1, 6, 6),
                              NamedSharding(self.mesh, P(self.axis)))

    def ct_to_local_traced(self, CT):
        """Traceable (jit-safe) variant of :meth:`ct_to_local`: one gather
        per linearization (NOT per matvec), resharded by shard_map."""
        pad = self.elem_pad_flat.astype(CT.dtype)
        CT_l = CT[self.elem_gids_flat] * pad[:, None, None]
        return CT_l.reshape(self.plan.D, -1, 6, 6)

    def _geom(self, dtype):
        if dtype == jnp.float32:
            return self.grad_N_local32, self.vol_local32
        return self.grad_N_local, self.vol_local

    def matvec_pad(self, CT_local, u_pad, mask_pad):
        """Dtype-polymorphic distributed A @ u (padded layout, masked
        operator semantics applied by the caller)."""
        D, S = self.plan.D, self.S
        gradN, vol = self._geom(u_pad.dtype)
        out = self._matvec(CT_local, u_pad.reshape(D, S, 3),
                           mask_pad.reshape(D, S, 3), self.conn_local,
                           gradN, vol, self.pair_send, self.pair_recv)
        return out.reshape(D * S, 3)

    def block_diagonal_padded(self, CT_local):
        """Owner-assembled nodal 3x3 stiffness blocks, (D*S, 3, 3)."""
        out = self._blockdiag(CT_local, self.conn_local, self.grad_N_local,
                              self.vol_local, self.pair_send, self.pair_recv)
        return out.reshape(self.plan.D * self.S, 3, 3)

    def pad_rows(self, v):
        """(n_nodes, ...) -> (D*S, ...) padded owner-major layout (traced)."""
        out = jnp.zeros((self.plan.D * self.S,) + v.shape[1:], dtype=v.dtype)
        return out.at[self.node_perm].set(v)


def make_halo_masked_solver(halo: HaloMomentumSolver, settings, apply_M,
                            zero_dirichlet: bool = False):
    """Halo-layout counterpart of fem.momentum._make_masked_solver.

    Same signature/contract - ``solve_lin(CT, b, mask, u_bc, x0, rtol, P)
    -> (x, iters, res, b_eff_norm)`` with CT in GLOBAL element order and nodal vectors
    in the replicated (n_nodes, 3) layout - but everything inside the Krylov
    loop runs owner-sharded: layout conversion happens ONCE per solve
    (4 gathers in, 1 out), each Krylov iteration communicates only
    O(interface) halo rows (reference PETSc ghost updates,
    MomentumEquation.py:915-922) plus scalar psums for the dot products
    (GSPMD lowers the vdots over owner-sharded vectors to local partials +
    all-reduce).  ``P`` holds padded block-Jacobi inverses.
    """
    from ..fem.solvers import ir_solve

    solve = settings.solve_fn()
    mixed = settings.precision == "mixed"

    def solve_lin(CT, b, mask, u_bc, x0, rtol, P):
        CT_l = halo.ct_to_local_traced(CT.astype(jnp.float64))
        bp = halo.to_padded(b)
        mp = halo.to_padded(mask)
        up = halo.to_padded(u_bc)
        x0p = halo.to_padded(x0)

        def Aop(x):
            return (mp * halo.matvec_pad(CT_l, mp * x, mp)
                    + (1.0 - mp) * x)

        def M_inv(r):
            return apply_M(P, r, mp)

        if zero_dirichlet:
            b_eff = mp * bp
        else:
            b_eff = (mp * (bp - halo.matvec_pad(CT_l, up, mp))
                     + (1.0 - mp) * up)
        b_eff_norm = jnp.sqrt(jnp.vdot(b_eff.reshape(-1),
                                       b_eff.reshape(-1)))
        if mixed:
            CT_l32 = halo.ct_to_local_traced(CT.astype(jnp.float32))
            mp32 = mp.astype(jnp.float32)

            def Aop32(x):
                return (mp32 * halo.matvec_pad(CT_l32, mp32 * x, mp32)
                        + (1.0 - mp32) * x)

            def M_inv32(r):
                return apply_M(P, r, mp32)

            x, k, res = ir_solve(Aop, Aop32, b_eff, x0p, M_inv32,
                                 inner_solve=solve, rtol=rtol,
                                 inner_rtol=settings.inner_rtol,
                                 inner_maxiter=settings.max_it,
                                 max_passes=settings.max_passes)
            need_f64 = res > rtol * b_eff_norm

            def f64_finish(_):
                x2, k2, res2 = solve(Aop, b_eff, x, M_inv, rtol=rtol,
                                     maxiter=settings.max_it)
                better = jnp.isfinite(res2) & (res2 < res)
                return (jnp.where(better, x2, x), k + k2,
                        jnp.where(better, res2, res))

            x, k, res = jax.lax.cond(need_f64, f64_finish,
                                     lambda _: (x, k, res), None)
        else:
            x, k, res = solve(Aop, b_eff, x0p, M_inv, rtol=rtol,
                              maxiter=settings.max_it)
        return halo.from_padded(x), k, res, b_eff_norm

    return solve_lin


def halo_block_jacobi(halo: HaloMomentumSolver, C, mask):
    """Padded block-Jacobi preconditioner (P, apply) for the halo solver.

    Blocks are owner-assembled with O(interface) exchange (the halo analog
    of the psum'd blocks in the replicated path), masked, and inverted
    locally.  ``apply`` expects padded residuals.
    """
    from ..linalg import inv3x3

    C_l = halo.ct_to_local(jnp.asarray(C, dtype=jnp.float64))
    blk = halo.block_diagonal_padded(C_l)
    mp = halo.to_padded(jnp.asarray(mask, dtype=jnp.float64))
    blk = blk * mp[:, :, None] * mp[:, None, :]
    # padded / Dirichlet rows: identity keeps the blocks invertible
    blk = blk + (1.0 - mp)[:, :, None] * jnp.eye(3)[None]
    diag_ok = jnp.abs(blk[:, 0, 0]) + jnp.abs(blk[:, 1, 1]) \
        + jnp.abs(blk[:, 2, 2]) > 0
    blk = jnp.where(diag_ok[:, None, None], blk, jnp.eye(3)[None])
    blk_inv = inv3x3(blk)

    def apply_bj(P, r, m):
        (inv,) = P
        inv_t = jnp.transpose(inv, (1, 2, 0)).astype(r.dtype)
        return (inv_t * r.T[None]).sum(1).T

    return (blk_inv,), apply_bj


def halo_two_level(halo: HaloMomentumSolver, C, mask, G: int = 16):
    """Two-level preconditioner for the halo solver: owner-local
    block-Jacobi smoother + a replicated dense coarse-space correction.

    Pure block-Jacobi iteration counts grow with mesh size and device count
    (no global information transfer per application - the weakness the
    reference covers with ASM/ILU, Simulators.py:1075-1086).  The coarse
    space here is the same aggregate construction as the unsharded 2level
    mode (fem/momentum._coarse_space): G consecutive global node ids per
    aggregate (band/Morton ordering makes them spatially compact), coarse
    matrix R A R^T assembled once per wiring from the elastic element
    stiffness, inverted densely in f32, and REPLICATED across devices -
    3*n_agg is tiny (~3 KB/aggregate-row), so the coarse apply costs one
    segment-sum (psum'd by GSPMD over the owner-sharded residual), one
    small replicated matvec, and one gather back to the padded layout.
    """
    from types import SimpleNamespace
    from ..fem.momentum import _coarse_space
    from ..mesh.native import morton_order

    grid = halo.grid
    (blk_inv,), _bj = halo_block_jacobi(halo, C, mask)

    # Spatially compact aggregates regardless of the mesh's node numbering:
    # Morton-sort the nodes and aggregate G consecutive SORTED ids.  (The
    # unsharded 2level mode aggregates consecutive raw ids because its
    # restriction is a pure reshape; here the restriction is already a
    # segment-sum over an arbitrary static table, so better aggregates are
    # free.  Scattered aggregates make R A R^T nearly singular.)
    node_morton = np.asarray(morton_order(np.asarray(grid.points)))
    agg_of_node = np.empty(grid.n_nodes, dtype=np.int64)
    agg_of_node[node_morton] = np.arange(grid.n_nodes, dtype=np.int64) // G

    kern_view = SimpleNamespace(
        n_nodes=grid.n_nodes,
        conn=jnp.asarray(np.asarray(grid.conn)),
        grad_N=jnp.asarray(np.asarray(grid.grad_N)),
        vol=jnp.asarray(np.asarray(grid.volumes)))
    mask_g = jnp.asarray(np.asarray(mask), dtype=jnp.float64)
    # C may arrive padded to the sharded element count (shard_equation pads
    # trailing elements); the coarse assembly runs on the real global mesh
    C_g = jnp.asarray(C)[:grid.n_elems]
    coarse_inv, n_agg, _ = _coarse_space(kern_view, C_g, mask_g, G,
                                         agg_of_node=agg_of_node)

    # padded row -> aggregate id (padding rows go to a dump slot n_agg)
    node_perm = np.asarray(halo.node_perm)
    DS = halo.plan.D * halo.S
    agg_pad = np.full(DS, n_agg, dtype=np.int32)
    agg_pad[node_perm] = agg_of_node
    agg_pad_j = jnp.asarray(agg_pad)
    agg_gather = jnp.asarray(np.minimum(agg_pad, n_agg - 1))

    def apply_2l(P, r, m):
        blk_inv, coarse_inv = P
        inv_t = jnp.transpose(blk_inv, (1, 2, 0)).astype(r.dtype)
        z = (inv_t * r.T[None]).sum(1).T
        rm = r * m     # padding rows carry m = 0, so the dump slot is inert
        rc = jax.ops.segment_sum(rm, agg_pad_j,
                                 num_segments=n_agg + 1)[:n_agg]
        zc = (coarse_inv @ rc.reshape(-1).astype(jnp.float32)).reshape(
            n_agg, 3)
        zf = zc[agg_gather].astype(r.dtype)
        return z + zf * m

    return (blk_inv, coarse_inv), apply_2l
