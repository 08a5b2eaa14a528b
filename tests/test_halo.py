"""Owned-node halo-exchange sharding (v2): correctness + comm-volume tests.

The VERDICT scalability criterion: the distributed stiffness action must
match the single-device operator at 1e-9 AND communicate O(interface) rows
per matvec (not O(n_nodes * D) like the replicated-psum v1 path).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import safeincave_tpu as sc
from safeincave_tpu.parallel import make_device_mesh
from safeincave_tpu.parallel.halo import HaloPlan, HaloMomentumSolver
from safeincave_tpu.fem.kernels import MomentumKernel


def _grid(nx=6):
    return sc.GridBox(nx=nx, ny=nx, nz=nx)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
class TestHaloMatvec:
    def test_matches_single_device(self):
        grid = _grid()
        mesh = make_device_mesh()
        D = mesh.devices.size
        solver = HaloMomentumSolver(grid, mesh)
        kern = MomentumKernel(grid)

        rng = np.random.default_rng(0)
        E, N = grid.n_elems, grid.n_nodes
        # SPD-ish random tangents + random vector + a Dirichlet mask
        A = rng.normal(size=(E, 6, 6))
        CT = jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + 6 * np.eye(6))
        u = jnp.asarray(rng.normal(size=(N, 3)))
        mask = jnp.asarray((rng.random((N, 3)) > 0.1).astype(float))

        ref = mask * kern.matvec(kern.prep(CT), mask * u)

        CT_l = solver.ct_to_local(CT)
        u_pad = solver.to_padded(u)
        mask_pad = solver.to_padded(mask)
        out = solver.from_padded(
            solver.matvec_padded(CT_l, u_pad, mask_pad))

        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-9, atol=1e-9 * scale)

    def test_comm_volume_is_interface_sized(self):
        grid = _grid(nx=8)
        plan = HaloPlan(grid, 8)
        N = grid.n_nodes
        # v1 psum ships ~N rows per device per matvec; the halo plan must
        # ship only part-boundary rows - for an 8-way RCB of a cube this is
        # a few surface layers, far below the volume
        per_dev = plan.comm_volume_per_matvec()
        assert per_dev < 0.35 * N, (per_dev, N)
        # every part's surface is much smaller than the whole mesh
        assert plan.interface_fraction() < 1.5, plan.interface_fraction()
        # sanity: ownership covers all nodes exactly once
        counts = np.bincount(plan.owner, minlength=plan.D)
        assert counts.sum() == N
        assert counts.max() <= plan.S

    def test_comm_is_neighbor_exchange_not_allgather(self):
        """VERDICT r03 item 5: per-device received volume must be the TRUE
        neighbor interface (PETSc ghost-update semantics,
        MomentumEquation.py:915-922), not O(D * max_send) as an all_gather
        delivers."""
        grid = _grid(nx=8)
        D = 8
        plan = HaloPlan(grid, D)
        # true received rows per device == its halo-node count
        conn = np.asarray(grid.conn)
        halos = []
        for d in range(D):
            elems_d = np.where(plan.elem_part == d)[0]
            nodes_d = np.unique(conn[elems_d])
            halos.append((plan.owner[nodes_d] != d).sum())
        np.testing.assert_array_equal(plan.recv_rows_true,
                                      np.asarray(halos))
        # an all_gather would deliver D * max_send rows to every device;
        # the padded ppermute volume must sit near the true interface,
        # far below that
        allgather_volume = D * plan.B
        assert plan.comm_volume_per_matvec() <= 0.6 * allgather_volume, (
            plan.comm_volume_per_matvec(), allgather_volume)
        # padding slack: within 2x of the true max interface
        assert plan.comm_volume_per_matvec() <= 2 * plan.comm_rows_true()
        # round count is bounded by the neighbor degree, not D
        assert plan.R <= 16, plan.R

    def test_partition_is_balanced(self):
        grid = _grid(nx=8)
        plan = HaloPlan(grid, 8)
        sizes = np.bincount(plan.elem_part, minlength=plan.D)
        assert sizes.min() >= 0.8 * sizes.max()


def _wire(grid):
    momBC = sc.MomentumBC
    eq = sc.LinearMomentum(grid, theta=0.5)
    eq.set_solver(sc.SolverSettings(method="bicgstab", rtol=1e-12,
                                    max_it=400))
    n = eq.n_elems
    one = jnp.ones(n)
    mat = sc.Material(n)
    mat.set_density(2000.0 * one)
    mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
    mat.add_to_non_elastic(sc.Viscoelastic(105e11 * one, 10e9 * one,
                                           0.32 * one))
    mat.add_to_non_elastic(sc.DislocationCreep(1.9e-20 * one, 51600 * one,
                                               3.0 * one))
    eq.set_material(mat)
    eq.set_T0(298.0 * one)
    eq.set_T(298.0 * one)
    eq.build_body_force([0.0, 0.0, 0.0])
    bc = momBC.BcHandler(eq)
    tv = [0.0, 1e9]
    names = grid.get_boundary_names()
    # both the box fixtures' UPPERCASE names and the reference cavern
    # meshes' Title-case names - without supports the system is singular
    # (pure Neumann), which the coarse-corrected preconditioner rightly
    # refuses to converge on
    for nm, comp in (("WEST", 0), ("SOUTH", 1), ("BOTTOM", 2),
                     ("West", 0), ("South", 1), ("Bottom", 2)):
        if nm in names:
            bc.add_boundary_condition(momBC.DirichletBC(nm, comp,
                                                        [0., 0.], tv))
    for nm in ("TOP", "Top"):
        if nm in names:
            bc.add_boundary_condition(momBC.NeumannBC(
                nm, 2, 0.0, 0.0, [10e6, 10e6], tv, g=0.0))
    eq.set_boundary_conditions(bc)
    return eq


def _msteps(eq, n=3, dt=3600.0):
    eq.bc.update_dirichlet(0.0)
    eq.bc.update_neumann(0.0)
    eq.solve_elastic_response()
    eps = eq.compute_total_strain()
    eq.compute_elastic_stress(eps)
    eq.compute_eps_ne_rate(eq.sig_v, 0.0)
    eq.update_eps_ne_rate_old()
    stats = eq.solve_time_steps([(k + 1) * dt for k in range(n)], [dt] * n,
                                tol=1e-8, maxiter=40)
    assert (stats[:, 5] > 0.5).all(), stats
    return np.asarray(eq.u), np.asarray(eq.sig_v)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
class TestHaloProductionSolver:
    """shard_equation(mode='halo'): the full fused multi-step program with
    the owner-sharded Krylov loop (VERDICT round-1 item 4)."""

    @pytest.mark.slow
    def test_fused_msteps_matches_single_device(self):
        from safeincave_tpu.parallel import shard_equation
        eq_ref = _wire(_grid(nx=4))
        u_ref, sv_ref = _msteps(eq_ref)

        eq_h = _wire(_grid(nx=4))
        n_orig = eq_h.n_elems
        shard_equation(eq_h, make_device_mesh(), mode="halo")
        assert eq_h._halo is not None
        u_h, sv_h = _msteps(eq_h)

        scale = np.abs(u_ref).max()
        np.testing.assert_allclose(u_h, u_ref, rtol=1e-9,
                                   atol=1e-9 * scale)
        np.testing.assert_allclose(sv_h[:n_orig], sv_ref, rtol=1e-8,
                                   atol=0.1)

    @pytest.mark.slow
    def test_cavern_msteps_matches_single_device(self):
        """cavern_600-class mesh over 8 virtual devices: the VERDICT 'Done'
        criterion (halo fused steps match single-device to 1e-9 with
        O(interface) comm per matvec)."""
        import os
        from safeincave_tpu.utils import find_grid
        from safeincave_tpu.parallel import shard_equation

        path = find_grid("cavern_regular_600_3D", fallback="cavern_proxy_600")
        g1 = sc.GridHandlerGMSH("geom", path)
        eq_ref = _wire(g1)
        u_ref, sv_ref = _msteps(eq_ref, n=2)

        g2 = sc.GridHandlerGMSH("geom", path)
        eq_h = _wire(g2)
        n_orig = eq_h.n_elems
        shard_equation(eq_h, make_device_mesh(), mode="halo")
        plan = eq_h._halo.plan
        # O(interface): each device ships a few boundary layers, not the mesh
        assert plan.comm_volume_per_matvec() < 0.35 * g2.n_nodes
        u_h, sv_h = _msteps(eq_h, n=2)

        scale = np.abs(u_ref).max()
        np.testing.assert_allclose(u_h, u_ref, rtol=1e-9,
                                   atol=1e-9 * scale)
        np.testing.assert_allclose(sv_h[:n_orig], sv_ref, rtol=1e-8,
                                   atol=0.1)
