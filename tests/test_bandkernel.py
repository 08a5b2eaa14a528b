"""Banded Pallas matvec vs the XLA MomentumKernel (interpret mode, CPU).

Interpret mode executes the exact kernel program (lane shuffles, roll-based
prefix sums, one-hot matmuls) with XLA semantics, so agreement here pins the
kernel math + static tables; Mosaic lowering is exercised separately on the
real TPU (bench.py).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from safeincave_tpu.fem.bandplan import BandPlan
from safeincave_tpu.fem.bandkernel import BandMatvec
from safeincave_tpu.fem.kernels import MomentumKernel
from safeincave_tpu.mesh.boxgen import GridBox
from safeincave_tpu.mesh.reorder import reordered_grid


def _setup(nx=5):
    g0 = GridBox(Lx=1.0, Ly=2.0, Lz=1.5, nx=nx, ny=nx, nz=nx)
    g, _, _ = reordered_grid(g0, method="band")
    plan = BandPlan.build(np.asarray(g.conn), g.n_nodes)
    return g, plan


@pytest.mark.parametrize("nx", [
    3, pytest.param(5, marks=pytest.mark.slow)])
def test_band_matvec_matches_xla(nx):
    g, plan = _setup(nx)
    kern = MomentumKernel(g)
    band = BandMatvec(plan, interpret=True)

    rng = np.random.default_rng(2)
    E = g.n_elems
    # random SPD-ish CT per element (symmetric, diagonally dominant)
    M = rng.normal(size=(E, 6, 6))
    CT = 0.5 * (M + np.transpose(M, (0, 2, 1))) + 8.0 * np.eye(6)
    u = rng.normal(size=(g.n_nodes, 3))

    CT_soa = jnp.asarray(np.transpose(CT, (1, 2, 0)).astype(np.float32))
    u32 = jnp.asarray(u.astype(np.float32))
    ref = np.asarray(kern.matvec(CT_soa, u32))

    ctv = band.pack_ct(CT_soa, jnp.asarray(g.volumes, jnp.float32))
    gn = band.pack_gn(jnp.asarray(g.grad_N, jnp.float32))
    got = np.asarray(band.matvec(ctv, gn, u32))

    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


def test_band_matvec_elastic_energy_symmetry():
    """u^T A v == v^T A u for the symmetrized operator."""
    g, plan = _setup(4)
    band = BandMatvec(plan, interpret=True)
    rng = np.random.default_rng(3)
    E = g.n_elems
    M = rng.normal(size=(E, 6, 6))
    CT = 0.5 * (M + np.transpose(M, (0, 2, 1))) + 8.0 * np.eye(6)
    # symmetrize in the energy sense: A is symmetric when CT has the
    # w=diag(1,1,1,2,2,2) Voigt symmetry CT = w^-1 CT^T w; build one such
    w = np.diag([1.0, 1, 1, 2, 2, 2])
    CT = 0.5 * (CT + np.linalg.inv(w) @ np.transpose(CT, (0, 2, 1)) @ w)
    CT_soa = jnp.asarray(np.transpose(CT, (1, 2, 0)).astype(np.float32))
    ctv = band.pack_ct(CT_soa, jnp.asarray(g.volumes, jnp.float32))
    gn = band.pack_gn(jnp.asarray(g.grad_N, jnp.float32))

    u = rng.normal(size=(g.n_nodes, 3)).astype(np.float32)
    v = rng.normal(size=(g.n_nodes, 3)).astype(np.float32)
    Au = np.asarray(band.matvec(ctv, gn, jnp.asarray(u)))
    Av = np.asarray(band.matvec(ctv, gn, jnp.asarray(v)))
    a = float((v * Au).sum())
    b = float((u * Av).sum())
    assert abs(a - b) < 1e-3 * max(abs(a), 1.0)


@pytest.mark.slow
def test_band_wired_solver_matches_default():
    """enable_band_matvec: the fused multi-step program with the Pallas
    band kernel as the f32 Krylov operator reproduces the default path
    (the f64 defect correction pins the converged solution)."""
    import safeincave_tpu as sc
    momBC = sc.MomentumBC

    g0 = GridBox(Lx=1.0, Ly=1.0, Lz=1.0, nx=4, ny=4, nz=4)
    g, _, _ = reordered_grid(g0, method="band")

    def build():
        eq = sc.LinearMomentum(g, theta=0.5)
        eq.set_solver(sc.SolverSettings(method="bicgstab", rtol=1e-12,
                                        max_it=300, fp32_phase=True))
        n = eq.n_elems
        one = jnp.ones(n)
        mat = sc.Material(n)
        mat.set_density(2000.0 * one)
        mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
        mat.add_to_non_elastic(sc.DislocationCreep(1.9e-20 * one,
                                                   51600 * one, 3.0 * one))
        eq.set_material(mat)
        eq.set_T0(298.0 * one)
        eq.set_T(298.0 * one)
        eq.build_body_force([0.0, 0.0, 0.0])
        bc = momBC.BcHandler(eq)
        tv = [0.0, 1e9]
        for nm, c in (("WEST", 0), ("SOUTH", 1), ("BOTTOM", 2)):
            bc.add_boundary_condition(momBC.DirichletBC(nm, c, [0., 0.], tv))
        bc.add_boundary_condition(momBC.NeumannBC("TOP", 2, 0.0, 0.0,
                                                  [10e6, 10e6], tv, g=0.0))
        eq.set_boundary_conditions(bc)
        return eq

    def run(eq):
        eq.bc.update_dirichlet(0.0)
        eq.bc.update_neumann(0.0)
        eq.solve_elastic_response()
        eps = eq.compute_total_strain()
        eq.compute_elastic_stress(eps)
        eq.compute_eps_ne_rate(eq.sig_v, 0.0)
        eq.update_eps_ne_rate_old()
        stats = eq.solve_time_steps([3600.0, 7200.0], [3600.0] * 2,
                                    tol=1e-8, maxiter=40)
        assert (stats[:, 5] > 0.5).all()
        return np.asarray(eq.u)

    u_ref = run(build())
    eq_b = build()
    eq_b.enable_band_matvec(interpret=True)
    u_b = run(eq_b)
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(u_b, u_ref, atol=1e-9 * scale)


def test_enable_band_rejects_unordered_grid():
    import pytest
    import safeincave_tpu as sc
    from safeincave_tpu.fem.kernels import MomentumKernel
    g = GridBox(nx=8, ny=8, nz=8)   # lexicographic ordering, not banded
    kern = MomentumKernel(g)
    try:
        kern.enable_band(interpret=True)
    except ValueError as e:
        assert "band-ordered" in str(e)
    else:
        # a structured box can be band-enough already; accept either
        assert kern.band is not None
