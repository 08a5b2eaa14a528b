"""End-to-end FEM tests: elastic patch tests, heat diffusion, inelastic step.

These validate the matrix-free solve chain against analytic solutions - the
acceptance style of reference solve_elastic_response
(/root/reference/safeincave/MomentumEquation.py:892-923) and the heat step
(HeatEquation.py:304-365).
"""
import numpy as np
import jax.numpy as jnp

import safeincave_tpu as sc

momBC = sc.MomentumBC
heatBC = sc.HeatBC

E_MOD = 102e9
NU = 0.3
P_LOAD = 10e6  # 10 MPa


def _make_elastic_cube(nx=3):
    grid = sc.GridBox(nx=nx, ny=nx, nz=nx)
    eq = sc.LinearMomentum(grid, theta=0.5)
    eq.set_solver(sc.SolverSettings(method="cg", rtol=1e-13, max_it=500))
    mat = sc.Material(eq.n_elems)
    mat.set_density(2000.0 * jnp.ones(eq.n_elems))
    spring = sc.Spring(E_MOD * jnp.ones(eq.n_elems), NU * jnp.ones(eq.n_elems))
    mat.add_to_elastic(spring)
    eq.set_material(mat)
    eq.build_body_force([0.0, 0.0, 0.0])
    return grid, eq


def _uniaxial_bcs(eq, t_final, p=P_LOAD):
    bc = momBC.BcHandler(eq)
    tv = [0.0, t_final]
    bc.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
    bc.add_boundary_condition(momBC.NeumannBC("TOP", 2, 0.0, 0.0,
                                              [p, p], tv, g=0.0))
    eq.set_boundary_conditions(bc)
    return bc


class TestElasticPatch:
    def test_uniaxial_compression(self):
        """TOP pressure p: sigma_zz = -p uniform, u_z = -p z / E,
        lateral expansion nu p / E."""
        grid, eq = _make_elastic_cube(nx=3)
        _uniaxial_bcs(eq, 1.0)
        eq.bc.update_dirichlet(0.0)
        eq.bc.update_neumann(0.0)
        eq.solve_elastic_response()
        eps = eq.compute_total_strain()
        sig = np.asarray(eq.compute_elastic_stress(eps))

        np.testing.assert_allclose(sig[:, 2], -P_LOAD, rtol=1e-8)
        np.testing.assert_allclose(sig[:, 0], 0.0, atol=P_LOAD * 1e-8)
        np.testing.assert_allclose(sig[:, 1], 0.0, atol=P_LOAD * 1e-8)
        np.testing.assert_allclose(sig[:, 3:], 0.0, atol=P_LOAD * 1e-8)

        u = np.asarray(eq.u)
        z = grid.points[:, 2]
        np.testing.assert_allclose(u[:, 2], -P_LOAD / E_MOD * z,
                                   rtol=1e-6, atol=1e-12)
        x = grid.points[:, 0]
        np.testing.assert_allclose(u[:, 0], NU * P_LOAD / E_MOD * x,
                                   rtol=1e-6, atol=1e-12)

    def test_pressure_invariants(self):
        grid, eq = _make_elastic_cube(nx=3)
        _uniaxial_bcs(eq, 1.0)
        eq.bc.update_dirichlet(0.0)
        eq.bc.update_neumann(0.0)
        eq.solve_elastic_response()
        eq.compute_elastic_stress(eq.compute_total_strain())
        eq.compute_p_elems()
        eq.compute_q_elems()
        eq.compute_p_nodes()
        eq.compute_q_nodes()
        np.testing.assert_allclose(np.asarray(eq.p_nodes), -P_LOAD / 3,
                                   rtol=1e-7)
        np.testing.assert_allclose(np.asarray(eq.q_elems), P_LOAD, rtol=1e-7)

    def test_hydrostatic_neumann_column(self):
        """Hydrostatic fluid column: traction = -(p + rho g (H - z)) n."""
        grid, eq = _make_elastic_cube(nx=2)
        bc = momBC.BcHandler(eq)
        tv = [0.0, 1.0]
        rho_f, g = 1000.0, -9.81
        bc.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
        bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
        bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
        bc.add_boundary_condition(momBC.NeumannBC("TOP", 2, rho_f, 1.0,
                                                  [P_LOAD, P_LOAD], tv, g=g))
        eq.set_boundary_conditions(bc)
        bc.update_neumann(0.0)
        fz = float(np.asarray(bc.b_neumann)[:, 2].sum())
        # on TOP (z = H = 1): value = -p + rho g (H - 1) = -p; area = 1
        np.testing.assert_allclose(fz, -P_LOAD, rtol=1e-10)


class TestDirichletTimeDependence:
    def test_prescribed_displacement(self):
        grid, eq = _make_elastic_cube(nx=2)
        bc = momBC.BcHandler(eq)
        tv = [0.0, 10.0]
        bc.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
        bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
        bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
        bc.add_boundary_condition(momBC.DirichletBC("TOP", 2, [0., -0.01], tv))
        eq.set_boundary_conditions(bc)
        bc.update_dirichlet(5.0)  # half-way: u_z(top) = -0.005
        bc.update_neumann(5.0)
        eq.solve_elastic_response()
        u = np.asarray(eq.u)
        top = grid.points[:, 2] > 1 - 1e-9
        np.testing.assert_allclose(u[top, 2], -0.005, rtol=1e-10)
        eps = np.asarray(eq.compute_total_strain())
        np.testing.assert_allclose(eps[:, 2], -0.005, rtol=1e-7)


class TestHeat:
    def _make(self, nx=3):
        grid = sc.GridBox(nx=nx, ny=nx, nz=nx)
        eq = sc.HeatDiffusion(grid)
        mat = sc.Material(eq.n_elems)
        mat.set_density(2000.0 * jnp.ones(eq.n_elems))
        mat.set_specific_heat_capacity(900.0 * jnp.ones(eq.n_elems))
        mat.set_thermal_conductivity(5.0 * jnp.ones(eq.n_elems))
        eq.set_material(mat)
        eq.set_solver(sc.SolverSettings(method="cg", rtol=1e-13, max_it=500))
        return grid, eq

    def test_steady_linear_profile(self):
        grid, eq = self._make(nx=3)
        bc = heatBC.BcHandler(eq)
        tv = [0.0, 1e12]
        bc.add_boundary_condition(heatBC.DirichletBC("BOTTOM", [300., 300.], tv))
        bc.add_boundary_condition(heatBC.DirichletBC("TOP", [320., 320.], tv))
        eq.set_boundary_conditions(bc)
        eq.set_initial_T(310.0 * jnp.ones(grid.n_nodes))
        # huge dt => essentially the steady state in one implicit step
        eq.solve(1.0, 1e15)
        T = np.asarray(eq.T)
        z = grid.points[:, 2]
        np.testing.assert_allclose(T, 300.0 + 20.0 * z, rtol=1e-8)
        # element projection = vertex mean
        T_e = np.asarray(eq.get_T_elems())
        np.testing.assert_allclose(T_e, 300.0 + 20.0 * grid.centroids[:, 2],
                                   rtol=1e-8)

    def test_robin_equilibrium(self):
        """With only Robin BCs at T_inf, steady state is T = T_inf."""
        grid, eq = self._make(nx=2)
        bc = heatBC.BcHandler(eq)
        tv = [0.0, 1e12]
        bc.add_boundary_condition(heatBC.RobinBC("TOP", [350., 350.], 25.0, tv))
        eq.set_boundary_conditions(bc)
        eq.set_initial_T(300.0 * jnp.ones(grid.n_nodes))
        eq.solve(1.0, 1e18)
        np.testing.assert_allclose(np.asarray(eq.T), 350.0, rtol=1e-6)

    def test_energy_conservation_neumann(self):
        """Insulated cube with constant influx q on TOP: mean T rises by
        q A dt / (rho cp V)."""
        grid, eq = self._make(nx=2)
        bc = heatBC.BcHandler(eq)
        tv = [0.0, 1e12]
        q_in = 100.0
        bc.add_boundary_condition(heatBC.NeumannBC("TOP", [q_in, q_in], tv))
        eq.set_boundary_conditions(bc)
        eq.set_initial_T(300.0 * jnp.ones(grid.n_nodes))
        dt = 1000.0
        eq.solve(1.0, dt)
        # volume-mean of P1 field via mass-weighted average
        kern = eq.kernel
        mean_T = float(np.asarray(kern.mass_apply(jnp.ones(eq.n_elems),
                                                  eq.T)).sum())
        expected = 300.0 + q_in * 1.0 * dt / (2000.0 * 900.0 * 1.0)
        np.testing.assert_allclose(mean_T, expected, rtol=1e-10)


class TestInelasticStep:
    def test_creep_relaxes_strain_under_constant_load(self):
        """Cube with dislocation creep under deviatoric load: total strain
        grows over time while stress stays at the applied load."""
        grid, eq = _make_elastic_cube(nx=2)
        # add creep to the existing material
        n = eq.n_elems
        creep = sc.DislocationCreep(1.9e-20 * jnp.ones(n), 51600 * jnp.ones(n),
                                    3.0 * jnp.ones(n))
        eq.mat.add_to_non_elastic(creep)
        eq.set_T0(298.0 * jnp.ones(n))
        eq.set_T(298.0 * jnp.ones(n))
        t_final = 10 * 3600.0
        _uniaxial_bcs(eq, t_final)
        tc = sc.TimeController(dt=1.0, initial_time=0.0, final_time=10.0,
                               time_unit="hour")
        sim = sc.Simulator_M(eq, tc, outputs=[], compute_elastic_response=True)
        eps_el = -P_LOAD / E_MOD
        sim.run()
        sig = np.asarray(eq.sig_v)
        np.testing.assert_allclose(sig[:, 2], -P_LOAD, rtol=1e-6)
        eps = np.asarray(eq.eps_tot_v)
        # creep strain accumulated beyond the elastic value
        assert eps[:, 2].max() < eps_el * 1.5  # grew more negative
        assert (eps[:, 2] < eps_el * 1.01).all()
        # uniform stress state => uniform creep
        np.testing.assert_allclose(eps[:, 2], eps[0, 2], rtol=1e-6)
