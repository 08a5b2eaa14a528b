"""Shared builders for the golden-field regression configs.

Three configs mirroring the reference's canonical examples (SURVEY.md 2.3):

* ``triaxial``  - confined cube, full 4-element constitutive model
  (elastic + Kelvin-Voigt + dislocation creep + Desai), the
  examples/mechanics/1_triaxial regime.
* ``cavern_box``- gravity + hydrostatic-column Neumann loading, the
  examples/mechanics/4_cavern regime on a box proxy.
* ``tm_cube``   - coupled thermo-mechanics with a heated face, the
  examples/thermomechanics/1_cube regime.

Used by generate_goldens.py (writes tests/golden/*.npz) and
test_golden_fields.py (asserts 1e-8-relative reproduction - the BASELINE.md
correctness acceptance turned into an executable check).
"""
import numpy as np
import jax.numpy as jnp

import safeincave_tpu as sc

momBC = sc.MomentumBC
heatBC = sc.HeatBC

MPa = 1e6
HOUR = 3600.0


def _material(n, desai=True, kv=True):
    one = jnp.ones(n)
    mat = sc.Material(n)
    mat.set_density(2200.0 * one)
    mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
    if kv:
        mat.add_to_non_elastic(sc.Viscoelastic(105e11 * one, 10e9 * one,
                                               0.32 * one))
    mat.add_to_non_elastic(sc.DislocationCreep(1.9e-20 * one, 51600 * one,
                                               3.0 * one))
    if desai:
        mat.add_to_non_elastic(sc.ViscoplasticDesai(
            mu_1=5.3665857009859815e-11 * one, N_1=3.1 * one,
            a_1=1.965018496922832e-05 * one, eta=0.8275682807874163 * one,
            n=3.0 * one, beta_1=0.0048 * one, beta=0.995 * one, m=-0.5 * one,
            gamma=0.095 * one, sigma_t=5.0 * one, alpha_0=0.0022 * one))
    return mat


def build_triaxial(nx=3):
    """Confined triaxial cube (reference examples/mechanics/1_triaxial)."""
    grid = sc.GridBox(nx=nx, ny=nx, nz=nx)
    eq = sc.LinearMomentum(grid, theta=0.5)
    eq.set_solver(sc.SolverSettings(method="bicgstab", rtol=1e-12,
                                    max_it=500))
    n = eq.n_elems
    eq.set_material(_material(n))
    eq.set_T0(298.0 * jnp.ones(n))
    eq.set_T(298.0 * jnp.ones(n))
    eq.build_body_force([0.0, 0.0, 0.0])

    bc = momBC.BcHandler(eq)
    tv = [0.0, 1e9]
    bc.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
    for name in ("EAST", "NORTH"):
        bc.add_boundary_condition(momBC.NeumannBC(name, 2, 0.0, 0.0,
                                                  [4 * MPa, 4 * MPa], tv,
                                                  g=0.0))
    bc.add_boundary_condition(momBC.NeumannBC("TOP", 2, 0.0, 0.0,
                                              [8 * MPa, 8 * MPa], tv, g=0.0))
    eq.set_boundary_conditions(bc)
    return eq


def build_cavern_box(nx=4):
    """Gravity + hydrostatic cavern-pressure column on a box proxy
    (reference examples/mechanics/4_cavern BC idiom,
    main.py:124-131,179-186)."""
    grid = sc.GridBox(Lx=100.0, Ly=100.0, Lz=200.0, nx=nx, ny=nx, nz=nx)
    eq = sc.LinearMomentum(grid, theta=0.5)
    eq.set_solver(sc.SolverSettings(method="bicgstab", rtol=1e-12,
                                    max_it=500))
    n = eq.n_elems
    eq.set_material(_material(n, desai=False))
    eq.set_T0(298.0 * jnp.ones(n))
    eq.set_T(298.0 * jnp.ones(n))
    eq.build_body_force([0.0, 0.0, -9.81])

    bc = momBC.BcHandler(eq)
    tv = [0.0, 1e9]
    bc.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("EAST", 0, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("NORTH", 1, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
    # hydrostatic column on TOP: p(t) + rho_fluid g (H - z)
    bc.add_boundary_condition(momBC.NeumannBC(
        "TOP", 2, density=800.0, ref_pos=200.0,
        values=[10 * MPa, 12 * MPa], time_values=tv, g=-9.81))
    eq.set_boundary_conditions(bc)
    return eq


def build_tm_cube(nx=3):
    """Coupled TM cube with a heated face
    (reference examples/thermomechanics/1_cube)."""
    grid = sc.GridBox(nx=nx, ny=nx, nz=nx)
    n = grid.n_elems
    one = jnp.ones(n)
    tv = [0.0, 1e9]

    eq_heat = sc.HeatDiffusion(grid)
    eq_heat.set_solver(sc.SolverSettings(method="cg", rtol=1e-12,
                                         max_it=500))
    mat = _material(n, desai=False)
    mat.set_specific_heat_capacity(850.0 * one)
    mat.set_thermal_conductivity(5.0 * one)
    mat.set_thermal_expansion(4.4e-5 * one)
    mat.add_to_thermoelastic(sc.Thermoelastic(4.4e-5 * one))
    eq_heat.set_material(mat)
    eq_heat.set_initial_T(298.0 * jnp.ones(grid.n_nodes))
    bc_h = heatBC.BcHandler(eq_heat)
    bc_h.add_boundary_condition(heatBC.DirichletBC("TOP", [330., 330.], tv))
    bc_h.add_boundary_condition(heatBC.RobinBC("BOTTOM", [298., 298.], 25.0,
                                               tv))
    eq_heat.set_boundary_conditions(bc_h)

    eq_mom = sc.LinearMomentum(grid, theta=0.5)
    eq_mom.set_solver(sc.SolverSettings(method="bicgstab", rtol=1e-12,
                                        max_it=500))
    eq_mom.set_material(mat)
    eq_mom.build_body_force([0.0, 0.0, 0.0])
    bc_m = momBC.BcHandler(eq_mom)
    bc_m.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
    bc_m.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
    bc_m.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
    bc_m.add_boundary_condition(momBC.NeumannBC("TOP", 2, 0.0, 0.0,
                                                [5 * MPa, 5 * MPa], tv,
                                                g=0.0))
    eq_mom.set_boundary_conditions(bc_m)
    return eq_mom, eq_heat


def build_interlayer_tm(n=5):
    """Heterogeneous multi-material cavern TM config (the reference
    nobian run_interlayer.py regime, :396-1109,1617-1680): dislocation
    creep in the salt (the reference's non-MD salt scenario), Mohr-Coulomb
    viscoplastic interlayers (MC fluidity zeroed on salt, creep prefactor
    zeroed on interlayers - the reference's own per-cell masking idiom),
    thermoelastic coupling, cyclic cavern pressure.  Mesh: the framework's
    own revolved-profile generator with two dipping interlayer bands
    (mesh/cavern_gen.py).

    Munson-Dawson salt is deliberately NOT used here: from a cold (zero
    zeta, non-equilibrated) state its transient-function linearization
    needs ~100 fixed-point iterations on the first TM step (measured), and
    the reference only ever runs MD after a mechanics-only equilibrium
    stage (run_interlayer.py warm-start idiom).  The MD+MC combination
    remains available through the same Material API."""
    from safeincave_tpu.mesh.cavern_gen import GridCavern, InterlayerBand

    grid = GridCavern(L=450.0, H=660.0, n=n,
                      interlayers=[InterlayerBand(250.0, 40.0, dip_deg=8.0),
                                   InterlayerBand(430.0, 35.0, dip_deg=-5.0)])
    n_el = grid.n_elems
    one = np.ones(n_el)
    regions = grid.get_subdomain_names()
    inter = np.asarray(grid.get_parameter(
        {r: (1.0 if r.startswith("Interlayer") else 0.0) for r in regions}))
    salt = 1.0 - inter

    eq_heat = sc.HeatDiffusion(grid)
    eq_heat.set_solver(sc.SolverSettings(method="cg", rtol=1e-12,
                                         max_it=500))
    mat = sc.Material(n_el)
    mat.set_density(2200.0 * salt + 2900.0 * inter)
    E = 102e9 * salt + 70e9 * inter
    nu = 0.30 * salt + 0.27 * inter
    mat.add_to_elastic(sc.Spring(E, nu))
    # salt dislocation creep, prefactor zeroed on interlayer cells (the
    # reference masks per-cell the same way, run_interlayer.py:1206-1241)
    mat.add_to_non_elastic(sc.DislocationCreep(
        1.9e-20 * salt, 51600 * one, 3.0 * one, name="ds_creep"))
    # Mohr-Coulomb viscoplastic interlayers (reference :1617-1660:
    # c=4 MPa, phi=35 deg, psi=0, sigma_t=1 MPa, mu_1=1e-9, N_1=1),
    # fluidity zeroed on salt cells
    mat.add_to_non_elastic(sc.MohrCoulombViscoplastic(
        mu_1=1e-9 * inter, N_1=1.0 * one, cohesion=4.0 * one,
        friction_angle=np.radians(35.0) * one,
        dilation_angle=0.0 * one, sigma_t=1.0 * one))
    mat.add_to_thermoelastic(sc.Thermoelastic(4.4e-5 * one))
    mat.set_specific_heat_capacity(850.0 * one)
    mat.set_thermal_conductivity(7.0 * one)
    eq_heat.set_material(mat)
    eq_heat.set_initial_T(298.0 * jnp.ones(grid.n_nodes))
    bc_h = heatBC.BcHandler(eq_heat)
    tv3 = [0.0, 12 * HOUR, 1e9]
    bc_h.add_boundary_condition(heatBC.DirichletBC("Top",
                                                   [298., 295., 295.], tv3))
    bc_h.add_boundary_condition(heatBC.RobinBC("Cavern",
                                               [298., 290., 290.], 5.0, tv3))
    eq_heat.set_boundary_conditions(bc_h)

    eq_mom = sc.LinearMomentum(grid, theta=0.5)
    eq_mom.set_solver(sc.SolverSettings(method="bicgstab", rtol=1e-12,
                                        max_it=500))
    eq_mom.set_material(mat)
    eq_mom.build_body_force([0.0, 0.0, 0.0])
    bc_m = momBC.BcHandler(eq_mom)
    tv = [0.0, 1e9]
    for nm, comp in (("West", 0), ("East", 0), ("South", 1), ("North", 1),
                     ("Bottom", 2)):
        bc_m.add_boundary_condition(momBC.DirichletBC(nm, comp,
                                                      [0., 0.], tv))
    # cyclic cavern gas pressure (24 h sinus, the operation-stage regime).
    # Overburden (15 MPa) stays above the cavern pressure band (8 +- 2 MPa)
    # so the stress state around the cavern remains compressive - the same
    # ordering every reference cavern example maintains (a cavern pressure
    # exceeding overburden puts the roof in tension, where the MC tension
    # cut-off flow direction flips every iteration and the fixed point
    # cannot settle).
    t_sched = list(np.arange(0.0, 80 * HOUR, HOUR))
    p_sched = list(8 * MPa + 2 * MPa
                   * np.sin(2 * np.pi * np.asarray(t_sched) / (24 * HOUR)))
    bc_m.add_boundary_condition(momBC.NeumannBC("Top", 2, 0.0, 0.0,
                                                [15 * MPa, 15 * MPa], tv,
                                                g=0.0))
    bc_m.add_boundary_condition(momBC.NeumannBC("Cavern", 2, 0.0, 0.0,
                                                p_sched, t_sched, g=0.0))
    eq_mom.set_boundary_conditions(bc_m)
    return eq_mom, eq_heat


def run_mechanics(eq, n_steps=3, dt=HOUR):
    """The Simulator_M inner loop, without outputs (golden trajectory)."""
    eq.bc.update_dirichlet(0.0)
    eq.bc.update_neumann(0.0)
    eq.solve_elastic_response()
    eps = eq.compute_total_strain()
    eq.compute_elastic_stress(eps)
    eq.compute_eps_ne_rate(eq.sig_v, 0.0)
    eq.update_eps_ne_rate_old()
    for k in range(n_steps):
        t = (k + 1) * dt
        ite, err = eq.solve_time_step(t, dt, tol=1e-8, maxiter=40)
        assert err <= 1e-8, f"step {k} did not converge: {err}"
        eq.update_internal_variables()
        eq.update_eps_ne_rate_old()
        eq.update_eps_ne_old(eq.sig_v, eq._last_sv_k, dt)
    return np.asarray(eq.u), np.asarray(eq.sig_v)


def run_tm(eq_mom, eq_heat, n_steps=3, dt=HOUR):
    """The Simulator_TM inner loop, without outputs."""
    T_elems = eq_heat.get_T_elems()
    eq_mom.set_T0(T_elems)
    eq_mom.bc.update_dirichlet(0.0)
    eq_mom.bc.update_neumann(0.0)
    eq_mom.solve_elastic_response()
    eps = eq_mom.compute_total_strain()
    eq_mom.compute_elastic_stress(eps)
    eq_mom.set_T(eq_heat.get_T_elems())
    eq_mom.set_T0(eq_heat.get_T_elems())
    eq_mom.compute_eps_ne_rate(eq_mom.sig_v, 0.0)
    eq_mom.update_eps_ne_rate_old()
    for k in range(n_steps):
        t = (k + 1) * dt
        eq_heat.solve(t, dt)
        eq_mom.set_T(eq_heat.get_T_elems())
        ite, err = eq_mom.solve_time_step(t, dt, tol=1e-6, maxiter=20)
        assert err <= 1e-6, f"TM step {k} did not converge: {err}"
        eq_mom.update_internal_variables()
        eq_mom.update_eps_ne_rate_old()
        eq_mom.update_eps_ne_old(eq_mom.sig_v, eq_mom._last_sv_k, dt)
    return (np.asarray(eq_mom.u), np.asarray(eq_mom.sig_v),
            np.asarray(eq_heat.T))


def compute_all():
    """All golden trajectories as a flat {name: array} dict."""
    out = {}
    u, sv = run_mechanics(build_triaxial())
    out["triaxial_u"], out["triaxial_sig"] = u, sv
    u, sv = run_mechanics(build_cavern_box())
    out["cavern_u"], out["cavern_sig"] = u, sv
    u, sv, T = run_tm(*build_tm_cube())
    out["tm_u"], out["tm_sig"], out["tm_T"] = u, sv, T
    u, sv, T = run_tm(*build_interlayer_tm())
    out["inter_u"], out["inter_sig"], out["inter_T"] = u, sv, T
    return out
