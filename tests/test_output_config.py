"""Output / post-processing / JSON-config / material-point tests."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import safeincave_tpu as sc
from safeincave_tpu.mesh import box_mesh, write_msh
from safeincave_tpu import postproc

momBC = sc.MomentumBC


def _small_sim(tmp_path, n_steps=2):
    grid = sc.GridBox(nx=2, ny=2, nz=2)
    eq = sc.LinearMomentum(grid, theta=0.5)
    eq.set_solver(sc.SolverSettings(method="cg", rtol=1e-12, max_it=300))
    n = eq.n_elems
    mat = sc.Material(n)
    mat.set_density(2000.0 * jnp.ones(n))
    mat.add_to_elastic(sc.Spring(102e9 * jnp.ones(n), 0.3 * jnp.ones(n)))
    mat.add_to_non_elastic(sc.DislocationCreep(
        1.9e-20 * jnp.ones(n), 51600 * jnp.ones(n), 3.0 * jnp.ones(n)))
    eq.set_material(mat)
    eq.set_T0(298.0 * jnp.ones(n))
    eq.set_T(298.0 * jnp.ones(n))
    eq.build_body_force([0.0, 0.0, 0.0])
    bc = momBC.BcHandler(eq)
    tv = [0.0, 1e9]
    bc.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
    bc.add_boundary_condition(momBC.NeumannBC("TOP", 2, 0.0, 0.0,
                                              [10e6, 10e6], tv, g=0.0))
    eq.set_boundary_conditions(bc)

    out = sc.SaveFields(eq)
    out.set_output_folder(str(tmp_path / "case"))
    out.add_output_field("u", "Displacement (m)")
    out.add_output_field("p_elems", "Mean Stress (Pa)")
    out.add_output_field("sig", "Stress (Pa)")
    tc = sc.TimeController(dt=1.0, initial_time=0.0, final_time=float(n_steps),
                           time_unit="hour")
    sim = sc.Simulator_M(eq, tc, [out], compute_elastic_response=True)
    sim.run()
    return grid, eq, str(tmp_path / "case")


class TestXdmfOutput:
    def test_write_and_read_back(self, tmp_path):
        grid, eq, folder = _small_sim(tmp_path)
        # displacement: nodal vector, n_steps+1 saves
        t, u, points, topo = postproc.read_timeseries(folder, "u")
        assert u.shape == (3, grid.n_nodes, 3)
        np.testing.assert_allclose(points, grid.points)
        np.testing.assert_allclose(t, [0.0, 3600.0, 7200.0])
        np.testing.assert_allclose(u[-1], np.asarray(eq.u), atol=1e-18)
        # cell scalar + tensor
        t2, p = postproc.read_cell_scalar(folder, "p_elems")
        assert p.shape == (3, grid.n_elems)
        t3, sig = postproc.read_cell_tensor(folder, "sig")
        assert sig.shape == (3, grid.n_elems, 3, 3)
        np.testing.assert_allclose(sig[-1, :, 2, 2], -10e6, rtol=1e-6)
        # xdmf xml exists and log written
        assert os.path.isfile(os.path.join(folder, "u", "u.xdmf"))
        assert os.path.isfile(os.path.join(folder, "log.txt"))

    def test_probe_helpers(self, tmp_path):
        grid, eq, folder = _small_sim(tmp_path)
        t, series = postproc.probe_node_series(folder, "u", [0.5, 0.5, 1.0])
        assert series.shape == (3, 3)
        t, p_series = postproc.probe_cell_series(folder, "p_elems",
                                                 [0.5, 0.5, 0.5])
        np.testing.assert_allclose(p_series[-1], -10e6 / 3, rtol=1e-6)


class TestMshRoundtrip:
    def test_write_read(self, tmp_path):
        args = box_mesh(nx=2, ny=2, nz=3)
        path = str(tmp_path / "geom.msh")
        write_msh(path, *args)
        g = sc.GridHandlerGMSH("geom", str(tmp_path))
        assert g.n_nodes == args[0].shape[0]
        assert g.n_elems == args[1].shape[0]
        assert set(g.get_boundary_names()) == {"WEST", "EAST", "SOUTH",
                                               "NORTH", "BOTTOM", "TOP"}
        np.testing.assert_allclose(g.points, args[0])


class TestJsonDriver:
    def test_two_stage_run(self, tmp_path):
        # write a box mesh as a gmsh fixture
        grid_dir = tmp_path / "grid"
        grid_dir.mkdir()
        write_msh(str(grid_dir / "geom.msh"), *box_mesh(nx=2, ny=2, nz=2))
        out_dir = tmp_path / "out"
        hourv = 3600.0
        cfg = {
            "output": {"path": str(out_dir)},
            "grid": {"path": str(grid_dir), "name": "geom"},
            "time_settings": {"theta": 0.5,
                              "time_list": [0.0, 2 * hourv, 4 * hourv]},
            "body_force": {"direction": 2, "gravity": -9.81,
                           "density": 2200.0},
            "constitutive_model": {
                "elastic": {"spring": {"parameters": {"E": 102e9, "nu": 0.3}}},
                "nonelastic": {
                    "creep": {"type": "DislocationCreep", "active": True,
                              "equilibrium": True,
                              "parameters": {"A": 1.9e-20, "Q": 51600,
                                             "n": 3.0, "T": 298.0}},
                },
            },
            "solver_settings": {"type": "KrylovSolver", "method": "cg",
                                "preconditioner": "jacobi",
                                "relative_tolerance": 1e-12},
            "simulation_settings": {
                "equilibrium": {"active": True, "dt_max": hourv,
                                "ite_max": 2},
                "operation": {"dt_max": hourv, "hardening": False},
            },
            "boundary_conditions": {
                "WEST": {"type": "dirichlet", "component": 0,
                         "values": [0.0, 0.0, 0.0]},
                "SOUTH": {"type": "dirichlet", "component": 1,
                          "values": [0.0, 0.0, 0.0]},
                "BOTTOM": {"type": "dirichlet", "component": 2,
                           "values": [0.0, 0.0, 0.0]},
                "TOP": {"type": "neumann", "direction": 2, "density": 0.0,
                        "reference_position": 0.0,
                        "values": [8e6, 10e6, 8e6]},
            },
        }
        sim = sc.Simulator_GUI(cfg)
        sim.run()
        # both stages wrote outputs
        for stage in ("equilibrium", "operation"):
            t, u, _, _ = postproc.read_timeseries(
                str(out_dir / stage), "u")
            assert u.shape[0] >= 2
            assert np.isfinite(u).all()


class TestMaterialPoint:
    def test_creep_accumulation_matches_analytic(self):
        n = 1
        one = jnp.ones(n)
        mat = sc.Material(n)
        mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
        mat.add_to_non_elastic(sc.DislocationCreep(1.9e-20 * one,
                                                   51600 * one, 3.0 * one))
        mps = sc.MaterialPointSimulator(mat, theta=0.5)
        sig = np.zeros((1, 3, 3))
        sig[0, 2, 2] = -10e6
        times = np.linspace(0, 10 * 3600, 11)
        hist = np.broadcast_to(sig, (11, 3, 3))
        res = mps.run(hist, times)
        # constant stress: eps_ne(t) = rate * t (theta-scheme is exact here)
        q = 10e6
        A_bar = 1.9e-20 * np.exp(-51600 / 8.32 / 298.0) * q ** 2
        dev_zz = -10e6 - (-10e6 / 3)
        expected_zz = A_bar * dev_zz * times[-1]
        np.testing.assert_allclose(res["eps_ne"][-1, 0, 2, 2], expected_zz,
                                   rtol=1e-6)
        # total = elastic + creep
        np.testing.assert_allclose(
            res["eps_total"][-1, 0, 2, 2],
            expected_zz + (-10e6 / 102e9), rtol=1e-6)

    def test_calibrate_recovers_creep_amplitude(self):
        one = jnp.ones(1)
        times = np.linspace(0, 5 * 3600, 6)
        sig = np.zeros((6, 3, 3))
        sig[:, 2, 2] = -10e6
        A_true = 1.9e-20

        def predict(params):
            q = 10e6
            A_bar = params["A"] * jnp.exp(-51600 / 8.32 / 298.0) * q ** 2
            dev_zz = -10e6 + 10e6 / 3
            return A_bar * dev_zz * jnp.asarray(times)

        observed = predict({"A": A_true})
        fitted, hist = sc.calibrate(predict, {"A": 5e-20}, observed,
                                    lr=0.1, steps=150,
                                    loss_scale=np.abs(np.asarray(observed)).max())
        np.testing.assert_allclose(fitted["A"], A_true, rtol=0.05)
        assert hist[-1] < hist[0]

class TestMultiModelConfig:
    """Config layer covers all 7 inelastic models with per-region parameter
    dicts (reference idiom: MN interlayer + MD salt,
    /root/reference/examples/mechanics/nobian/Simulation/run_interlayer.py:1658,1750)."""

    @pytest.mark.slow
    def test_mn_interlayer_md_salt_runs(self, tmp_path):
        out_dir = tmp_path / "out"
        hourv = 3600.0
        deg = np.pi / 180.0
        cfg = {
            "output": {"path": str(out_dir)},
            "grid": {"path": os.path.join(os.path.dirname(__file__), "..",
                                  "grids", "cube_regions"), "name": "geom"},
            "time_settings": {"theta": 0.5,
                              "time_list": [0.0, hourv, 2 * hourv]},
            "body_force": {"direction": 2, "gravity": 0.0, "density": 2200.0},
            "constitutive_model": {
                "elastic": {"spring": {"parameters": {
                    "E": {"OMEGA_A": 25e9, "OMEGA_B": 102e9}, "nu": 0.3}}},
                "nonelastic": {
                    "mn_interlayer": {
                        "type": "MatsuokaNakaiViscoplastic", "active": True,
                        "equilibrium": False,
                        "parameters": {
                            # interlayer yields, salt region effectively rigid
                            # (huge cohesion => Fvp < 0 there)
                            "mu_1": 1e-12, "N_1": 1.0,
                            "cohesion": {"OMEGA_A": 1e6, "OMEGA_B": 1e12},
                            "friction_angle": 30 * deg,
                            "dilation_angle": 10 * deg,
                            "sigma_t": 5.0}},
                    "md_salt": {
                        "type": "MunsonDawsonCreep", "active": True,
                        "equilibrium": False,
                        "parameters": {
                            "A": {"OMEGA_A": 0.0, "OMEGA_B": 1.0e-22},
                            "Q": 51600.0, "n": 3.0, "K0": 1e-6, "c": 0.0092,
                            "m": 3.0, "alpha_w": -10.0, "beta_w": -0.7,
                            "delta": 0.58, "mu": 12e9, "T": 298.0}},
                },
            },
            "solver_settings": {"type": "KrylovSolver", "method": "cg",
                                "preconditioner": "jacobi",
                                "relative_tolerance": 1e-12},
            "simulation_settings": {
                "equilibrium": {"active": False, "dt_max": hourv,
                                "ite_max": 1},
                "operation": {"dt_max": hourv, "hardening": False},
            },
            "boundary_conditions": {
                "WEST": {"type": "dirichlet", "component": 0,
                         "values": [0.0, 0.0, 0.0]},
                "SOUTH": {"type": "dirichlet", "component": 1,
                          "values": [0.0, 0.0, 0.0]},
                "BOTTOM": {"type": "dirichlet", "component": 2,
                           "values": [0.0, 0.0, 0.0]},
                "TOP": {"type": "neumann", "direction": 2, "density": 0.0,
                        "reference_position": 0.0,
                        "values": [8e6, 9e6, 8e6]},
            },
        }
        sim = sc.Simulator_GUI(cfg)
        # per-region dict expanded to per-element arrays
        E = np.asarray(sim.mat.elems_e[0].E)
        assert len(np.unique(E)) == 2
        sim.run()
        t, u, _, _ = postproc.read_timeseries(str(out_dir / "operation"), "u")
        assert u.shape[0] >= 2
        assert np.isfinite(u).all()

    def test_builder_validates_all_seven_models(self):
        from safeincave_tpu.app.builder import (InputFileBuilder,
                                                VALID_ELEMENT_TYPES,
                                                ELEMENT_PARAMS)
        assert len(VALID_ELEMENT_TYPES) == 7
        b = InputFileBuilder()
        for t in VALID_ELEMENT_TYPES:
            params = {k: 1.0 for k in ELEMENT_PARAMS[t]}
            b.add_nonelastic(f"el_{t}", t, params)
        assert len(b.data["constitutive_model"]["nonelastic"]) == 7
        with pytest.raises(ValueError):
            b.add_nonelastic("bad", "MunsonDawsonCreep", {"A": 1.0})
