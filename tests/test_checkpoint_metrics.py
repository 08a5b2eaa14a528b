"""Checkpoint/resume and step-metrics tests."""
import json
import os

import pytest
import numpy as np
import jax.numpy as jnp

import safeincave_tpu as sc

momBC = sc.MomentumBC


def _build(nx=2):
    grid = sc.GridBox(nx=nx, ny=nx, nz=nx)
    eq = sc.LinearMomentum(grid, theta=0.5)
    eq.set_solver(sc.SolverSettings(method="cg", rtol=1e-12, max_it=300))
    n = eq.n_elems
    one = jnp.ones(n)
    mat = sc.Material(n)
    mat.set_density(2000.0 * one)
    mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
    # Kelvin-Voigt is the resume acid test: its rate depends on
    # phi1 = theta * t, so re-initializing rates at resume time (t >> 0)
    # instead of keeping the restored arrays breaks exact continuation
    mat.add_to_non_elastic(sc.Viscoelastic(105e11 * one, 10e9 * one,
                                           0.32 * one))
    mat.add_to_non_elastic(sc.DislocationCreep(1.9e-20 * one, 51600 * one,
                                               3.0 * one))
    mat.add_to_non_elastic(sc.ViscoplasticDesai(
        mu_1=5.3665857009859815e-11 * one, N_1=3.1 * one,
        a_1=1.965018496922832e-05 * one, eta=0.8275682807874163 * one,
        n=3.0 * one, beta_1=0.0048 * one, beta=0.995 * one, m=-0.5 * one,
        gamma=0.095 * one, sigma_t=5.0 * one, alpha_0=0.0022 * one))
    eq.set_material(mat)
    eq.set_T0(298.0 * one)
    eq.set_T(298.0 * one)
    eq.build_body_force([0.0, 0.0, 0.0])
    bc = momBC.BcHandler(eq)
    tv = [0.0, 1e9]
    bc.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
    # confined triaxial state (the reference 1_triaxial regime - Desai-stable)
    for name in ("EAST", "NORTH"):
        bc.add_boundary_condition(momBC.NeumannBC(name, 2, 0.0, 0.0,
                                                  [4e6, 4e6], tv, g=0.0))
    bc.add_boundary_condition(momBC.NeumannBC("TOP", 2, 0.0, 0.0,
                                              [8e6, 8e6], tv, g=0.0))
    eq.set_boundary_conditions(bc)
    return grid, eq


def _run(eq, tc, **kw):
    sim = sc.Simulator_M(eq, tc, outputs=[], compute_elastic_response=True,
                         **kw)
    sim.run()


class TestCheckpoint:
    @pytest.mark.slow
    def test_resume_reproduces_straight_run(self, tmp_path):
        # straight run: 4 steps
        grid, eq_a = _build()
        tc_a = sc.TimeController(dt=1.0, initial_time=0.0, final_time=4.0,
                                 time_unit="hour")
        _run(eq_a, tc_a)

        # checkpointed run: 2 steps, save, rebuild, restore, 2 more steps
        ckpt = str(tmp_path / "ck.npz")
        grid, eq_b = _build()
        tc_b = sc.TimeController(dt=1.0, initial_time=0.0, final_time=2.0,
                                 time_unit="hour")
        _run(eq_b, tc_b)
        sc.save_checkpoint(ckpt, eq_b, tc_b)

        grid, eq_c = _build()
        tc_c = sc.TimeController(dt=1.0, initial_time=0.0, final_time=4.0,
                                 time_unit="hour")
        sc.load_checkpoint(ckpt, eq_c, tc_c)
        assert tc_c.step_counter == 2
        # continuation: no elastic re-solve (the reference stage-2 idiom)
        sim = sc.Simulator_M(eq_c, tc_c, outputs=[],
                             compute_elastic_response=False)
        sim.run()

        np.testing.assert_allclose(np.asarray(eq_c.sig_v),
                                   np.asarray(eq_a.sig_v), rtol=1e-10,
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(eq_c.u), np.asarray(eq_a.u),
                                   rtol=1e-10, atol=1e-15)

    @pytest.mark.slow
    def test_periodic_checkpointing(self, tmp_path):
        grid, eq = _build()
        tc = sc.TimeController(dt=1.0, initial_time=0.0, final_time=2.0,
                               time_unit="hour")
        ckpt = str(tmp_path / "auto.npz")
        _run(eq, tc, checkpoint_every=1, checkpoint_path=ckpt)
        assert os.path.isfile(ckpt)


class TestMetrics:
    def test_jsonl_records(self, tmp_path):
        grid, eq = _build()
        tc = sc.TimeController(dt=1.0, initial_time=0.0, final_time=3.0,
                               time_unit="hour")
        path = str(tmp_path / "metrics.jsonl")
        m = sc.StepMetrics(path)
        _run(eq, tc, metrics=m)
        recs = [json.loads(line) for line in open(path)]
        assert len(recs) == 3
        assert all(r["converged"] for r in recs)
        assert all(r["fp_iters"] >= 1 for r in recs)
        s = m.summary()
        assert s["steps"] == 3 and s["max_error"] <= 1e-8
