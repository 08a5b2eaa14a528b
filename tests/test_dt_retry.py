"""dt-halving retry: a failed (NaN) attempt must roll back the FULL state.

Reference semantics: Simulators.py:441-503 restores stress and every
element's ISV state before re-entering the solve at dt/2.  The rebuild must
additionally restore eq.u (the Krylov initial guess) and eq.eps_tot_v, since
solve_time_step reads them.  A poisoned-but-unrestored field would make every
retry NaN out immediately.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

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
    mat.add_to_non_elastic(sc.DislocationCreep(1.9e-20 * one, 51600 * one,
                                               3.0 * one))
    eq.set_material(mat)
    eq.set_T0(298.0 * one)
    eq.set_T(298.0 * one)
    eq.build_body_force([0.0, 0.0, 0.0])
    bc = momBC.BcHandler(eq)
    tv = [0.0, 1e9]
    bc.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
    bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
    bc.add_boundary_condition(momBC.NeumannBC("TOP", 2, 0.0, 0.0,
                                              [8e6, 8e6], tv, g=0.0))
    eq.set_boundary_conditions(bc)
    return eq


def _poison(eq):
    """Simulate what a diverged/NaN solve leaves behind."""
    nan = jnp.asarray(np.nan)
    eq.u = eq.u * nan
    eq.sig_v = eq.sig_v * nan
    eq.eps_tot_v = eq.eps_tot_v * nan
    eq._last_sv_k = eq.sig_v
    for e in eq.mat.elems_ne:
        e.state = {k: v * nan for k, v in e.state.items()}


def _fail_first_attempts(eq, n_failures):
    """Wrap solve_time_step: the first n calls poison the state and report
    NaN (as a real diverged fixed point does), later calls run normally."""
    real = eq.solve_time_step
    calls = {"n": 0, "dts": []}

    def wrapped(t, dt, tol=1e-8, maxiter=40):
        calls["n"] += 1
        calls["dts"].append(dt)
        if calls["n"] <= n_failures:
            _poison(eq)
            return maxiter, float("nan")
        return real(t, dt, tol=tol, maxiter=maxiter)

    eq.solve_time_step = wrapped
    return calls


class TestDtRetry:
    def test_recovers_after_nan(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        eq = _build()
        tc = sc.TimeController(dt=1.0, initial_time=0.0, final_time=1.0,
                               time_unit="hour")
        metrics = sc.StepMetrics()
        sim = sc.Simulator_M(eq, tc, outputs=[], metrics=metrics)
        calls = _fail_first_attempts(eq, n_failures=1)
        sim.run()

        # retry ran at the halved dt and converged
        assert calls["dts"] == [3600.0, 1800.0]
        rec = metrics.records[-1]
        assert rec["converged"]
        assert rec["dt_cuts"] == 1
        assert rec["error"] <= 1e-8
        assert np.isfinite(np.asarray(eq.u)).all()
        assert np.isfinite(np.asarray(eq.sig_v)).all()
        for e in eq.mat.elems_ne:
            for v in e.state.values():
                assert np.isfinite(np.asarray(v)).all()

    def test_exhausted_retries_restore_backup_and_dump(self, tmp_path,
                                                       monkeypatch):
        monkeypatch.chdir(tmp_path)
        eq = _build()
        tc = sc.TimeController(dt=1.0, initial_time=0.0, final_time=1.0,
                               time_unit="hour")
        metrics = sc.StepMetrics()
        sim = sc.Simulator_M(eq, tc, outputs=[], metrics=metrics)
        _fail_first_attempts(eq, n_failures=10)   # every attempt fails
        sim.run()

        rec = metrics.records[-1]
        assert not rec["converged"]
        assert rec["dt_cuts"] == sim.max_dt_cuts + 1
        # state rolled back to the (finite) pre-step backup, so the run
        # is not poisoned for subsequent steps/outputs
        assert np.isfinite(np.asarray(eq.u)).all()
        assert np.isfinite(np.asarray(eq.sig_v)).all()
        assert np.isfinite(np.asarray(eq.eps_tot_v)).all()
        for e in eq.mat.elems_ne:
            for v in e.state.values():
                assert np.isfinite(np.asarray(v)).all()
        # diagnostic dump written (reference nan_diagnostic.pt analog)
        assert os.path.isfile("nan_diagnostic.npz")
