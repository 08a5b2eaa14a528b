"""Time-controller loop-bound tests (reference TimeHandler.py semantics).

Guards the float-accumulation off-by-one: keep_looping must terminate after
exactly the scheduled number of steps even when rounding leaves t slightly
below t_final, and the parabolic controller must never index past its
time_list.
"""
import numpy as np

import safeincave_tpu as sc


def _drain(tc, max_steps=10_000):
    steps = 0
    while tc.keep_looping():
        tc.advance_time()
        steps += 1
        assert steps <= max_steps, "runaway time loop"
    return steps


class TestTimeController:
    def test_exact_step_count(self):
        tc = sc.TimeController(dt=1.0, initial_time=0.0, final_time=10.0,
                               time_unit="hour")
        assert _drain(tc) == 10
        assert tc.t == tc.t_final

    def test_non_divisible_accumulation(self):
        # 0.1 h steps over 1 h: binary float 0.1 accumulates to
        # 0.9999999999999999 h, which must NOT trigger an 11th step
        tc = sc.TimeController(dt=0.1, initial_time=0.0, final_time=1.0,
                               time_unit="hour")
        assert _drain(tc) == 10

    def test_unit_conversion(self):
        tc = sc.TimeController(dt=0.5, initial_time=0.0, final_time=2.0,
                               time_unit="day")
        assert tc.dt == 0.5 * 86400.0
        assert tc.t_final == 2.0 * 86400.0


class TestTimeControllerParabolic:
    def test_never_overruns_time_list(self):
        for n in (2, 3, 7, 20, 100):
            tc = sc.TimeControllerParabolic(n_time_steps=n, initial_time=0.0,
                                            final_time=5.0, time_unit="day")
            steps = _drain(tc)   # IndexError here = the off-by-one bug
            assert steps == n - 1
            assert tc.step_counter == n - 1
            np.testing.assert_allclose(tc.t, tc.t_final, rtol=1e-12)

    def test_small_steps_early(self):
        tc = sc.TimeControllerParabolic(n_time_steps=50, initial_time=0.0,
                                        final_time=10.0, time_unit="day")
        dts = np.diff(tc.time_list)
        assert (dts[1:] >= dts[:-1] - 1e-9).all()   # monotone growing dt
        assert dts[0] < dts[-1] / 10


class TestTimeControllerFromList:
    def test_walks_grid_exactly(self):
        grid = [0.0, 10.0, 30.0, 100.0]
        tc = sc.TimeControllerFromList(grid)
        ts, dts = [], []
        while tc.keep_looping():
            tc.advance_time()
            ts.append(tc.t)
            dts.append(tc.dt)
        assert ts == grid[1:]
        np.testing.assert_allclose(dts, np.diff(grid))
        assert tc.step_counter == 3

    def test_rejects_bad_grids(self):
        import pytest
        with pytest.raises(ValueError):
            sc.TimeControllerFromList([0.0])
        with pytest.raises(ValueError):
            sc.TimeControllerFromList([0.0, 2.0, 1.0])


class TestDpLimitGrid:
    def test_refines_through_ramps(self):
        # pressure ramps 0 -> 1 MPa over [40, 60] h, flat elsewhere
        hour = 3600.0

        def p(t):
            th = t / hour
            return 1e6 * min(max((th - 40.0) / 20.0, 0.0), 1.0)

        times = sc.build_time_list_by_dp_limit(
            100 * hour, p, dt_min=0.5 * hour, dt_max=8 * hour, dp_max=1e5)
        times = np.asarray(times)
        dts = np.diff(times)
        assert (dts > 0).all()
        assert abs(times[-1] - 100 * hour) < 1e-6
        # plateau steps at dt_max, ramp steps clamped small enough that the
        # per-step pressure change stays within dp_max
        ramp = (times[:-1] >= 40 * hour) & (times[1:] <= 60 * hour)
        assert dts[~ramp].max() == 8 * hour
        p_steps = np.abs(np.diff([p(t) for t in times]))
        assert (p_steps <= 1e5 + 1e-9).all()


class TestAdaptiveTimeController:
    def test_grows_and_shrinks(self):
        tc = sc.AdaptiveTimeController(dt=1.0, initial_time=0.0,
                                       final_time=100.0, time_unit="hour",
                                       dt_min=0.25, dt_max=8.0)
        tc.advance_time()
        d0 = tc.dt
        tc.feedback(2)              # fast => grow
        assert tc.dt > d0
        tc.feedback(20)             # slow => shrink
        tc.feedback(3, dt_cuts=2)   # retries => shrink per cut
        assert tc.dt >= 0.25 * 3600.0
        for _ in range(50):
            tc.feedback(1)
        assert tc.dt == 8.0 * 3600.0   # clamped at dt_max

    def test_lands_on_t_final(self):
        tc = sc.AdaptiveTimeController(dt=3.0, initial_time=0.0,
                                       final_time=10.0, time_unit="hour")
        steps = 0
        while tc.keep_looping():
            tc.advance_time()
            tc.feedback(1)          # always grow
            steps += 1
            assert steps < 100
        np.testing.assert_allclose(tc.t, tc.t_final, rtol=1e-12)

    def test_fewer_steps_than_fixed_dt_at_equal_accuracy(self):
        """VERDICT item-7 'Done' criterion on a creep relaxation: the
        adaptive run takes fewer steps than fixed-dt while landing on the
        same final state (the late steps converge in 1-2 fixed-point
        iterations, so dt can grow without accuracy loss)."""
        import jax.numpy as jnp
        momBC = sc.MomentumBC

        def build():
            grid = sc.GridBox(nx=3, ny=3, nz=3)
            eq = sc.LinearMomentum(grid, theta=0.5)
            eq.set_solver(sc.SolverSettings(method="cg", rtol=1e-12,
                                            max_it=300))
            n = eq.n_elems
            one = jnp.ones(n)
            mat = sc.Material(n)
            mat.set_density(2000.0 * one)
            mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
            mat.add_to_non_elastic(sc.DislocationCreep(
                1.9e-20 * one, 51600 * one, 3.0 * one))
            eq.set_material(mat)
            eq.set_T0(298.0 * one)
            eq.set_T(298.0 * one)
            eq.build_body_force([0.0, 0.0, 0.0])
            bc = momBC.BcHandler(eq)
            tv = [0.0, 1e9]
            bc.add_boundary_condition(momBC.DirichletBC("WEST", 0,
                                                        [0., 0.], tv))
            bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1,
                                                        [0., 0.], tv))
            bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2,
                                                        [0., 0.], tv))
            bc.add_boundary_condition(momBC.NeumannBC(
                "TOP", 2, 0.0, 0.0, [10e6, 10e6], tv, g=0.0))
            eq.set_boundary_conditions(bc)
            return eq

        def run(tc):
            eq = build()
            sim = sc.Simulator_M(eq, tc, [], compute_elastic_response=True)
            sim.run()
            return np.asarray(eq.u), tc.step_counter

        u_fix, n_fix = run(sc.TimeController(
            dt=1.0, initial_time=0.0, final_time=24.0, time_unit="hour"))
        u_ad, n_ad = run(sc.AdaptiveTimeController(
            dt=1.0, initial_time=0.0, final_time=24.0, time_unit="hour",
            dt_min=0.5, dt_max=6.0, fast_iters=4))

        assert n_ad < n_fix, (n_ad, n_fix)
        scale = np.abs(u_fix).max()
        np.testing.assert_allclose(u_ad, u_fix, atol=5e-4 * scale)
