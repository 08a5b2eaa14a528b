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
