"""Time-stepping controllers.

Reference: /root/reference/safeincave/TimeHandler.py:24-274.  Host-side (no
JAX): these drive the outer time loop; each step body is a single jitted
device call.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable

import numpy as np

from .utils import minute, hour, day, year

_UNIT = {"second": 1, "minute": minute, "hour": hour, "day": day, "year": year}

Fn = Callable[[np.ndarray], np.ndarray]


class TimeControllerBase(ABC):
    """Converts user time units to seconds and tracks loop state
    (reference TimeHandler.py:24-126)."""

    def __init__(self, initial_time: float, final_time: float,
                 time_unit: str = "second"):
        if time_unit not in _UNIT:
            raise Exception(f"Time unit {time_unit} not supported.")
        self.time_unit = time_unit
        self.time_conversion = _UNIT[time_unit]
        self.t_final = final_time * self.time_conversion
        self.t_initial = initial_time * self.time_conversion
        self.t = initial_time * self.time_conversion
        self.step_counter = 0

    def keep_looping(self) -> bool:
        # relative tolerance guards float accumulation: without it, rounding
        # can leave t a few ulp below t_final and run one extra step
        # (reference TimeHandler.py:100-110 uses a time_tol the same way)
        tol = 1e-12 * max(1.0, abs(self.t_final))
        return self.t < self.t_final - tol

    @abstractmethod
    def advance_time(self) -> None:
        ...


class TimeController(TimeControllerBase):
    """Fixed-step controller (reference TimeHandler.py:130-166)."""

    def __init__(self, dt: float, initial_time: float, final_time: float,
                 time_unit: str = "second"):
        super().__init__(initial_time, final_time, time_unit)
        self.dt = dt * self.time_conversion

    def advance_time(self) -> None:
        self.step_counter += 1
        self.t += self.dt


class TimeControllerParabolic(TimeControllerBase):
    """t^2-spaced steps rescaled to [t0, tf]: small steps early
    (reference TimeHandler.py:170-274)."""

    def __init__(self, n_time_steps: int, initial_time: float,
                 final_time: float, time_unit: str = "second"):
        super().__init__(initial_time, final_time, time_unit)
        self.n_time_steps = n_time_steps
        self.time_list = self.calculate_varying_times(self.fun_parabolic)
        self.dt = self.time_list[1] - self.time_list[0]
        self.step_counter = 0

    @staticmethod
    def fun_parabolic(t_array: np.ndarray) -> np.ndarray:
        return t_array ** 2

    def calculate_varying_times(self, fun: Fn) -> np.ndarray:
        t_eq = np.linspace(self.t_initial, self.t_final, self.n_time_steps)
        y = fun(t_eq)
        f_min = np.min(t_eq)
        f_max = np.max(y)
        k = (t_eq.max() - t_eq.min()) / (f_max - f_min)
        return k * (y - f_min) + t_eq.min()

    def keep_looping(self) -> bool:
        # index-based guard: the schedule has exactly n_time_steps points,
        # so rounding in the rescaled time_list can never over-run it
        return (self.step_counter < len(self.time_list) - 1
                and super().keep_looping())

    def advance_time(self) -> None:
        self.step_counter += 1
        self.t = self.time_list[self.step_counter]
        self.dt = (self.time_list[self.step_counter]
                   - self.time_list[self.step_counter - 1])
