"""Smoke tests: the examples tree runs end-to-end (abbreviated schedules)."""
import os
import runpy
import sys

import pytest


def _run_example(path, tmp_path, monkeypatch, kwargs=None):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(path))
    try:
        mod = runpy.run_path(path, run_name="not_main")
        mod["main"](**(kwargs or {}))
    finally:
        sys.path.pop(0)


EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.slow
def test_thermal_cube(tmp_path, monkeypatch):
    _run_example(os.path.join(EXAMPLES, "thermal", "1_cube", "main.py"),
                 tmp_path, monkeypatch)
    assert os.path.isfile(tmp_path / "output" / "thermal_cube" / "T" / "T.xdmf")


@pytest.mark.slow
def test_thermomechanics_cube(tmp_path, monkeypatch):
    _run_example(os.path.join(EXAMPLES, "thermomechanics", "1_cube",
                              "main.py"), tmp_path, monkeypatch)
    assert os.path.isfile(tmp_path / "output" / "tm_cube" / "mom" / "u" / "u.xdmf")


@pytest.mark.slow
def test_triaxial(tmp_path, monkeypatch):
    _run_example(os.path.join(EXAMPLES, "mechanics", "1_triaxial",
                              "main.py"), tmp_path, monkeypatch,
                 kwargs={"final_time": 2.0, "dt": 0.5})
    assert os.path.isfile(tmp_path / "output" / "case_0" / "u" / "u.xdmf")


@pytest.mark.slow
def test_cavern_staged(tmp_path, monkeypatch):
    _run_example(os.path.join(EXAMPLES, "mechanics", "4_cavern",
                              "main.py"), tmp_path, monkeypatch,
                 kwargs={"eq_hours": 2.0, "eq_dt": 1.0,
                         "op_hours": 2.0, "op_dt": 1.0})
    assert os.path.isfile(tmp_path / "output" / "operation" / "u" / "u.xdmf")


@pytest.mark.slow
def test_cube_regions(tmp_path, monkeypatch):
    _run_example(os.path.join(EXAMPLES, "mechanics", "2_cube_regions",
                              "main.py"), tmp_path, monkeypatch)
    assert os.path.isfile(tmp_path / "output" / "case_0" / "u" / "u.xdmf")


@pytest.mark.slow
def test_nobian_interlayer(tmp_path, monkeypatch):
    _run_example(os.path.join(EXAMPLES, "mechanics", "nobian_interlayer",
                              "main.py"), tmp_path, monkeypatch,
                 kwargs={"operation_days": 0.25, "dt_hours": 2.0})
    out = tmp_path / "output" / "nobian_interlayer"
    assert os.path.isfile(out / "u" / "u.xdmf")
    assert os.path.isfile(out / "ksp_log.jsonl")


CAVERN_GRID = "/root/reference/grids/cavern_regular_600_3D"
OVB_GRID = "/root/reference/grids/cavern_overburden_coarse"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(CAVERN_GRID),
                    reason="reference grids not mounted")
def test_thermal_cavern(tmp_path, monkeypatch):
    _run_example(os.path.join(EXAMPLES, "thermal", "2_cavern", "main.py"),
                 tmp_path, monkeypatch,
                 kwargs={"n_time_steps": 3, "final_time": 0.1,
                         "time_unit": "day"})
    assert os.path.isfile(tmp_path / "output" / "case_0" / "T" / "T.xdmf")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(OVB_GRID),
                    reason="reference grids not mounted")
def test_thermomechanics_cavern_staged(tmp_path, monkeypatch):
    """Flagship: equilibrium -> TM operation with Robin cavern wall."""
    _run_example(os.path.join(EXAMPLES, "thermomechanics", "2_cavern",
                              "main.py"), tmp_path, monkeypatch,
                 kwargs={"n_eq_steps": 2, "eq_days": 0.2,
                         "op_days": 0.4, "op_dt_days": 0.2,
                         "cycle_days": 0.1})
    out = tmp_path / "output" / "case_1"
    assert os.path.isfile(out / "equilibrium" / "u" / "u.xdmf")
    assert os.path.isfile(out / "operation" / "u" / "u.xdmf")
    assert os.path.isfile(out / "operation" / "T" / "T.xdmf")
