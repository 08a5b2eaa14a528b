"""Smoke tests: the examples tree runs end-to-end (abbreviated schedules)."""
import os
import runpy
import sys

import pytest


def _run_example(path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.dirname(path))
    try:
        mod = runpy.run_path(path, run_name="not_main")
        mod["main"]()
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
