"""Yearly production scenario: CSV year, staging, checkpoint/resume
(VERDICT r03 item 7; reference run_interlayer.py:163-236 workflow)."""
import json
import os
import runpy
import sys

import numpy as np
import pytest

EX = os.path.join(os.path.dirname(__file__), "..", "examples", "mechanics",
                  "nobian_yearly")


def _load_main():
    sys.path.insert(0, EX)
    try:
        return runpy.run_path(os.path.join(EX, "main.py"),
                              run_name="not_main")
    finally:
        sys.path.pop(0)


@pytest.mark.slow
def test_yearly_scenario_with_resume(tmp_path):
    mod = _load_main()
    out = str(tmp_path / "run")

    # abbreviated year: the full 365-day CSV schedule compressed into 20
    # days ('stretch' mode - the reference's own compression workflow) so
    # CI sees every schedule feature at CI cost
    summary = mod["main"](["--days", "20", "--dt-hours", "12",
                           "--mesh-n", "5", "--mode", "stretch",
                           "--out", out])
    assert summary["steps"] == 40
    assert summary["max_error"] <= 1e-8

    # artifacts of the production workflow
    assert os.path.isfile(os.path.join(out, "metrics.jsonl"))
    assert os.path.isfile(os.path.join(out, "checkpoint.npz"))
    assert os.path.isfile(os.path.join(out, "operation", "u", "u.xdmf"))
    assert os.path.isfile(os.path.join(out, "equilibrium", "u", "u.xdmf"))
    rows = [json.loads(ln) for ln in open(os.path.join(out, "metrics.jsonl"))
            if ln.strip()]
    assert len(rows) == 40
    assert all(r["converged"] for r in rows)

    # sparse saves: interval 8 -> 40/8 + t=0 snapshots
    import h5py
    with h5py.File(os.path.join(out, "operation", "u", "u.h5")) as f:
        n_saves = len(f["Function"]["u"])
    assert n_saves == 40 // 8 + 1

    # resume mid-year: the checkpoint written at step 32 continues to the
    # same end state the straight run reached
    mod2 = _load_main()
    out2 = str(tmp_path / "resume")
    summary2 = mod2["main"](["--days", "20", "--dt-hours", "12",
                             "--mesh-n", "5", "--mode", "stretch",
                             "--out", out2,
                             "--resume",
                             os.path.join(out, "checkpoint.npz")])
    assert summary2["steps"] == 8           # steps 33..40
    assert summary2["max_error"] <= 1e-8


@pytest.mark.slow
def test_yearly_plot(tmp_path):
    mod = _load_main()
    out = str(tmp_path / "run")
    mod["main"](["--days", "4", "--dt-hours", "12", "--mesh-n", "5",
                 "--skip-equilibrium", "--out", out])
    sys.path.insert(0, EX)
    try:
        plot = runpy.run_path(os.path.join(EX, "plot_results.py"),
                              run_name="not_main")
        plot["main"](out)
    finally:
        sys.path.pop(0)
    assert os.path.isfile(os.path.join(out, "results.png"))
