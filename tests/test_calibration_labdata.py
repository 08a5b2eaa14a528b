"""Real-data calibration workflow (VERDICT r03 item 6).

The reference fits its material models to measured IfG creep records
(/root/reference/examples/mechanics/MaterialCalibration/optimizer/
optimizer.py:17-43); these tests drive the repo-owned equivalent end to
end: raw-CSV loader -> differentiable piecewise-analytic forward model ->
sc.calibrate autodiff fit -> MaterialPointSimulator cross-check on the
production constitutive elements.
"""
import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
CAL = os.path.join(HERE, "..", "examples", "mechanics",
                   "MaterialCalibration")
sys.path.insert(0, CAL)

from lab_data import load_ifg_creep_csv  # noqa: E402

CSV = os.path.join(CAL, "data", "ZW_TCC4.csv")


class TestLabLoader:
    def test_parses_record(self):
        rec = load_ifg_creep_csv(CSV)
        n = len(rec["times_s"])
        assert n > 100
        for k in ("eps_axial", "s1_Pa", "sdiff_Pa", "s3_Pa", "T_K"):
            assert rec[k].shape == (n,), k
        # multi-stage loading: several distinct sigma_diff plateaus
        stages = np.unique(np.round(rec["sdiff_Pa"] / 1e6))
        assert len(stages) >= 3, stages
        # sane physics: monotone time, ~100 C cell, ~18 MPa confinement
        assert (np.diff(rec["times_s"]) > 0).all()
        assert 360 < rec["T_K"].mean() < 380
        assert 15e6 < rec["s3_Pa"].mean() < 21e6
        assert rec["meta"]["Ed_GPa"] > 10


class TestLabFit:
    @pytest.mark.slow
    def test_fit_reduces_misfit_and_crosschecks(self):
        import jax.numpy as jnp
        import runpy
        import safeincave_tpu as sc

        mod = runpy.run_path(os.path.join(CAL, "calibrate_labdata.py"),
                             run_name="not_main")
        rec = load_ifg_creep_csv(CSV)
        observed = rec["eps_axial"] - rec["eps_axial"][0]
        predict = mod["make_forward"](rec)

        params0 = {"A": 1e-36, "n": 4.0, "eta1": 1e14, "E1": 5e9}
        fitted, hist = sc.calibrate(predict, params0, observed,
                                    lr=0.08, steps=150,
                                    loss_scale=np.abs(observed).max())
        assert hist[-1] < 0.25 * hist[0], hist[::30]
        pred = np.asarray(predict({k: jnp.asarray(float(v))
                                   for k, v in fitted.items()}))
        assert np.isfinite(pred).all()
        # fit tracks the data shape (60 cheap steps: loose bound)
        corr = np.corrcoef(pred, observed)[0, 1]
        assert corr > 0.95, corr

        # production-element cross-check at the fitted parameters
        one = np.ones(1)
        mat = sc.Material(1)
        mat.add_to_elastic(sc.Spring(38.6e9 * one, 0.25 * one))
        mat.add_to_non_elastic(sc.Viscoelastic(
            float(fitted["eta1"]) * one, float(fitted["E1"]) * one,
            0.25 * one))
        mat.add_to_non_elastic(sc.DislocationCreep(
            float(fitted["A"]) * one, mod["Q_FIXED"] * one,
            float(fitted["n"]) * one))
        mps = sc.MaterialPointSimulator(mat, theta=0.5,
                                        Temp=rec["T_K"].mean() * one)
        T = len(rec["times_s"])
        hist3 = np.zeros((T, 3, 3))
        hist3[:, 0, 0] = hist3[:, 1, 1] = -rec["s3_Pa"]
        hist3[:, 2, 2] = -(rec["s3_Pa"] + rec["sdiff_Pa"])
        res = mps.run(hist3, rec["times_s"])
        eps_zz = np.asarray(res["eps_total"][:, 0, 2, 2])
        mps_pred = -(eps_zz - eps_zz[0])
        # theta-scheme integration agrees with the analytic forward model
        np.testing.assert_allclose(mps_pred, pred, atol=2e-3)
