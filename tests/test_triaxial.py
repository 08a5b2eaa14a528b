"""TriaxialSimulator (mixed strain/stress control) correctness.

The digital-twin analog of the reference's FLAC3D compression_model
(/root/reference/examples/mechanics/MaterialCalibration/optimizer/
models.py:51-186).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import safeincave_tpu as sc

MPa = 1e6
DEG = np.pi / 180.0


def _mat(n, with_mc=True, cohesion=3.0, friction=30.0 * DEG):
    one = np.ones(n)
    mat = sc.Material(n)
    mat.add_to_elastic(sc.Spring(25e9 * one, 0.3 * one))
    if with_mc:
        mat.add_to_non_elastic(sc.MohrCoulombViscoplastic(
            mu_1=2e-5 * one, N_1=1.5 * one, cohesion=cohesion * one,
            friction_angle=friction * one,
            dilation_angle=10.0 * DEG * one, sigma_t=1.0 * one))
    return mat


def _schedule(mat, Sr, times, rate=1e-5):
    eps0 = np.asarray((mat.C_inv[:, 2, 0] + mat.C_inv[:, 2, 1]
                       + mat.C_inv[:, 2, 2])) * Sr
    return eps0[None, :] - rate * times[:, None]


class TestTriaxialElastic:
    def test_elastic_limit_matches_hooke(self):
        """With no inelastic elements the response is exactly uniaxial
        Hooke at constant confinement: d S_diff = -E d eps_axial."""
        n = 2
        mat = _mat(n, with_mc=False)
        sim = sc.TriaxialSimulator(mat)
        Sr = np.array([-2 * MPa, -5 * MPa])
        times = np.linspace(0.0, 500.0, 11)
        ez = _schedule(mat, Sr, times)
        res = sim.run_compression(jnp.asarray(Sr), jnp.asarray(ez), times)
        S = np.asarray(res["S_diff"])
        deps = np.diff(np.asarray(ez), axis=0)
        dS = np.diff(S, axis=0)
        np.testing.assert_allclose(dS / -deps, 25e9, rtol=1e-9)
        # radial stress is held: S_diff[0] == 0 at the isotropic start
        np.testing.assert_allclose(S[0], 0.0, atol=1.0)

    def test_mc_plateau_orders_with_confinement(self):
        """Beyond yield the deviatoric stress plateaus, higher confinement
        -> higher strength (Drucker-Prager), plateau far below elastic."""
        n = 2
        mat = _mat(n)
        sim = sc.TriaxialSimulator(mat)
        Sr = np.array([-2 * MPa, -8 * MPa])
        times = np.linspace(0.0, 2000.0, 41)
        ez = _schedule(mat, Sr, times)
        res = sim.run_compression(jnp.asarray(Sr), jnp.asarray(ez), times)
        S = np.asarray(res["S_diff"])
        assert np.isfinite(S).all()
        # plateau: last two steps change by < 1% of the value
        assert abs(S[-1, 0] - S[-2, 0]) < 0.01 * abs(S[-1, 0])
        # strength grows with confinement
        assert S[-1, 1] > S[-1, 0] > 2 * MPa
        # far below the elastic line (25 GPa * 2% = 500 MPa)
        assert S[-1, 1] < 100 * MPa

    def test_differentiable_in_strength_params(self):
        import jax
        n = 1
        Sr = np.array([-3 * MPa])
        times = np.linspace(0.0, 1000.0, 21)

        def S_end(c):
            mat = _mat(n, cohesion=c)
            sim = sc.TriaxialSimulator(mat)
            ez = _schedule(mat, Sr, times)
            res = sim.run_compression(jnp.asarray(Sr), jnp.asarray(ez),
                                      times)
            return res["S_diff"][-1, 0]

        g = jax.grad(S_end)(jnp.asarray(3.0))
        assert np.isfinite(float(g))
        # more cohesion -> higher strength, and the gradient matches a FD
        # probe to leading order
        fd = (float(S_end(jnp.asarray(3.05))) -
              float(S_end(jnp.asarray(2.95)))) / 0.1
        assert fd > 0
        np.testing.assert_allclose(float(g), fd, rtol=2e-2)


@pytest.mark.slow
def test_example_recovers_parameters(tmp_path, monkeypatch):
    import os
    import runpy
    import sys
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "mechanics", "MaterialCalibration",
                        "calibrate_triaxial.py")
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["calibrate_triaxial.py"])
    mod = runpy.run_path(path, run_name="not_main")
    fitted = mod["main"]()
    assert abs(float(fitted["cohesion"]) - 3.0) < 0.15
    assert abs(float(fitted["friction"]) / DEG - 30.0) < 1.0
