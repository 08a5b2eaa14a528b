"""Golden-value tests for the constitutive layer.

The numeric oracles are the backend-independent physics values from the
reference test-suite (/root/reference/tests/test_material.py) - fixed stress
states, theta = 0.5, dt = 7200 s - so agreement here demonstrates constitutive
parity with SafeInCave.  Tests are structured for pytest and exercise both the
mutating (reference-compatible) API and tensor views.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import safeincave_tpu as sc

THETA = 0.5
DT = 7200.0
PHI1 = THETA * DT
PHI2 = (1 - THETA) * DT

STRESS_A = 1e6 * jnp.asarray([[[1., 4., 5.],
                               [4., 2., 6.],
                               [5., 6., 3.]]])
ZEROS = jnp.zeros((1, 3, 3))
TEMP = 298.0 * jnp.ones(1)


def assert_close(actual, expected, rtol, atol):
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               rtol=rtol, atol=atol)


class TestSpring:
    def test_eps_e(self):
        n = 2
        E = 102e9 * jnp.ones(n)
        nu = 0.3 * jnp.ones(n)
        elem = sc.Spring(E, nu, name="spring")
        elem.initialize()
        stress = 1e6 * jnp.asarray([[[1., 4., 5.], [4., 2., 6.], [5., 6., 3.]],
                                    [[6., 1., 2.], [1., 5., 3.], [2., 3., 4.]]])
        elem.compute_eps_e(stress)
        expected = [[[-4.9020e-06, 5.0980e-05, 6.3725e-05],
                     [5.0980e-05, 7.8431e-06, 7.6471e-05],
                     [6.3725e-05, 7.6471e-05, 2.0588e-05]],
                    [[3.2353e-05, 1.2745e-05, 2.5490e-05],
                     [1.2745e-05, 1.9608e-05, 3.8235e-05],
                     [2.5490e-05, 3.8235e-05, 6.8627e-06]]]
        assert_close(elem.eps_e, expected, rtol=1e-4, atol=1e-9)


class TestViscoelastic:
    def make(self):
        n = 1
        return sc.Viscoelastic(105e11 * jnp.ones(n), 10e9 * jnp.ones(n),
                               0.32 * jnp.ones(n))

    def test_full_lifecycle(self):
        elem = self.make()
        elem.compute_G_B(STRESS_A, DT, THETA, TEMP)
        true_G = [[[2.0666e-14, -5.8081e-15, -5.8081e-15, 0, 0, 0],
                   [-5.8081e-15, 2.0666e-14, -5.8081e-15, 0, 0, 0],
                   [-5.8081e-15, -5.8081e-15, 2.0666e-14, 0, 0, 0],
                   [0, 0, 0, 2.6474e-14, 0, 0],
                   [0, 0, 0, 0, 2.6474e-14, 0],
                   [0, 0, 0, 0, 0, 2.6474e-14]]]
        assert_close(elem.G, true_G, rtol=1e-4, atol=1e-18)

        elem.compute_eps_ne_rate(STRESS_A, PHI1, TEMP)
        true_rate = [[[-8.3746e-09, 1.0590e-07, 1.3237e-07],
                      [1.0590e-07, 1.8100e-08, 1.5884e-07],
                      [1.3237e-07, 1.5884e-07, 4.4574e-08]]]
        assert_close(elem.eps_ne_rate, true_rate, rtol=1e-4, atol=1e-10)

        elem.compute_eps_ne_k(PHI1, PHI2)
        true_k = [[[-3.0148e-05, 3.8123e-04, 4.7653e-04],
                   [3.8123e-04, 6.5158e-05, 5.7184e-04],
                   [4.7653e-04, 5.7184e-04, 1.6047e-04]]]
        assert_close(elem.eps_ne_k, true_k, rtol=1e-4, atol=1e-8)

        elem.update_eps_ne_old(STRESS_A, ZEROS, PHI2)
        true_eps = [[[-6.0297e-05, 7.6245e-04, 9.5307e-04],
                     [7.6245e-04, 1.3032e-04, 1.1437e-03],
                     [9.5307e-04, 1.1437e-03, 3.2093e-04]]]
        assert_close(elem.eps_ne_old, true_eps, rtol=1e-4, atol=1e-7)

        elem.update_eps_ne_rate_old()
        assert_close(elem.eps_ne_rate_old, true_rate, rtol=1e-4, atol=1e-7)


class TestDislocationCreep:
    def make(self):
        n = 1
        return sc.DislocationCreep(1.9e-20 * jnp.ones(n), 51600 * jnp.ones(n),
                                   3.0 * jnp.ones(n), name="creep")

    def test_full_lifecycle(self):
        elem = self.make()
        elem.compute_G_B(STRESS_A, DT, THETA, TEMP)
        true_G = [[[2.7650e-15, -1.3564e-15, -1.4086e-15, -8.3471e-16, -1.0434e-15, -1.2521e-15],
                   [-1.3564e-15, 2.7128e-15, -1.3564e-15, 0, 0, 0],
                   [-1.4086e-15, -1.3564e-15, 2.7650e-15, 8.3471e-16, 1.0434e-15, 1.2521e-15],
                   [-2.0868e-16, 0, 2.0868e-16, 1.1477e-14, 4.1735e-15, 5.0083e-15],
                   [-2.6085e-16, 0, 2.6085e-16, 4.1735e-15, 1.3355e-14, 6.2603e-15],
                   [-3.1302e-16, 0, 3.1302e-16, 5.0083e-15, 6.2603e-15, 1.5651e-14]]]
        assert_close(elem.G, true_G, rtol=1e-4, atol=1e-19)

        elem.compute_eps_ne_rate(STRESS_A, PHI1, TEMP)
        true_rate = [[[-4.0692e-09, 1.6277e-08, 2.0346e-08],
                      [1.6277e-08, 0.0, 2.4415e-08],
                      [2.0346e-08, 2.4415e-08, 4.0692e-09]]]
        assert_close(elem.eps_ne_rate, true_rate, rtol=1e-4, atol=1e-12)

        elem.compute_eps_ne_k(PHI1, PHI2)
        true_k = [[[-1.4649e-05, 5.8597e-05, 7.3246e-05],
                   [5.8597e-05, 0.0, 8.7895e-05],
                   [7.3246e-05, 8.7895e-05, 1.4649e-05]]]
        assert_close(elem.eps_ne_k, true_k, rtol=1e-4, atol=1e-8)

        elem.update_eps_ne_old(STRESS_A, ZEROS, PHI2)
        true_eps = [[[-8.7519e-05, 4.0867e-04, 5.1084e-04],
                     [4.0867e-04, 0.0, 6.1301e-04],
                     [5.1084e-04, 6.1301e-04, 8.7519e-05]]]
        assert_close(elem.eps_ne_old, true_eps, rtol=1e-3, atol=1e-4)

        assert_close(elem.eps_ne_rate_old, np.zeros((1, 3, 3)), rtol=1e-10, atol=1e-10)
        elem.update_eps_ne_rate_old()
        assert_close(elem.eps_ne_rate_old, true_rate, rtol=1e-4, atol=1e-10)


class TestPressureSolutionCreep:
    def make(self):
        n = 1
        return sc.PressureSolutionCreep(1.29e-15 * jnp.ones(n),
                                        10e-3 * jnp.ones(n),
                                        13184 * jnp.ones(n), name="creep")

    def test_full_lifecycle(self):
        elem = self.make()
        elem.compute_G_B(STRESS_A, DT, THETA, TEMP)
        true_G = [[[1.4155e-14, -7.0777e-15, -7.0777e-15, 0, 0, 0],
                   [-7.0777e-15, 1.4155e-14, -7.0777e-15, 0, 0, 0],
                   [-7.0777e-15, -7.0777e-15, 1.4155e-14, 0, 0, 0],
                   [0, 0, 0, 4.2466e-14, 0, 0],
                   [0, 0, 0, 0, 4.2466e-14, 0],
                   [0, 0, 0, 0, 0, 4.2466e-14]]]
        assert_close(elem.G, true_G, rtol=1e-4, atol=1e-18)

        elem.compute_eps_ne_rate(STRESS_A, PHI1, TEMP)
        true_rate = [[[-2.1233e-08, 8.4932e-08, 1.0617e-07],
                      [8.4932e-08, 0.0, 1.2740e-07],
                      [1.0617e-07, 1.2740e-07, 2.1233e-08]]]
        assert_close(elem.eps_ne_rate, true_rate, rtol=1e-4, atol=1e-11)

        elem.compute_eps_ne_k(PHI1, PHI2)
        true_k = [[[-7.6439e-05, 3.0576e-04, 3.8219e-04],
                   [3.0576e-04, 0.0, 4.5863e-04],
                   [3.8219e-04, 4.5863e-04, 7.6439e-05]]]
        assert_close(elem.eps_ne_k, true_k, rtol=1e-3, atol=1e-8)

        elem.update_eps_ne_old(STRESS_A, ZEROS, PHI2)
        true_eps = [[[-1.5288e-04, 9.1727e-04, 1.1466e-03],
                     [9.1727e-04, 0.0, 1.3759e-03],
                     [1.1466e-03, 1.3759e-03, 1.5288e-04]]]
        assert_close(elem.eps_ne_old, true_eps, rtol=1e-3, atol=1e-4)


def _desai_oracle_rate(stress_cp_mpa, alpha, p):
    """Independent numpy transcription of the reference Desai rate
    (MaterialProps.py:1291-1429, current code: flow built on I1_star).

    ``stress_cp_mpa``: dict of the six compression-positive MPa components.
    Returns (rate_voigt(6,), Fvp).
    """
    sxx, syy, szz = stress_cp_mpa["xx"], stress_cp_mpa["yy"], stress_cp_mpa["zz"]
    sxy, sxz, syz = stress_cp_mpa["xy"], stress_cp_mpa["xz"], stress_cp_mpa["yz"]
    I1 = sxx + syy + szz
    I2 = sxx * syy + syy * szz + sxx * szz - sxy**2 - syz**2 - sxz**2
    I3 = (sxx * syy * szz + 2 * sxy * syz * sxz - szz * sxy**2
          - sxx * syz**2 - syy * sxz**2)
    J2 = I1**2 / 3 - I2
    J3 = (2 / 27) * I1**3 - (1 / 3) * I1 * I2 + I3
    J2 = max(J2, 1e-6)
    Sr = -(J3 * np.sqrt(27)) / (2 * J2**1.5)
    I1s = I1 + p["sigma_t"]

    F1y = alpha * I1s**p["n"] - p["gamma"] * I1s**2
    F2y = max(np.exp(p["beta_1"] * I1s) - p["beta"] * Sr, 1e-6)
    Fvp = J2 + F1y * F2y**p["m"]

    F1 = -alpha * I1s**p["n"] + p["gamma"] * I1s**2
    F2 = max(np.exp(p["beta_1"] * I1s) - p["beta"] * Sr, 1e-6)
    dF1_dI1 = 2 * p["gamma"] * I1s - p["n"] * alpha * I1s**(p["n"] - 1)
    dF2m_dI1 = p["beta_1"] * p["m"] * np.exp(p["beta_1"] * I1s) * F2**(p["m"] - 1)
    dF_dI1 = -(dF1_dI1 * F2**p["m"] + F1 * dF2m_dI1)
    dF2_dJ2 = -(3 * p["beta"] * J3 * np.sqrt(27)) / (4 * J2**2.5)
    dF_dJ2 = 1 - F1 * p["m"] * F2**(p["m"] - 1) * dF2_dJ2
    dF_dJ3 = -p["m"] * F1 * p["beta"] * np.sqrt(27) * F2**(p["m"] - 1) / (2 * J2**1.5)

    dI2 = np.array([syy + szz, sxx + szz, sxx + syy, -2 * sxy, -2 * sxz, -2 * syz])
    dI3 = np.array([syy * szz - syz**2, sxx * szz - sxz**2, sxx * syy - sxy**2,
                    2 * (sxz * syz - szz * sxy), 2 * (sxy * syz - syy * sxz),
                    2 * (sxz * sxy - sxx * syz)])
    dI1 = np.array([1., 1., 1., 0., 0., 0.])
    dJ2 = (2 / 3) * I1 * dI1 - dI2
    dJ3 = ((2 / 9) * I1**2 - I2 / 3) * dI1 - (I1 / 3) * dI2 + dI3
    dQdS = dF_dI1 * dI1 + dF_dJ2 * dJ2 + dF_dJ3 * dJ3

    lmbda = p["mu_1"] * Fvp**p["N_1"] if Fvp > 0 else 0.0
    return -dQdS * lmbda, Fvp


DESAI_P = dict(mu_1=5.3665857009859815e-11, N_1=3.1, a_1=1.965018496922832e-05,
               eta=0.8275682807874163, n=3.0, beta_1=0.0048, beta=0.995,
               m=-0.5, gamma=0.095, sigma_t=5.0, alpha_0=0.0022)


def _desai_oracle_residue(rate6, alpha, qsi_old, dt, p):
    nrm = np.sqrt((rate6[:3]**2).sum() + 2 * (rate6[3:]**2).sum())
    qsi = qsi_old + nrm * dt
    r = alpha - p["a_1"] / (((p["a_1"] / p["alpha_0"])**(1 / p["eta"]) + qsi)**p["eta"])
    return r, qsi


class TestViscoplasticDesai:
    """Oracle: independent numpy transcription of the *current* reference
    formulas.  NOTE: the reference's own golden test values
    (tests/test_material.py:244-265) were generated by an older flow rule
    using unshifted I1; the current reference code builds the flow on I1_star
    (MaterialProps.py:1329-1348), so those stale G/rate goldens are not
    reproducible by the reference code itself.  Invariant-level goldens
    (Fvp = 185.226, alpha unchanged) remain valid and are asserted.
    """

    def make(self):
        one = jnp.ones(1)
        return sc.ViscoplasticDesai(
            **{k: v * one for k, v in DESAI_P.items()}, name="desai")

    STRESS_TRIAX = -1e7 * jnp.asarray([[[1., 0., 0.],
                                        [0., 1., 0.],
                                        [0., 0., 3.]]])
    CP = dict(xx=10., yy=10., zz=30., xy=0., xz=0., yz=0.)

    def test_rate_matches_oracle(self):
        elem = self.make()
        elem.compute_eps_ne_rate(self.STRESS_TRIAX, PHI1, TEMP)
        rate_o, Fvp_o = _desai_oracle_rate(self.CP, DESAI_P["alpha_0"], DESAI_P)
        rate = np.asarray(elem.eps_ne_rate)[0]
        np.testing.assert_allclose(np.diag(rate), rate_o[:3], rtol=3e-6)
        np.testing.assert_allclose(rate[0, 1], 0.0, atol=1e-18)
        # golden yield-function value from the reference test-suite
        assert_close(elem.Fvp, [185.2260], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(float(elem.Fvp[0]), Fvp_o, rtol=1e-7)

    def test_tangent_matches_oracle_fd(self):
        """G = E - H/h with the reference's literal FD probe semantics
        (stale stored-rate base, EPS_alpha = 1e-4 alpha, EPS_sigma = 0.1 Pa)."""
        elem = self.make()
        elem.compute_G_B(self.STRESS_TRIAX, DT, THETA, TEMP)
        p = DESAI_P
        alpha = p["alpha_0"]

        # oracle h, Q with zero stored rate (elem state starts at zero)
        r0, _ = _desai_oracle_residue(np.zeros(6), alpha, 0.0, DT, p)
        eps_a = 1e-4 * alpha
        rate_a, _ = _desai_oracle_rate(self.CP, alpha + eps_a, p)
        r_a, _ = _desai_oracle_residue(rate_a, alpha + eps_a, 0.0, DT, p)
        h_o = (r_a - r0) / eps_a
        Q_o = rate_a / eps_a
        np.testing.assert_allclose(float(elem.state["h"][0]), h_o, rtol=1e-6)

        # oracle P: perturb each Voigt stress entry by 0.1 Pa = 1e-7 MPa
        P_o = np.zeros(6)
        keys = ["xx", "yy", "zz", "xy", "xz", "yz"]
        for k in range(6):
            cp = dict(self.CP)
            cp[keys[k]] -= 1e-7  # +0.1 Pa SafeInCave = -1e-7 MPa compression-positive
            rate_p, _ = _desai_oracle_rate(cp, alpha, p)
            r_p, _ = _desai_oracle_residue(rate_p, alpha, 0.0, DT, p)
            P_o[k] = (r_p - r0) / 0.1
        np.testing.assert_allclose(np.asarray(elem.state["P"])[0], P_o,
                                   rtol=1e-6, atol=1e-12)

        # oracle E: central FD of the oracle rate (1e-2 Pa steps, x2 shear cols)
        E_o = np.zeros((6, 6))
        for k in range(6):
            cp_p, cp_m = dict(self.CP), dict(self.CP)
            cp_p[keys[k]] -= 1e-8   # +1e-2 Pa in SafeInCave signs
            cp_m[keys[k]] += 1e-8
            rp, _ = _desai_oracle_rate(cp_p, alpha, p)
            rm, _ = _desai_oracle_rate(cp_m, alpha, p)
            fac = 1.0 if k < 3 else 2.0
            E_o[:, k] = fac * (rp - rm) / (2 * 1e-2)
        H_o = np.outer(Q_o, P_o * np.array([1, 1, 1, 2, 2, 2]))
        G_o = E_o - H_o / h_o
        np.testing.assert_allclose(np.asarray(elem.G)[0], G_o,
                                   rtol=2e-3, atol=1e-12)

        # alpha untouched before increment; qsi committed from the fresh rate
        assert_close(elem.alpha, [0.0022], rtol=1e-12, atol=0)
        rate_c, _ = _desai_oracle_rate(self.CP, alpha, p)
        _, qsi_o = _desai_oracle_residue(rate_c, alpha, 0.0, DT, p)
        np.testing.assert_allclose(float(elem.qsi[0]), qsi_o, rtol=1e-6)

    def test_increment_and_commit(self):
        elem = self.make()
        elem.compute_G_B(self.STRESS_TRIAX, DT, THETA, TEMP)
        elem.compute_eps_ne_rate(self.STRESS_TRIAX, PHI1, TEMP)
        alpha_before = float(elem.alpha[0])
        elem.increment_internal_variables(self.STRESS_TRIAX, self.STRESS_TRIAX, DT)
        # delta_alpha = -r/h with equal stresses
        expected = alpha_before - float(elem.state["r"][0]) / float(elem.state["h"][0])
        np.testing.assert_allclose(float(elem.alpha[0]), max(expected, 1e-10),
                                   rtol=1e-12)
        elem.update_internal_variables()
        np.testing.assert_allclose(np.asarray(elem.qsi_old), np.asarray(elem.qsi))

    def test_initial_hardening_zeros_fvp(self):
        elem = self.make()
        elem.compute_initial_hardening(self.STRESS_TRIAX, Fvp_0=0.0)
        assert_close(elem.Fvp, [0.0], rtol=0, atol=1e-3)  # ~1e-7 of the J2 scale; limited by XLA pow precision
        assert float(elem.alpha[0]) > 0


class TestMohrCoulomb:
    def make(self, mu_1=1e-8, psi=0.0):
        n = 1
        one = jnp.ones(n)
        return sc.MohrCoulombViscoplastic(
            mu_1=mu_1 * one, N_1=1.0 * one, cohesion=1.0 * one,
            friction_angle=np.deg2rad(30.0) * one,
            dilation_angle=psi * one, sigma_t=1.0 * one)

    def test_no_yield_hydrostatic_compression(self):
        elem = self.make()
        stress = -10e6 * jnp.eye(3)[None]
        elem.compute_eps_ne_rate(stress, PHI1, TEMP)
        assert float(jnp.abs(elem.eps_ne_rate).max()) == 0.0
        assert float(elem.Fvp[0]) < 0

    def test_yield_in_shear_is_deviatoric(self):
        elem = self.make(psi=0.0)
        stress = -1e6 * jnp.asarray([[[1., 0., 0.],
                                      [0., 1., 0.],
                                      [0., 0., 30.]]])
        elem.compute_eps_ne_rate(stress, PHI1, TEMP)
        rate = np.asarray(elem.eps_ne_rate)[0]
        assert float(elem.Fvp[0]) > 0
        assert np.abs(rate).max() > 0
        # zero dilation -> traceless viscoplastic flow
        np.testing.assert_allclose(np.trace(rate), 0.0, atol=1e-18)

    def test_tension_cutoff_volumetric(self):
        elem = self.make()
        stress = 5e6 * jnp.eye(3)[None]  # isotropic tension 5 MPa > sigma_t
        elem.compute_eps_ne_rate(stress, PHI1, TEMP)
        rate = np.asarray(elem.eps_ne_rate)[0]
        assert float(elem.Fvp[0]) > 0
        # volumetric expansion flow: diagonal positive, equal (sign: -(-1/3)*lmbda)
        assert rate[0, 0] > 0
        np.testing.assert_allclose(rate[0, 0], rate[1, 1], rtol=1e-12)
        np.testing.assert_allclose(rate[0, 0], rate[2, 2], rtol=1e-12)


class TestMatsuokaNakai:
    def make(self):
        n = 1
        one = jnp.ones(n)
        return sc.MatsuokaNakaiViscoplastic(
            mu_1=1e-8 * one, N_1=1.0 * one, cohesion=1.0 * one,
            friction_angle=np.deg2rad(30.0) * one,
            dilation_angle=0.0 * one, sigma_t=1.0 * one)

    def test_matches_mc_in_triaxial_compression(self):
        """MN and MC share the flow rule; in triaxial compression the MN NFC
        yield reduces to the Mohr-Coulomb criterion, so onset must agree."""
        mn = self.make()
        one = jnp.ones(1)
        # MC at the same friction/cohesion
        mc = sc.MohrCoulombViscoplastic(
            mu_1=1e-8 * one, N_1=1.0 * one, cohesion=1.0 * one,
            friction_angle=jnp.asarray(np.deg2rad(30.0)) * one,
            dilation_angle=0.0 * one, sigma_t=1.0 * one)
        # MC in triaxial compression: sig1 = sig3 * (1+sin)/(1-sin) + 2c cos/(1-sin)
        sin, cos = np.sin(np.deg2rad(30)), np.cos(np.deg2rad(30))
        sig3 = 5.0
        sig1_crit = sig3 * (1 + sin) / (1 - sin) + 2 * 1.0 * cos / (1 - sin)
        for fac, expect_yield in [(0.95, False), (1.1, True)]:
            s1 = sig1_crit * fac
            stress = -1e6 * jnp.asarray([[[sig3, 0., 0.],
                                          [0., sig3, 0.],
                                          [0., 0., s1]]])
            mn.compute_eps_ne_rate(stress, PHI1, TEMP)
            yielded = float(mn.Fvp[0]) > 0
            assert yielded == expect_yield, (fac, float(mn.Fvp[0]))

    def test_frictionless_has_zero_shift(self):
        one = jnp.ones(1)
        elem = sc.MatsuokaNakaiViscoplastic(
            mu_1=1e-8 * one, N_1=1.0 * one, cohesion=1.0 * one,
            friction_angle=0.0 * one, dilation_angle=0.0 * one,
            sigma_t=1.0 * one)
        assert float(elem.params["cohesive_shift"][0]) == 0.0


class TestMunsonDawson:
    def make(self):
        n = 1
        one = jnp.ones(n)
        return sc.MunsonDawsonCreep(
            A=1.9e-20 * one, Q=51600 * one, n=3.0 * one,
            K0=1e-6 * one, c=0.009198 * one, m=3.0 * one,
            alpha_w=-17.37 * one, beta_w=-7.738 * one, delta=0.58 * one,
            mu=12.4e9 * one)

    def test_rate_direction_and_steady_state(self):
        elem = self.make()
        elem.compute_eps_ne_rate(STRESS_A, PHI1, TEMP)
        rate = np.asarray(elem.eps_ne_rate)[0]
        # deviatoric flow (traceless)
        np.testing.assert_allclose(np.trace(rate), 0.0, atol=1e-20)
        # scalar magnitude: F * epsdot_ss * 1.5 * |s| / sigma
        s = np.asarray(STRESS_A)[0]
        dev = s - np.trace(s) / 3 * np.eye(3)
        sigma = np.sqrt(1.5 * (dev * dev).sum())
        epsdot_ss = 1.9e-20 * np.exp(-51600 / 8.32 / 298.0) * sigma ** 3
        F = float(elem.F[0])
        expected = F * epsdot_ss * 1.5 * dev / sigma
        np.testing.assert_allclose(rate, expected, rtol=1e-6)

    def test_zeta_relaxes_toward_eps_t_star(self):
        """Transient: F > 1 while zeta < eps_t*; zeta grows via the ISV update."""
        elem = self.make()
        elem.compute_eps_ne_rate(STRESS_A, PHI1, TEMP)
        assert float(elem.F[0]) > 1.0  # hardening branch with these params
        elem.compute_G_B(STRESS_A, DT, THETA, TEMP)
        elem.increment_internal_variables(STRESS_A, STRESS_A, DT)
        assert float(elem.zeta[0]) > 0.0
        elem.update_internal_variables()
        np.testing.assert_allclose(np.asarray(elem.zeta_old),
                                   np.asarray(elem.zeta))

    def test_tangent_consistency_fd(self):
        """Exact h, P must match finite differences of the residue."""
        elem = self.make()
        elem.state["zeta"] = 1e-7 * jnp.ones(1)
        elem.compute_G_B(STRESS_A, DT, THETA, TEMP)
        r0 = np.asarray(elem.compute_residue(STRESS_A, elem.state["zeta"], TEMP, DT))
        dz = 1e-12
        r1 = np.asarray(elem.compute_residue(STRESS_A, elem.state["zeta"] + dz, TEMP, DT))
        h_fd = (r1 - r0) / dz
        np.testing.assert_allclose(np.asarray(elem.h), h_fd, rtol=1e-3)
