"""Viscoplastic elements: Desai, Mohr-Coulomb (Drucker-Prager), Matsuoka-Nakai.

Reference models:
* ViscoplasticDesai          /root/reference/safeincave/MaterialProps.py:1037-1562
* MohrCoulombViscoplastic    :1565-1746
* MatsuokaNakaiViscoplastic  :1749-1968

All three use the compression-positive, MPa-scaled stress convention
internally (reference :1199-1220) and Perzyna overstress multipliers.  The
Desai hardening linearization (r, h, Q, P) uses exact autodiff in place of the
reference's finite-difference probes; all published guard semantics (J2 floor,
F2 clamp, softening cut-off, h ~ 0 handling, alpha positivity) are preserved.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..linalg import eigvalsh3x3
from ..utils import MPa, VOIGT_WEIGHT, norm_voigt, voigt_to_tensor
from .base import NonElasticElement, _as_voigt

# python float (weak-typed in jax): a numpy float64 SCALAR would silently
# promote the float32 mixed-precision phase back to float64
_SQRT27 = float(np.sqrt(27.0))
# float32 constant: exact values; float64 inputs still promote to float64
# while the mixed-precision (float32) phase stays float32
_ISO6 = np.asarray([1., 1., 1., 0., 0., 0.], dtype=np.float32)


def _cp_mpa(sv6):
    """SafeInCave stress (Pa, tension+) -> compression-positive MPa components."""
    return -sv6 / MPa


def _invariants_cp(s):
    """I1, I2, I3, J2, J3 from compression-positive Voigt components."""
    sxx, syy, szz, sxy, sxz, syz = (s[k] for k in range(6))
    I1 = sxx + syy + szz
    I2 = sxx * syy + syy * szz + sxx * szz - sxy ** 2 - syz ** 2 - sxz ** 2
    I3 = (sxx * syy * szz + 2 * sxy * syz * sxz
          - szz * sxy ** 2 - sxx * syz ** 2 - syy * sxz ** 2)
    J2 = I1 ** 2 / 3.0 - I2
    J3 = (2.0 / 27.0) * I1 ** 3 - (1.0 / 3.0) * I1 * I2 + I3
    return I1, I2, I3, J2, J3


class ViscoplasticDesai(NonElasticElement):
    """Perzyna viscoplasticity with hardening ISV alpha (reference :1037-1562)."""

    F_0 = 1.0
    J2_MIN = 1e-6       # MPa^2 floor (reference :1187)
    F2_MIN = 1e-6       # clamp on F2 (reference :1244, :1340)
    H_MIN = 1e-6        # |h| guard (reference :1473)
    ALPHA_MIN = 1e-10   # positivity clamp on alpha (reference :1158)

    def __init__(self, mu_1, N_1, a_1, eta, n, beta_1, beta, m, gamma,
                 sigma_t, alpha_0, name: str = "desai"):
        mu_1 = np.asarray(mu_1, dtype=np.float64)
        super().__init__(mu_1.shape[0], name)
        as64 = lambda x: np.asarray(x, dtype=np.float64)
        self.params = {
            "mu_1": mu_1, "N_1": as64(N_1), "a_1": as64(a_1), "eta": as64(eta),
            "n": as64(n), "beta_1": as64(beta_1), "beta": as64(beta),
            "m": as64(m), "gamma": as64(gamma), "sigma_t": as64(sigma_t),
            "alpha_0": as64(alpha_0),
        }
        z = jnp.asarray(np.zeros(self.n_elems))
        self.state.update({
            "alpha": jnp.asarray(self.params["alpha_0"]),
            "qsi": z,
            "qsi_old": z,
            "Fvp": z,
            "r": z,
            "h": jnp.asarray(np.ones(self.n_elems)),
            "P": jnp.asarray(np.zeros((self.n_elems, 6))),
            "h_small": jnp.asarray(np.zeros(self.n_elems, dtype=bool)),
        })

    # ------------------------------------------------------------------ #
    # Per-element pure physics
    # ------------------------------------------------------------------ #
    @staticmethod
    def _Fvp_one(alpha, I1s, J2s, Sr, p):
        """Yield function (reference compute_Fvp :1222-1246).

        ``I1s <= 0`` (net tension beyond the tensile shift) is outside the
        model's domain: the reference evaluates ``I1s ** n`` there and
        silently produces NaN (torch pow of a negative base).  The power is
        evaluated at a clamped base instead; callers kill the flow for such
        elements (see ``_rate_one_static``), which is the only non-NaN
        reading of the reference semantics.
        """
        I1c = jnp.maximum(I1s, 1e-12)
        F1 = alpha * I1c ** p["n"] - p["gamma"] * I1s ** 2
        F2 = jnp.exp(jnp.clip(p["beta_1"] * I1s, -50.0, 50.0)) \
            - p["beta"] * Sr
        F2 = jnp.maximum(F2, ViscoplasticDesai.F2_MIN)
        return J2s + F1 * F2 ** p["m"]

    @staticmethod
    def _rate_one_static(sv6, alpha, p):
        """Viscoplastic strain rate (reference compute_eps_ne_rate :1291-1429)."""
        s = _cp_mpa(sv6)
        sxx, syy, szz, sxy, sxz, syz = (s[k] for k in range(6))
        I1, I2, I3, J2, J3 = _invariants_cp(s)

        j2_low = J2 <= ViscoplasticDesai.J2_MIN
        J2s = jnp.maximum(J2, ViscoplasticDesai.J2_MIN)
        Sr = -(J3 * _SQRT27) / (2.0 * J2s ** 1.5)
        Sr = jnp.where(j2_low, 0.0, Sr)

        I1s = I1 + p["sigma_t"]
        Fvp = ViscoplasticDesai._Fvp_one(alpha, I1s, J2s, Sr, p)

        # domain guard: fractional powers of I1s NaN for I1s <= 0 (tension
        # beyond the tensile shift); clamp the power base and kill the flow
        # on such elements (see _Fvp_one docstring)
        tension = I1s <= 0.0
        I1c = jnp.maximum(I1s, 1e-12)

        # Flow direction dF/dsigma via the (I1, J2, J3) chain rule (:1329-1407)
        F1 = -alpha * I1c ** p["n"] + p["gamma"] * I1s ** 2
        # exp clamped at +-50: only active beyond ~10 GPa |I1| (far outside
        # the physical range), but keeps a transiently-garbage Krylov
        # iterate from turning into inf*0=NaN downstream
        F2 = jnp.exp(jnp.clip(p["beta_1"] * I1s, -50.0, 50.0)) \
            - p["beta"] * Sr
        f2_neg = F2 < ViscoplasticDesai.F2_MIN
        F2 = jnp.maximum(F2, ViscoplasticDesai.F2_MIN)

        dF1_dI1 = 2 * p["gamma"] * I1s - p["n"] * alpha * I1c ** (p["n"] - 1)
        dF2m_dI1 = (p["beta_1"] * p["m"]
                    * jnp.exp(jnp.clip(p["beta_1"] * I1s, -50.0, 50.0))
                    * F2 ** (p["m"] - 1))
        dF_dI1 = -(dF1_dI1 * F2 ** p["m"] + F1 * dF2m_dI1)

        dF2_dJ2 = -(3 * p["beta"] * J3 * _SQRT27) / (4 * J2s ** 2.5)
        dF_dJ2 = 1 - F1 * p["m"] * F2 ** (p["m"] - 1) * dF2_dJ2
        dF_dJ3 = -p["m"] * F1 * p["beta"] * _SQRT27 * F2 ** (p["m"] - 1) / (2 * J2s ** 1.5)

        dI2 = jnp.stack([syy + szz, sxx + szz, sxx + syy,
                         -2 * sxy, -2 * sxz, -2 * syz])
        dI3 = jnp.stack([syy * szz - syz ** 2,
                         sxx * szz - sxz ** 2,
                         sxx * syy - sxy ** 2,
                         2 * (sxz * syz - szz * sxy),
                         2 * (sxy * syz - syy * sxz),
                         2 * (sxz * sxy - sxx * syz)])
        dI1 = _ISO6

        dJ2_dI1 = (2.0 / 3.0) * I1
        dJ2 = dJ2_dI1 * dI1 - dI2
        dJ3_dI1 = (2.0 / 9.0) * I1 ** 2 - (1.0 / 3.0) * I2
        dJ3_dI2 = -(1.0 / 3.0) * I1
        dJ3 = dJ3_dI1 * dI1 + dJ3_dI2 * dI2 + dI3

        dQdS = dF_dI1 * dI1 + dF_dJ2 * dJ2 + dF_dJ3 * dJ3

        # Guard semantics (:1409-1417): zero flow where J2 ~ 0, F2 was
        # negative, or alpha has fully softened.
        softened = alpha <= 0.01 * p["alpha_0"]
        kill = j2_low | f2_neg | softened | tension
        dQdS = jnp.where(kill, 0.0, dQdS)

        # Perzyna multiplier with NaN-safe power (:1420-1424)
        yielding = (Fvp > 0) & ~tension
        Fvp_safe = jnp.where(yielding, Fvp, 1.0)
        lmbda = jnp.where(
            yielding,
            p["mu_1"] * (Fvp_safe / ViscoplasticDesai.F_0) ** p["N_1"],
            0.0)
        return -dQdS * lmbda, Fvp

    @staticmethod
    def _residue_one(rate6, alpha, qsi_old, dt, p):
        """Hardening residue r(alpha) (reference compute_residue :1094-1117)."""
        qsi = qsi_old + norm_voigt(rate6) * dt
        r = alpha - p["a_1"] / (((p["a_1"] / p["alpha_0"]) ** (1.0 / p["eta"])
                                 + qsi) ** p["eta"])
        return r, qsi

    # ------------------------------------------------------------------ #
    # Element protocol
    # ------------------------------------------------------------------ #
    def _isv_slice(self, state):
        return {"alpha": state["alpha"]}

    def _rate_one(self, sv6, isv, T, p):
        return self._rate_one_static(sv6, isv["alpha"], p)[0]

    def f_rate(self, state, sv6, phi1, T):
        new = dict(state)
        rate, Fvp = jax.vmap(self._rate_one_static, in_axes=(0, 0, 0))(
            sv6, state["alpha"], self._p(sv6.dtype))
        new["rate"] = rate
        new["Fvp"] = Fvp
        return new

    def f_tangent(self, state, sv6, T, dt, theta):
        """(r, h, Q, P) hardening linearization (reference :1432-1500).

        NOTE: these are *literal* forward differences, not derivatives.  The
        reference uses the stored strain rate as the FD base while perturbed
        evaluations recompute the rate fresh (:1463-1467); when the stored
        rate is stale the secant is dominated by that mismatch, and the
        published trajectories (and golden tests) depend on this behavior, so
        it is reproduced exactly.  Only the flow-Jacobian E uses exact
        autodiff (its central FD has no stale base).
        """
        alpha = state["alpha"]
        qsi_old = state["qsi_old"]
        params = self._p(sv6.dtype)

        batched_rate = jax.vmap(
            lambda s, a, p: self._rate_one_static(s, a, p)[0],
            in_axes=(0, 0, 0))
        batched_res = jax.vmap(self._residue_one, in_axes=(0, 0, 0, None, 0))

        # base residue with the *stored* rate (:1465)
        r, _ = batched_res(state["rate"], alpha, qsi_old, dt, params)

        # alpha probe: EPSILON_ALPHA = 1e-4 * alpha (:1459).  In the f32
        # fixed-point phase the reference probe sizes fall below float32
        # resolution (0.1 Pa on ~1e7 Pa stress is a 1e-8 relative nudge), so
        # they are widened - the probes only shape the iteration path; the
        # final f64 iterations (reference-exact probes) decide convergence.
        f32 = sv6.dtype == jnp.float32
        eps_a = (1e-2 if f32 else 1e-4) * alpha
        rate_a = batched_rate(sv6, alpha + eps_a, params)
        r_a, _ = batched_res(rate_a, alpha + eps_a, qsi_old, dt, params)
        h = (r_a - r) / eps_a
        Q = (rate_a - state["rate"]) / eps_a[:, None]

        # stress probes: EPSILON_STRESS = 0.1 Pa on each Voigt entry (:1480-1488)
        P_cols = []
        for k in range(6):
            if f32:
                EPS_S = 1e-3 * (1.0 + jnp.abs(sv6[:, k]))
            else:
                EPS_S = 1e-1
            sv_p = sv6.at[:, k].add(EPS_S)
            rate_p = batched_rate(sv_p, alpha, params)
            r_p, _ = batched_res(rate_p, alpha, qsi_old, dt, params)
            P_cols.append((r_p - r) / EPS_S)
        P = jnp.stack(P_cols, axis=-1)

        # committed qsi uses the fresh (consistent) rate at the probe point;
        # the reference commits the value from its last FD probe (:1116),
        # which differs only by the 0.1 Pa perturbation.
        rate_fresh = batched_rate(sv6, alpha, params)
        qsi = qsi_old + norm_voigt(rate_fresh) * dt

        h_small = jnp.abs(h) < self.H_MIN
        h = jnp.where(h_small, 1.0, h)
        B = (r / h)[:, None] * Q

        H = Q[:, :, None] * (P * VOIGT_WEIGHT)[:, None, :]
        H_over_h = H / h[:, None, None]

        E = self._E_exact(sv6, {"alpha": alpha}, T)

        B = jnp.where(h_small[:, None], 0.0, B)
        P = jnp.where(h_small[:, None], 0.0, P)
        H_over_h = jnp.where(h_small[:, None, None], 0.0, H_over_h)

        new = dict(state)
        new["G"] = E - H_over_h
        new["B"] = B
        new["r"] = r
        new["h"] = h
        new["P"] = P
        new["h_small"] = h_small
        new["qsi"] = qsi
        return new

    def f_increment_isv(self, state, sv6, sv6_k, dt):
        """delta_alpha = -(r + P:(sigma-sigma_k))/h, alpha kept positive (:1129-1158)."""
        dsig = sv6 - sv6_k
        pd = jnp.sum(state["P"] * VOIGT_WEIGHT * dsig, axis=-1)
        delta = -(state["r"] + pd) / state["h"]
        delta = jnp.where(state["h_small"], 0.0, delta)
        new = dict(state)
        new["alpha"] = jnp.maximum(state["alpha"] + delta, self.ALPHA_MIN)
        return new

    def f_commit_isv(self, state):
        new = dict(state)
        new["qsi_old"] = state["qsi"]
        return new

    # ------------------------------------------------------------------ #
    def compute_initial_hardening(self, stress, Fvp_0: float = 0.0):
        """Solve alpha_0 from Fvp = Fvp_0 at the current stress (reference :1248-1288)."""
        sv6 = _as_voigt(stress)
        p = self.params

        def one(sv, pp):
            s = _cp_mpa(sv)
            I1, I2, I3, J2, J3 = _invariants_cp(s)
            j2_low = J2 <= self.J2_MIN
            J2s = jnp.maximum(J2, self.J2_MIN)
            Sr = jnp.where(j2_low, 0.0, -(J3 * _SQRT27) / (2.0 * J2s ** 1.5))
            I1s = I1 + pp["sigma_t"]
            F2i = jnp.maximum(jnp.exp(pp["beta_1"] * I1s) - pp["beta"] * Sr,
                              self.F2_MIN)
            a0 = (pp["gamma"] * I1s ** (2 - pp["n"])
                  + (Fvp_0 - J2s) * I1s ** (-pp["n"]) * F2i ** (-pp["m"]))
            return a0, (I1s, J2s, Sr)

        alpha_0, (I1s, J2s, Sr) = jax.vmap(one, in_axes=(0, 0))(sv6, p)
        ALPHA_MIN0 = 1e-6  # reference :1275
        self.ind_desai_disabled = jnp.where(alpha_0 <= ALPHA_MIN0)[0]
        alpha_0 = jnp.maximum(alpha_0, ALPHA_MIN0)
        self.params = dict(self.params, alpha_0=alpha_0)
        new = dict(self.state)
        new["alpha"] = alpha_0
        new["Fvp"] = jax.vmap(self._Fvp_one, in_axes=(0, 0, 0, 0, 0))(
            alpha_0, I1s, J2s, Sr, self.params)
        self.state = new

    # -- reference-style views ------------------------------------------- #
    @property
    def alpha(self):
        return self.state["alpha"]

    @property
    def alpha_0(self):
        return self.params["alpha_0"]

    @property
    def Fvp(self):
        return self.state["Fvp"]

    @property
    def qsi(self):
        return self.state["qsi"]

    @property
    def qsi_old(self):
        return self.state["qsi_old"]

    @property
    def r(self):
        return self.state["r"]

    @property
    def h(self):
        return self.state["h"]

    @property
    def P(self):
        return voigt_to_tensor(self.state["P"])


class _DPFlowMixin:
    """Shared Drucker-Prager non-associated flow direction (reference :1705-1732)."""

    @staticmethod
    def _dp_flow(s, alpha_Q):
        """Flow direction in compression-positive Voigt components."""
        sxx, syy, szz, sxy, sxz, syz = (s[k] for k in range(6))
        I1 = sxx + syy + szz
        I2 = (sxx * syy + syy * szz + sxx * szz
              - sxy ** 2 - syz ** 2 - sxz ** 2)
        J2 = jnp.maximum(I1 ** 2 / 3.0 - I2, 1e-20)
        inv2 = 1.0 / (2.0 * jnp.sqrt(J2))
        dJ2 = jnp.stack([(2. / 3.) * I1 - (syy + szz),
                         (2. / 3.) * I1 - (sxx + szz),
                         (2. / 3.) * I1 - (sxx + syy),
                         2 * sxy, 2 * sxz, 2 * syz])
        return inv2 * dJ2 - alpha_Q * _ISO6, I1, J2


class MohrCoulombViscoplastic(NonElasticElement, _DPFlowMixin):
    """Drucker-Prager circumscription of Mohr-Coulomb with tension cut-off.

    Reference: MaterialProps.py:1565-1746.  Perfect plasticity (no ISV),
    non-associated flow via the dilation angle.
    """

    F_0 = 1.0

    def __init__(self, mu_1, N_1, cohesion, friction_angle, dilation_angle,
                 sigma_t, name: str = "mohr_coulomb"):
        # numpy arithmetic on concrete inputs (params are captured by jitted
        # closures - device-array constants force a d2h fetch at lowering,
        # see materials/base.py _p); jnp only when cohesion/friction/dilation
        # are JAX tracers - the calibration twins differentiate through the
        # constructor (examples/mechanics/MaterialCalibration)
        traced = any(isinstance(x, jax.core.Tracer)
                     for x in (mu_1, N_1, cohesion, friction_angle,
                               dilation_angle, sigma_t))
        xp = jnp if traced else np
        mu_1 = xp.asarray(mu_1, dtype=xp.float64)
        super().__init__(mu_1.shape[0], name)
        as64 = lambda x: xp.asarray(x, dtype=xp.float64)
        cohesion = as64(cohesion)
        phi = as64(friction_angle)
        psi = as64(dilation_angle)
        sin_phi, cos_phi, sin_psi = xp.sin(phi), xp.cos(phi), xp.sin(psi)
        sq3 = np.sqrt(3.0)
        self.params = {
            "mu_1": mu_1, "N_1": as64(N_1), "sigma_t": as64(sigma_t),
            "alpha_F": 2.0 * sin_phi / (sq3 * (3.0 - sin_phi)),
            "k_F": 6.0 * cohesion * cos_phi / (sq3 * (3.0 - sin_phi)),
            "alpha_Q": 2.0 * sin_psi / (sq3 * (3.0 - sin_psi)),
        }
        self.cohesion = cohesion
        self.friction_angle = phi
        self.dilation_angle = psi
        self.state["Fvp"] = jnp.asarray(np.zeros(self.n_elems))

    @staticmethod
    def _rate_one_static(sv6, p):
        s = _cp_mpa(sv6)
        dQdS, I1, J2 = _DPFlowMixin._dp_flow(s, p["alpha_Q"])
        F_shear = jnp.sqrt(J2) - p["alpha_F"] * I1 - p["k_F"]
        F_tension = -I1 / 3.0 - p["sigma_t"]
        Fvp = jnp.maximum(F_shear, F_tension)
        is_tension = F_tension > F_shear
        dQdS = jnp.where(is_tension, -_ISO6 / 3.0, dQdS)
        Fvp_safe = jnp.where(Fvp > 0, Fvp, 1.0)
        lmbda = jnp.where(Fvp > 0,
                          p["mu_1"] * (Fvp_safe / MohrCoulombViscoplastic.F_0) ** p["N_1"],
                          0.0)
        return -dQdS * lmbda, Fvp

    def _rate_one(self, sv6, isv, T, p):
        return self._rate_one_static(sv6, p)[0]

    def f_rate(self, state, sv6, phi1, T):
        new = dict(state)
        rate, Fvp = jax.vmap(self._rate_one_static, in_axes=(0, 0))(
            sv6, self._p(sv6.dtype))
        new["rate"] = rate
        new["Fvp"] = Fvp
        return new

    @property
    def Fvp(self):
        return self.state["Fvp"]


class MatsuokaNakaiViscoplastic(NonElasticElement, _DPFlowMixin):
    """True Matsuoka-Nakai yield (NFC n=1 obliquity form) with DP-based flow.

    Reference: MaterialProps.py:1749-1968.  Principal stresses come from the
    analytic symmetric 3x3 eigensolver (:mod:`safeincave_tpu.linalg`) instead
    of torch ``eigvalsh``.
    """

    F_0 = 1.0

    def __init__(self, mu_1, N_1, cohesion, friction_angle, dilation_angle,
                 sigma_t, name: str = "matsuoka_nakai"):
        mu_1 = np.asarray(mu_1, dtype=np.float64)
        super().__init__(mu_1.shape[0], name)
        as64 = lambda x: np.asarray(x, dtype=np.float64)
        cohesion = as64(cohesion)
        phi = as64(friction_angle)
        psi = as64(dilation_angle)
        sin_phi, cos_phi, sin_psi = np.sin(phi), np.cos(phi), np.sin(psi)
        safe_sin = np.where(np.abs(sin_phi) < 1e-10, 1.0, sin_phi)
        shift = np.where(np.abs(sin_phi) < 1e-10, 0.0,
                         cohesion * cos_phi / safe_sin)
        self.params = {
            "mu_1": mu_1, "N_1": as64(N_1), "sigma_t": as64(sigma_t),
            "k_nfc": np.sqrt(2.0) * sin_phi,
            "cohesive_shift": shift,
            "alpha_Q": 2.0 * sin_psi / (np.sqrt(3.0) * (3.0 - sin_psi)),
        }
        self.cohesion = cohesion
        self.friction_angle = phi
        self.dilation_angle = psi
        self.state["Fvp"] = jnp.asarray(np.zeros(self.n_elems))

    @staticmethod
    def _rate_one_static(sv6, p):
        s = _cp_mpa(sv6)
        tensor = voigt_to_tensor(s)
        eig = eigvalsh3x3(tensor)  # ascending
        sig3_s = eig[0] + p["cohesive_shift"]
        sig2_s = eig[1] + p["cohesive_shift"]
        sig1_s = eig[2] + p["cohesive_shift"]

        d12 = jnp.maximum(sig1_s + sig2_s, 1e-20)
        d23 = jnp.maximum(sig2_s + sig3_s, 1e-20)
        d31 = jnp.maximum(sig3_s + sig1_s, 1e-20)
        sin2 = (((sig1_s - sig2_s) / d12) ** 2
                + ((sig2_s - sig3_s) / d23) ** 2
                + ((sig3_s - sig1_s) / d31) ** 2)
        f_nfc = jnp.sqrt(sin2 + 1e-30) - p["k_nfc"]
        p_mean = jnp.maximum((sig1_s + sig2_s + sig3_s) / 3.0, 1e-20)
        F_shear = f_nfc * p_mean

        dQdS, I1, J2 = _DPFlowMixin._dp_flow(s, p["alpha_Q"])
        F_tension = -I1 / 3.0 - p["sigma_t"]
        Fvp = jnp.maximum(F_shear, F_tension)
        is_tension = F_tension > F_shear
        dQdS = jnp.where(is_tension, -_ISO6 / 3.0, dQdS)
        Fvp_safe = jnp.where(Fvp > 0, Fvp, 1.0)
        lmbda = jnp.where(Fvp > 0,
                          p["mu_1"] * (Fvp_safe / MatsuokaNakaiViscoplastic.F_0) ** p["N_1"],
                          0.0)
        return -dQdS * lmbda, Fvp

    def _rate_one(self, sv6, isv, T, p):
        return self._rate_one_static(sv6, p)[0]

    def f_rate(self, state, sv6, phi1, T):
        new = dict(state)
        rate, Fvp = jax.vmap(self._rate_one_static, in_axes=(0, 0))(
            sv6, self._p(sv6.dtype))
        new["rate"] = rate
        new["Fvp"] = Fvp
        return new

    @property
    def Fvp(self):
        return self.state["Fvp"]
