"""Multi-model creep calibration on staged triaxial schedules.

Ports the reference's two-model calibration workflow
(/root/reference/examples/mechanics/MaterialCalibration/calibrate_newdata.py):

  (a) the SafeInCave chain - Spring + Kelvin + DislocationCreep + Desai
      (scalar axial forms, reference :192-252 disloc_rate / kelvin_rate /
      desai_rate / _update_alpha, integrated like :289-388)
  (b) Munson-Dawson - Spring + MunsonDawsonCreep (reference :254-278,
      :390-478), here reusing the framework element's own per-point physics
      (materials/creep.py MunsonDawsonCreep._md_fields_one) so the
      calibrated parameters drop straight into the FE solver.

Differences from the reference: the forward models are pure-JAX
``lax.scan`` programs, so the fits use EXACT autodiff gradients through the
integrator (sc.calibrate = Adam in log-space) instead of scipy L-BFGS-B
finite differences; and the stress schedule interpolation is
``build_stress_schedule`` parity (reference :150-185).

Data: pass a ZW_TCC*.csv path (time_h, sigma1_MPa, sigma3_MPa,
eps_axial_pct columns) to fit lab data; with no argument, synthetic
observations are generated from known parameters and recovered.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import safeincave_tpu as sc
from safeincave_tpu.materials.creep import MunsonDawsonCreep

HOUR = 3600.0
R_GAS = 8.32
T_LAB = 298.0


# -- schedule (reference calibrate_newdata.py:150-185) ---------------------- #
def build_stress_schedule(time_h, sigma1_MPa, sigma3_MPa, dt_hours=0.25):
    """Fine time grid with stresses interpolated from lab waypoints.

    Returns (t_s, sigma1_Pa, sigma3_Pa, idx_start); t=0 is where deviatoric
    loading (sigma1 - sigma3 > 1 MPa) begins, like the reference.
    """
    time_h = np.asarray(time_h, dtype=float)
    sigma1 = np.asarray(sigma1_MPa, dtype=float)
    sigma3 = np.asarray(sigma3_MPa, dtype=float)
    mask = (sigma1 - sigma3) > 1.0
    if not np.any(mask):
        raise ValueError("No deviatoric loading found in data")
    idx = int(np.argmax(mask))
    t_lab = (time_h[idx:] - time_h[idx]) * HOUR
    n = int(np.ceil((time_h[-1] - time_h[idx]) / dt_hours))
    t_s = np.linspace(0.0, t_lab[-1], n + 1)
    s1 = np.interp(t_s, t_lab, sigma1[idx:] * 1e6)
    s3 = np.interp(t_s, t_lab, sigma3[idx:] * 1e6)
    return t_s, s1, s3, idx


# -- model (a): SafeInCave chain, scalar axial form ------------------------- #
def sic_axial_strain(params, t_s, s1, s3):
    """Axial creep strain of Spring+Kelvin+DislocationCreep (+elastic).

    params: A, n (dislocation, Q fixed at 51600), eta, E1 (Kelvin).
    Kelvin uses the exact exponential per-step update (reference :339-345);
    dislocation is forward-Euler on the interpolated schedule (:347-352).
    """
    sd = jnp.asarray(s1 - s3)
    dts = jnp.diff(jnp.asarray(t_s))
    A_bar = jnp.exp(jnp.log(params["A"]) - 51600.0 / (R_GAS * T_LAB))

    def step(carry, inp):
        eps_k, eps_d = carry
        sd_k, dt = inp
        # exact Kelvin relaxation over dt at frozen stress
        eps_k_inf = sd_k / params["E1"]
        decay = jnp.exp(-params["E1"] * dt / params["eta"])
        eps_k = eps_k_inf + (eps_k - eps_k_inf) * decay
        eps_d = eps_d + A_bar * jnp.abs(sd_k) ** params["n"] \
            * jnp.sign(sd_k) * dt
        return (eps_k, eps_d), eps_k + eps_d

    (_, _), eps = lax.scan(step, (jnp.asarray(0.0), jnp.asarray(0.0)),
                           (sd[1:], dts))
    return jnp.concatenate([jnp.zeros(1), eps])


# -- model (b): Munson-Dawson via the framework element's physics ----------- #
def md_axial_strain(params, t_s, s1, s3, n_newton=12):
    """Axial creep strain of the Munson-Dawson element under the schedule.

    Reuses MunsonDawsonCreep's own per-point physics (_md_fields_one /
    _residue_one, materials/creep.py) on the triaxial stress tensor
    diag(-s3, -s3, -s1) (SafeInCave signs), so the calibrated parameters
    drop straight into the FE solver.  The transient ISV zeta advances by
    BACKWARD Euler (Newton on the element's residue): the transient
    relaxation time e*/((F0-1) edot_ss) is seconds at lab stresses, far
    stiffer than any practical dt - the reference copes with adaptive
    forward-Euler sub-stepping (calibrate_newdata.py:390-478), implicit is
    the robust equivalent.  The strain increment uses the exact identity
    d(eps_transient) = d(zeta) * 1.5 dev/sigma, so no stiffness enters the
    strain either.  params: A, n, K0, delta; other MD constants fixed.
    """
    p = {"A": params["A"], "Q": jnp.asarray(51600.0), "n": params["n"],
         "K0": params["K0"], "c": jnp.asarray(0.0),
         "m": jnp.asarray(3.0), "alpha_w": jnp.asarray(-13.2),
         "beta_w": jnp.asarray(-7.738), "delta": params["delta"],
         "mu": jnp.asarray(12.4e9)}
    dts = jnp.diff(jnp.asarray(t_s))
    sv_hist = jnp.stack([
        -jnp.asarray(s3), -jnp.asarray(s3), -jnp.asarray(s1),
        jnp.zeros_like(jnp.asarray(s1)), jnp.zeros_like(jnp.asarray(s1)),
        jnp.zeros_like(jnp.asarray(s1))], axis=-1)           # (T, 6)

    def step(carry, inp):
        zeta_old, eps_zz = carry
        sv6, dt = inp

        def res(z):
            return MunsonDawsonCreep._residue_one(sv6, z, zeta_old, T_LAB,
                                                  dt, p)

        def newton(z, _):
            r = res(z)
            h = jax.grad(res)(z)
            h = jnp.where(jnp.abs(h) > 1e-12, h, 1.0)
            return jnp.maximum(z - r / h, 0.0), None

        zeta, _ = lax.scan(newton, zeta_old, None, length=n_newton)
        dev, sig, edot_ss, _, _ = MunsonDawsonCreep._md_fields_one(
            sv6, zeta, T_LAB, p)
        proj = 1.5 * dev[2] / sig
        # steady-state + exact transient increment (zeta IS the transient
        # equivalent strain: zeta_dot = (F-1) edot_ss)
        eps_zz = eps_zz + proj * (edot_ss * dt + (zeta - zeta_old))
        return (zeta, eps_zz), eps_zz

    (_, _), eps = lax.scan(step, (jnp.asarray(0.0), jnp.asarray(0.0)),
                           (sv_hist[1:], dts))
    return jnp.concatenate([jnp.zeros(1), eps])


TRUE_SIC = {"A": 1.9e-20, "n": 3.0, "eta": 1.05e14, "E1": 10e9}
TRUE_MD = {"A": 1.9e-20, "n": 3.0, "K0": 1e7, "delta": 0.58}


def staged_schedule():
    """Staged deviatoric loading with a final UNLOAD (ZW_TCC pattern).

    The unload stage matters for Munson-Dawson: the recovery exponent
    delta only acts when zeta > eps_t_star, i.e. after a stress DROP -
    a monotonic schedule leaves delta unidentifiable."""
    time_h = [0, 1, 24, 25, 72, 73, 120, 121, 168]
    sigma1 = [5, 14, 14, 18, 18, 22, 22, 12, 12]     # MPa
    sigma3 = [5, 4, 4, 4, 4, 4, 4, 4, 4]
    return build_stress_schedule(time_h, sigma1, sigma3, dt_hours=0.5)


def load_csv(path):
    d = np.genfromtxt(path, delimiter=",", names=True)
    cols = d.dtype.names
    return (d[cols[0]], d[cols[1]], d[cols[2]],
            d[cols[3]] / 100.0 if len(cols) > 3 else None)


def main(csv_path=None):
    if csv_path:
        time_h, s1_MPa, s3_MPa, eps_obs = load_csv(csv_path)
        t_s, s1, s3, idx = build_stress_schedule(time_h, s1_MPa, s3_MPa)
        obs_sic = obs_md = np.interp(
            t_s, (np.asarray(time_h)[idx:] - time_h[idx]) * HOUR,
            eps_obs[idx:])
    else:
        t_s, s1, s3, _ = staged_schedule()
        rng = np.random.default_rng(0)
        noise = 1 + 0.01 * rng.standard_normal(len(t_s))
        obs_sic = np.asarray(sic_axial_strain(
            {k: jnp.asarray(v) for k, v in TRUE_SIC.items()},
            t_s, s1, s3)) * noise
        obs_md = np.asarray(md_axial_strain(
            {k: jnp.asarray(v) for k, v in TRUE_MD.items()},
            t_s, s1, s3)) * noise

    scale = max(np.abs(obs_sic).max(), 1e-12)
    fitted_sic, hist = sc.calibrate(
        lambda p: sic_axial_strain(p, t_s, s1, s3),
        params0={"A": 5e-20, "n": 2.5, "eta": 3e14, "E1": 5e9},
        observed=obs_sic, lr=0.05, steps=400, loss_scale=scale)
    print("SafeInCave chain fit:")
    for k, v in fitted_sic.items():
        print(f"  {k}: {float(v):.4e}   (true {TRUE_SIC[k]:.4e})")
    print(f"  loss {hist[0]:.3e} -> {hist[-1]:.3e}")

    scale = max(np.abs(obs_md).max(), 1e-12)
    fitted_md, hist = sc.calibrate(
        lambda p: md_axial_strain(p, t_s, s1, s3),
        params0={"A": 5e-20, "n": 2.5, "K0": 3e6, "delta": 0.3},
        observed=obs_md, lr=0.05, steps=400, loss_scale=scale)
    print("Munson-Dawson fit:")
    for k, v in fitted_md.items():
        print(f"  {k}: {float(v):.4e}   (true {TRUE_MD[k]:.4e})")
    print(f"  loss {hist[0]:.3e} -> {hist[-1]:.3e}")
    return fitted_sic, fitted_md


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
