"""Mohr-Coulomb digital-twin calibration on triaxial compression tests.

This is the framework-native rebuild of the reference's FLAC3D-based
strength calibration (/root/reference/examples/mechanics/MaterialCalibration/
optimizer/models.py:51-186 compression_model + optimizer.py:17-43): there,
every optimizer probe re-runs an Itasca zone model under a velocity-driven
ram and scipy L-BFGS-B finite-differences the residual.  Here the twin is
``sc.TriaxialSimulator.run_compression`` - the same mixed control (axial
strain rate at fixed radial confinement) integrated with the framework's
own theta-scheme constitutive machinery - and because it is a pure-JAX
``lax.scan``, the Mohr-Coulomb strength parameters are fitted with EXACT
autodiff gradients through the entire stress-strain history.

Workflow (mirrors the lab practice encoded in the reference optimizer):
  1. Young's modulus from the initial elastic slope of S_diff(eps_axial)
     (closed form - no optimizer needed for the elastic branch).
  2. Cohesion + friction angle by gradient descent on the full curve at
     two confinements simultaneously (batched as two material points).

With no arguments, synthetic "lab" curves are generated from known
parameters (plus noise) and recovered; pass CSV paths with
(eps_axial_pct, S_diff_MPa) columns to fit measured data.
"""
import sys

import numpy as np
import jax.numpy as jnp

import safeincave_tpu as sc

MPa = 1e6
DEG = np.pi / 180.0

# two confinement levels, SafeInCave signs (compression negative)
SR = np.array([-2.0 * MPa, -5.0 * MPa])
E_TRUE, NU = 25e9, 0.3
# NOTE the element's units: cohesion / sigma_t in MPa, compression-positive
# (materials/viscoplastic.py _cp_mpa), matching the reference's parameter
# tables (MaterialProps.py:1565-1746)
TRUE = {"cohesion": 3.0, "friction": 30.0 * DEG}
DILATION = 10.0 * DEG
# Perzyna overstress viscosity: large enough that the stress relaxes to
# the yield surface within a few load steps (near-rate-independent limit)
MU_1, N_1 = 2e-5, 1.5

EPS_RATE = 1e-5            # 1/s axial strain rate (ram velocity analog)
T_END = 2000.0             # -> 2 % axial strain
TIMES = np.linspace(0.0, T_END, 81)


def run_twin(cohesion, friction, sample_scale=1.0):
    """S_diff histories (T, 2) for both confinements, differentiable in
    (cohesion, friction)."""
    n = len(SR)
    one = jnp.ones(n)
    mat = sc.Material(n)
    mat.add_to_elastic(sc.Spring(E_TRUE * np.ones(n), NU * np.ones(n)))
    mat.add_to_non_elastic(sc.MohrCoulombViscoplastic(
        mu_1=MU_1 * one, N_1=N_1 * one,
        cohesion=cohesion * one, friction_angle=friction * one,
        dilation_angle=DILATION * one, sigma_t=1.0 * one))
    sim = sc.TriaxialSimulator(mat, theta=0.5)
    # prescribed total axial strain: isotropic elastic state at t=0, then
    # the ram moves at EPS_RATE (compression -> increasingly negative)
    eps0 = np.asarray((mat.C_inv[:, 2, 0] + mat.C_inv[:, 2, 1]
                       + mat.C_inv[:, 2, 2])) * np.asarray(SR)
    ez = eps0[None, :] - EPS_RATE * TIMES[:, None] * sample_scale
    res = sim.run_compression(jnp.asarray(SR), jnp.asarray(ez), TIMES)
    return res["S_diff"]


def fit(observed):
    fitted, hist = sc.calibrate(
        lambda p: run_twin(p["cohesion"], p["friction"]),
        params0={"cohesion": 1.5, "friction": 22.0 * DEG},
        observed=observed, lr=0.08, steps=250,
        loss_scale=float(np.abs(observed).max()))
    return fitted, hist


def main():
    if len(sys.argv) > 1:
        curves = []
        for path in sys.argv[1:]:
            arr = np.loadtxt(path, delimiter=",", skiprows=1)
            # columns: eps_axial_pct, S_diff_MPa -> resample onto TIMES
            eps = EPS_RATE * TIMES * 100.0
            curves.append(np.interp(eps, arr[:, 0], arr[:, 1]) * MPa)
        observed = np.stack(curves, axis=1)
    else:
        rng = np.random.default_rng(0)
        observed = np.asarray(run_twin(TRUE["cohesion"], TRUE["friction"]))
        observed = observed * (1 + 0.01 * rng.standard_normal(observed.shape))

    # elastic branch check: initial slope == E (uniaxial increment at
    # constant radial stress has d S_diff / d eps_axial = -E); use the
    # first step, before the weaker confinement reaches yield
    k = 1
    slope = ((observed[k, 1] - observed[0, 1])
             / (EPS_RATE * (TIMES[k] - TIMES[0])))
    print(f"elastic slope -> E ~ {abs(slope)/1e9:.1f} GPa "
          f"(true {E_TRUE/1e9:.1f})")

    fitted, hist = fit(observed)
    print(f"fitted cohesion  = {float(fitted['cohesion']):.3f} MPa "
          f"(true {TRUE['cohesion']:.3f})")
    print(f"fitted friction  = {float(fitted['friction'])/DEG:.2f} deg "
          f"(true {TRUE['friction']/DEG:.2f})")
    print(f"loss: {hist[0]:.3e} -> {hist[-1]:.3e}")
    return fitted


if __name__ == "__main__":
    main()
