"""Calibrate creep parameters against a triaxial strain-time record.

Mirrors the reference MaterialCalibration workflow
(/root/reference/examples/mechanics/MaterialCalibration/optimizer/
optimizer.py:17-43: scipy L-BFGS-B over model residuals), but uses the
differentiable material-point simulator: exact autodiff gradients through the
theta-scheme integration, no finite differences.

Here synthetic "lab data" is generated from known parameters and recovered.
Replace ``observed`` with a measured axial-strain time series to fit real
creep tests.
"""
import numpy as np
import jax.numpy as jnp

import safeincave_tpu as sc

# triaxial stress state: 4 MPa confinement, 14 MPa axial (SafeInCave signs)
SIG = np.diag([-4e6, -4e6, -14e6])
TIMES = np.linspace(0.0, 48 * 3600.0, 49)
TEMP = 298.0

TRUE = {"A": 1.9e-20, "Q": 51600.0, "n": 3.0}


def axial_creep_strain(params):
    """Closed-form dislocation-creep axial strain under constant stress.

    (Under constant stress the theta-scheme is exact, so the analytic
    expression doubles as the fast differentiable forward model.)
    """
    dev_zz = SIG[2, 2] - np.trace(SIG) / 3.0
    q = abs(SIG[2, 2] - SIG[0, 0])
    A_bar = params["A"] * jnp.exp(-jnp.asarray(TRUE["Q"]) / 8.32 / TEMP) \
        * q ** (params["n"] - 1.0)
    return A_bar * dev_zz * jnp.asarray(TIMES)


def main():
    # synthetic observation from the true parameters (+ mild noise)
    rng = np.random.default_rng(0)
    observed = np.asarray(axial_creep_strain({k: jnp.asarray(v)
                                              for k, v in TRUE.items()}))
    observed = observed * (1 + 0.01 * rng.standard_normal(observed.shape))

    fitted, history = sc.calibrate(
        axial_creep_strain,
        params0={"A": 5e-20, "n": 2.5},
        observed=observed,
        lr=0.05, steps=300,
        loss_scale=np.abs(observed).max())

    print("fitted:", {k: float(v) for k, v in fitted.items()})
    print("true:  ", {k: TRUE[k] for k in fitted})
    print(f"loss: {history[0]:.3e} -> {history[-1]:.3e}")

    # cross-check with the full material-point integrator
    one = np.ones(1)
    mat = sc.Material(1)
    mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
    mat.add_to_non_elastic(sc.DislocationCreep(
        fitted["A"] * one, TRUE["Q"] * one, fitted["n"] * one))
    mps = sc.MaterialPointSimulator(mat, theta=0.5)
    res = mps.run(np.broadcast_to(SIG, (len(TIMES), 3, 3)), TIMES)
    model_axial = np.asarray(res["eps_ne"][:, 0, 2, 2])
    rms = np.sqrt(np.mean((model_axial - observed) ** 2))
    print(f"material-point RMS misfit: {rms:.3e}")


if __name__ == "__main__":
    main()
