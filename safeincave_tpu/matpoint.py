"""Material-point (0-D) simulator + differentiable calibration utilities.

The reference's v1 architecture had a ``MaterialPointSimulator``
(docs_archive/source/modules.rst) that v2 dropped; its MaterialCalibration
examples reimplement point integration ad hoc with scipy L-BFGS-B fits
(/root/reference/examples/mechanics/MaterialCalibration/optimizer/
optimizer.py:17-43, models.py:51-296).  This module restores it as a
first-class component and - being pure JAX - makes the whole stress-driven
integration differentiable, so calibration can use exact gradients instead of
finite differences.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .materials.base import _as_voigt
from .utils import voigt_to_tensor


class MaterialPointSimulator:
    """Integrate the inelastic response at material points under a prescribed
    stress history (the triaxial-test setting used for calibration).

    Uses the same theta-scheme ISV machinery as the FE solver: per step,
    tangent -> ISV increment (with sigma = sigma_k) -> rate -> predictor ->
    commit.
    """

    def __init__(self, mat, theta: float = 0.5, Temp=None):
        self.mat = mat
        self.theta = theta
        n = mat.n_elems
        self.Temp = (jnp.full(n, 298.0) if Temp is None
                     else jnp.asarray(Temp, dtype=jnp.float64))

    def run(self, stress_history, times):
        """Integrate under the prescribed stress path.

        Parameters
        ----------
        stress_history : (T, 3, 3) or (T, n_pts, 3, 3) or (T, n_pts, 6)
            Stress at each time instant (SafeInCave signs, Pa).
        times : (T,) seconds.

        Returns
        -------
        dict with "eps_ne" (T, n_pts, 3, 3) total inelastic strain,
        "eps_e" elastic strain, "eps_total", plus per-ISV histories.
        """
        mat = self.mat
        theta = self.theta
        n = mat.n_elems
        times = np.asarray(times, dtype=float)
        hist = np.asarray(stress_history, dtype=float)
        if hist.ndim == 3 and hist.shape[1:] == (3, 3):
            hist = np.broadcast_to(hist[:, None, :, :], (hist.shape[0], n, 3, 3))

        sv_hist = [_as_voigt(jnp.asarray(h)) for h in hist]
        states = [dict(e.state) for e in mat.elems_ne]

        out_eps_ne = []
        out_isv = {e.name: [] for e in mat.elems_ne}

        sv = sv_hist[0]
        # initial rates at the first stress state
        states = [e.f_rate(st, sv, 0.0, self.Temp)
                  for e, st in zip(mat.elems_ne, states)]
        states = [e.f_rate_to_old(st)
                  for e, st in zip(mat.elems_ne, states)]
        out_eps_ne.append(sum(st["eps_old"] for st in states)
                          if states else jnp.zeros((n, 6)))
        self._record_isv(states, out_isv)

        for k in range(1, len(times)):
            dt = float(times[k] - times[k - 1])
            sv_k = sv_hist[k - 1]
            sv = sv_hist[k]
            new_states = []
            for e, st in zip(mat.elems_ne, states):
                st = e.f_tangent(st, sv_k, self.Temp, dt, theta)
                st = e.f_increment_isv(st, sv, sv_k, dt)
                st = e.f_rate(st, sv, dt * theta, self.Temp)
                st = e.f_eps_k(st, dt * theta, dt * (1 - theta))
                st = e.f_commit_isv(st)
                st = e.f_update_eps_old(st, sv, sv_k, dt * (1 - theta))
                st = e.f_rate_to_old(st)
                new_states.append(st)
            states = new_states
            out_eps_ne.append(sum(st["eps_old"] for st in states)
                              if states else jnp.zeros((n, 6)))
            self._record_isv(states, out_isv)

        for e, st in zip(mat.elems_ne, states):
            e.state = st

        eps_ne = jnp.stack(out_eps_ne)                      # (T, n, 6)
        eps_e = jnp.stack([jnp.einsum("nij,nj->ni", mat.C_inv, s)
                           for s in sv_hist])
        result = {
            "times": times,
            "eps_ne": voigt_to_tensor(eps_ne),
            "eps_e": voigt_to_tensor(eps_e),
            "eps_total": voigt_to_tensor(eps_ne + eps_e),
        }
        for name, vals in out_isv.items():
            if vals and vals[0]:
                keys = vals[0].keys()
                result[name] = {k2: np.stack([np.asarray(v[k2]) for v in vals])
                                for k2 in keys}
        return result

    @staticmethod
    def _record_isv(states, out_isv):
        for (name, _), st in zip(out_isv.items(), states):
            rec = {}
            for key in ("alpha", "qsi", "Fvp", "zeta", "F"):
                if key in st:
                    rec[key] = st[key]
            out_isv[name].append(rec)


class TriaxialSimulator(MaterialPointSimulator):
    """Mixed-control triaxial compression twin: prescribed axial strain
    (strain-rate-controlled loading ram) at fixed radial confinement.

    This is the digital twin the reference's calibration optimizer builds
    in FLAC3D (/root/reference/examples/mechanics/MaterialCalibration/
    optimizer/models.py:51-186 compression_model: velocity-z loading at
    ``zone face apply stress-normal Sr`` confinement), re-expressed on the
    framework's own theta-scheme point machinery as a differentiable
    ``lax.scan`` - so Young/Poisson/cohesion/friction fits use exact
    gradients instead of FLAC re-runs per finite-difference probe.

    Per step the axial stress is the root of the scalar consistency
    equation  C_inv[2,:] . sigma + eps_ne_zz(sigma) = eps_zz_prescribed
    at fixed sig_xx = sig_yy = Sr, solved by ``n_fp`` fixed-point sweeps
    through the material's predictor (same structure as the FE solver's
    global iteration).
    """

    def run_compression(self, Sr, eps_axial, times, n_fp: int = 12):
        """Integrate a strain-driven compression path.

        Parameters
        ----------
        Sr : scalar or (n_pts,) radial confinement (SafeInCave signs: Pa,
            compression negative).
        eps_axial : (T,) or (T, n_pts) prescribed TOTAL axial strain
            (negative in compression), eps_axial[0] consistent with the
            initial isotropic state sigma = Sr * I.
        times : (T,) seconds.

        Returns dict with "sig_zz", "eps_vol", "eps_ne" histories
        ((T, n_pts) / (T, n_pts, 6)) and "S_diff" = sig_xx - sig_zz (the
        reference's differential stress, positive in compression).
        """
        mat = self.mat
        theta = self.theta
        n = mat.n_elems
        times = np.asarray(times, dtype=float)
        Sr = jnp.broadcast_to(jnp.asarray(Sr, dtype=jnp.float64), (n,))
        ez = jnp.asarray(eps_axial, dtype=jnp.float64)
        if ez.ndim == 1:
            ez = jnp.broadcast_to(ez[:, None], (len(times), n))
        dts = jnp.asarray(np.diff(times))
        Temp = self.Temp
        Ci = mat.C_inv                                        # (n, 6, 6)
        Ci_zz = Ci[:, 2, 2]
        Ci_zr = Ci[:, 2, 0] + Ci[:, 2, 1]

        def sv_of(szz):
            z = jnp.zeros_like(szz)
            return jnp.stack([Sr, Sr, szz, z, z, z], axis=-1)

        elems = mat.elems_ne

        def trial_eps_ne(states, sv, sv_k, dt):
            """End-of-step inelastic strain for a trial end stress."""
            tot = jnp.zeros((n, 6))
            new_states = []
            for e, st in zip(elems, states):
                st = e.f_tangent(st, sv_k, Temp, dt, theta)
                st = e.f_increment_isv(st, sv, sv_k, dt)
                st = e.f_rate(st, sv, dt * theta, Temp)
                st = e.f_eps_k(st, dt * theta, dt * (1 - theta))
                upd = e.f_update_eps_old(st, sv, sv_k, dt * (1 - theta))
                tot = tot + upd["eps_old"]
                new_states.append(st)
            return tot, new_states

        def step(carry, inp):
            states, szz_k = carry
            dt, ez_t = inp
            sv_k = sv_of(szz_k)

            def resid(szz):
                sv = sv_of(szz)
                eps_ne, _ = trial_eps_ne(states, sv, sv_k, dt)
                return Ci_zz * szz + Ci_zr * Sr + eps_ne[:, 2] - ez_t

            def newton(i, szz):
                # point-diagonal Jacobian via one jvp (plain fixed point
                # diverges for stiff Perzyna overstress: the inelastic
                # compliance d eps_ne_zz / d sig_zz exceeds the elastic one)
                r, dr = jax.jvp(resid, (szz,), (jnp.ones_like(szz),))
                dr = jnp.where(jnp.abs(dr) > 1e-30, dr, Ci_zz)
                return szz - r / dr

            szz = jax.lax.fori_loop(0, n_fp, newton, szz_k)
            sv = sv_of(szz)
            eps_ne, sts = trial_eps_ne(states, sv, sv_k, dt)
            # commit with the converged end stress
            new_states = []
            for e, st in zip(elems, sts):
                st = e.f_commit_isv(st)
                st = e.f_update_eps_old(st, sv, sv_k, dt * (1 - theta))
                st = e.f_rate_to_old(st)
                new_states.append(st)
            eps_tot = apply66_rows(Ci, sv) + eps_ne
            out = (szz, eps_tot[:, 0] + eps_tot[:, 1] + eps_tot[:, 2],
                   eps_ne)
            return (tuple(new_states), szz), out

        states0 = [dict(e.state) for e in elems]
        # initial rates at the isotropic state
        sv0 = sv_of(Sr)
        states0 = [e.f_rate(st, sv0, 0.0, Temp)
                   for e, st in zip(elems, states0)]
        states0 = [e.f_rate_to_old(st) for e, st in zip(elems, states0)]

        (states_f, _), (szz, evol, eps_ne) = jax.lax.scan(
            step, (tuple(states0), Sr), (dts, ez[1:]))
        for e, st in zip(elems, states_f):
            e.state = st
        szz = jnp.concatenate([Sr[None], szz], axis=0)
        ev0 = (apply66_rows(Ci, sv0)[:, :3].sum(-1)
               + sum(st["eps_old"][:, :3].sum(-1) for st in states0))
        evol = jnp.concatenate([ev0[None], evol], axis=0)
        return {
            "times": times,
            "sig_zz": szz,
            "S_diff": Sr[None, :] - szz,
            "eps_axial": ez,
            "eps_vol": evol,
            "eps_ne": (jnp.concatenate(
                [sum(st["eps_old"] for st in states0)[None], eps_ne])
                if elems else jnp.zeros((len(times), n, 6))),
        }


def apply66_rows(M, v):
    """(n,6) result of batched (n,6,6) @ (n,6) without einsum-in-f64."""
    return (M * v[:, None, :]).sum(-1)


def calibrate(build_result_fn, params0: dict, observed, lr: float = 0.05,
              steps: int = 200, loss_scale=None):
    """Gradient-based parameter calibration.

    ``build_result_fn(params) -> prediction array`` must be a pure JAX
    function of a dict of scalars/arrays; the loss is mean squared error
    against ``observed``.  Returns (fitted_params, loss_history).

    This replaces the reference's scipy L-BFGS-B finite-difference fits
    (MaterialCalibration/optimizer/optimizer.py:17-43) with exact autodiff
    gradients through the integrator, using log-space updates for positivity.
    """
    observed = jnp.asarray(observed)
    scale = jnp.asarray(1.0 if loss_scale is None else loss_scale)

    log_params = {k: jnp.log(jnp.asarray(v, dtype=jnp.float64))
                  for k, v in params0.items()}

    def loss_fn(lp):
        params = {k: jnp.exp(v) for k, v in lp.items()}
        pred = build_result_fn(params)
        return jnp.mean(((pred - observed) / scale) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    history = []
    # Adam in log-space with cosine lr decay; the returned parameters are
    # the BEST-loss iterate, not the last one (long runs can oscillate in
    # the flat A-n valleys of creep laws without this)
    m = {k: jnp.zeros_like(v) for k, v in log_params.items()}
    v2 = {k: jnp.zeros_like(v) for k, v in log_params.items()}
    b1, b2, eps = 0.9, 0.999, 1e-8
    best_loss, best = np.inf, dict(log_params)
    for i in range(steps):
        loss, g = grad_fn(log_params)
        history.append(float(loss))
        if history[-1] < best_loss:
            best_loss, best = history[-1], dict(log_params)
        lr_i = lr * (0.05 + 0.95 * 0.5
                     * (1 + np.cos(np.pi * i / max(steps - 1, 1))))
        for k in log_params:
            m[k] = b1 * m[k] + (1 - b1) * g[k]
            v2[k] = b2 * v2[k] + (1 - b2) * g[k] ** 2
            mhat = m[k] / (1 - b1 ** (i + 1))
            vhat = v2[k] / (1 - b2 ** (i + 1))
            log_params[k] = log_params[k] - lr_i * mhat / (jnp.sqrt(vhat)
                                                           + eps)
    loss, _ = grad_fn(log_params)
    if float(loss) < best_loss:
        best_loss, best = float(loss), dict(log_params)
    history.append(best_loss)
    fitted = {k: np.asarray(jnp.exp(v)) for k, v in best.items()}
    return fitted, history
