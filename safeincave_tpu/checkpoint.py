"""Checkpoint / resume.

The reference has NO restart capability (SURVEY.md 5: stage handoff is
in-memory only; XDMF outputs are not restartable state).  Here the full
simulation state - displacement, stress/strain, every element's ISV state,
temperatures, time-controller position - is a flat dict of arrays, saved as a
single ``.npz``.  ``restore`` rebuilds the state onto an already-wired
equation (same mesh/material structure), enabling exact continuation.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def save_checkpoint(path: str, eq, t_control=None, heat_eq=None,
                    extra: dict | None = None):
    """Serialize full simulation state to ``path`` (.npz).

    Element arrays from sharded runs are sliced back to the true element
    count (parallel/sharding.py pads to a multiple of the device count), so
    a checkpoint saved from a sharded equation restores onto an unsharded
    one and vice versa.
    """
    n_pad = getattr(eq, "n_elems", None)
    n_true = getattr(eq, "n_elems_orig", n_pad)

    def unpad(a):
        a = np.asarray(a)
        if (a.ndim >= 1 and n_pad is not None and a.shape[0] == n_pad
                and n_pad > n_true):
            return a[:n_true]
        return a

    data = {
        "u": np.asarray(eq.u),
        "sig_v": unpad(eq.sig_v),
        "eps_tot_v": unpad(eq.eps_tot_v),
        "Temp": unpad(eq.Temp),
        "T0": unpad(eq.T0),
    }
    for idx, e in enumerate(eq.mat.elems_ne):
        for key, val in e.state.items():
            data[f"elem{idx}_{key}"] = unpad(val)
        for key, val in e.params.items():
            data[f"elemparam{idx}_{key}"] = unpad(val)
    if t_control is not None:
        data["tc_t"] = np.asarray(t_control.t)
        data["tc_step"] = np.asarray(t_control.step_counter)
    if heat_eq is not None:
        data["heat_T"] = np.asarray(heat_eq.T)
        data["heat_T_old"] = np.asarray(heat_eq.T_old)
    if extra:
        for k, v in extra.items():
            data[f"extra_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **data)


def load_checkpoint(path: str, eq, t_control=None, heat_eq=None) -> dict:
    """Restore state saved by :func:`save_checkpoint` onto wired objects.

    Returns the dict of ``extra_*`` entries (with prefix stripped).
    """
    with np.load(path) as z:
        eq.u = jnp.asarray(z["u"])
        eq.sig_v = jnp.asarray(z["sig_v"])
        eq.eps_tot_v = jnp.asarray(z["eps_tot_v"])
        eq.Temp = jnp.asarray(z["Temp"])
        eq.T0 = jnp.asarray(z["T0"])
        for idx, e in enumerate(eq.mat.elems_ne):
            st = dict(e.state)
            for key in st:
                name = f"elem{idx}_{key}"
                if name in z:
                    st[key] = jnp.asarray(z[name])
            e.state = st
            params = dict(e.params)
            for key in params:
                name = f"elemparam{idx}_{key}"
                if name in z:
                    params[key] = jnp.asarray(z[name])
            e.params = params
        if t_control is not None and "tc_t" in z:
            t_control.t = float(z["tc_t"])
            t_control.step_counter = int(z["tc_step"])
        if heat_eq is not None and "heat_T" in z:
            heat_eq.T = jnp.asarray(z["heat_T"])
            heat_eq.T_old = jnp.asarray(z["heat_T_old"])
        return {k[6:]: z[k] for k in z.files if k.startswith("extra_")}
