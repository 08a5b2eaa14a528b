"""Jitted matrix-free Krylov solvers (CG and BiCGStab) with Jacobi
preconditioning.

Replaces PETSc KSP (reference Simulators.py:1075-1086; examples use
cg/bicg/bcgs + ASM/ILU at rtol=1e-12, max_it=100-200).  The operator is a
closure performing the masked stiffness action; the whole iteration runs in a
``lax.while_loop`` on device, so one linear solve is a single XLA program with
no host round-trips.

Convergence: relative residual ||r|| <= rtol * ||b|| (+ atol), like KSP's
default left-preconditioned residual test but on the true residual.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _vdot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def cg_solve(A: Callable, b, x0, M_inv, rtol=1e-12, atol=0.0, maxiter=200):
    """Preconditioned conjugate gradients for SPD operators.

    Parameters
    ----------
    A : callable(x) -> Ax
    M_inv : callable(r) -> preconditioned residual (e.g. Jacobi)

    Returns (x, iterations, final_residual_norm).
    """
    b_norm = jnp.sqrt(_vdot(b, b))
    tol2 = jnp.maximum(rtol * b_norm, atol) ** 2

    r0 = b - A(x0)
    z0 = M_inv(r0)
    p0 = z0
    rz0 = _vdot(r0, z0)

    def cond(carry):
        x, r, z, p, rz, k = carry
        return (_vdot(r, r) > tol2) & (k < maxiter)

    def body(carry):
        x, r, z, p, rz, k = carry
        Ap = A(p)
        pAp = _vdot(p, Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = _vdot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return x, r, z, p, rz_new, k + 1

    x, r, _, _, _, k = jax.lax.while_loop(cond, body,
                                          (x0, r0, z0, p0, rz0, 0))
    return x, k, jnp.sqrt(_vdot(r, r))


def bicgstab_solve(A: Callable, b, x0, M_inv, rtol=1e-12, atol=0.0,
                   maxiter=200):
    """Preconditioned BiCGStab for (mildly) non-symmetric operators.

    Needed because the consistent tangent CT with Desai/Munson-Dawson ISV
    coupling is non-symmetric (rank-one H term), which is why the reference
    examples run PETSc bicg/bcgs rather than cg.
    """
    b_norm = jnp.sqrt(_vdot(b, b))
    tol2 = jnp.maximum(rtol * b_norm, atol) ** 2

    r0 = b - A(x0)
    rhat = r0

    def cond(carry):
        x, r, p, v, rho, alpha, omega, k = carry
        return (_vdot(r, r) > tol2) & (k < maxiter)

    def body(carry):
        x, r, p, v, rho, alpha, omega, k = carry
        rho_new = _vdot(rhat, r)
        beta = (rho_new / jnp.where(rho != 0, rho, 1.0)) * \
               (alpha / jnp.where(omega != 0, omega, 1.0))
        p = r + beta * (p - omega * v)
        phat = M_inv(p)
        v = A(phat)
        denom = _vdot(rhat, v)
        alpha = rho_new / jnp.where(denom != 0, denom, 1.0)
        s = r - alpha * v
        shat = M_inv(s)
        t = A(shat)
        tt = _vdot(t, t)
        omega = _vdot(t, s) / jnp.where(tt != 0, tt, 1.0)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return x, r, p, v, rho_new, alpha, omega, k + 1

    init = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
            jnp.asarray(1.0, b.dtype), jnp.asarray(1.0, b.dtype),
            jnp.asarray(1.0, b.dtype), 0)
    x, r, _, _, _, _, _, k = jax.lax.while_loop(cond, body, init)
    return x, k, jnp.sqrt(_vdot(r, r))
