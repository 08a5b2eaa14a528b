"""Banded Pallas matvec vs the XLA MomentumKernel (interpret mode, CPU).

Interpret mode executes the exact kernel program (lane shuffles, roll-based
prefix sums, one-hot matmuls) with XLA semantics, so agreement here pins the
kernel math + static tables; Mosaic lowering is exercised separately on the
real TPU (bench.py).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from safeincave_tpu.fem.bandplan import BandPlan
from safeincave_tpu.fem.bandkernel import BandMatvec
from safeincave_tpu.fem.kernels import MomentumKernel
from safeincave_tpu.mesh.boxgen import GridBox
from safeincave_tpu.mesh.reorder import reordered_grid


def _setup(nx=5):
    g0 = GridBox(Lx=1.0, Ly=2.0, Lz=1.5, nx=nx, ny=nx, nz=nx)
    g, _, _ = reordered_grid(g0, method="band")
    plan = BandPlan.build(np.asarray(g.conn), g.n_nodes)
    return g, plan


@pytest.mark.parametrize("nx", [3, 5])
def test_band_matvec_matches_xla(nx):
    g, plan = _setup(nx)
    kern = MomentumKernel(g)
    band = BandMatvec(plan, interpret=True)

    rng = np.random.default_rng(2)
    E = g.n_elems
    # random SPD-ish CT per element (symmetric, diagonally dominant)
    M = rng.normal(size=(E, 6, 6))
    CT = 0.5 * (M + np.transpose(M, (0, 2, 1))) + 8.0 * np.eye(6)
    u = rng.normal(size=(g.n_nodes, 3))

    CT_soa = jnp.asarray(np.transpose(CT, (1, 2, 0)).astype(np.float32))
    u32 = jnp.asarray(u.astype(np.float32))
    ref = np.asarray(kern.matvec(CT_soa, u32))

    ctv = band.pack_ct(CT_soa, jnp.asarray(g.volumes, jnp.float32))
    gn = band.pack_gn(jnp.asarray(g.grad_N, jnp.float32))
    got = np.asarray(band.matvec(ctv, gn, u32))

    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


def test_band_matvec_elastic_energy_symmetry():
    """u^T A v == v^T A u for the symmetrized operator."""
    g, plan = _setup(4)
    band = BandMatvec(plan, interpret=True)
    rng = np.random.default_rng(3)
    E = g.n_elems
    M = rng.normal(size=(E, 6, 6))
    CT = 0.5 * (M + np.transpose(M, (0, 2, 1))) + 8.0 * np.eye(6)
    # symmetrize in the energy sense: A is symmetric when CT has the
    # w=diag(1,1,1,2,2,2) Voigt symmetry CT = w^-1 CT^T w; build one such
    w = np.diag([1.0, 1, 1, 2, 2, 2])
    CT = 0.5 * (CT + np.linalg.inv(w) @ np.transpose(CT, (0, 2, 1)) @ w)
    CT_soa = jnp.asarray(np.transpose(CT, (1, 2, 0)).astype(np.float32))
    ctv = band.pack_ct(CT_soa, jnp.asarray(g.volumes, jnp.float32))
    gn = band.pack_gn(jnp.asarray(g.grad_N, jnp.float32))

    u = rng.normal(size=(g.n_nodes, 3)).astype(np.float32)
    v = rng.normal(size=(g.n_nodes, 3)).astype(np.float32)
    Au = np.asarray(band.matvec(ctv, gn, jnp.asarray(u)))
    Av = np.asarray(band.matvec(ctv, gn, jnp.asarray(v)))
    a = float((v * Au).sum())
    b = float((u * Av).sum())
    assert abs(a - b) < 1e-3 * max(abs(a), 1.0)
