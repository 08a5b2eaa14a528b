"""Owned-node halo-exchange sharding (v2): correctness + comm-volume tests.

The VERDICT scalability criterion: the distributed stiffness action must
match the single-device operator at 1e-9 AND communicate O(interface) rows
per matvec (not O(n_nodes * D) like the replicated-psum v1 path).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import safeincave_tpu as sc
from safeincave_tpu.parallel import make_device_mesh
from safeincave_tpu.parallel.halo import HaloPlan, HaloMomentumSolver
from safeincave_tpu.fem.kernels import MomentumKernel


def _grid(nx=6):
    return sc.GridBox(nx=nx, ny=nx, nz=nx)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
class TestHaloMatvec:
    def test_matches_single_device(self):
        grid = _grid()
        mesh = make_device_mesh()
        D = mesh.devices.size
        solver = HaloMomentumSolver(grid, mesh)
        kern = MomentumKernel(grid)

        rng = np.random.default_rng(0)
        E, N = grid.n_elems, grid.n_nodes
        # SPD-ish random tangents + random vector + a Dirichlet mask
        A = rng.normal(size=(E, 6, 6))
        CT = jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + 6 * np.eye(6))
        u = jnp.asarray(rng.normal(size=(N, 3)))
        mask = jnp.asarray((rng.random((N, 3)) > 0.1).astype(float))

        ref = mask * kern.matvec(kern.prep(CT), mask * u)

        CT_l = solver.ct_to_local(CT)
        u_pad = solver.to_padded(u)
        mask_pad = solver.to_padded(mask)
        out = solver.from_padded(
            solver.matvec_padded(CT_l, u_pad, mask_pad))

        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-9, atol=1e-9 * scale)

    def test_comm_volume_is_interface_sized(self):
        grid = _grid(nx=8)
        plan = HaloPlan(grid, 8)
        N = grid.n_nodes
        # v1 psum ships ~N rows per device per matvec; the halo plan must
        # ship only part-boundary rows - for an 8-way RCB of a cube this is
        # a few surface layers, far below the volume
        per_dev = plan.comm_volume_per_matvec()
        assert per_dev < 0.35 * N, (per_dev, N)
        # every part's surface is much smaller than the whole mesh
        assert plan.interface_fraction() < 1.5, plan.interface_fraction()
        # sanity: ownership covers all nodes exactly once
        counts = np.bincount(plan.owner, minlength=plan.D)
        assert counts.sum() == N
        assert counts.max() <= plan.S

    def test_partition_is_balanced(self):
        grid = _grid(nx=8)
        plan = HaloPlan(grid, 8)
        sizes = np.bincount(plan.elem_part, minlength=plan.D)
        assert sizes.min() >= 0.8 * sizes.max()
