"""Pallas TPU kernel for the banded matrix-free CG1 stiffness action.

One ``pallas_call`` executes the whole matvec in VMEM:

    RS (gather copies) --lane-shuffle gather--> ue[a][c] (Er, 128)
    --element apply--> fe[a][c] (Er, 128) --reduce + slab scatter-->
    shifted slab blocks --(XLA compress)--> f (N, 3)

using the static schedule from :class:`~safeincave_tpu.fem.bandplan.BandPlan`.
The kernel contains NO matmuls and NO unstructured memory ops: only
per-row lane shuffles (``tpu.dynamic_gather``, the one shuffle Mosaic
supports), ``pltpu.roll`` prefix sums, static 8-aligned row slices, and
elementwise VPU math.  One-hot MXU matmuls were measured at ~0.1 us per
output row on this part (2112-row pool matmul = 135 us vs ~20 us for the
entire rest of the kernel), hence the slice-based design; XLA's generic
row-at-a-time gather/scatter (~650 us at cavern scale) never runs.

The surrounding XLA program does the cheap structured prep/finish (see
``BandPlan`` docstring): ``repeat(u2d, q)`` + residue-shifted copies before
the kernel, shifted slab summation + ``reshape(Nr, q, 128).sum(1)`` after.
Both fuse with the Krylov loop's vector ops.

The element apply is the same structure-of-arrays math as
``MomentumKernel.matvec`` (fem/kernels.py) with the element volume folded
into CT once per solve (``sigma * vol = (CT*vol) : eps``).

Precision: f32; the f64 outer defect-correction loop in the momentum solver
(fem/momentum.py ir_solve) supplies f64 accuracy on top.

Replaces: PETSc MatAIJ SpMV inside KSP
(/root/reference/safeincave/MomentumEquation.py:1008-1025).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bandplan import BandPlan

# tensorial Voigt order [xx, yy, zz, xy, xz, yz]
_VOIGT = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))
_T2V = {(i, j): p for p, (i, j) in enumerate(_VOIGT)}
_T2V.update({(j, i): p for p, (i, j) in enumerate(_VOIGT)})


def _lane_gather(x, idx):
    """out[s, l] = x[s, idx[s, l]] — per-row shuffle along the 128 lanes.

    x, idx, out all share one 2D shape; idx int32.  This is the shape
    Mosaic's ``tpu.dynamic_gather`` supports natively (one source vreg
    along the gather dim).
    """
    dn = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return lax.gather(x, idx[..., None], dn, (1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _lane_cumsum(x, lanes):
    """Inclusive prefix sum along lanes via 7 masked roll-adds."""
    for k in (1, 2, 4, 8, 16, 32, 64):
        shifted = pltpu.roll(x, jnp.int32(k), 1)
        x = x + jnp.where(lanes >= k, shifted, 0.0)
    return x


def _band_kernel(plan: BandPlan,
                 u_ref, ct_ref, gn_ref,
                 gk_ref, gl_ref, rsort_ref, rprev_ref, sal_ref,
                 o_ref):
    f32 = jnp.float32
    Er, Nr = plan.Er, plan.Nr
    Wg, Ws, Lg, Ls = plan.Wg, plan.Ws, plan.Lg, plan.Ls
    ng, ns = len(plan.g_res), len(plan.s_res)

    # ---- gather ------------------------------------------------------- #
    gk = [gk_ref[a * Er:(a + 1) * Er] for a in range(4)]
    gl = [gl_ref[a * Er:(a + 1) * Er] for a in range(4)]
    ue = [[None] * 3 for _ in range(4)]
    for c in range(3):
        base_c = c * ng * Lg
        slices = []
        for k in range(Wg):
            ci, off = plan.g_slice(k)
            r0 = base_c + ci * Lg + off
            slices.append(u_ref[r0:r0 + Er])
        for a in range(4):
            acc = jnp.zeros((Er, 128), f32)
            for k in range(Wg):
                g = _lane_gather(slices[k], gl[a])
                acc = acc + jnp.where(gk[a] == k, g, f32(0))
            ue[a][c] = acc

    # ---- element apply (SoA, vol folded into CT) ---------------------- #
    gn = [[gn_ref[(a * 3 + i) * Er:(a * 3 + i + 1) * Er] for i in range(3)]
          for a in range(4)]
    grad = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            g = ue[0][i] * gn[0][j]
            for a in range(1, 4):
                g = g + ue[a][i] * gn[a][j]
            grad[i][j] = g
    eps = [grad[0][0], grad[1][1], grad[2][2],
           0.5 * (grad[0][1] + grad[1][0]),
           0.5 * (grad[0][2] + grad[2][0]),
           0.5 * (grad[1][2] + grad[2][1])]
    sig = []
    for m in range(6):
        s = ct_ref[(m * 6) * Er:(m * 6 + 1) * Er] * eps[0]
        for k in range(1, 6):
            s = s + ct_ref[(m * 6 + k) * Er:(m * 6 + k + 1) * Er] * eps[k]
        sig.append(s)
    fe = [[None] * 3 for _ in range(4)]
    for a in range(4):
        for c in range(3):
            s = sig[_T2V[(c, 0)]] * gn[a][0]
            for j in range(1, 3):
                s = s + sig[_T2V[(c, j)]] * gn[a][j]
            fe[a][c] = s

    # ---- reduce + slab scatter ---------------------------------------- #
    lanes = lax.broadcasted_iota(jnp.int32, (Er, 128), 1)
    rsort = [rsort_ref[a * Er:(a + 1) * Er] for a in range(4)]
    rprev_raw = [rprev_ref[a * Er:(a + 1) * Er] for a in range(4)]
    for c in range(3):
        # Mosaic has no scatter/DUS lowering on *values*, so the slab
        # accumulators live in the output ref: zero-init, then static-slice
        # read-modify-write (all offsets 8-aligned by construction).
        for bi in range(ns):
            b0 = (c * ns + bi) * Ls
            o_ref[b0:b0 + Ls] = jnp.zeros((Ls, 128), f32)
        for a in range(4):
            rprev = jnp.maximum(rprev_raw[a], 0)
            prev_w = jnp.where(rprev_raw[a] >= 0, f32(1), f32(0))
            v = _lane_gather(fe[a][c], rsort[a])
            cs = _lane_cumsum(v, lanes)
            prev = _lane_gather(cs, rprev)
            red = cs - prev_w * prev        # valid at run-end lanes only
            for k2 in range(Ws):
                r0 = (a * Ws + k2) * Er
                sl_raw = sal_ref[r0:r0 + Er]
                sl = jnp.maximum(sl_raw, 0)
                w = jnp.where(sl_raw >= 0, f32(1), f32(0))
                V = _lane_gather(red, sl) * w
                bi, off = plan.s_slab(k2)
                d0 = (c * ns + bi) * Ls + off
                o_ref[d0:d0 + Er] = o_ref[d0:d0 + Er] + V


class BandMatvec:
    """Compiled banded matvec for one mesh (band-ordered connectivity)."""

    def __init__(self, plan: BandPlan, interpret: bool = False):
        self.plan = plan
        p = plan
        self.Np = p.Nr * 128
        self.Ep = p.Er * 128
        self._ng = len(p.g_res)
        self._ns = len(p.s_res)

        def _i32(x):
            # host-resident (numpy): captured by jitted closures, where
            # device arrays would force a d2h fetch at lowering
            return np.ascontiguousarray(x.astype(np.int32))

        self._gk = _i32(p.gk)
        self._gl = _i32(p.gl)
        self._rsort = _i32(p.red_sort)
        self._rprev = _i32(p.red_prev)
        self._sal = _i32(p.sal)

        kern = functools.partial(_band_kernel, p)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        self._call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((3 * self._ns * p.Ls, 128),
                                           jnp.float32),
            in_specs=[vmem] * 8,
            out_specs=vmem,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

    # -- XLA-side pack/prep (fuses with surrounding Krylov vector ops) -- #
    def build_RS(self, u2d3):
        """(3, Nr, 128) f32 -> stacked gather copies (3*ng*Lg, 128)."""
        p = self.plan
        rep = jnp.repeat(u2d3, p.q, axis=1)            # (3, q*Nr, 128)
        pad0 = p.pad0g
        if pad0 >= 0:
            rep = jnp.pad(rep, ((0, 0), (pad0, 0), (0, 0)))
        else:
            rep = rep[:, -pad0:]
        need = 7 + p.Lg
        if rep.shape[1] < need:
            rep = jnp.pad(rep, ((0, 0), (0, need - rep.shape[1]), (0, 0)))
        copies = [rep[:, pr:pr + p.Lg] for pr in p.g_res]   # ng x (3,Lg,128)
        return jnp.concatenate(copies, axis=1).reshape(-1, 128)

    def pack_u(self, u):
        """(N, 3) f32 -> stacked gather copies for the kernel."""
        N = u.shape[0]
        u3 = jnp.zeros((3, self.Np), jnp.float32)
        u3 = u3.at[:, :N].set(u.T.astype(jnp.float32))
        return self.build_RS(u3.reshape(3, self.plan.Nr, 128))

    def compress_f(self, out):
        """Kernel output (3*ns*Ls, 128) -> (3, Nr, 128) nodal forces."""
        p = self.plan
        blocks = out.reshape(3, self._ns, p.Ls, 128)
        lead = max(0, -p.pad0s)
        width = lead + 7 + p.Ls
        need = lead + p.pad0s + p.q * p.Nr
        width = max(width, need)
        A = jnp.zeros((3, width, 128), jnp.float32)
        for bi, pr in enumerate(p.s_res):
            A = A.at[:, lead + pr:lead + pr + p.Ls].add(blocks[:, bi])
        body = A[:, lead + p.pad0s:need]
        return body.reshape(3, p.Nr, p.q, 128).sum(axis=2)

    def unpack_f(self, out, n_nodes):
        f3 = self.compress_f(out).reshape(3, self.Np)
        return f3[:, :n_nodes].T

    def pack_ct(self, CT_soa, vol):
        """CT (6,6,E) SoA + vol (E,) -> vol-folded (36*Er, 128) f32."""
        E = vol.shape[0]
        out = jnp.zeros((36, self.Ep), jnp.float32)
        ctv = (CT_soa * vol[None, None, :]).reshape(36, E)
        out = out.at[:, :E].set(ctv.astype(jnp.float32))
        return out.reshape(36 * self.plan.Er, 128)

    def pack_gn(self, grad_N):
        """grad_N (E,4,3) -> (12*Er, 128) f32 ((a, comp) major).

        Pure numpy on a host-resident input: the result is stored once and
        then captured as a jit closure constant by every band matvec - a
        device-array version forces a d2h fetch at MLIR lowering (the r04
        failure class), so it must stay host-resident.  Device inputs
        (tests) are pulled host-side first."""
        g_host = np.asarray(grad_N)
        E = g_host.shape[0]
        out = np.zeros((12, self.Ep), np.float32)
        out[:, :E] = np.transpose(g_host, (1, 2, 0)).reshape(12, E)
        return out.reshape(12 * self.plan.Er, 128)

    def pack_gn_traced(self, grad_N):
        """Traced twin of pack_gn for in-jit use: packs the on-device
        derived grad_N (kernels._device_tet_geometry) so band programs
        carry no multi-MB geometry literal (module-size rationale in
        kernels._device_tet_geometry)."""
        E = grad_N.shape[0]
        out = jnp.zeros((12, self.Ep), jnp.float32)
        g = jnp.transpose(grad_N, (1, 2, 0)).reshape(12, E)
        out = out.at[:, :E].set(g.astype(jnp.float32))
        return out.reshape(12 * self.plan.Er, 128)

    def apply_packed(self, u_rs, ctv36, gn12):
        """Raw kernel apply on pre-packed operands."""
        return self._call(u_rs, ctv36, gn12, self._gk, self._gl,
                          self._rsort, self._rprev, self._sal)

    def matvec(self, ctv36, gn12, u):
        """(N,3) f32 -> (N,3) f32 through the packed kernel."""
        out = self.apply_packed(self.pack_u(u), ctv36, gn12)
        return self.unpack_f(out, self.plan.n_nodes)

    def matvec_2d(self, ctv36, gn12, u2d3):
        """(3, Nr, 128) f32 -> (3, Nr, 128) — for packed Krylov loops."""
        return self.compress_f(
            self.apply_packed(self.build_RS(u2d3), ctv36, gn12))
