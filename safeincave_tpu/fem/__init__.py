"""Matrix-free tetrahedral FEM core (CG1 displacements, DG0 materials).

Replaces the reference's dolfinx/UFL/FFCx/PETSc stack
(/root/reference/safeincave/MomentumEquation.py, HeatEquation.py) with
gather -> batched-einsum -> segment-sum operators and jitted Krylov solvers.
No sparse matrix is ever formed: the bilinear form action is computed from
precomputed shape-function gradients and per-element 6x6 tangents.
"""
from .kernels import MomentumKernel, HeatKernel
from .solvers import cg_solve, bicgstab_solve
from .momentum import LinearMomentumBase, LinearMomentum, SolverSettings
from .heat import HeatDiffusion

__all__ = ["MomentumKernel", "HeatKernel", "cg_solve", "bicgstab_solve",
           "LinearMomentumBase", "LinearMomentum", "SolverSettings",
           "HeatDiffusion"]
