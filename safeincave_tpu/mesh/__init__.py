"""Mesh layer: gmsh I/O, built-in box meshes, grid handling, geometry.

Replaces the reference's dolfinx/gmshio/meshio stack
(/root/reference/safeincave/Grid.py) with a self-contained numpy/JAX
implementation: a pure-Python ``.msh`` parser (v2.2 and v4.1 ASCII), a
structured box tet mesher, and a Grid that precomputes every geometric
quantity (volumes, shape-function gradients, facet areas/normals, smoothing
operators) as dense arrays ready for gather/segment-sum kernels.
"""
from .msh_io import read_msh, write_msh
from .grid import Grid, GridHandlerGMSH
from .boxgen import box_mesh, GridBox, GridBoxRegions
from .reorder import reordered_grid
from . import native

__all__ = ["read_msh", "write_msh", "Grid", "GridHandlerGMSH", "box_mesh",
           "GridBox", "GridBoxRegions", "reordered_grid", "native"]
