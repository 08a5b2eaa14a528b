"""Post-processing: standalone readers for the framework's XDMF/HDF5 outputs
plus point-probe and smoothing helpers.

Reference: /root/reference/safeincave/PostProcessingTools.py (meshio-based
XDMF time-series readers :192-374, duplicate numpy smoother :23-107, point
lookup :109-189).  Works directly on the h5 layout written by
:class:`safeincave_tpu.output.SaveFields`; no solver objects needed.
"""
from __future__ import annotations

import os

import numpy as np
import h5py


def read_timeseries(output_folder: str, field_name: str):
    """Read a saved field time series.

    Returns (times, values, points, topology) where values has shape
    (n_steps, ...) matching the saved field layout.
    """
    h5path = os.path.join(output_folder, field_name, f"{field_name}.h5")
    with h5py.File(h5path, "r") as h5:
        points = h5["Mesh/geometry"][()]
        topology = h5["Mesh/topology"][()]
        grp = h5[f"Function/{field_name}"]
        steps = sorted(grp.keys(), key=int)
        values = np.stack([grp[s][()] for s in steps])
    times = _read_times(output_folder, field_name)
    if times is None or len(times) != values.shape[0]:
        times = np.arange(values.shape[0], dtype=float)
    return times, values, points, topology


def _read_times(output_folder, field_name):
    xdmf = os.path.join(output_folder, field_name, f"{field_name}.xdmf")
    if not os.path.isfile(xdmf):
        return None
    times = []
    with open(xdmf) as f:
        for line in f:
            line = line.strip()
            if line.startswith("<Time Value="):
                times.append(float(line.split('"')[1]))
    return np.asarray(times) if times else None


# ---------------------------------------------------------------------------
# Reference-compatible helpers (PostProcessingTools.py names)
# ---------------------------------------------------------------------------
def read_cell_scalar(output_folder, field_name):
    t, v, _, _ = read_timeseries(output_folder, field_name)
    return t, v


def read_cell_tensor(output_folder, field_name):
    t, v, _, _ = read_timeseries(output_folder, field_name)
    if v.ndim == 3 and v.shape[-1] == 9:
        v = v.reshape(v.shape[0], v.shape[1], 3, 3)
    return t, v


def read_node_scalar(output_folder, field_name):
    return read_cell_scalar(output_folder, field_name)


def read_node_vector(output_folder, field_name):
    t, v, _, _ = read_timeseries(output_folder, field_name)
    return t, v


def find_closest_node(points: np.ndarray, xyz) -> int:
    """Index of the mesh node closest to ``xyz`` (reference :109-189)."""
    d = np.linalg.norm(points - np.asarray(xyz)[None, :], axis=1)
    return int(np.argmin(d))


def find_closest_cell(points: np.ndarray, topology: np.ndarray, xyz) -> int:
    centroids = points[topology].mean(axis=1)
    d = np.linalg.norm(centroids - np.asarray(xyz)[None, :], axis=1)
    return int(np.argmin(d))


def probe_node_series(output_folder, field_name, xyz):
    """Time series of a nodal field at the node closest to ``xyz``."""
    t, v, points, _ = read_timeseries(output_folder, field_name)
    idx = find_closest_node(points, xyz)
    return t, v[:, idx]


def probe_cell_series(output_folder, field_name, xyz):
    """Time series of a cell field at the cell closest to ``xyz``."""
    t, v, points, topo = read_timeseries(output_folder, field_name)
    idx = find_closest_cell(points, topo, xyz)
    return t, v[:, idx]


def build_smoother(points: np.ndarray, topology: np.ndarray):
    """Volume-weighted cell->node and uniform node->cell averaging matrices
    as (apply_to_cells, apply_to_nodes) callables (reference :23-107)."""
    n_nodes = points.shape[0]
    n_elems = topology.shape[0]
    p = points[topology]
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    e3 = p[:, 3] - p[:, 0]
    vol = np.abs((e1 * np.cross(e2, e3)).sum(axis=1)) / 6.0

    flat_nodes = topology.reshape(-1)
    flat_elems = np.repeat(np.arange(n_elems), 4)
    vol_sum = np.zeros(n_nodes)
    np.add.at(vol_sum, flat_nodes, vol[flat_elems])
    w = vol[flat_elems] / vol_sum[flat_nodes]

    def cells_to_nodes(q):
        out = np.zeros(n_nodes)
        np.add.at(out, flat_nodes, w * np.asarray(q)[flat_elems])
        return out

    def nodes_to_cells(q):
        return np.asarray(q)[topology].mean(axis=1)

    return cells_to_nodes, nodes_to_cells
