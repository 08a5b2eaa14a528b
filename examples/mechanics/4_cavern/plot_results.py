"""Post-process the cavern run: probe time-series from the XDMF outputs.

The reference ships a plot_results.py with every example
(/root/reference/examples/thermomechanics/2_cavern/plot_results.py); this is
the same workflow on this framework's post-processing layer
(safeincave_tpu.postproc): read the operation-stage XDMF series, probe the
displacement at the cavern roof and the stress invariants next to the wall,
plot against the applied pressure cycle.  Headless (Agg), writes
results.png next to the outputs.

Run after main.py:  python plot_results.py [output_dir]
"""
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

from safeincave_tpu import postproc as pp
from safeincave_tpu.utils import MPa, hour


def main(out_root=None):
    here = os.path.dirname(os.path.abspath(__file__))
    out_root = out_root or os.path.join(here, "output")
    op = os.path.join(out_root, "operation")

    # displacement at the highest point of the mesh interior (cavern roof
    # region): largest |u_z| response to the pressure cycle
    t_u, u, pts, _ = pp.read_timeseries(op, "u")
    roof = pts[:, 2].argmax()
    t_q, q, cpts, topo = pp.read_timeseries(op, "q_elems")
    cc = pp.compute_cell_centroids(topo, pts)
    wall = np.linalg.norm(cc - cc.mean(axis=0), axis=1).argmin()

    fig, axes = plt.subplots(1, 2, figsize=(9, 3.6))
    axes[0].plot(np.asarray(t_u) / hour, u[:, roof, 2] * 1e3, "-o", ms=3)
    axes[0].set_xlabel("time (h)")
    axes[0].set_ylabel("roof settlement u_z (mm)")
    axes[1].plot(np.asarray(t_q) / hour, q[:, wall] / MPa, "-o", ms=3)
    axes[1].set_xlabel("time (h)")
    axes[1].set_ylabel("von Mises near cavern (MPa)")
    for ax in axes:
        ax.grid(True, alpha=0.4)
    fig.tight_layout()
    png = os.path.join(out_root, "results.png")
    fig.savefig(png, dpi=130)
    print(f"wrote {png}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
