"""Post-process the coupled TM cavern run (reference
examples/thermomechanics/2_cavern/plot_results.py workflow): probe the
temperature at the cavern wall and the displacement/von-Mises response from
the operation-stage XDMF outputs and plot them.  Headless (Agg).

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
    out_root = out_root or os.path.join(here, "output", "case_1")
    op = os.path.join(out_root, "operation")   # T is saved alongside u/q

    t_T, T, tpts, _ = pp.read_timeseries(op, "T")
    # probe the coldest node of the final state (the convective cavern wall)
    wall_node = T[-1].argmin()
    t_u, u, pts, _ = pp.read_timeseries(op, "u")
    roof = pts[:, 2].argmax()
    t_q, q, cpts, topo = pp.read_timeseries(op, "q_elems")
    cc = pp.compute_cell_centroids(topo, pts)
    wall_cell = np.linalg.norm(cc - cc.mean(axis=0), axis=1).argmin()

    fig, axes = plt.subplots(1, 3, figsize=(12, 3.6))
    axes[0].plot(np.asarray(t_T) / hour, T[:, wall_node], "-o", ms=3)
    axes[0].set_ylabel("cavern-wall T (K)")
    axes[1].plot(np.asarray(t_u) / hour, u[:, roof, 2] * 1e3, "-o", ms=3)
    axes[1].set_ylabel("roof settlement u_z (mm)")
    axes[2].plot(np.asarray(t_q) / hour, q[:, wall_cell] / MPa, "-o", ms=3)
    axes[2].set_ylabel("von Mises near cavern (MPa)")
    for ax in axes:
        ax.set_xlabel("time (h)")
        ax.grid(True, alpha=0.4)
    fig.tight_layout()
    png = os.path.join(out_root, "results.png")
    fig.savefig(png, dpi=130)
    print(f"wrote {png}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
