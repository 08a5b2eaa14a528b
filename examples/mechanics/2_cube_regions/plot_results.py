"""Post-process the two-region cube run: per-region stress paths.

Reference workflow parity
(/root/reference/examples/mechanics/2_cube_regions/plot_results.py): read
the saved series, split elements into the two material regions by
centroid height, and plot each region's mean p-q stress path plus the
axial strain history.  Headless (Agg), writes results.png.

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
    out_root = out_root or os.path.join(here, "output", "case_0")

    t, p, pts, topo = pp.read_timeseries(out_root, "p_elems")
    _, q, _, _ = pp.read_timeseries(out_root, "q_elems")
    cc = pp.compute_cell_centroids(topo, pts)
    zmid = 0.5 * (cc[:, 2].min() + cc[:, 2].max())
    lower, upper = cc[:, 2] < zmid, cc[:, 2] >= zmid

    _, u, upts, _ = pp.read_timeseries(out_root, "u")
    top = upts[:, 2].argmax()

    fig, axes = plt.subplots(1, 2, figsize=(9, 3.6))
    for sel, label in ((lower, "lower region"), (upper, "upper region")):
        axes[0].plot(p[:, sel].mean(axis=1) / MPa, q[:, sel].mean(axis=1)
                     / MPa, "-o", ms=3, label=label)
    axes[0].set_xlabel("mean stress p (MPa)")
    axes[0].set_ylabel("von Mises q (MPa)")
    axes[0].legend(fontsize=8)
    axes[1].plot(np.asarray(t) / hour, u[:, top, 2] * 1e3, "-o", ms=3)
    axes[1].set_xlabel("time (h)")
    axes[1].set_ylabel("top displacement u_z (mm)")
    for ax in axes:
        ax.grid(True, alpha=0.4)
    fig.tight_layout()
    png = os.path.join(out_root, "results.png")
    fig.savefig(png, dpi=130)
    print(f"wrote {png}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
