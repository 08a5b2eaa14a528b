"""The repo-owned 1200-level heterogeneous production mesh (BASELINE
config 5 without the reference checkout; VERDICT r03 item 8)."""
import os

import numpy as np

import safeincave_tpu as sc

GRID_DIR = os.path.join(os.path.dirname(__file__), "..", "grids",
                        "cavern_interlayer_1200")


class TestCavernInterlayer1200:
    def test_regions_and_boundaries(self):
        grid = sc.GridHandlerGMSH("geom", GRID_DIR)
        regions = grid.get_subdomain_names()
        assert set(regions) == {"Salt_bottom", "Interlayer_1", "Salt_middle",
                                "Interlayer_2", "Salt_top", "Overburden"}
        assert {"West", "East", "South", "North", "Bottom", "Top",
                "Cavern"} <= set(grid.get_boundary_names())
        # 1200-class size (reference cavern_regular_1200_3D: ~41k tets)
        assert 30_000 <= grid.n_elems <= 60_000
        # every region is populated
        marks = np.asarray(grid.get_parameter(
            {r: i for i, r in enumerate(regions)}))
        counts = np.bincount(marks.astype(int), minlength=len(regions))
        assert (counts > 0).all(), counts
        # the overburden cap sits above the formation
        cents = grid.centroids
        over = marks == regions.index("Overburden")
        assert cents[over, 2].min() > cents[~over, 2].mean()

    def test_cavern_wall_well_formed(self):
        grid = sc.GridHandlerGMSH("geom", GRID_DIR)
        cav = grid.get_boundary_tags("Cavern")
        assert cav.size > 100
        pts = grid.points[np.unique(grid.tris[cav])]
        # carved void is interior: wall nodes away from the box faces
        L, H = 1200.0, 1600.0
        assert pts[:, 0].min() > 0 and pts[:, 0].max() < L
        assert pts[:, 2].min() > 0 and pts[:, 2].max() < H
