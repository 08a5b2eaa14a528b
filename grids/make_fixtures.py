"""Generate the repo-owned grid fixtures (committed .msh files).

The reference ships gmsh-API generator scripts that need the gmsh binary
(/root/reference/grids/*/geom.py); here the fixtures are produced by the
framework's own structured generator (mesh/boxgen.py) and serialized with
mesh/msh_io.write_msh, so tests/examples/bench run with no reference mount
and no gmsh install.

Run from the repo root:  python grids/make_fixtures.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from safeincave_tpu.mesh.boxgen import box_mesh
from safeincave_tpu.mesh.msh_io import write_msh

HERE = os.path.dirname(os.path.abspath(__file__))


def save(name, points, tets, tet_tags, tris, tri_tags, fd):
    d = os.path.join(HERE, name)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "geom.msh")
    write_msh(path, points, tets, tet_tags, tris, tri_tags, fd)
    print(f"{name}: {points.shape[0]} nodes, {tets.shape[0]} tets -> {path}")


def cube():
    """Unit cube, single region (the reference grids/cube analog)."""
    save("cube", *box_mesh(1.0, 1.0, 1.0, 4, 4, 4))


def cube_regions():
    """Two-region unit cube split at z=0.5 (grids/cube_regions analog,
    used by the per-region-parameter examples and the MN+MD config test)."""
    points, tets, tet_tags, tris, tri_tags, fd = box_mesh(
        1.0, 1.0, 1.0, 4, 4, 4)
    cents = points[tets].mean(axis=1)
    tet_tags = np.where(cents[:, 2] < 0.5, 28, 27).astype(np.int32)
    fd = dict(fd)
    body_tag, _ = fd.pop("BODY")
    fd["OMEGA_A"] = (27, 3)          # top half (reference cube_coarse naming)
    fd["OMEGA_B"] = (28, 3)
    save("cube_regions", points, tets, tet_tags, tris, tri_tags, fd)


def cavern_proxy(name="cavern_proxy_600", L=600.0, H=800.0, n=14):
    """Cavern-class proxy: a salt box with an interior spherical void whose
    boundary is tagged "Cavern" and an "Interlayer" region band.

    Stands in for grids/cavern_regular_600_3D (5.4k nodes / 24k tets) at
    committable size: elements whose centroid falls inside the void sphere
    are removed, the newly exposed faces become the Cavern boundary, and a
    horizontal band of elements is tagged as a second region so
    multi-material configs exercise region-keyed parameters.
    """
    points, tets, tet_tags, tris, tri_tags, fd = box_mesh(L, L, H, n, n, n)
    c = np.array([L / 2, L / 2, H / 2])
    r = 0.18 * L
    cents = points[tets].mean(axis=1)
    keep = np.linalg.norm(cents - c, axis=1) > r
    tets = tets[keep]

    # region tags: interlayer band above the cavern, salt elsewhere
    cents = points[tets].mean(axis=1)
    interlayer = np.abs(cents[:, 2] - 0.78 * H) < 0.05 * H
    tet_tags = np.where(interlayer, 2, 1).astype(np.int32)

    # boundary faces: faces of kept tets that appear exactly once
    faces = {}
    FACE = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    for tet in tets:
        for f in FACE:
            key = tuple(sorted(int(tet[i]) for i in f))
            faces[key] = faces.get(key, 0) + 1
    bfaces = np.array([k for k, cnt in faces.items() if cnt == 1])
    # classify: original outer tris keep their tags; interior ones = Cavern
    fcents = points[bfaces].mean(axis=1)
    on_box = ((np.abs(fcents[:, 0]) < 1e-9) | (np.abs(fcents[:, 0] - L) < 1e-9)
              | (np.abs(fcents[:, 1]) < 1e-9) | (np.abs(fcents[:, 1] - L) < 1e-9)
              | (np.abs(fcents[:, 2]) < 1e-9) | (np.abs(fcents[:, 2] - H) < 1e-9))
    old = {tuple(sorted(map(int, t))): tag for t, tag in zip(tris, tri_tags)}
    new_tris, new_tags = [], []
    cav_tag = 7
    for f, box in zip(bfaces, on_box):
        key = tuple(sorted(map(int, f)))
        if box and key in old:
            new_tris.append(list(f))
            new_tags.append(old[key])
        else:
            new_tris.append(list(f))
            new_tags.append(cav_tag)
    fd = dict(fd)
    body_tag, _ = fd.pop("BODY")
    fd["SALT"] = (1, 3)
    fd["INTERLAYER"] = (2, 3)
    fd["Cavern"] = (cav_tag, 2)

    # drop now-unused nodes (void interior)
    used = np.unique(np.concatenate([np.asarray(new_tris).ravel(),
                                     tets.ravel()]))
    remap = -np.ones(points.shape[0], np.int64)
    remap[used] = np.arange(used.size)
    save(name, points[used], remap[tets], tet_tags,
         remap[np.asarray(new_tris)], np.asarray(new_tags), fd)


def cavern_interlayer_proxy():
    """Heterogeneous multi-region cavern fixture (stands in for
    grids/cavern_interlayer_600_3D: 6.9k nodes / 38k tets): revolved cavern
    profile + two dipping interlayer bands, reference region naming
    (Salt_bottom / Interlayer_1 / Salt_middle / Interlayer_2 / Salt_top)."""
    from safeincave_tpu.mesh.cavern_gen import cavern_mesh, InterlayerBand
    points, tets, tet_tags, tris, tri_tags, fd = cavern_mesh(
        L=450.0, H=660.0, n=12,
        interlayers=[InterlayerBand(250.0, 30.0, dip_deg=8.0),
                     InterlayerBand(430.0, 25.0, dip_deg=-5.0)])
    save("cavern_interlayer_proxy", points, tets, tet_tags, tris, tri_tags,
         fd)


def cavern_proxy_1200():
    """1200-class proxy (stands in for grids/cavern_regular_1200_3D:
    7.5k nodes / 41k tets)."""
    cavern_proxy(name="cavern_proxy_1200", L=1200.0, H=1600.0, n=18)


def cavern_interlayer_1200():
    """Repo-OWNED 1200-level heterogeneous production mesh (BASELINE
    config 5 class; reference grids/cavern_A5_interlayer_3D semantics:
    ~40k tets, salt formation with dipping interlayers AND a non-salt
    overburden cap above the formation).  Unlike the *_proxy fixtures this
    is not a stand-in for a reference mesh lookup — bench.py's
    interlayer1200-TM row names it directly, so BASELINE config 5 runs
    with no reference checkout mounted."""
    from safeincave_tpu.mesh.cavern_gen import cavern_mesh, InterlayerBand
    points, tets, tet_tags, tris, tri_tags, fd = cavern_mesh(
        L=1200.0, H=1600.0, n=17,
        interlayers=[InterlayerBand(600.0, 70.0, dip_deg=8.0),
                     InterlayerBand(1050.0, 60.0, dip_deg=-5.0)],
        overburden_from=1350.0)
    save("cavern_interlayer_1200", points, tets, tet_tags, tris, tri_tags,
         fd)


if __name__ == "__main__":
    cube()
    cube_regions()
    cavern_proxy()
    cavern_proxy_1200()
    cavern_interlayer_proxy()
    cavern_interlayer_1200()
