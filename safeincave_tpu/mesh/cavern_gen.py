"""Parameterized multi-region cavern mesh generator.

The reference regenerates its cavern/interlayer geometries with gmsh-API
scripts (/root/reference/grids/generate_cavern_geo.py,
generate_interlayer_spikes.py, generate_A5_heterogeneous_tilted.py) that
need the gmsh binary.  This module provides the framework-owned equivalent
capability: a salt box with a **revolved cavern profile** carved out
(cylindrical body + spherical caps, the shape family of the reference
``Wall_profile`` curves) and any number of **dipping interlayer bands**,
each its own tagged region, with the reference's region/boundary naming
(Salt_bottom / Interlayer_1 / Salt_middle / ... / Salt_top, boundary
"Cavern", box faces West..Top — the naming of
grids/cavern_interlayer_600_3D/geom.msh $PhysicalNames).

Structured Kuhn tetrahedra (mesh/boxgen.py) rather than an unstructured
gmsh tetrahedralization: on TPU the regular connectivity is a feature
(tight RCM bands, small block-ELL K), and the physics contract — regions,
boundary tags, cavern wall facets — is identical.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .boxgen import box_mesh
from .grid import Grid

_FACES = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]


@dataclass
class CavernProfile:
    """Revolved cavern profile: cylinder of radius ``radius`` between
    ``z_bottom``/``z_top`` with spherical end caps (cap height = radius)."""
    radius: float
    z_bottom: float
    z_top: float

    def contains(self, xyz, cx, cy):
        """Boolean mask of points strictly inside the revolved profile."""
        r2 = (xyz[:, 0] - cx) ** 2 + (xyz[:, 1] - cy) ** 2
        z = xyz[:, 2]
        zb, zt, R = self.z_bottom, self.z_top, self.radius
        body = (z >= zb) & (z <= zt) & (r2 < R * R)
        cap_t = (z > zt) & (r2 + (z - zt) ** 2 < R * R)
        cap_b = (z < zb) & (r2 + (z - zb) ** 2 < R * R)
        return body | cap_t | cap_b


@dataclass
class InterlayerBand:
    """Planar dipping band: elements whose centroid satisfies
    ``|z - tan(dip) * (x - x_ref) - z_center| < thickness / 2``."""
    z_center: float
    thickness: float
    dip_deg: float = 0.0

    def signed_coord(self, cents, x_ref):
        return (cents[:, 2]
                - np.tan(np.radians(self.dip_deg)) * (cents[:, 0] - x_ref))


def cavern_mesh(L=450.0, H=660.0, n=12, nz=None,
                cavern: CavernProfile | None = None,
                interlayers: list[InterlayerBand] | None = None,
                overburden_from: float | None = None):
    """Build (points, tets, tet_tags, tris, tri_tags, field_data).

    Region naming follows the reference interlayer meshes: with k bands the
    volume regions are Salt_bottom, Interlayer_1, Salt_middle, ...,
    Interlayer_k, Salt_top (a single "Salt" region when k = 0).  Boundary
    names: West/East/South/North/Bottom/Top plus "Cavern" for the facets
    exposed by carving the profile.

    ``overburden_from`` splits everything above that z level off the top
    salt slab into an "Overburden" region — the reference's heterogeneous
    1200-level meshes (grids/cavern_A5_interlayer_3D semantics: non-salt
    cap rock above the salt formation) carry the same extra region.
    """
    nz = nz or max(2, int(round(n * H / L)))
    points, tets, tet_tags, tris, tri_tags, fd = box_mesh(L, L, H, n, n, nz)
    cx = cy = L / 2.0
    if cavern is None:
        cavern = CavernProfile(radius=0.18 * L, z_bottom=0.30 * H,
                               z_top=0.45 * H)
    interlayers = list(interlayers or [])

    cents = points[tets].mean(axis=1)
    keep = ~cavern.contains(cents, cx, cy)
    tets = tets[keep]
    cents = cents[keep]

    # --- volume regions: salt slabs interleaved with dipping bands ------- #
    interlayers.sort(key=lambda b: b.z_center)
    field_data = {}
    tag = 1
    if interlayers:
        tet_tags = np.zeros(tets.shape[0], dtype=np.int32)
        n_bands = len(interlayers)
        # Salt_bottom, Salt_middle[, Salt_middle_2, ...], Salt_top
        salt_names = ["Salt_bottom"] + [
            "Salt_middle" if i == 1 else f"Salt_middle_{i}"
            for i in range(1, n_bands)] + ["Salt_top"]
        for i, band in enumerate(interlayers):
            d = band.signed_coord(cents, cx)
            in_band = (np.abs(d - band.z_center) < band.thickness / 2.0)
            below = (tet_tags == 0) & ~in_band & (d < band.z_center)
            tet_tags[below] = tag
            field_data[salt_names[i]] = (tag, 3)
            tag += 1
            tet_tags[in_band & (tet_tags == 0)] = tag
            field_data[f"Interlayer_{i + 1}"] = (tag, 3)
            tag += 1
        tet_tags[tet_tags == 0] = tag
        field_data[salt_names[-1]] = (tag, 3)
        tag += 1
    else:
        tet_tags = np.ones(tets.shape[0], dtype=np.int32)
        field_data["Salt"] = (1, 3)
        tag = 2

    if overburden_from is not None:
        cap = cents[:, 2] > overburden_from
        tet_tags = np.where(cap, tag, tet_tags).astype(np.int32)
        field_data["Overburden"] = (tag, 3)
        tag += 1

    # --- boundary facets: exterior faces of the carved mesh -------------- #
    faces = tets[:, _FACES].reshape(-1, 3)
    fs = np.sort(faces, axis=1)
    _, first, counts = np.unique(fs, axis=0, return_index=True,
                                 return_counts=True)
    ext = faces[first[counts == 1]]
    fc = points[ext].mean(axis=1)
    tol = 1e-9 * max(L, H)
    name_tag = {}
    for nm in ("West", "East", "South", "North", "Bottom", "Top", "Cavern"):
        name_tag[nm] = tag
        field_data[nm] = (tag, 2)
        tag += 1
    plane = np.full(ext.shape[0], name_tag["Cavern"], dtype=np.int32)
    for nm, axis, val in (("West", 0, 0.0), ("East", 0, L),
                          ("South", 1, 0.0), ("North", 1, L),
                          ("Bottom", 2, 0.0), ("Top", 2, H)):
        on = np.abs(points[ext][:, :, axis] - val).max(axis=1) < max(tol, 1e-9)
        plane[on] = name_tag[nm]
    tris, tri_tags = ext, plane

    # --- drop interior nodes orphaned by the carve ----------------------- #
    used = np.unique(np.concatenate([tets.ravel(), tris.ravel()]))
    remap = -np.ones(points.shape[0], dtype=np.int64)
    remap[used] = np.arange(used.size)
    return (points[used], remap[tets], tet_tags, remap[tris],
            np.asarray(tri_tags), field_data)


class GridCavern(Grid):
    """In-memory multi-region cavern grid (see :func:`cavern_mesh`)."""

    def __init__(self, L=450.0, H=660.0, n=12, nz=None, cavern=None,
                 interlayers=None, overburden_from=None):
        super().__init__(*cavern_mesh(L=L, H=H, n=n, nz=nz, cavern=cavern,
                                      interlayers=interlayers,
                                      overburden_from=overburden_from))
