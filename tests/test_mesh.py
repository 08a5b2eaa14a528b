"""Mesh layer tests: msh parsing, box generation, geometry, smoothers.

Tag/region/boundary semantics follow the reference grid tests
(/root/reference/tests/test_grid.py) using the cube_coarse fixture from the
reference checkout when available.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from safeincave_tpu.mesh import GridBox, GridHandlerGMSH, box_mesh

# repo-owned copy of the reference cube_coarse fixture (tests/files/README.md)
REF_CUBE = os.path.join(os.path.dirname(__file__), "files", "cube_coarse")


class TestBoxMesh:
    def test_counts_and_volume(self):
        g = GridBox(Lx=2.0, Ly=1.0, Lz=1.0, nx=4, ny=2, nz=2)
        assert g.n_elems == 6 * 4 * 2 * 2
        assert g.n_nodes == 5 * 3 * 3
        np.testing.assert_allclose(g.volumes.sum(), 2.0, rtol=1e-12)
        assert g.Lx == 2.0 and g.Ly == 1.0 and g.Lz == 1.0

    def test_boundary_names_and_areas(self):
        g = GridBox(Lx=2.0, Ly=1.0, Lz=1.0, nx=4, ny=2, nz=2)
        assert set(g.get_boundary_names()) == {"WEST", "EAST", "SOUTH",
                                               "NORTH", "BOTTOM", "TOP"}
        assert g.get_subdomain_names() == ["BODY"]
        # facet areas per boundary
        for name, expected in [("WEST", 1.0), ("EAST", 1.0), ("SOUTH", 2.0),
                               ("NORTH", 2.0), ("BOTTOM", 2.0), ("TOP", 2.0)]:
            idx = g.get_boundary_tags(name)
            np.testing.assert_allclose(g.tri_areas[idx].sum(), expected,
                                       rtol=1e-12)

    def test_normals_outward(self):
        g = GridBox(nx=3, ny=3, nz=3)
        for name, vec in [("WEST", [-1, 0, 0]), ("EAST", [1, 0, 0]),
                          ("SOUTH", [0, -1, 0]), ("NORTH", [0, 1, 0]),
                          ("BOTTOM", [0, 0, -1]), ("TOP", [0, 0, 1])]:
            idx = g.get_boundary_tags(name)
            np.testing.assert_allclose(g.tri_normals[idx],
                                       np.tile(vec, (len(idx), 1)), atol=1e-12)

    def test_grad_N_partition_of_unity(self):
        g = GridBox(nx=2, ny=2, nz=2)
        # gradients of the four shape functions sum to zero
        np.testing.assert_allclose(g.grad_N.sum(axis=1), 0.0, atol=1e-12)
        # linear completeness: sum_a N_a(x) x_a reproduces gradient identity
        p = g.points[g.conn]          # (E, 4, 3)
        ident = np.einsum("eai,eaj->eij", p, g.grad_N)
        np.testing.assert_allclose(ident, np.tile(np.eye(3), (g.n_elems, 1, 1)),
                                   atol=1e-10)

    def test_get_parameter(self):
        g = GridBox(nx=2, ny=2, nz=2)
        p = g.get_parameter(3.5)
        assert p.shape == (g.n_elems,)
        assert float(p[0]) == 3.5
        p2 = g.get_parameter([2.0])  # one region
        np.testing.assert_allclose(np.asarray(p2), 2.0)

    def test_smoother_partition_of_unity(self):
        g = GridBox(nx=3, ny=3, nz=3)
        ones = jnp.ones(g.n_elems)
        nodes = g.elems_to_nodes(ones)
        np.testing.assert_allclose(np.asarray(nodes), 1.0, rtol=1e-12)
        smoothed = g.smooth_elems(ones)
        np.testing.assert_allclose(np.asarray(smoothed), 1.0, rtol=1e-12)


@pytest.mark.skipif(not os.path.isdir(REF_CUBE),
                    reason="reference fixture not available")
class TestGmshCubeCoarse:
    def test_load_and_tags(self):
        g = GridHandlerGMSH("geom", REF_CUBE)
        assert g.n_nodes == 23
        assert g.n_elems > 0
        assert set(g.get_boundary_names()) == {"NORTH", "SOUTH", "WEST",
                                               "EAST", "BOTTOM", "TOP"}
        assert set(g.get_subdomain_names()) == {"OMEGA_A", "OMEGA_B"}
        assert g.get_boundary_tag("NORTH") == 21
        assert g.get_subdomain_tag("OMEGA_A") == 27
        # regions partition the cells
        total = sum(len(g.region_indices[r]) for r in g.region_names)
        assert total == g.n_elems
        np.testing.assert_allclose(g.volumes.sum(), 1.0, rtol=1e-10)
        np.testing.assert_allclose(g.Lx, 1.0)

    def test_boundary_area(self):
        g = GridHandlerGMSH("geom", REF_CUBE)
        for name in g.get_boundary_names():
            idx = g.get_boundary_tags(name)
            np.testing.assert_allclose(g.tri_areas[idx].sum(), 1.0, rtol=1e-10)


class TestGmshV41Cavern:
    def test_v41_parser_repo_fixture(self):
        """v4.1 parser coverage without the reference mount: hand-written
        two-block Nodes / two-block Elements / Entities fixture."""
        from safeincave_tpu.mesh.msh_io import read_msh
        m = read_msh(os.path.join(os.path.dirname(__file__), "files",
                                  "tiny_v41.msh"))
        assert m.points.shape == (5, 3)
        assert m.tets.shape == (2, 4) and list(m.tet_tags) == [2, 2]
        assert m.tris.shape == (2, 3) and list(m.tri_tags) == [1, 1]
        assert m.field_data == {"Wall": (1, 2), "Body": (2, 3)}
        np.testing.assert_allclose(m.points[4], [1.0, 1.0, 1.0])

    @pytest.mark.skipif(
        os.environ.get("SAFEINCAVE_NO_REFERENCE") == "1"
        or not os.path.isfile(
            "/root/reference/grids/cavern_regular_600_3D/geom.msh"),
        reason="reference grids not available")
    def test_load_cavern(self):
        g = GridHandlerGMSH("geom", "/root/reference/grids/cavern_regular_600_3D")
        # counts pinned in BASELINE.md from the .msh headers
        assert g.n_nodes == 5420
        assert g.n_elems == 23935  # tets only; the 29944 header count includes boundary tris+lines
        assert g.volumes.min() > 0
        assert len(g.get_boundary_names()) >= 4

    def test_load_cavern_proxy(self):
        """Repo-owned cavern-class fixture (grids/make_fixtures.py)."""
        g = GridHandlerGMSH(
            "geom", os.path.join(os.path.dirname(__file__), "..",
                                 "grids", "cavern_proxy_600"))
        assert g.n_nodes == 3360
        assert g.n_elems == 16148
        assert g.volumes.min() > 0
        assert "Cavern" in g.get_boundary_names()
        assert set(g.get_subdomain_names()) == {"SALT", "INTERLAYER"}
