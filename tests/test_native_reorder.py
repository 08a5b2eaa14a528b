"""Native preprocessing (C++ + numpy fallback) and mesh reordering tests."""
import numpy as np
import pytest

from safeincave_tpu.mesh import GridBox, reordered_grid
from safeincave_tpu.mesh import native


class TestNative:
    def test_cpp_library_builds(self):
        lib = native._build_and_load()
        assert lib is not None, "C++ toolchain present but build failed"

    def test_morton_is_permutation(self):
        g = GridBox(nx=4, ny=4, nz=4)
        order = native.morton_order(g.centroids)
        assert sorted(order.tolist()) == list(range(g.n_elems))

    def test_morton_cpp_matches_numpy(self):
        g = GridBox(nx=3, ny=4, nz=5)
        cpp = native.morton_order(g.centroids)
        lib = native._lib
        try:
            native._lib = None
            native._lib_tried = True
            ref = native.morton_order(g.centroids)
        finally:
            native._lib = lib
        np.testing.assert_array_equal(cpp, ref)

    def test_rcb_balanced(self):
        g = GridBox(nx=4, ny=4, nz=4)
        parts, order = native.rcb_partition(g.centroids, 8)
        counts = np.bincount(parts, minlength=8)
        assert counts.max() - counts.min() <= 1
        assert sorted(order.tolist()) == list(range(g.n_elems))
        # ordering groups partitions contiguously
        assert (np.diff(parts[order]) >= 0).all()

    def test_adjacency(self):
        g = GridBox(nx=2, ny=2, nz=2)
        adj = native.tet_adjacency(g.conn)
        # symmetric: if b is neighbor of a, a is neighbor of b
        for e in range(g.n_elems):
            for nb in adj[e]:
                if nb >= 0:
                    assert e in adj[nb]
        # boundary faces count matches the boundary triangle count
        n_boundary_faces = int((adj < 0).sum())
        assert n_boundary_faces == g.tris.shape[0]


class TestReorder:
    @pytest.mark.parametrize("method,nparts", [("morton", None), ("rcb", 8)])
    def test_geometry_preserved(self, method, nparts):
        g = GridBox(nx=3, ny=3, nz=3)
        g2, order, nperm = reordered_grid(g, method=method, nparts=nparts)
        assert g2.n_elems == g.n_elems and g2.n_nodes == g.n_nodes
        np.testing.assert_allclose(g2.volumes.sum(), g.volumes.sum(),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.sort(g2.volumes), np.sort(g.volumes),
                                   rtol=1e-12)
        # node positions permuted consistently
        np.testing.assert_allclose(g2.points[nperm], g.points)
        # centroids permuted by elem order
        np.testing.assert_allclose(g2.centroids, g.centroids[order])
        # boundary areas preserved per name
        for name in g.get_boundary_names():
            a1 = g.tri_areas[g.get_boundary_tags(name)].sum()
            a2 = g2.tri_areas[g2.get_boundary_tags(name)].sum()
            np.testing.assert_allclose(a1, a2, rtol=1e-12)

    def test_solve_invariant_under_reordering(self):
        import jax.numpy as jnp
        import safeincave_tpu as sc
        momBC = sc.MomentumBC

        def solve(grid):
            eq = sc.LinearMomentum(grid, theta=0.5)
            eq.set_solver(sc.SolverSettings(method="cg", rtol=1e-13,
                                            max_it=500))
            n = grid.n_elems
            one = np.ones(n)
            mat = sc.Material(n)
            mat.set_density(2000.0 * one)
            mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
            eq.set_material(mat)
            eq.build_body_force([0., 0., 0.])
            bc = momBC.BcHandler(eq)
            tv = [0., 1.]
            bc.add_boundary_condition(momBC.DirichletBC("WEST", 0, [0., 0.], tv))
            bc.add_boundary_condition(momBC.DirichletBC("SOUTH", 1, [0., 0.], tv))
            bc.add_boundary_condition(momBC.DirichletBC("BOTTOM", 2, [0., 0.], tv))
            bc.add_boundary_condition(momBC.NeumannBC("TOP", 2, 0., 0.,
                                                      [10e6, 10e6], tv, g=0.))
            eq.set_boundary_conditions(bc)
            bc.update_dirichlet(0.); bc.update_neumann(0.)
            eq.solve_elastic_response()
            return np.asarray(eq.u)

        g = GridBox(nx=3, ny=3, nz=3)
        u_ref = solve(g)
        g2, order, nperm = reordered_grid(g, method="morton")
        u_new = solve(g2)
        np.testing.assert_allclose(u_new[nperm], u_ref, rtol=1e-8, atol=1e-14)
