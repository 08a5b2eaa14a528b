"""Procedural cavern shape library (mesh/cavern_gen.py catalog).

The reference ships 43 committed gmsh grid directories
(/root/reference/grids/cavern_*); the framework synthesizes the same shape
families on demand.  These tests pin the catalog contract: every reference
directory name parses, volumes normalize exactly, and synthesized meshes
are well-formed multi-region grids that the FEM layer accepts.
"""
import os

import numpy as np
import pytest

from safeincave_tpu.mesh.cavern_gen import (
    SHAPE_FAMILIES, _shape_family, build_catalog_grid, fit_volume,
    parse_grid_name, synthesize_grid)

# every cavern_* directory the reference ships (ls /root/reference/grids)
REFERENCE_DIR_NAMES = [
    "cavern_A5_3D", "cavern_A5_interlayer_3D",
    "cavern_asymmetric_1200_3D", "cavern_asymmetric_600_3D",
    "cavern_asymmetric_shelf_1200_3D", "cavern_asymmetric_shelf_600_3D",
    "cavern_bulbous_ledges_1200_3D", "cavern_bulbous_ledges_600_3D",
    "cavern_dipping_interlayer_1200_3D",
    "cavern_dipping_nointerlayer_1200_3D",
    "cavern_directcirculation_1200_3D", "cavern_directcirculation_600_3D",
    "cavern_fastleached_1200_3D", "cavern_fastleached_600_3D",
    "cavern_heterogenous", "cavern_interlayer_600_3D",
    "cavern_interlayer_upperhalf_1200_3D", "cavern_irregular_finemesh",
    "cavern_irregular_original", "cavern_multichamber_1200_3D",
    "cavern_multichamber_600_3D", "cavern_multiplechamber",
    "cavern_nointerlayer", "cavern_overburden", "cavern_overburden_coarse",
    "cavern_regular", "cavern_regular_1200_3D", "cavern_regular_600_3D",
    "cavern_reversedcirculation_1200_3D",
    "cavern_reversedcirculation_600_3D",
    "cavern_spike_lower_1200_3D", "cavern_spike_lower_il2x_1200_3D",
    "cavern_spike_lower_il4x_1200_3D", "cavern_spike_none_1200_3D",
    "cavern_spike_upper_1200_3D", "cavern_spike_upper_il2x_1200_3D",
    "cavern_spike_upper_il4x_1200_3D",
    "cavern_tilted_1200_3D", "cavern_tilted_600_3D",
    "cavern_tubefailure_1200_3D", "cavern_tubefailure_600_3D",
    "cavern_vertical_intrusion_1200_3D",
    "cavern_vertical_intrusion_600_3D",
]


def test_every_reference_grid_name_parses():
    for name in REFERENCE_DIR_NAMES:
        assert parse_grid_name(name) is not None, name


def test_volume_normalization_exact():
    for family in SHAPE_FAMILIES:
        shape, _, _ = _shape_family(family)
        for target in (600e3, 1200e3):
            fitted, s = fit_volume(shape, target)
            assert abs(fitted.volume() - target) / target < 1e-9, family
            assert s > 0


@pytest.mark.parametrize("name", [
    "cavern_asymmetric_600_3D", "cavern_bulbous_ledges_600_3D",
    "cavern_multichamber_600_3D", "cavern_tilted_600_3D",
    "cavern_spike_upper_il4x_1200_3D", "cavern_tubefailure_600_3D",
    "cavern_A5_interlayer_3D", "cavern_overburden",
])
def test_catalog_grid_well_formed(name):
    g = build_catalog_grid(name, n=8)
    assert g.n_elems > 500 and g.n_nodes > 200
    assert np.all(g.volumes > 0)
    bnames = g.get_boundary_names()
    for nm in ("West", "East", "South", "North", "Bottom", "Top", "Cavern"):
        assert nm in bnames, (name, bnames)
    # the carve must actually expose cavern wall facets
    assert len(g.get_boundary_tags("Cavern")) > 20, name
    fam, _ = parse_grid_name(name)
    regions = g.get_subdomain_names()
    if fam in ("interlayer", "A5_interlayer") or fam.startswith("spike_up") \
            or fam.startswith("spike_lo"):
        assert any("Interlayer" in r for r in regions), (name, regions)
    if fam == "overburden":
        assert "Overburden" in regions, (name, regions)
    # interlayer bands must be nonempty element sets
    for r in regions:
        assert np.count_nonzero(
            g.elem_tags == g.dolfin_tags[3][r]) > 0, (name, r)


def test_spike_thickness_scaling():
    g2 = build_catalog_grid("cavern_spike_upper_il2x_1200_3D", n=10)
    g4 = build_catalog_grid("cavern_spike_upper_il4x_1200_3D", n=10)
    n2 = sum(np.count_nonzero(g2.elem_tags == t)
             for r, t in g2.dolfin_tags[3].items() if "Interlayer" in r)
    n4 = sum(np.count_nonzero(g4.elem_tags == t)
             for r, t in g4.dolfin_tags[3].items() if "Interlayer" in r)
    assert n4 > n2 > 0


def test_synthesize_and_load_roundtrip(tmp_path):
    import safeincave_tpu as sc
    d = synthesize_grid("cavern_fastleached_600_3D", str(tmp_path), n=8)
    assert os.path.isfile(os.path.join(d, "geom.msh"))
    grid = sc.GridHandlerGMSH("geom", d, reorder="band")
    assert "Cavern" in grid.get_boundary_names()
    assert grid.n_elems > 500


def test_find_grid_synthesizes_catalog_names(tmp_path, monkeypatch):
    """find_grid falls back to on-demand synthesis for catalog names."""
    import safeincave_tpu.utils as ut
    monkeypatch.setenv("SAFEINCAVE_NO_REFERENCE", "1")
    # point the repo grids dir at a temp location so the test never
    # pollutes (or depends on) the real grids/ directory
    import safeincave_tpu.mesh.cavern_gen as cg
    real_synth = cg.synthesize_grid
    calls = {}

    def spy(name, out_root, n=None):
        calls["name"] = name
        return real_synth(name, str(tmp_path), n=8)
    monkeypatch.setattr(cg, "synthesize_grid", spy)
    d = ut.find_grid("cavern_reversedcirculation_600_3D")
    assert calls["name"] == "cavern_reversedcirculation_600_3D"
    assert os.path.isfile(os.path.join(d, "geom.msh"))


def test_fem_accepts_catalog_mesh():
    """A catalog shape drives an actual elastic solve end-to-end."""
    import safeincave_tpu as sc
    g = build_catalog_grid("cavern_asymmetric_600_3D", n=6)
    eq = sc.LinearMomentum(g, theta=0.5)
    eq.set_solver(sc.SolverSettings(method="bicgstab", rtol=1e-10,
                                    max_it=400))
    n = eq.n_elems
    one = np.ones(n)
    mat = sc.Material(n)
    mat.set_density(2200.0 * one)
    mat.add_to_elastic(sc.Spring(102e9 * one, 0.3 * one))
    eq.set_material(mat)
    eq.set_T0(298.0 * one)
    eq.set_T(298.0 * one)
    eq.build_body_force([0.0, 0.0, 0.0])
    bc = sc.MomentumBC.BcHandler(eq)
    tv = [0.0, 1e12]
    for nm, comp in (("West", 0), ("South", 1), ("Bottom", 2)):
        bc.add_boundary_condition(sc.MomentumBC.DirichletBC(
            nm, comp, [0.0, 0.0], tv))
    bc.add_boundary_condition(sc.MomentumBC.NeumannBC(
        "Cavern", 2, 0.0, 0.0, [10e6, 10e6], tv, g=0.0))
    eq.set_boundary_conditions(bc)
    eq.bc.update_dirichlet(0.0)
    eq.bc.update_neumann(0.0)
    eq.solve_elastic_response()
    u = np.asarray(eq.u)
    assert np.isfinite(u).all() and np.abs(u).max() > 0
