"""End-to-end golden-field regression (BASELINE.md correctness acceptance).

Re-runs the three canonical configs (triaxial, cavern-proxy, TM cube;
tests/golden_configs.py) and asserts displacement / stress / temperature
fields reproduce the committed snapshots to 1e-8 relative - the tolerance
BASELINE.md demands for reference parity, applied here as an executable
trajectory-freeze so any solver/constitutive change that moves converged
fields is caught, not claimed.

Regenerate intentionally with tests/generate_goldens.py.
"""
import os

import numpy as np
import pytest

import golden_configs as gc

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fields.npz")

pytestmark = pytest.mark.skipif(not os.path.isfile(GOLDEN),
                                reason="golden snapshot not generated")


def _check(actual, name, z, rtol=1e-8):
    want = z[name]
    scale = np.abs(want).max()
    np.testing.assert_allclose(actual, want, rtol=rtol, atol=rtol * scale,
                               err_msg=name)


class TestGoldenFields:
    def test_triaxial(self):
        u, sv = gc.run_mechanics(gc.build_triaxial())
        with np.load(GOLDEN) as z:
            _check(u, "triaxial_u", z)
            _check(sv, "triaxial_sig", z)

    @pytest.mark.slow
    def test_cavern_box(self):
        u, sv = gc.run_mechanics(gc.build_cavern_box())
        with np.load(GOLDEN) as z:
            _check(u, "cavern_u", z)
            _check(sv, "cavern_sig", z)

    def test_tm_cube(self):
        u, sv, T = gc.run_tm(*gc.build_tm_cube())
        with np.load(GOLDEN) as z:
            _check(u, "tm_u", z)
            _check(sv, "tm_sig", z)

    @pytest.mark.slow
    def test_interlayer_tm(self):
        """Heterogeneous multi-material cavern TM: MC interlayers + creeping
        salt on the revolved-profile multi-region mesh (VERDICT r02 item 5;
        reference nobian run_interlayer.py regime)."""
        u, sv, T = gc.run_tm(*gc.build_interlayer_tm())
        with np.load(GOLDEN) as z:
            _check(u, "inter_u", z)
            _check(sv, "inter_sig", z)
            _check(T, "inter_T", z)
