import numpy as np
import jax.numpy as jnp

import safeincave_tpu.utils as ut


def test_units():
    assert ut.hour == 3600
    assert ut.day == 86400
    assert ut.year == 365 * 86400
    assert ut.MPa == 1e6


def test_voigt_roundtrip():
    rng = np.random.default_rng(3)
    t = rng.standard_normal((10, 3, 3))
    t = 0.5 * (t + np.transpose(t, (0, 2, 1)))
    v = ut.tensor_to_voigt(jnp.asarray(t))
    back = ut.voigt_to_tensor(v)
    np.testing.assert_allclose(np.asarray(back), t, atol=1e-15)
    # ordering [xx, yy, zz, xy, xz, yz]
    np.testing.assert_allclose(np.asarray(v)[:, 3], t[:, 0, 1])
    np.testing.assert_allclose(np.asarray(v)[:, 4], t[:, 0, 2])
    np.testing.assert_allclose(np.asarray(v)[:, 5], t[:, 1, 2])


def test_dotdot_matches_dense_contraction():
    """C:eps in tensorial Voigt must equal the full 4th-order contraction for
    an isotropic C (the convention check of reference tests/test_utils.py)."""
    from safeincave_tpu.materials.elastic import isotropic_C
    E = jnp.asarray([10e9])
    nu = jnp.asarray([0.3])
    C = isotropic_C(E, nu)
    rng = np.random.default_rng(5)
    eps = rng.standard_normal((1, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    sig = np.asarray(ut.dotdot(C, jnp.asarray(eps)))
    # lame form: sigma = lambda tr(eps) I + 2 mu eps
    lam = float(E[0]) * 0.3 / ((1 + 0.3) * (1 - 2 * 0.3))
    mu = float(E[0]) / (2 * (1 + 0.3))
    expected = lam * np.trace(eps[0]) * np.eye(3) + 2 * mu * eps[0]
    np.testing.assert_allclose(sig[0], expected, rtol=1e-12)


def test_von_mises_and_norm():
    s = jnp.asarray([[1.0, 1.0, 1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(ut.von_mises_voigt(s)), [0.0], atol=1e-12)
    s2 = jnp.asarray([[2.0, -1.0, -1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(ut.von_mises_voigt(s2)), [3.0], rtol=1e-12)
    v = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]])
    t = ut.voigt_to_tensor(v)
    np.testing.assert_allclose(np.asarray(ut.norm_voigt(v))[0],
                               np.linalg.norm(np.asarray(t)[0]), rtol=1e-12)
