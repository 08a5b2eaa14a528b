import numpy as np
import jax.numpy as jnp

from safeincave_tpu.linalg import inv6x6, eigvalsh3x3


def test_inv6x6_random():
    rng = np.random.default_rng(42)
    M = rng.standard_normal((64, 6, 6)) + 6.0 * np.eye(6)
    inv, ok = inv6x6(jnp.asarray(M))
    assert bool(ok.all())
    err = np.einsum("nij,njk->nik", np.asarray(inv), M) - np.eye(6)
    assert np.abs(err).max() < 1e-10


def test_inv6x6_needs_pivoting():
    # zero leading diagonal entry forces a row swap
    M = np.array([[0., 1, 0, 0, 0, 0],
                  [1., 0, 0, 0, 0, 0],
                  [0., 0, 1, 0, 0, 0],
                  [0., 0, 0, 1, 0, 0],
                  [0., 0, 0, 0, 1, 0],
                  [0., 0, 0, 0, 0, 1]])[None]
    inv, ok = inv6x6(jnp.asarray(M))
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(inv)[0], M[0], atol=1e-14)


def test_inv6x6_flags_singular():
    M = np.zeros((2, 6, 6))
    M[0] = np.eye(6)
    M[1] = 1.0  # rank-1 -> singular
    _, ok = inv6x6(jnp.asarray(M))
    assert bool(ok[0]) and not bool(ok[1])


def test_inv6x6_ill_conditioned_scale():
    # badly scaled but invertible (like C_inv ~ 1e-11 entries)
    rng = np.random.default_rng(0)
    M = 1e-11 * (rng.standard_normal((16, 6, 6)) + 6 * np.eye(6))
    inv, ok = inv6x6(jnp.asarray(M))
    assert bool(ok.all())
    err = np.einsum("nij,njk->nik", np.asarray(inv), M) - np.eye(6)
    assert np.abs(err).max() < 1e-8


def test_eigvalsh3x3_matches_numpy():
    rng = np.random.default_rng(7)
    A = rng.standard_normal((128, 3, 3))
    A = 0.5 * (A + np.transpose(A, (0, 2, 1)))
    mine = np.asarray(eigvalsh3x3(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-9)


def test_eigvalsh3x3_degenerate():
    A = np.stack([np.eye(3) * 2.5, np.diag([1.0, 1.0, 4.0]), np.zeros((3, 3))])
    mine = np.asarray(eigvalsh3x3(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-12)
