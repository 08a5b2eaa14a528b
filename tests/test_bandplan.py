"""BandPlan static-schedule validation (pure numpy, no TPU).

The numpy re-execution in BandPlan.build_R/gather_np/scatter_np mirrors the
Pallas kernel + XLA pack/compress op sequence 1:1; these tests pin it against
naive gather/scatter-add references, so a green run here certifies the static
tables independently of Mosaic.
"""
import numpy as np
import pytest

from safeincave_tpu.fem.bandplan import BandPlan, band_order
from safeincave_tpu.mesh.boxgen import GridBox


def _mesh(nx=6):
    g = GridBox(Lx=1.0, Ly=1.0, Lz=1.0, nx=nx, ny=nx, nz=nx)
    return np.asarray(g.conn), g.n_nodes


def _planned(nx=6):
    conn, N = _mesh(nx)
    perm, eorder = band_order(conn, N)
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    conn_b = inv[conn][eorder]
    return conn_b, N


def test_band_order_is_permutation():
    conn, N = _mesh(4)
    perm, eorder = band_order(conn, N)
    assert sorted(perm) == list(range(N))
    assert sorted(eorder) == list(range(conn.shape[0]))


def test_band_order_reduces_bandwidth():
    conn, N = _mesh(8)
    perm, eorder = band_order(conn, N)
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    conn_b = inv[conn]
    bw = max(np.abs(conn_b[:, a] - conn_b[:, b]).max()
             for a in range(4) for b in range(4))
    bw0 = max(np.abs(conn[:, a] - conn[:, b]).max()
              for a in range(4) for b in range(4))
    assert bw <= bw0


def test_slice_alignment():
    conn, N = _planned(6)
    plan = BandPlan.build(conn, N)
    for k in range(plan.Wg):
        ci, off = plan.g_slice(k)
        assert off % 8 == 0 and off >= 0
        assert off + plan.Er <= plan.Lg
    for k2 in range(plan.Ws):
        bi, off = plan.s_slab(k2)
        assert off % 8 == 0 and off >= 0
        assert off + plan.Er <= plan.Ls


@pytest.mark.parametrize("nx", [3, 6, 9])
def test_gather_matches_naive(nx):
    conn, N = _planned(nx)
    plan = BandPlan.build(conn, N)
    rng = np.random.default_rng(0)
    u = rng.normal(size=N)
    u2d = np.zeros((plan.Nr, 128))
    u2d.reshape(-1)[:N] = u
    RS = plan.build_R(u2d)
    out = plan.gather_np(RS)
    E = conn.shape[0]
    for a in range(4):
        got = out[a].reshape(-1)[:E]
        np.testing.assert_allclose(got, u[conn[:, a]], rtol=0, atol=0)


@pytest.mark.parametrize("nx", [3, 6, 9])
def test_scatter_matches_naive(nx):
    conn, N = _planned(nx)
    plan = BandPlan.build(conn, N)
    E = conn.shape[0]
    rng = np.random.default_rng(1)
    fe_flat = rng.normal(size=(4, E))
    fe = np.zeros((4, plan.Er, 128))
    for a in range(4):
        fe[a].reshape(-1)[:E] = fe_flat[a]
    out = plan.scatter_np(fe)
    ref = np.zeros(N)
    for a in range(4):
        np.add.at(ref, conn[:, a], fe_flat[a])
    np.testing.assert_allclose(out.reshape(-1)[:N], ref, rtol=1e-12, atol=1e-12)


def test_padding_rows_are_inert():
    """Padding lanes borrow the last element's dests; with the kernel's
    zero contributions there (CT/vol/grad_N zero-padded) they are inert."""
    conn, N = _planned(5)
    plan = BandPlan.build(conn, N)
    E = conn.shape[0]
    fe = np.zeros((4, plan.Er, 128))
    for a in range(4):
        fe[a].reshape(-1)[:E] = 1.0       # real lanes 1, padded lanes 0
    out = plan.scatter_np(fe)
    ref = np.zeros(N)
    for a in range(4):
        np.add.at(ref, conn[:, a], np.ones(E))
    np.testing.assert_allclose(out.reshape(-1)[:N], ref, atol=1e-12)
    # padded node slots receive nothing
    assert np.all(out.reshape(-1)[N:] == 0.0)
