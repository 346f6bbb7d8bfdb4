"""Block-tridiagonal / arrowhead linear algebra vs dense reference."""
import numpy as np
import jax.numpy as jnp
import pytest

from bayesgp_tpu.linalg import block_tridiag as bt


def random_banded_spd(m, bw, seed=0):
    rng = np.random.default_rng(seed)
    A = np.zeros((m, m))
    for o in range(bw + 1):
        v = rng.normal(0, 0.3, m - o)
        A[np.arange(m - o) + o, np.arange(m - o)] = v
        A[np.arange(m - o), np.arange(m - o) + o] = v
    A += np.diag(np.abs(rng.normal(0, 1, m)) + 2.0 * (bw + 1))
    band = np.zeros((bw + 1, m))
    for o in range(bw + 1):
        band[o, :m - o] = np.diagonal(A, -o)
    return A, band


@pytest.mark.parametrize("m,bw,s", [(12, 3, 4), (24, 2, 4), (20, 4, 5),
                                    (16, 3, 8)])
def test_band_to_blocks_roundtrip(m, bw, s):
    A, band = random_banded_spd(m, bw, seed=m)
    D, E = bt.band_to_blocks(jnp.asarray(band), s)
    nb = m // s
    dense = np.zeros((m, m))
    for g in range(nb):
        dense[g*s:(g+1)*s, g*s:(g+1)*s] = D[g]
    for g in range(nb - 1):
        dense[(g+1)*s:(g+2)*s, g*s:(g+1)*s] = E[g]
        dense[g*s:(g+1)*s, (g+1)*s:(g+2)*s] = np.asarray(E[g]).T
    np.testing.assert_allclose(dense, A, atol=1e-12)


@pytest.mark.parametrize("m,bw,s", [(12, 3, 4), (40, 4, 5), (32, 3, 8)])
def test_cholesky_and_solve(m, bw, s):
    A, band = random_banded_spd(m, bw, seed=7 * m)
    D, E = bt.band_to_blocks(jnp.asarray(band), s)
    fac = bt.bt_cholesky(D, E)
    # logdet
    sign, logdet = np.linalg.slogdet(A)
    assert np.isclose(float(bt.bt_half_logdet(fac)), logdet / 2, rtol=1e-10)
    # solve
    rng = np.random.default_rng(1)
    b = rng.normal(size=m)
    x = bt.bt_solve(fac, jnp.asarray(b.reshape(-1, s)))
    np.testing.assert_allclose(np.asarray(x).ravel(), np.linalg.solve(A, b),
                               rtol=1e-9, atol=1e-10)


def test_arrowhead():
    m, bw, s, q = 24, 3, 4, 5
    Hb, band = random_banded_spd(m, bw, seed=3)
    rng = np.random.default_rng(4)
    C = rng.normal(0, 0.3, (m, q))
    Hd = np.diag(np.abs(rng.normal(0, 1, q)) + 5.0)
    Hd += 0.1 * rng.normal(size=(q, q)) @ np.eye(q)
    Hd = 0.5 * (Hd + Hd.T) + 5 * np.eye(q)
    H = np.block([[Hb, C], [C.T, Hd]])

    D, E = bt.band_to_blocks(jnp.asarray(band), s)
    af = bt.arrow_factor(D, E, jnp.asarray(C.reshape(-1, s, q)), jnp.asarray(Hd))

    sign, logdet = np.linalg.slogdet(H)
    assert sign > 0
    assert np.isclose(float(bt.arrow_half_logdet(af)), logdet / 2, rtol=1e-10)

    r = rng.normal(size=m + q)
    zb, zd = bt.arrow_solve(af, jnp.asarray(r[:m].reshape(-1, s)),
                            jnp.asarray(r[m:]))
    z = np.concatenate([np.asarray(zb).ravel(), np.asarray(zd)])
    np.testing.assert_allclose(z, np.linalg.solve(H, r), rtol=1e-9, atol=1e-10)


def test_arrow_sample_covariance():
    """L_full^{-T} z has covariance H^{-1} (structural identity check)."""
    m, bw, s, q = 12, 2, 4, 3
    Hb, band = random_banded_spd(m, bw, seed=9)
    rng = np.random.default_rng(10)
    C = rng.normal(0, 0.2, (m, q))
    Hd = 4 * np.eye(q)
    H = np.block([[Hb, C], [C.T, Hd]])
    D, E = bt.band_to_blocks(jnp.asarray(band), s)
    af = bt.arrow_factor(D, E, jnp.asarray(C.reshape(-1, s, q)), jnp.asarray(Hd))
    # apply to all unit vectors -> columns of L_full^{-T}; check
    # Linv.T @ Linv... direct check: cov = X X^T where X = L_full^{-T} I
    X = []
    for i in range(m + q):
        z = np.zeros(m + q)
        z[i] = 1.0
        xb, xd = bt.arrow_sample(af, jnp.asarray(z[:m].reshape(-1, s)),
                                 jnp.asarray(z[m:]))
        X.append(np.concatenate([np.asarray(xb).ravel(), np.asarray(xd)]))
    X = np.stack(X, axis=1)   # columns = L^{-T} e_i
    np.testing.assert_allclose(X @ X.T, np.linalg.inv(H), rtol=1e-8,
                               atol=1e-10)


class TestBlockedKernels:
    """chol_kernels blocked f64 kernels vs LAPACK-style references."""

    @pytest.mark.parametrize("s", [8, 16, 32, 64, 128])
    def test_cholesky_blocked(self, s):
        from bayesgp_tpu.linalg import chol_kernels as ck
        rng = np.random.default_rng(s)
        A = rng.normal(size=(s, s))
        A = A @ A.T + s * np.eye(s)
        L = np.asarray(ck.cholesky_blocked(jnp.asarray(A)))
        np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=1e-11,
                                   atol=1e-11)

    @pytest.mark.parametrize("s,m", [(16, 3), (64, 5), (128, 128)])
    def test_trsm_variants(self, s, m):
        from bayesgp_tpu.linalg import chol_kernels as ck
        rng = np.random.default_rng(s + m)
        A = rng.normal(size=(s, s))
        L = np.linalg.cholesky(A @ A.T + s * np.eye(s))
        B = rng.normal(size=(s, m))
        np.testing.assert_allclose(
            np.asarray(ck.trsm_left_lower(jnp.asarray(L), jnp.asarray(B))),
            np.linalg.solve(L, B), rtol=1e-10, atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(ck.trsm_left_lower_t(jnp.asarray(L), jnp.asarray(B))),
            np.linalg.solve(L.T, B), rtol=1e-10, atol=1e-11)
        v = rng.normal(size=s)
        np.testing.assert_allclose(
            np.asarray(ck.trsm_left_lower(jnp.asarray(L), jnp.asarray(v))),
            np.linalg.solve(L, v), rtol=1e-10, atol=1e-11)
