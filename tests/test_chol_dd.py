"""Blocked double-float dense Cholesky (linalg/chol_dd.py) vs LAPACK
f64 — interpret-mode Pallas on CPU (same harness style as
test_band_kernels.py). The on-chip consumer is the scatter_iid Schur
factor (fast/scatter_iid.py hessian_factor) whose native-f64 lowering
crashes the v5-lite worker at d ~ 2000."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayesgp_tpu.linalg import chol_dd

pytestmark = pytest.mark.smoke


def _spd(d, seed=0, cond=1e6):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    ev = np.logspace(0, -np.log10(cond), d)
    A = (Q * ev) @ Q.T
    # Jacobi-equilibrate (the callers' convention)
    s = 1.0 / np.sqrt(np.diag(A))
    return (A * s[:, None]) * s[None, :]


@pytest.mark.parametrize("d", [128, 300, 512])
def test_factor_matches_lapack(d):
    A = _spd(d, seed=d)
    L = np.asarray(chol_dd.cholesky_dd_f64(jnp.asarray(A),
                                           interpret=True))
    L0 = np.linalg.cholesky(A)
    assert np.allclose(L, L0, rtol=0, atol=5e-12), \
        np.max(np.abs(L - L0))
    # reconstruction
    assert np.allclose(L @ L.T, A, rtol=0, atol=1e-12)


def test_half_logdet(eps=1e-8):
    A = _spd(257, seed=3)
    L = chol_dd.cholesky_dd_f64(jnp.asarray(A), interpret=True)
    hld = float(chol_dd.half_logdet(L))
    _, ref = np.linalg.slogdet(A)
    assert abs(hld - 0.5 * ref) < eps


@pytest.mark.parametrize("r", [1, 7, 200])
def test_solves(r):
    d = 300
    A = _spd(d, seed=9)
    rng = np.random.default_rng(1)
    Bm = rng.normal(size=(d, r))
    L = chol_dd.cholesky_dd_f64(jnp.asarray(A), interpret=True)
    L0 = np.linalg.cholesky(A)
    y = np.asarray(chol_dd.solve_lower_blocked(L, jnp.asarray(Bm),
                                               interpret=True))
    y0 = np.linalg.solve(L0, Bm)
    # relative to the solution magnitude (cond(L) ~ 1e3 amplifies the
    # ~2^-48 dd resolution through the substitution)
    rel = np.max(np.abs(y - y0)) / np.max(np.abs(y0))
    assert rel < 3e-9, rel
    x = np.asarray(chol_dd.solve_lower_t_blocked(L, jnp.asarray(y),
                                                 interpret=True))
    x0 = np.linalg.solve(L0.T, y0)
    relx = np.max(np.abs(x - x0)) / np.max(np.abs(x0))
    assert relx < 3e-9, relx


def test_solve_vector_shape():
    d = 130
    A = _spd(d, seed=5)
    b = np.ones(d)
    L = chol_dd.cholesky_dd_f64(jnp.asarray(A), interpret=True)
    y = chol_dd.solve_lower_blocked(L, jnp.asarray(b), interpret=True)
    assert y.shape == (d,)
    x = chol_dd.solve_lower_t_blocked(L, y, interpret=True)
    L0 = np.linalg.cholesky(A)
    x0 = np.linalg.solve(L0.T, np.linalg.solve(L0, b))
    assert np.allclose(np.asarray(x), x0, atol=1e-9)


def test_indefinite_stays_finite():
    """Clamped pivots: an indefinite matrix yields a FINITE factor
    (optimizer walk-out contract, same as the band kernels)."""
    d = 200
    A = _spd(d, seed=11)
    A[5, 5] = -0.5
    L = np.asarray(chol_dd.cholesky_dd_f64(jnp.asarray(A),
                                           interpret=True))
    assert np.all(np.isfinite(L))
