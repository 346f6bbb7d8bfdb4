"""Unit tests for the banded B-spline reparametrization (basis/reparam.py).

transform_T / prior_band are built by sparse bidiagonal differencing
(the BSpline.derivative coefficient recurrence kept sparse); pin them
against the dense scipy BSpline path they replaced."""
import numpy as np
import pytest

from bayesgp_tpu.basis import reparam


def _transform_T_scipy(knots, p):
    """The original dense construction: psi_j^(p) at interval midpoints
    via scipy BSpline.derivative (reference semantics, O(d^2 p))."""
    knots = np.asarray(knots, np.float64)
    mids = 0.5 * (knots[:-1] + knots[1:])
    return reparam.eval_constrained_bspline(mids, knots, p, deriv=p)


@pytest.mark.parametrize("p", [1, 2, 3, 4])
@pytest.mark.parametrize("uniform", [True, False])
def test_transform_T_matches_scipy(p, uniform):
    rng = np.random.default_rng(7 + p)
    if uniform:
        knots = np.linspace(0.0, 9.0, 23)
    else:
        knots = np.concatenate([[0.0], np.sort(rng.uniform(0.02, 11.0, 21))])
    Tn = reparam.transform_T(knots, p)
    To = _transform_T_scipy(knots, p)
    assert Tn.shape == To.shape == (len(knots) - 1, len(knots) - 1)
    assert np.abs(Tn - To).max() <= 1e-11 * max(1.0, np.abs(To).max())
    # lower-banded with offsets -p..0: strictly-upper part exactly zero
    assert np.abs(np.triu(Tn, 1)).max() == 0.0
    assert np.abs(np.tril(Tn, -(p + 1))).max() == 0.0


@pytest.mark.parametrize("deriv", [0, 1, 2])
def test_sparse_design_matches_dense_basis(deriv):
    from bayesgp_tpu.basis.bsplines import eval_bspline_basis, sparse_design
    lo, hi, k = 0.0, 8.0, 12
    x = np.linspace(lo, hi, 57)        # includes both endpoints
    D = eval_bspline_basis(x, lo, hi, k, 4, deriv=deriv)
    S = sparse_design(x, lo, hi, k, 4, deriv=deriv)
    assert np.diff(S.indptr).max() <= 4
    assert np.abs(D - S.toarray()).max() <= 1e-12 * max(1.0, np.abs(D).max())


@pytest.mark.parametrize("p", [1, 2, 3])
def test_prior_band_matches_dense_product(p):
    rng = np.random.default_rng(17 + p)
    knots = np.concatenate([[0.0], np.sort(rng.uniform(0.05, 8.0, 29))])
    band, logdetT, T = reparam.prior_band(knots, p)
    w = np.diff(knots)
    P = (T.T * w[None, :]) @ T
    d = T.shape[0]
    for o in range(p + 1):
        assert np.allclose(band[o, :d - o], np.diagonal(P, -o),
                           rtol=1e-10, atol=1e-12 * np.abs(P).max())
    _, ld_ref = np.linalg.slogdet(T)
    assert abs(logdetT - ld_ref) <= 1e-8 * max(1.0, abs(ld_ref))
