"""Unit tests for the basis layer against closed-form values and the
reference's documented examples."""
import numpy as np
import pytest

from bayesgp_tpu.basis import osplines, bsplines, sgp
from bayesgp_tpu.basis.priors import (prior_conversion_iwp,
                                      prior_conversion_sgp,
                                      compute_d_step_sgp_sd)


class TestOsplines:
    def test_local_poly_inside_interval(self):
        # inside (k_i, k_{i+1}]: (x - k_i)^p / p!
        knots = np.array([0.0, 1.0, 2.0])
        x = np.array([0.5])
        D = osplines.get_local_poly(knots, x, p=2)
        assert D.shape == (1, 2)
        assert np.isclose(D[0, 0], 0.5 ** 2 / 2)
        assert D[0, 1] == 0.0

    def test_local_poly_tail_is_taylor_continuation(self):
        # beyond k_{i+1} the basis continues as the Taylor polynomial:
        # value and first p-1 derivatives match at the break
        knots = np.array([0.0, 1.0, 5.0])
        p = 3
        eps = 1e-6
        left = osplines.get_local_poly(knots, np.array([1.0 - eps]), p)[0, 0]
        right = osplines.get_local_poly(knots, np.array([1.0 + eps]), p)[0, 0]
        assert np.isclose(left, right, atol=1e-10)

    def test_local_poly_pth_derivative_is_indicator(self):
        # f^(p) of basis i is 1 on (k_i, k_{i+1}], 0 beyond
        knots = np.array([0.0, 1.0, 2.0])
        p = 2
        h = 1e-5
        for x0, expected in [(0.5, 1.0), (1.5, 0.0)]:
            xs = np.array([x0 - h, x0, x0 + h])
            vals = osplines.get_local_poly(knots, xs, p)[:, 0]
            second = (vals[0] - 2 * vals[1] + vals[2]) / h ** 2
            assert np.isclose(second, expected, atol=1e-4)

    def test_reference_docstring_example_shape(self):
        # reference @examples R/01_utility.R:375-376
        D = osplines.local_poly_helper(
            knots=[0, 0.2, 0.4, 0.6, 0.8], refined_x=np.arange(0, 0.81, 0.1),
            p=2)
        assert D.shape == (9, 4)

    def test_negative_knots_reflection(self):
        knots = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
        x = np.array([-1.5, 0.5])
        D = osplines.local_poly_helper(knots, x, p=2)
        # negative part uses reflected coordinates
        assert D.shape == (2, 4)
        Dn = osplines.get_local_poly(np.array([0.0, 1.0, 2.0]),
                                     np.array([1.5, 0.0]), 2)
        np.testing.assert_allclose(D[:, :2], Dn)

    def test_weights_precision(self):
        knots = np.array([0.0, 0.5, 1.5])
        P = osplines.compute_weights_precision(knots)
        np.testing.assert_allclose(np.diag(P), [0.5, 1.0])

    def test_weights_precision_mixed_sign(self):
        knots = np.array([-1.0, 0.0, 2.0])
        P = osplines.compute_weights_precision(knots)
        np.testing.assert_allclose(np.diag(P), [1.0, 2.0])

    def test_global_poly(self):
        X = osplines.global_poly_helper(np.array([0.0, 2.0]), p=3)
        np.testing.assert_allclose(X, [[1, 0, 0], [1, 2, 4]])


class TestBsplines:
    def test_partition_of_unity(self):
        x = np.linspace(0, 10, 101)
        B = bsplines.eval_bspline_basis(x, 0, 10, nbasis=8)
        np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-12)

    def test_right_endpoint_left_limit(self):
        B = bsplines.eval_bspline_basis(np.array([10.0]), 0, 10, nbasis=8)
        assert np.isclose(B[0, -1], 1.0)

    def test_derivative_consistency(self):
        x = np.linspace(0.5, 9.5, 7)
        h = 1e-6
        B1 = bsplines.eval_bspline_basis(x, 0, 10, 8, deriv=1)
        fd = (bsplines.eval_bspline_basis(x + h, 0, 10, 8)
              - bsplines.eval_bspline_basis(x - h, 0, 10, 8)) / (2 * h)
        np.testing.assert_allclose(B1, fd, atol=1e-5)

    def test_dropind(self):
        B = bsplines.eval_bspline_basis(np.linspace(0, 1, 5), 0, 1, 10,
                                        dropind=(1, 2))
        assert B.shape == (5, 8)


class TestSGP:
    def test_B_sB_structure(self):
        x = np.linspace(0, 5, 20)
        B = sgp.compute_B_sB(x, a=1.3, k=10, region=[0, 5])
        assert B.shape == (20, 24)  # 3 blocks of (10-2) after dropind
        Bb = bsplines.eval_bspline_basis(x, 0, 5, 10, dropind=(1, 2))
        np.testing.assert_allclose(B[:, :8], Bb * np.cos(1.3 * x)[:, None])
        np.testing.assert_allclose(B[:, 16:], Bb)

    def test_harmonic_stacking(self):
        x = np.linspace(0, 5, 11)
        B = sgp.compute_B_sB_helper(x, a=1.0, k=8, m=3, region=[0, 5])
        assert B.shape == (11, 3 * 3 * 6)

    def test_Q_symmetric_positive(self):
        Q = sgp.compute_Q_sB(a=2.0, k=10, region=[0, 5], accuracy=0.01)
        assert Q.shape == (24, 24)
        np.testing.assert_allclose(Q, Q.T)
        eig = np.linalg.eigvalsh(Q)
        assert eig.min() > -1e-8

    def test_Q_quadform_matches_penalty_integral(self):
        # v^T Q v must equal the integral of (f'' + a^2 f)^2 for the sB
        # function f = sum_j v_j phi_j  (the defining property of Q)
        a, k, region = 1.7, 9, [0.0, 4.0]
        rng = np.random.default_rng(0)
        v = rng.normal(size=3 * (k - 2))
        acc = 0.001
        Q = sgp.compute_Q_sB(a=a, k=k, region=region, accuracy=acc)
        nsteps = int(np.floor((region[1] - region[0]) / acc + 1e-10))
        x = region[0] + acc * np.arange(nsteps + 1)
        h = 1e-5

        def f(xx):
            return sgp.compute_B_sB(xx, a, k, region) @ v

        f0 = f(x)
        fpp = (f(x + h) - 2 * f0 + f(x - h)) / h ** 2
        integrand = (fpp + a ** 2 * f0) ** 2
        w = np.diff(np.concatenate([[0.0], x]))
        integral = np.sum(w * integrand)
        assert np.isclose(v @ Q @ v, integral, rtol=1e-4)

    def test_global_poly_sgp(self):
        X = sgp.global_poly_sgp(np.array([0.0, 1.0]), a=2.0, m=2)
        np.testing.assert_allclose(
            X[1], [np.cos(2), np.sin(2), np.cos(4), np.sin(4)])


class TestPriorConversion:
    def test_iwp_closed_form(self):
        # Cp = d^(2p-1) / ((2p-1) (p-1)!^2)
        out = prior_conversion_iwp(2.0, {"u": 1.0, "alpha": 0.5}, p=2)
        Cp = 2.0 ** 3 / (3 * 1)
        assert np.isclose(out["u"], 1.0 / np.sqrt(Cp))
        assert out["alpha"] == 0.5

    def test_sgp_correction(self):
        c = compute_d_step_sgp_sd(1.0, 2.0)
        expected = np.sqrt((1 / 4) * (0.5 - np.sin(4.0) / 8.0))
        assert np.isclose(c, expected)
        out = prior_conversion_sgp(1.0, {"u": 3.0, "alpha": 0.1}, a=2.0, m=2)
        corr = compute_d_step_sgp_sd(1.0, 2.0) + compute_d_step_sgp_sd(1.0, 4.0)
        assert np.isclose(out["u"], 3.0 / corr)


def test_post_matmul_routing():
    """_post_matmul: host path for small/CPU products; the device branch
    (exercised with min_flops=0 — a no-op routing on the CPU test
    backend) agrees with numpy to f32 accuracy."""
    from bayesgp_tpu.postfit import _post_matmul

    rng = np.random.default_rng(0)
    A = rng.normal(size=(40, 12))
    Bm = rng.normal(size=(12, 17))
    np.testing.assert_array_equal(_post_matmul(A, Bm), A @ Bm)
    out = _post_matmul(A, Bm, min_flops=0)
    np.testing.assert_allclose(out, A @ Bm, rtol=2e-6, atol=1e-6)


def test_predict_chunked_matches_full():
    """The chunked predict path (production scale) must produce the
    same mean/interval as the single-pass path."""
    import bayesgp_tpu as bg
    from bayesgp_tpu import postfit

    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 4, 120))
    y = rng.poisson(np.exp(0.5 * np.sin(x) + 1.0)).astype(float)
    fit = bg.model_fit("y ~ f(x, model='IWP', order=2, k=8)",
                       {"x": x, "y": y}, family="Poisson", M=50,
                       engine="dense")
    grid = {"x": np.linspace(0.1, 3.9, 200)}
    full = fit.predict("x", newdata=grid)
    old = postfit._PREDICT_CHUNK_ELEMS
    try:
        postfit._PREDICT_CHUNK_ELEMS = 500   # force ~10-row blocks
        chunked = fit.predict("x", newdata=grid)
    finally:
        postfit._PREDICT_CHUNK_ELEMS = old
    for key in full:
        np.testing.assert_allclose(chunked[key], full[key], atol=1e-12)


def test_model_fit_timing():
    """model_fit(timing=True) attaches a per-phase PhaseTimer
    (SURVEY.md section 5: the tracing subsystem the reference lacks)."""
    import bayesgp_tpu as bg

    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(0, 3, 80))
    y = rng.poisson(np.exp(0.4 * np.sin(x) + 1.0)).astype(float)
    fit = bg.model_fit("y ~ f(x, model='IWP', order=2, k=6)",
                       {"x": x, "y": y}, family="Poisson", M=30,
                       engine="dense", timing=True)
    assert fit.timing is not None
    phases = list(fit.timing.times)
    assert any("build" in p for p in phases)
    assert any("inference" in p for p in phases)
    assert "total" in fit.timing.summary()
    # default: no timer
    fit2 = bg.model_fit("y ~ f(x, model='IWP', order=2, k=6)",
                        {"x": x, "y": y}, family="Poisson", M=30,
                        engine="dense")
    assert fit2.timing is None


def test_predict_derivative_consistency():
    """SURVEY.md section 4 property test: central finite differences of
    the degree-0 posterior DRAWS match the degree-1 (and degree-1 vs
    degree-2) draws — both are exact evaluations of the same
    piecewise-polynomial sample paths."""
    import bayesgp_tpu as bg

    rng = np.random.default_rng(8)
    x = np.sort(rng.uniform(0, 4, 150))
    y = rng.poisson(np.exp(0.5 * np.sin(1.3 * x) + 1.0)).astype(float)
    fit = bg.model_fit("y ~ f(x, model='IWP', order=3, k=10)",
                       {"x": x, "y": y}, family="Poisson", M=40,
                       engine="dense", seed=2)
    grid = np.linspace(0.5, 3.5, 31)
    h = 1e-4
    for d in (0, 1):
        _, f_hi = fit.predict("x", newdata={"x": grid + h}, degree=d,
                              only_samples=True)
        _, f_lo = fit.predict("x", newdata={"x": grid - h}, degree=d,
                              only_samples=True)
        _, f_d = fit.predict("x", newdata={"x": grid}, degree=d + 1,
                             only_samples=True)
        fd = (f_hi - f_lo) / (2 * h)
        scale = np.maximum(np.abs(f_d), 1.0)
        assert np.max(np.abs(fd - f_d) / scale) < 1e-5
