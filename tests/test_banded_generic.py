"""Generalized banded backend (fast/banded.py): sGP drivers and
multi-term models. The Laplace marginal must EQUAL the dense backend's
(same objective, same Laplace value; the V-coordinate change is
unit-determinant up to the subtracted log|det T|)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayesgp_tpu as bg
from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.inference.aghq import DenseBackend, aghq_fit
from bayesgp_tpu.fast.banded import build_banded_backend


def _sgp_problem(n=150, k=20, m=1, family="Poisson", seed=0, with_fixed=True):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 40.0, n))
    eta = 0.6 * np.sin(2 * np.pi * x / 10.0) + 1.2
    y = rng.poisson(np.exp(eta)).astype(np.float64)
    inst = T.build_sgp_term("x", x, period=10.0, k=k, m=m)
    dmf = [np.ones((n, 1))]
    fixed_names = ["intercept"]
    if with_fixed:
        dmf.append(rng.normal(0, 1, (n, 1)))
        fixed_names.append("z")
    bf_prec = np.full(len(dmf), 0.01)
    bf_mean = np.zeros(len(dmf))
    md = B.build_model_data([inst], dmf, y, family,
                            control_fixed_prec=bf_prec,
                            control_fixed_mean=bf_mean)
    return [inst], md, dmf, bf_prec, bf_mean


def _multiterm_problem(n=200, seed=1):
    """IWP + IID on a Poisson response."""
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 10.0, n))
    g = rng.integers(0, 5, n)
    eta = 0.5 * np.sin(x) + 0.2 * g + 0.5
    y = rng.poisson(np.exp(eta)).astype(np.float64)
    t1 = T.build_iwp_term("x", x, order=2, k=15)
    t2 = T.build_iid_term("g", g)
    dmf = [np.ones((n, 1))]
    bf_prec = np.array([0.01])
    bf_mean = np.zeros(1)
    md = B.build_model_data([t1, t2], dmf, y, "Poisson",
                            control_fixed_prec=bf_prec,
                            control_fixed_mean=bf_mean)
    return [t1, t2], md, dmf, bf_prec, bf_mean


def _compare_nll(instances, md, dmf, bf_prec, bf_mean, thetas, tol=1e-6):
    dense = DenseBackend(md)
    banded = build_banded_backend(instances, md, dmf, bf_prec, bf_mean)
    nll_d = jax.jit(dense.nll)
    nll_b = jax.jit(banded.nll)
    for th in thetas:
        th = jnp.asarray(th, jnp.float64)
        v_d = float(nll_d(th))
        v_b = float(nll_b(th))
        assert abs(v_d - v_b) < tol * (1.0 + abs(v_d)), (
            f"theta={th}: dense={v_d} banded={v_b}")
    return banded


def test_sgp_driver_nll_matches_dense():
    prob = _sgp_problem()
    _compare_nll(*prob, thetas=[[0.0], [2.0], [-2.0], [4.0]])


def test_sgp_driver_m2_nll_matches_dense():
    prob = _sgp_problem(k=12, m=2)
    _compare_nll(*prob, thetas=[[0.0], [2.0]])


def test_sgp_driver_gaussian_family():
    prob = _sgp_problem(family="Gaussian")
    # theta = [theta_sgp, theta_noise]
    _compare_nll(*prob, thetas=[[0.0, 0.0], [2.0, 1.0], [-1.0, 2.0]])


def test_multiterm_iwp_iid_nll_matches_dense():
    prob = _multiterm_problem()
    _compare_nll(*prob, thetas=[[0.0, 0.0], [2.0, -1.0], [-1.0, 1.0]])


def test_banded_gradient_matches_dense():
    instances, md, dmf, bf_prec, bf_mean = _sgp_problem()
    dense = DenseBackend(md)
    banded = build_banded_backend(instances, md, dmf, bf_prec, bf_mean)
    th = jnp.asarray([1.0], jnp.float64)
    g_d = np.asarray(jax.grad(dense.nll)(th))
    g_b = np.asarray(jax.grad(banded.nll)(th))
    np.testing.assert_allclose(g_b, g_d, rtol=1e-4, atol=1e-6)


def test_banded_aghq_fit_and_samples_match_dense():
    """Full AGHQ through the banded backend: lognormconst and posterior
    sample moments (reference coordinate order) match the dense fit."""
    instances, md, dmf, bf_prec, bf_mean = _sgp_problem(n=120, k=15)
    fit_d = aghq_fit(DenseBackend(md), k=4)
    banded = build_banded_backend(instances, md, dmf, bf_prec, bf_mean)
    fit_b = aghq_fit(banded, k=4)
    assert abs(fit_d.lognormconst - fit_b.lognormconst) < 1e-4
    np.testing.assert_allclose(fit_b.mode, fit_d.mode, atol=1e-4)

    from bayesgp_tpu.inference.sampling import sample_marginal
    key = jax.random.PRNGKey(0)
    M = 6000
    s_d, _, _ = sample_marginal(key, fit_d, M)
    s_b, _, _ = sample_marginal(key, fit_b, M)
    assert s_d.shape == s_b.shape
    mu_d, mu_b = s_d.mean(axis=1), s_b.mean(axis=1)
    sd_d = s_d.std(axis=1)
    # same posterior => means agree within MC error
    assert np.max(np.abs(mu_d - mu_b) / (sd_d + 1e-3)) < 0.15
    np.testing.assert_allclose(s_b.std(axis=1), sd_d, rtol=0.15, atol=5e-3)


def test_model_fit_engine_banded_sgp():
    """model_fit(engine='banded') on an sGP+fixed model reproduces the
    dense fit's posterior through the full public API (summary/predict)."""
    rng = np.random.default_rng(4)
    n = 150
    x = np.sort(rng.uniform(0.0, 40.0, n))
    y = rng.poisson(np.exp(0.6 * np.sin(2 * np.pi * x / 10.0) + 1.2))
    data = {"y": y.astype(float), "x": x}
    f = "y ~ f(x=x, model='sGP', period=10, k=20)"
    fit_d = bg.model_fit(f, data=data, family="Poisson", engine="dense",
                         M=4000, seed=0)
    fit_b = bg.model_fit(f, data=data, family="Poisson", engine="banded",
                         M=4000, seed=0)
    assert abs(fit_d.mod.lognormconst - fit_b.mod.lognormconst) < 1e-4
    p_d = fit_d.predict("x")
    p_b = fit_b.predict("x")
    scale = np.abs(p_d["mean"]).max()
    assert np.max(np.abs(p_d["mean"] - p_b["mean"])) < 0.1 * scale
    th_d = fit_d.theta_summary()["theta(x)"]["mean"]
    th_b = fit_b.theta_summary()["theta(x)"]["mean"]
    assert abs(th_d - th_b) < 1e-3


def test_multiterm_fit_samples_reference_order():
    """Multi-term: posterior means per block line up with the dense fit
    (checks the backend->reference permutation)."""
    instances, md, dmf, bf_prec, bf_mean = _multiterm_problem()
    fit_d = aghq_fit(DenseBackend(md), k=3)
    banded = build_banded_backend(instances, md, dmf, bf_prec, bf_mean)
    fit_b = aghq_fit(banded, k=3)
    assert abs(fit_d.lognormconst - fit_b.lognormconst) < 1e-4

    from bayesgp_tpu.inference.sampling import sample_marginal
    key = jax.random.PRNGKey(1)
    s_d, _, _ = sample_marginal(key, fit_d, 6000)
    s_b, _, _ = sample_marginal(key, fit_b, 6000)
    mu_d, mu_b = s_d.mean(axis=1), s_b.mean(axis=1)
    sd_d = s_d.std(axis=1) + 1e-3
    assert np.max(np.abs(mu_d - mu_b) / sd_d) < 0.15


def test_fused_nd_matches_host_path():
    """The fused s>1 programs (build_fused_opt_nd + build_fused_nodes)
    must reproduce the host-loop BFGS + node_eval path: same mode,
    Hessian, lognormconst, and marginals (CPU f64: both converge to
    |g| < tol, so agreement is to optimizer tolerance, not fp noise)."""
    instances, md, dmf, bf_prec, bf_mean = _multiterm_problem()
    b_f = build_banded_backend(instances, md, dmf, bf_prec, bf_mean)
    fit_f = aghq_fit(b_f, k=3)
    b_h = build_banded_backend(instances, md, dmf, bf_prec, bf_mean)
    b_h.supports_fused_nd = False        # instance override -> host path
    fit_h = aghq_fit(b_h, k=3)
    assert abs(fit_f.lognormconst - fit_h.lognormconst) < 1e-6
    np.testing.assert_allclose(fit_f.mode, fit_h.mode, atol=1e-5)
    np.testing.assert_allclose(fit_f.hessian, fit_h.hessian, rtol=1e-4)
    for mf, mh in zip(fit_f.marginals, fit_h.marginals):
        np.testing.assert_allclose(mf["theta"], mh["theta"], atol=1e-5)
        np.testing.assert_allclose(mf["logmargpost"], mh["logmargpost"],
                                   atol=1e-5)


def test_marginal_posterior_indefinite_outer_hessian():
    """Regression: fp-noisy FD outer Hessians (fused f32 paths) can be
    indefinite. aghq_fit PD-clips the adapted covariance into fit.L;
    marginal_posterior must adapt from fit.L too, not re-invert the raw
    Hessian (which crashed np.linalg.cholesky on the s=2 gauss2 bench)."""
    from bayesgp_tpu.inference.aghq import marginal_posterior
    prob = _sgp_problem(family="Gaussian", n=100, k=12)
    md = prob[1]
    be = DenseBackend(md)
    fit = aghq_fit(be, k=3)
    clean = [np.asarray(m["logmargpost"]).copy() for m in fit.marginals]
    # corrupt the stored Hessian into an indefinite matrix; fit.L stays
    # the PD factor the fit adapted with
    fit.hessian = np.array([[1.0, 2.0], [2.0, -0.5]])
    for j in range(2):
        marg = marginal_posterior(fit, be, j)
        assert np.all(np.isfinite(marg["logmargpost"]))
        # unchanged vs the clean fit (marginals depend only on fit.L)
        np.testing.assert_allclose(marg["logmargpost"], clean[j],
                                   rtol=1e-10)


def test_sgp_sparse_windows_match_dense_extraction():
    """materialize_B=False builds the interleaved sB windows straight
    from x (no (n, 3m*kb) dense design); same reconstructed design as
    the dense-extraction path, including region-extrapolation rows."""
    from bayesgp_tpu.fast.banded import (_sgp_sparse_rows,
                                         _sgp_sparse_rows_from_x)
    rng = np.random.default_rng(23)
    for m, k, region in [(1, 12, None), (2, 9, None), (1, 10, (0.0, 30.0))]:
        x = np.concatenate([rng.uniform(0.0, 36.0, 120), [0.0, 36.0]])
        kw = dict(a=2 * np.pi / 9.0, k=k, m=m, region=region)
        td = T.build_sgp_term("x", x, materialize_B=True, **kw)
        ts = T.build_sgp_term("x", x, materialize_B=False, **kw)
        assert ts.B is None
        vd, sd, kb, G = _sgp_sparse_rows(td)
        vs, ss, kbs, Gs = _sgp_sparse_rows_from_x(ts)
        assert (kb, G) == (kbs, Gs)
        n, d, W = len(x), kb * G, 4 * G
        def dense_of(v, s):
            D = np.zeros((n, d + W))
            for i in range(n):
                D[i, s[i]:s[i] + W] += v[i]
            return D[:, :d]
        assert np.abs(dense_of(vd, sd) - dense_of(vs, ss)).max() < 1e-12
        # ensure_B on the sparse term reproduces the dense fit-time B
        assert np.abs(ts.ensure_B() - td.B).max() < 1e-12


def test_model_fit_single_sgp_skips_dense_design():
    """A single-sGP-term model on the banded engine never materializes
    the driver design; posterior matches the dense engine."""
    rng = np.random.default_rng(5)
    n = 300
    x = np.sort(rng.uniform(0, 40, n))
    y = rng.poisson(np.exp(1.0 + 0.6 * np.sin(2 * np.pi * x / 10)))
    data = {"x": x, "y": y.astype(float)}
    fml = "y ~ f(x=x, model='sGP', period=10, k=16)"
    fit_b = bg.model_fit(fml, data=data, family="Poisson", M=200, seed=0,
                         engine="banded")
    assert fit_b.instances[0].B is None
    fit_d = bg.model_fit(fml, data=data, family="Poisson", M=200, seed=0,
                         engine="dense")
    assert abs(fit_b.mod.lognormconst - fit_d.mod.lognormconst) < 1e-5
    assert np.abs(np.asarray(fit_b.mod.mode)
                  - np.asarray(fit_d.mod.mode)).max() < 1e-4


def test_model_fit_multiterm_driver_skips_dense_design():
    """Multi-term banded fits build all IWP/sGP terms lazily: the driver
    keeps B=None (sparse windows), tails materialize via ensure_B."""
    rng = np.random.default_rng(9)
    n = 250
    x = np.sort(rng.uniform(0, 12, n))
    g = rng.integers(0, 4, n)
    y = rng.poisson(np.exp(0.4 * np.sin(x) + 0.1 * g + 0.5))
    data = {"x": x, "g": g.astype(float), "y": y.astype(float)}
    fml = "y ~ f(x=x, model='IWP', order=2, k=14) + f(x=g, model='IID')"
    fit_b = bg.model_fit(fml, data=data, family="Poisson", M=200, seed=0,
                         engine="banded")
    drv = [t for t in fit_b.instances if t.kind == "IWP"][0]
    assert drv.B is None
    fit_d = bg.model_fit(fml, data=data, family="Poisson", M=200, seed=0,
                         engine="dense")
    assert abs(fit_b.mod.lognormconst - fit_d.mod.lognormconst) < 1e-5


def test_banded_neg_log_post_matches_dense():
    """Banded joint neg_log_post == dense objective at W = ref_perm of
    [T(V' - Z0 t) | t] for random coordinates — the target density of
    the fast-backend MCMC path (mcmc.mcmc_fit_fast)."""
    from bayesgp_tpu.model.objective import neg_log_post

    instances, md, dmf, bf_prec, bf_mean = _multiterm_problem()
    be = build_banded_backend(instances, md, dmf, bf_prec, bf_mean)
    rng = np.random.default_rng(7)
    for _ in range(3):
        Vp = np.zeros(be.dpad)
        Vp[:be.d] = rng.normal(0, 0.3, be.d)
        tail = rng.normal(0, 0.2, be.q)
        theta = rng.normal(0, 0.3, md.n_theta)
        Vact = be.to_V(jnp.asarray(Vp), jnp.asarray(tail))
        U = be.apply_T(Vact[:be.d])
        full = np.concatenate([np.asarray(U), tail])
        W = full[np.asarray(be.ref_perm)]
        f_dense = float(neg_log_post(jnp.asarray(W), jnp.asarray(theta),
                                     md))
        f_band = float(be.neg_log_post(jnp.asarray(Vp), jnp.asarray(tail),
                                       jnp.asarray(theta)))
        assert np.isclose(f_band, f_dense, rtol=1e-10)
