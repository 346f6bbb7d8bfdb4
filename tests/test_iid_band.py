"""Merged-IID banded path: large-q IID terms interleaved into the IWP
driver band (fast/banded.py _merge_iid_into_band + BandDiagTerm).

The reference handles large-q IID terms through CHOLMOD's general
sparse Cholesky (R/02_model_fit.R:276-284, IID P=I at
R/01_utility.R:245-250); here the diagonal IID Hessian block merges
into the band. Parity vs the dense backend is exact (f64).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayesgp_tpu as bg
from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.fast.banded import build_banded_backend
from bayesgp_tpu.inference import aghq as A
from bayesgp_tpu.inference import laplace as L


def _problem(n=600, k=12, n_lev=30, seed=0, order=2):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 10.0, n))
    g = np.floor(x * (n_lev / 10.0)).astype(float)  # x-clustered levels
    u_true = 0.3 * rng.normal(size=int(g.max()) + 1)
    y = rng.poisson(np.exp(0.5 * np.sin(x) + u_true[g.astype(int)]
                           + 1.0)).astype(float)
    iwp_lazy = T.build_iwp_term("x", x, order=order, k=k,
                                materialize_B=False)
    iwp_dense = T.build_iwp_term("x", x, order=order, k=k)
    iid_dense = T.build_iid_term("g", g)
    iid_lazy = dataclasses.replace(iid_dense, B=None, P=None)
    dmf = [np.ones((n, 1))]
    return x, g, y, iwp_lazy, iwp_dense, iid_dense, iid_lazy, dmf


@pytest.fixture(scope="module")
def backends():
    (x, g, y, iwp_lazy, iwp_dense, iid_dense, iid_lazy,
     dmf) = _problem()
    md_dense = B.build_model_data([iwp_dense, iid_dense], dmf, y, "Poisson")
    md_lazy = B.build_model_data([iwp_lazy, iid_lazy], dmf, y, "Poisson",
                                 dense_design=False)
    be = build_banded_backend([iwp_lazy, iid_lazy], md_lazy, dmf,
                              np.full(1, 0.01), np.zeros(1))
    return md_dense, be


def test_merged_structure(backends):
    md_dense, be = backends
    assert len(be.band_terms) == 1
    bt = be.band_terms[0]
    assert bt.d_size == 30 and bt.theta_idx == 1
    assert int(np.asarray(bt.mask).sum()) == 30
    # real coordinate count excludes padded slots
    assert be.w_real == md_dense.A.shape[1]
    assert be.d > be.d_drv            # levels interleaved into the band


def test_laplace_nll_matches_dense(backends):
    md_dense, be = backends
    for th in ([0.0, 0.0], [0.7, -0.5], [-1.0, 1.2]):
        th = jnp.asarray(th, be.dtype)
        v_d = float(L.laplace_nll(th, md_dense)[0])
        v_b = float(be.laplace_nll(th)[0])
        np.testing.assert_allclose(v_b, v_d, rtol=1e-10)


def test_gradient_matches_dense(backends):
    md_dense, be = backends
    th = jnp.asarray([0.3, -0.2], be.dtype)
    gd = jax.grad(lambda t: L.laplace_nll(t, md_dense)[0])(th)
    gb = jax.grad(lambda t: be.laplace_nll(t)[0])(th)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd), rtol=1e-8)


def test_full_fit_and_samples_match_dense(backends):
    md_dense, be = backends
    fit_d = A.aghq_fit(md_dense, k=3)
    fit_b = A.aghq_fit(be, k=3)
    np.testing.assert_allclose(fit_b.mode, fit_d.mode, atol=1e-6)
    np.testing.assert_allclose(fit_b.lognormconst, fit_d.lognormconst,
                               atol=1e-7)
    for mb, md_ in zip(fit_b.marginals, fit_d.marginals):
        np.testing.assert_allclose(mb["theta"], md_["theta"], atol=1e-6)
        np.testing.assert_allclose(mb["logmargpost"], md_["logmargpost"],
                                   atol=1e-5)
    # posterior samples in reference order: moments must agree between
    # engines (MC error at M=4000)
    key = jax.random.PRNGKey(0)
    from bayesgp_tpu.inference.sampling import sample_marginal
    sd, _, _ = sample_marginal(key, fit_d, 4000)
    sb, _, _ = sample_marginal(key, fit_b, 4000)
    sd, sb = np.asarray(sd), np.asarray(sb)
    assert sd.shape == sb.shape
    mu_d = sd.mean(axis=1)
    mu_b = sb.mean(axis=1)
    sig_d = sd.std(axis=1)
    np.testing.assert_allclose(mu_b, mu_d,
                               atol=6 * sig_d.max() / np.sqrt(4000))


def test_scattered_levels_raise():
    """Non-x-clustered levels cannot stay band-limited: clear error at
    large q, densify fallback at small q."""
    rng = np.random.default_rng(3)
    n = 500
    x = np.sort(rng.uniform(0.0, 10.0, n))
    g = rng.integers(0, 40, n).astype(float)   # scattered!
    y = rng.poisson(np.exp(1.0 + 0.2 * np.sin(x))).astype(float)
    iwp = T.build_iwp_term("x", x, order=2, k=12, materialize_B=False)
    iid_lazy = dataclasses.replace(T.build_iid_term("g", g), B=None, P=None)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([iwp, iid_lazy], dmf, y, "Poisson",
                            dense_design=False)
    # q=40 <= 4000: falls back to the dense tail with a warning
    with pytest.warns(UserWarning, match="densifying"):
        be = build_banded_backend([iwp, iid_lazy], md, dmf,
                                  np.full(1, 0.01), np.zeros(1))
    assert not be.band_terms and be.q >= 40


def test_model_fit_lazy_end_to_end():
    """Public API: q > IID_LAZY_MIN_LEVELS rides the merged band and the
    whole fit/post-fit surface works."""
    rng = np.random.default_rng(5)
    n = 4000
    x = np.sort(rng.uniform(0.0, 100.0, n))
    g = np.floor(x * 6.0).astype(float)        # ~600 levels
    q = len(np.unique(g))
    assert q > T.IID_LAZY_MIN_LEVELS
    y = rng.poisson(np.exp(0.8 + 0.3 * np.sin(2 * np.pi * x / 25.0)
                           + 0.1 * rng.normal(size=n))).astype(float)
    # k=150 keeps levels-per-knot-interval (and with it the merged
    # bandwidth) small: the q >> d_drv regime works but compiles
    # slowly on this 1-core CPU host (bench-tier, not test-tier)
    fit = bg.model_fit(
        "y ~ f(x, model='IWP', order=2, k=150) + f(g, model='IID')",
        data={"y": y, "x": x, "g": g}, family="Poisson", method="aghq",
        aghq_k=3, M=200, seed=1)
    # the term went lazy and merged
    iid_inst = [t for t in fit.instances if t.kind == "IID"][0]
    assert iid_inst.B is None
    assert np.all(np.isfinite(fit.mod.mode))
    assert np.isfinite(fit.mod.lognormconst)
    assert fit.samps.shape[0] == fit.md.A.shape[1] if fit.md.A.size else True
    pred = fit.predict("x")
    assert np.all(np.isfinite(pred["mean"]))
    text = fit.summary()
    assert "theta(x)" in text and "theta(g)" in text


def test_merged_iid_mcmc_smoke(backends):
    """method='MCMC' (fast NUTS through the generic banded primitives
    neg_log_post/grad_W) works on a merged-IID backend: the band_terms
    prior components flow through the hand-assembled gradients."""
    from bayesgp_tpu.inference import mcmc as mcmc_mod
    _, be = backends
    opts = {"warmup": 40, "chains": 1, "seed": 0}
    mod, samps, theta_samps = mcmc_mod.mcmc_fit_fast(be, M=30,
                                                     options=opts)
    assert samps.shape[1] == 30 and samps.shape[0] == be.w_real
    assert np.all(np.isfinite(samps))
    assert np.all(np.isfinite(theta_samps))
