"""Unit tests of the joint negative log posterior and its structured
Hessians against closed forms and autodiff."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.model import families as F
from bayesgp_tpu.model.objective import neg_log_post, hessian_W, prior_precision


def tiny_model(family="Poisson", n=40, seed=0, **kw):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 5, n))
    inst = T.build_iwp_term("x", x, order=2, k=5)
    eta_true = 0.3 * x
    if family == "Gaussian":
        y = eta_true + rng.normal(0, 0.3, n)
    elif family == "Poisson":
        y = rng.poisson(np.exp(eta_true * 0.3)).astype(float)
    elif family == "Binomial":
        y = rng.binomial(3, 1 / (1 + np.exp(-0.2 * (x - 2)))).astype(float)
    elif family in ("Coxph", "cc", "none"):
        y = kw.pop("y")
    dmf = [np.ones((n, 1)), x.reshape(n, 1)]
    return B.build_model_data([inst], dmf, y, family, **kw), inst


@pytest.mark.parametrize("family", ["Gaussian", "Poisson", "Binomial"])
def test_hessian_matches_autodiff(family):
    md, _ = tiny_model(family)
    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.normal(0, 0.2, md.w_count))
    theta = jnp.asarray(rng.normal(0, 0.3, md.n_theta))
    H_struct = hessian_W(W, theta, md)
    H_ad = jax.hessian(neg_log_post)(W, theta, md)
    np.testing.assert_allclose(H_struct, H_ad, rtol=1e-9, atol=1e-9)


def test_gaussian_loglik_closed_form():
    md, _ = tiny_model("Gaussian")
    W = jnp.zeros(md.w_count)
    theta = jnp.zeros(md.n_theta)
    eta = np.zeros(md.n)
    sigma = 1.0
    ll = float(F.log_lik(jnp.asarray(eta), md, theta))
    expected = np.sum(-0.5 * np.log(2 * np.pi) - 0.5 * np.asarray(md.y) ** 2)
    assert np.isclose(ll, expected)


def test_poisson_loglik_closed_form():
    from scipy.stats import poisson
    md, _ = tiny_model("Poisson")
    rng = np.random.default_rng(2)
    eta = rng.normal(0, 0.5, md.n)
    ll = float(F.log_lik(jnp.asarray(eta), md, jnp.zeros(0)))
    expected = poisson.logpmf(np.asarray(md.y), np.exp(eta)).sum()
    assert np.isclose(ll, expected)


def test_binomial_loglik_closed_form():
    from scipy.stats import binom
    md, _ = tiny_model("Binomial")
    rng = np.random.default_rng(3)
    eta = rng.normal(0, 0.5, md.n)
    p = 1 / (1 + np.exp(-eta))
    ll = float(F.log_lik(jnp.asarray(eta), md, jnp.zeros(0)))
    expected = binom.logpmf(np.asarray(md.y), 1, p).sum()
    assert np.isclose(ll, expected)


def coxph_loglik_reference(eta, y, cens):
    """Literal transcription of the C++ nested loops
    (src/BayesGP.cpp:170-194) for cross-checking the vectorized version.
    Assumes data sorted by y ascending."""
    n = len(y)
    order = np.argsort(y, kind="stable")
    ranks = np.empty(n, int)
    sorted_y = y[order]
    first = np.searchsorted(sorted_y, sorted_y, side="left")
    ranks[order] = first + 1
    ll = 0.0
    for i in range(n):
        nn = n - ranks[i] + 1
        risk = eta[n - nn:]
        ll += -cens[i] * np.log(np.sum(np.exp(risk - eta[i])))
    return ll


def test_coxph_vectorized_matches_loops():
    rng = np.random.default_rng(4)
    n = 30
    y = np.sort(rng.exponential(1, n))  # pre-sorted like model_fit does
    y[5] = y[4]  # introduce a tie
    cens = rng.binomial(1, 0.7, n).astype(float)
    eta = rng.normal(0, 0.5, n)
    x = np.sort(rng.uniform(0, 5, n))
    inst = T.build_iwp_term("x", x, order=2, k=4)
    md = B.build_model_data([inst], [], y, "Coxph", cens=cens)
    ll_vec = float(F.log_lik(jnp.asarray(eta), md, jnp.zeros(0)))
    ll_ref = coxph_loglik_reference(eta, y, cens)
    assert np.isclose(ll_vec, ll_ref, rtol=1e-12)


def test_coxph_hessian_matches_autodiff():
    rng = np.random.default_rng(5)
    n = 25
    y = np.sort(rng.exponential(1, n))
    cens = rng.binomial(1, 0.7, n).astype(float)
    x = np.sort(rng.uniform(0, 5, n))
    inst = T.build_iwp_term("x", x, order=2, k=4)
    md = B.build_model_data([inst], [], y, "Coxph", cens=cens)
    eta = jnp.asarray(rng.normal(0, 0.5, n))
    M_struct = F.eta_hessian_full(eta, md, jnp.zeros(0))
    M_ad = -jax.hessian(lambda e: F.log_lik(e, md, jnp.zeros(0)))(eta)
    np.testing.assert_allclose(M_struct, M_ad, rtol=1e-8, atol=1e-10)


def cc_loglik_reference(eta, case_day, control_days, count):
    """Literal transcription of src/BayesGP.cpp:196-210 (logspace_add
    chain seeded at 0)."""
    ll = 0.0
    for i in range(len(case_day)):
        acc = 0.0
        for j in range(control_days.shape[1]):
            if control_days[i, j] == 0:
                continue
            v = eta[control_days[i, j] - 1] - eta[case_day[i] - 1]
            acc = np.logaddexp(acc, v)
        ll -= count[i] * acc
    return ll


def make_cc_model(seed=6, n_subj=8, per=4):
    rng = np.random.default_rng(seed)
    n = n_subj * per
    subject = np.repeat(np.arange(n_subj), per)
    case = np.zeros(n)
    for s in range(n_subj):
        case[s * per + rng.integers(0, per)] = 1.0
    x = rng.uniform(0, 5, n)
    inst = T.build_iwp_term("x", x, order=2, k=4)
    cc = B.build_cc_strata(case, subject, None)
    md = B.build_model_data([inst], [], case, "cc", cc_arrays=cc)
    return md, rng


def test_cc_vectorized_matches_loops():
    md, rng = make_cc_model()
    eta = rng.normal(0, 0.5, md.n)
    ll_vec = float(F.log_lik(jnp.asarray(eta), md, jnp.zeros(0)))
    ll_ref = cc_loglik_reference(eta, np.asarray(md.case_day),
                                 np.asarray(md.control_days),
                                 np.asarray(md.count))
    assert np.isclose(ll_vec, ll_ref, rtol=1e-12)


def test_cc_hessian_matches_autodiff():
    md, rng = make_cc_model(seed=7)
    eta = jnp.asarray(rng.normal(0, 0.5, md.n))
    M_struct = F.eta_hessian_full(eta, md, jnp.zeros(0))
    M_ad = -jax.hessian(lambda e: F.log_lik(e, md, jnp.zeros(0)))(eta)
    np.testing.assert_allclose(M_struct, M_ad, rtol=1e-8, atol=1e-10)


def test_prior_only_family():
    rng = np.random.default_rng(8)
    n = 20
    x = np.sort(rng.uniform(0, 5, n))
    inst = T.build_iwp_term("x", x, order=2, k=4)
    md = B.build_model_data([inst], [np.ones((n, 1))], np.zeros(n), "none")
    eta = jnp.asarray(rng.normal(size=n))
    assert float(F.log_lik(eta, md, jnp.zeros(0))) == 0.0


def test_prior_precision_blockdiag():
    md, inst = tiny_model("Poisson")
    theta = jnp.asarray([0.7])
    Q = np.asarray(prior_precision(theta, md))
    d = md.d_sizes[0]
    np.testing.assert_allclose(Q[:d, :d], np.exp(0.7) * inst.P)
    # boundary block has betaprec on the diagonal
    b = md.x_sizes[0]
    np.testing.assert_allclose(np.diag(Q)[d:d + b], 0.01)
    np.testing.assert_allclose(np.diag(Q)[d + b:], 0.01)


def test_neg_log_post_matches_manual_gaussian():
    """Full objective vs a hand computation for the Gaussian family."""
    md, inst = tiny_model("Gaussian")
    rng = np.random.default_rng(9)
    W = rng.normal(0, 0.3, md.w_count)
    theta = rng.normal(0, 0.2, 2)  # theta_RE, theta_family
    eta = np.asarray(md.A) @ W
    sigma = np.exp(-0.5 * theta[-1])
    ll = np.sum(-0.5 * np.log(2 * np.pi) - np.log(sigma)
                - 0.5 * ((np.asarray(md.y) - eta) / sigma) ** 2)
    d = md.d_sizes[0]
    U = W[:d]
    P = np.asarray(md.P_blocks[0])
    lpW = (-0.5 * np.exp(theta[0]) * U @ P @ U
           + 0.5 * (d * theta[0] + md.logPdet[0]))
    beta = W[d:d + md.x_sizes[0]]
    lpW += -0.5 * 0.01 * np.sum(beta ** 2)
    bf = W[md.fixed_offset():]
    lpW += -0.5 * np.sum(0.01 * bf ** 2)
    lpT = 0.0
    for uu, aa, th in zip(np.asarray(md.u), np.asarray(md.alpha), theta):
        phi = -np.log(aa) / uu
        lpT += np.log(0.5 * phi) - phi * np.exp(-0.5 * th) - 0.5 * th
    expected = -(ll + lpW + lpT)
    got = float(neg_log_post(jnp.asarray(W), jnp.asarray(theta), md))
    assert np.isclose(got, expected, rtol=1e-12)


def test_coxph_quadform_matches_full():
    rng = np.random.default_rng(15)
    n = 25
    y = np.sort(rng.exponential(1, n))
    y[4] = y[3]
    cens = rng.binomial(1, 0.7, n).astype(float)
    x = np.sort(rng.uniform(0, 5, n))
    inst = T.build_iwp_term("x", x, order=2, k=4)
    md = B.build_model_data([inst], [np.ones((n, 1))], y, "Coxph", cens=cens)
    eta = jnp.asarray(rng.normal(0, 0.5, n))
    Hq = F.eta_hessian_quadform(eta, md, jnp.zeros(0), md.A)
    M = F.eta_hessian_full(eta, md, jnp.zeros(0))
    np.testing.assert_allclose(Hq, md.A.T @ (M @ md.A), rtol=1e-9, atol=1e-11)


def test_cc_quadform_matches_full():
    md, rng = make_cc_model(seed=16)
    n = md.n
    eta = jnp.asarray(rng.normal(0, 0.5, n))
    Hq = F.eta_hessian_quadform(eta, md, jnp.zeros(0), md.A)
    M = F.eta_hessian_full(eta, md, jnp.zeros(0))
    np.testing.assert_allclose(Hq, md.A.T @ (M @ md.A), rtol=1e-9, atol=1e-11)
