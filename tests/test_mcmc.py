"""MCMC (adaptive HMC over joint (W, theta)) tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayesgp_tpu as bg
from bayesgp_tpu.inference import mcmc


def test_hmc_gaussian_target_moments():
    """The kernel samples a correlated Gaussian with correct moments."""
    rng = np.random.default_rng(0)
    A = rng.normal(size=(4, 4))
    cov = A @ A.T + 4 * np.eye(4)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(z):
        return -0.5 * z @ (prec @ z)

    zs, acc = jax.jit(lambda k: mcmc.run_chain(
        logp, jnp.zeros(4), k, n_warmup=1500, n_samples=6000,
        n_leapfrog=16))(jax.random.PRNGKey(1))
    zs = np.asarray(zs)
    assert 0.5 < float(acc) <= 1.0
    emp = np.cov(zs.T)
    sd = np.sqrt(np.diag(cov))
    assert np.abs(zs.mean(0) / sd).max() < 0.15
    assert np.abs(emp - cov).max() / np.abs(cov).max() < 0.25


def test_mcmc_model_fit_matches_aghq():
    """Posterior moments from method='MCMC' agree with aghq within MC
    error on a small Poisson model."""
    rng = np.random.default_rng(3)
    n = 80
    x = np.sort(rng.uniform(0, 6, n))
    y = rng.poisson(np.exp(0.4 * np.sin(x) + 1.0)).astype(float)
    data = {"y": y, "x": x}
    f = "y ~ f(x, model='IWP', order=2, k=6)"
    fit_a = bg.model_fit(f, data=data, family="Poisson", method="aghq",
                         M=4000, seed=2)
    fit_m = bg.model_fit(f, data=data, family="Poisson", method="MCMC",
                         M=4000, option_list={"warmup": 3000, "chains": 1})
    # fixed effect (intercept) posterior mean agreement
    mu_a = float(fit_a.sample_fixed_effect("intercept").mean())
    mu_m = float(fit_m.sample_fixed_effect("intercept").mean())
    sd_a = float(fit_a.sample_fixed_effect("intercept").std())
    assert abs(mu_a - mu_m) < 0.5 * sd_a + 0.05
    # theta posterior mean agreement (joint-MCMC vs AGHQ marginal)
    th_a = fit_a.theta_summary()["theta(x)"]["mean"]
    th_m = float(fit_m.theta_samps[:, 0].mean())
    th_sd = fit_a.theta_summary()["theta(x)"]["sd"]
    assert abs(th_a - th_m) < 1.0 * th_sd + 0.1
    # predict works off MCMC samples
    pred = fit_m.predict("x")
    assert np.all(np.isfinite(pred["mean"]))
    # var_density MCMC path (KDE of sigma samples)
    vd = fit_m.var_density(component="x")
    assert np.all(np.isfinite(vd["post"]))


def _fast_backend_small(family="Poisson", n=100, k=8, seed=5):
    from bayesgp_tpu import terms as T
    from bayesgp_tpu.model import build as B
    from bayesgp_tpu.fast.iwp import build_fast_iwp
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 6, n))
    f = 0.4 * np.sin(x) + 1.0
    if family == "Gaussian":
        y = f + 0.3 * rng.normal(size=n)
    else:
        y = rng.poisson(np.exp(f)).astype(float)
    inst = T.build_iwp_term("x", x, order=2, k=k)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, family)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    return build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data)


@pytest.mark.parametrize("family", ["Poisson", "Gaussian"])
def test_mcmc_fast_val_grad_consistent(family):
    """mcmc_fit_fast's hand-assembled (logp, grad) == autodiff of the
    backend's joint neg_log_post (both families: Gaussian adds the
    noise theta to the likelihood)."""
    from bayesgp_tpu.inference.mcmc import _fast_logp_val_grad

    be = _fast_backend_small(family)
    dim = be.d + be.q + be.n_theta
    rng = np.random.default_rng(0)
    # the PRODUCTION closures NUTS integrates, not a re-implementation
    logp, val_grad = _fast_logp_val_grad(be)
    ad = jax.jit(jax.value_and_grad(logp))
    hand = jax.jit(val_grad)
    for t in range(3):
        z = jnp.asarray(rng.normal(0, 0.7, dim))
        v1, g1 = ad(z)
        v2, g2 = hand(z)
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-9, atol=1e-9)


def test_mcmc_fast_model_fit_matches_aghq():
    """method='MCMC' + engine='banded' (the fast-backend NUTS path,
    mcmc.mcmc_fit_fast) agrees with aghq posterior moments on a small
    Poisson model, and the post-fit surfaces work off its samples."""
    rng = np.random.default_rng(3)
    n = 80
    x = np.sort(rng.uniform(0, 6, n))
    y = rng.poisson(np.exp(0.4 * np.sin(x) + 1.0)).astype(float)
    data = {"y": y, "x": x}
    f = "y ~ f(x, model='IWP', order=2, k=6)"
    fit_a = bg.model_fit(f, data=data, family="Poisson", method="aghq",
                         M=4000, seed=2)
    fit_m = bg.model_fit(f, data=data, family="Poisson", method="MCMC",
                         engine="banded", M=4000,
                         option_list={"warmup": 3000, "chains": 1})
    assert fit_m.mod["algorithm"] == "NUTS-fast"
    mu_a = float(fit_a.sample_fixed_effect("intercept").mean())
    mu_m = float(fit_m.sample_fixed_effect("intercept").mean())
    sd_a = float(fit_a.sample_fixed_effect("intercept").std())
    assert abs(mu_a - mu_m) < 0.5 * sd_a + 0.05
    th_a = fit_a.theta_summary()["theta(x)"]["mean"]
    th_m = float(fit_m.theta_samps[:, 0].mean())
    th_sd = fit_a.theta_summary()["theta(x)"]["sd"]
    assert abs(th_a - th_m) < 1.0 * th_sd + 0.1
    pred = fit_m.predict("x")
    assert np.all(np.isfinite(pred["mean"]))
    vd = fit_m.var_density(component="x")
    assert np.all(np.isfinite(vd["post"]))
