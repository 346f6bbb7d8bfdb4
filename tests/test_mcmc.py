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
