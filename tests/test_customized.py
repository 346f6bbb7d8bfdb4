"""Customized random effects and customized likelihood families
(reference: Customized RE class R/01_utility.R:59-63, 220-223, 251-254;
customized_template family_type -1, R/02_model_fit.R:19-24)."""
import numpy as np
import jax.numpy as jnp
import pytest

import bayesgp_tpu as bg


def test_customized_random_effect():
    """User-supplied compute_B / compute_P closures."""
    rng = np.random.default_rng(0)
    n = 80
    x = np.sort(rng.uniform(0, 1, n))
    y = rng.poisson(np.exp(1.0 + np.sin(2 * np.pi * x))).astype(float)

    def compute_B(xv):
        # simple Fourier features
        return np.stack([np.sin(2 * np.pi * xv), np.cos(2 * np.pi * xv),
                         np.sin(4 * np.pi * xv), np.cos(4 * np.pi * xv)],
                        axis=1)

    def compute_P(xv):
        return np.eye(4)

    fit = bg.model_fit(
        "y ~ f(x, model='Customized')", data={"y": y, "x": x},
        family="Poisson", M=500, seed=1,
        customized_re={"compute_B": compute_B, "compute_P": compute_P})
    assert np.isfinite(fit.mod.lognormconst)
    # the sin coefficient should be strongly positive
    idx = fit.random_samp_indexes["x"]
    coefs = fit.samps[idx, :].mean(axis=1)
    assert coefs[0] > 0.5


def test_customized_family():
    """A registered custom log-likelihood (negative binomial with fixed
    dispersion) fits end-to-end; a Poisson-equivalent custom family
    reproduces the built-in Poisson fit exactly."""
    rng = np.random.default_rng(2)
    n = 100
    x = np.sort(rng.uniform(0, 5, n))
    y = rng.poisson(np.exp(0.5 * np.sin(x) + 1.0)).astype(float)
    data = {"y": y, "x": x}
    f = "y ~ f(x, model='IWP', order=2, k=8)"

    def poisson_ll(eta, yy, theta):
        from jax.scipy.special import gammaln
        return jnp.sum(yy * eta - jnp.exp(eta) - gammaln(yy + 1.0))

    fit_builtin = bg.model_fit(f, data=data, family="Poisson", M=200, seed=3)
    fit_custom = bg.model_fit(f, data=data, family="Customized",
                              customized_template=poisson_ll, M=200, seed=3)
    assert np.isclose(fit_custom.mod.lognormconst,
                      fit_builtin.mod.lognormconst, atol=1e-4)
    assert np.allclose(fit_custom.mod.mode, fit_builtin.mod.mode, atol=1e-4)


def test_customized_family_requires_template():
    with pytest.raises(ValueError, match="customized_template"):
        bg.model_fit("y ~ f(x, model='IWP', order=2, k=5)",
                     data={"y": np.ones(10), "x": np.arange(10.0)},
                     family="Customized")
