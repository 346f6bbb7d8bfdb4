"""End-to-end integration tests for the partial-likelihood families
(the reference validates these via vignettes/BayesGP-Partial_Likelihood.Rmd)."""
import numpy as np
import pytest

import bayesgp_tpu as bg


@pytest.fixture(scope="module")
def cc_fit():
    """Case-crossover fit on the bundled sim1data (vignette lines 36-49:
    case ~ f(exposure, IWP2, k=30, initial_location=median), family cc,
    strata=subject)."""
    data = bg.datasets.sim1data()
    med = float(np.median(data["exposure"]))
    fit = bg.model_fit(
        "case ~ f(x=exposure, model='IWP', order=2, k=30, "
        f"initial_location={med}, sd_prior=dict(prior='exp', "
        "param=dict(u=1, alpha=0.5)))",
        data=data, family="cc", strata="subject", method="aghq", M=1000,
        seed=7)
    return fit, med


def test_cc_recovers_true_effect(cc_fit):
    """The simulated truth is 3(x^2 - 0.5^2) (vignette line 55); the
    fitted curve must match it (centered at the initial location) well
    within the credible envelope."""
    fit, med = cc_fit
    grid = np.linspace(0.05, 0.95, 19)
    pred = fit.predict("exposure", newdata={"exposure": grid})
    true_f = 3 * (grid ** 2 - 0.5 ** 2)
    true_c = true_f - 3 * (med ** 2 - 0.5 ** 2)
    rmse = np.sqrt(np.mean((pred["mean"] - true_c) ** 2))
    spread = np.mean(pred["pupper"] - pred["plower"])
    assert rmse < spread, (rmse, spread)
    # pointwise: most of the truth inside the 95% band
    inside = np.mean((true_c >= pred["plower"]) & (true_c <= pred["pupper"]))
    assert inside > 0.8


def test_cc_has_no_intercept(cc_fit):
    fit, _ = cc_fit
    assert "intercept" not in fit.fixed_samp_indexes


def make_survival_data(n=120, seed=5):
    """Weibull PH data with two fixed effects and an IID cluster effect."""
    rng = np.random.default_rng(seed)
    age = rng.uniform(20, 70, n)
    sex = rng.binomial(1, 0.5, n).astype(float)
    cluster = rng.integers(0, 10, n).astype(float)
    u = rng.normal(0, 0.3, 10)
    eta = 0.03 * (age - 45) - 0.8 * sex + u[cluster.astype(int)]
    t = rng.exponential(np.exp(-eta))
    c = rng.exponential(np.median(t) * 2.5, n)
    time = np.minimum(t, c)
    status = (t <= c).astype(float)
    return {"time": time, "age": age, "sex": sex, "id": cluster,
            "status": status}


def test_coxph_end_to_end():
    """CoxPH with fixed effects + IID frailty (vignette lines 73-93)."""
    data = make_survival_data()
    fit = bg.model_fit(
        "time ~ age + sex + f(x=id, model='IID', "
        "sd_prior=dict(prior='exp', param=dict(u=1, alpha=0.5)))",
        data=data, family="coxph", cens="status", method="aghq", M=2000,
        seed=11)
    s_age = fit.sample_fixed_effect("age")
    s_sex = fit.sample_fixed_effect("sex")
    # true effects 0.03 and -0.8; posterior means in the right region
    assert abs(s_age.mean() - 0.03) < 0.03
    assert abs(s_sex.mean() + 0.8) < 0.6
    assert s_sex.mean() < 0
    assert "intercept" not in fit.fixed_samp_indexes
    assert np.isfinite(fit.mod.lognormconst)


def test_coxph_sorts_data_by_response():
    """The reference sorts rows by the response before fitting
    (R/02_model_fit.R:346-350); results must not depend on input order."""
    data = make_survival_data(n=60, seed=9)
    fit1 = bg.model_fit(
        "time ~ age + f(x=id, model='IID')", data=data, family="coxph",
        cens="status", M=500, seed=1)
    perm = np.random.default_rng(0).permutation(60)
    data2 = {k: v[perm] for k, v in data.items()}
    fit2 = bg.model_fit(
        "time ~ age + f(x=id, model='IID')", data=data2, family="coxph",
        cens="status", M=500, seed=1)
    assert np.isclose(fit1.mod.lognormconst, fit2.mod.lognormconst,
                      rtol=1e-8)
    assert np.allclose(fit1.mod.mode, fit2.mod.mode, atol=1e-6)
