"""Golden-number integration test: the reference README covid example
(reference README.md:58-97; model new_deaths ~ weekdays1..6 +
f(t, IWP, order=3, k=30), Poisson, aghq k=4).

See PARITY.md for why the two adaptation paths carry different tolerances.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayesgp_tpu as bg
from bayesgp_tpu.inference import aghq as A
from bayesgp_tpu.inference import laplace as L

FORMULA = ("new_deaths ~ weekdays1 + weekdays2 + weekdays3 + weekdays4 "
           "+ weekdays5 + weekdays6 + f(t, model='IWP', order=3, k=30)")

GOLDEN = {
    "mode": -3.245926,
    "lognormconst": -4322.531,
    "quad_cov": 0.07936619,
    "mean": -3.271182, "sd": 0.2785344,
    "q2.5": -3.87922, "median": -3.268308, "q97.5": -2.760093,
    "fixed_means": [-5.40445, 0.09375, 0.07922, 0.12672, 0.12547,
                    0.05001, -0.15126],
}


@pytest.fixture(scope="module")
def covid_fit():
    data = bg.datasets.covid_canada()
    return bg.model_fit(FORMULA, data=data, family="Poisson", method="aghq",
                        M=3000, seed=1)


@pytest.fixture(scope="module")
def covid_md(covid_fit):
    return covid_fit.md


def test_reference_adaptation_parity(covid_md):
    """With the reference's own quadrature nodes, our Laplace nll must
    reproduce the README posterior summary to ~1e-5 (its printed
    precision) — the strongest achievable parity statement (PARITY.md)."""
    md = covid_md
    mode = np.array([GOLDEN["mode"]])
    H = np.array([[1.0 / GOLDEN["quad_cov"]]])
    cov = np.linalg.inv(H)
    Lc = np.linalg.cholesky(cov)
    z, logw_base = A.product_grid(4, 1)
    nodes = mode[None, :] + z @ Lc.T
    logw = logw_base + np.log(np.diag(Lc)).sum()
    nlls = np.asarray(jax.jit(jax.vmap(
        lambda th: L.laplace_nll(th, md)[0]))(jnp.asarray(nodes)))
    lw = -nlls + logw
    m = lw.max()
    lognorm = float(m + np.log(np.exp(lw - m).sum()))
    assert abs(lognorm - GOLDEN["lognormconst"]) < 1e-3

    fit = A.AGHQFit(mode=mode, hessian=H, L=Lc, nodes=nodes, logw=logw,
                    lognll=nlls, lognormconst=lognorm, states=None, k=4)
    fit.marginals = [A.marginal_posterior(fit, A.DenseBackend(md), 0)]
    rows = A.summarize_marginals(fit)[0]
    assert abs(rows["mean"] - GOLDEN["mean"]) < 1e-5
    assert abs(rows["sd"] - GOLDEN["sd"]) < 1e-5
    assert abs(rows["q2.5"] - GOLDEN["q2.5"]) < 1e-5
    assert abs(rows["median"] - GOLDEN["median"]) < 1e-5
    assert abs(rows["q97.5"] - GOLDEN["q97.5"]) < 1e-5


def test_native_fit_golden(covid_fit):
    """Native (exact-Hessian) path: values within the reference's
    fp-noise basin (PARITY.md Group B analysis)."""
    fit = covid_fit
    assert abs(fit.mod.mode[0] - GOLDEN["mode"]) < 5e-4
    assert abs(fit.mod.lognormconst - GOLDEN["lognormconst"]) < 2e-3
    cov = float(np.linalg.inv(fit.mod.hessian)[0, 0])
    assert abs(cov - GOLDEN["quad_cov"]) < 5e-3
    ts = fit.theta_summary()["theta(t)"]
    assert abs(ts["mean"] - GOLDEN["mean"]) < 1e-4
    assert abs(ts["sd"] - GOLDEN["sd"]) < 1e-3
    assert abs(ts["median"] - GOLDEN["median"]) < 5e-3
    assert abs(ts["q2.5"] - GOLDEN["q2.5"]) < 1e-2
    assert abs(ts["q97.5"] - GOLDEN["q97.5"]) < 1e-2


def test_fixed_effects_golden(covid_fit):
    """Fixed-effect posterior means: MC jitter at M=3000 is ~sd/sqrt(M)
    (intercept sd 0.66 => tol ~0.05; weekdays sd ~0.012 => tol ~2e-3),
    loosened 3x for safety."""
    fx = covid_fit.fixed_effects_summary()
    names = ["intercept"] + [f"weekdays{i}" for i in range(1, 7)]
    tols = [0.15] + [0.004] * 6
    for name, golden, tol in zip(names, GOLDEN["fixed_means"], tols):
        assert abs(fx[name]["Mean"] - golden) < tol, (name, fx[name]["Mean"])


def test_predict_runs(covid_fit):
    pred = covid_fit.predict("t")
    assert len(pred["mean"]) == 787
    assert np.all(pred["plower"] <= pred["pupper"])
    # derivative predictions (vignette covid example uses degree 1 and 2)
    for degree in (1, 2):
        pr = covid_fit.predict("t", degree=degree)
        assert np.all(np.isfinite(pr["mean"]))


def test_summary_and_post_table(covid_fit):
    text = covid_fit.summary()
    assert "theta(t)" in text
    # reference-format header block (R/03_post_fit.R:4-28 re-prints the
    # aghq summary; golden layout at reference README.md:73-96)
    assert "AGHQ on a 1 dimensional posterior with  4 quadrature points" in text
    assert "The posterior mode is:" in text
    assert "The log of the normalizing constant/marginal likelihood is:" in text
    assert "The covariance matrix used for the quadrature is..." in text
    assert "[,1]" in text and "[1,]" in text
    assert "Here are some moments and quantiles for the log precision:" in text
    assert "Here are some moments and quantiles for the fixed effects:" in text
    table = covid_fit.post_table()
    names = [r["name"] for r in table]
    assert "intercept" in names and "t (SD)" in names


def test_post_table_sd_row_golden(covid_fit):
    """Numeric pin of the theta->SD table row: the native fit's t (SD)
    median/quantiles sit within the fp-noise basin of the golden-derived
    values SD_q = exp(-theta_{1-q}/2) (PARITY.md Group B: the exact-vs-FD
    Hessian adaptation moves the quadrature cov ~4%, which propagates
    ~1% into the SD quantiles), plus a tight regression pin of the
    current values so refactors can't drift silently."""
    row = [r for r in covid_fit.post_table() if r["name"] == "t (SD)"][0]
    golden_median = np.exp(-GOLDEN["median"] / 2)      # 5.125
    golden_lo = np.exp(-GOLDEN["q97.5"] / 2)           # 3.975
    golden_hi = np.exp(-GOLDEN["q2.5"] / 2)            # 6.956
    assert abs(row["median"] - golden_median) / golden_median < 0.02
    assert abs(row["q0.025"] - golden_lo) / golden_lo < 0.02
    assert abs(row["q0.975"] - golden_hi) / golden_hi < 0.02
    assert row["prior"] == "Exponential"
    assert row["prior:P1"] == 1.0 and row["prior:P2"] == 0.5
    # regression pin (CPU f64 deterministic; values recorded 2026-08-20)
    np.testing.assert_allclose(
        [row["median"], row["q0.025"], row["q0.975"]],
        [5.105, 3.943, 6.897], atol=0.02)


def test_var_density_golden_values(covid_fit):
    """Numeric pin of var_density: posterior SD density integrates to 1,
    peaks near the golden SD mode, and the prior column is the exact
    exponential-prior density on the SD scale (value-asserted, not just
    name-asserted)."""
    vd = covid_fit.var_density(component="t")
    sd, post, prior = vd["SD"], vd["post"], vd["prior"]
    # density normalization (trapezoid over the fine grid)
    mass = np.trapezoid(post, sd)
    assert abs(mass - 1.0) < 0.01
    # the posterior mode on the SD scale sits near exp(-theta_mode/2)
    sd_mode = sd[np.argmax(post)]
    assert abs(sd_mode - np.exp(-GOLDEN["mode"] / 2)) < 0.15
    # prior column: P(sigma > u=1) = alpha=0.5 exponential on sigma,
    # density lam*exp(-lam*sd) with lam = log(2)
    lam = np.log(2.0)
    np.testing.assert_allclose(prior, lam * np.exp(-lam * sd), rtol=1e-10)
    # regression pin of the peak (recorded 2026-08-20, CPU f64)
    np.testing.assert_allclose([sd_mode, post.max()],
                               [4.9808, 0.60777], atol=0.02)


def test_reference_adaptation_sd_table_parity(covid_md):
    """Group-A parity for the SD-scale table: with the reference's own
    adaptation (mode/cov from README), the var_density machinery's SD
    quantiles must land on exp(-theta_q/2) of the golden theta quantiles
    to fine-grid resolution (the reference's aghq uses the identical
    1000-point extended grid + left-Riemann CDF discretization)."""
    md = covid_md
    mode = np.array([GOLDEN["mode"]])
    H = np.array([[1.0 / GOLDEN["quad_cov"]]])
    Lc = np.linalg.cholesky(np.linalg.inv(H))
    z, logw_base = A.product_grid(4, 1)
    nodes = mode[None, :] + z @ Lc.T
    logw = logw_base + np.log(np.diag(Lc)).sum()
    nlls = np.asarray(jax.jit(jax.vmap(
        lambda th: L.laplace_nll(th, md)[0]))(jnp.asarray(nodes)))
    lw = -nlls + logw
    m = lw.max()
    lognorm = float(m + np.log(np.exp(lw - m).sum()))
    fit = A.AGHQFit(mode=mode, hessian=H, L=Lc, nodes=nodes, logw=logw,
                    lognll=nlls, lognormconst=lognorm, states=None, k=4)
    fit.marginals = [A.marginal_posterior(fit, A.DenseBackend(md), 0)]

    transformation = {"totheta": lambda x: -2 * np.log(x),
                      "fromtheta": lambda x: np.exp(-x / 2)}
    pc = A.compute_pdf_and_cdf(fit.marginals[0],
                               transformation=transformation)
    sd = pc["transparam"][::-1]
    pdf_sd = pc["pdf_transparam"][::-1]
    cdf = np.cumsum(pdf_sd * np.concatenate([[0.0], np.diff(sd)]))
    # SD-space left-Riemann CDF over the non-uniform transformed grid
    # differs from the theta-space quantile transform by O(grid step):
    # measured 0.4-0.7% relative; bound at 1%
    for p, gq in ((0.025, np.exp(-GOLDEN["q97.5"] / 2)),
                  (0.5, np.exp(-GOLDEN["median"] / 2)),
                  (0.975, np.exp(-GOLDEN["q2.5"] / 2))):
        below = np.where(cdf < p)[0]
        q = sd[below.max()] if len(below) else sd[0]
        assert abs(q - gq) / gq < 0.01, (p, q, gq)
    # tight regression pin of the discretized values (CPU f64,
    # recorded 2026-08-20)
    qs = []
    for p in (0.025, 0.5, 0.975):
        below = np.where(cdf < p)[0]
        qs.append(sd[below.max()] if len(below) else sd[0])
    np.testing.assert_allclose(qs, [3.9490, 5.1049, 6.9104], atol=2e-3)


def test_reference_named_exports(covid_fit):
    """The reference NAMESPACE's exact names (NAMESPACE:3-23) resolve:
    IWP/sGP-cased aliases and the function-style post-fit API."""
    import bayesgp_tpu as bg
    assert bg.compute_post_fun_IWP is bg.compute_post_fun_iwp
    assert bg.prior_conversion_IWP is bg.prior_conversion_iwp
    assert bg.prior_conversion_sGP is bg.prior_conversion_sgp
    assert bg.global_poly_helper_sGP is bg.global_poly_sgp
    assert bg.compute_d_step_sGPsd is bg.compute_d_step_sgp_sd
    # function spellings delegate to the FitResult methods
    tab = bg.post_table(covid_fit)
    assert [r["name"] for r in tab] == [r["name"] for r in
                                        covid_fit.post_table()]
    vd = bg.var_density(covid_fit, component="t")
    assert "SD" in vd and "post" in vd and "prior" in vd
    s = bg.sample_fixed_effect(covid_fit, "weekdays1")
    assert s.shape[1] == 1
    pd_ = bg.para_density(covid_fit)
    assert "intercept" in pd_


def test_device_predict_summarizer_matches_host():
    """_summarize_linear_device (the accelerator predict-summary path)
    agrees with extract_mean_interval_given_samps to f32 tolerance,
    including the empty-global-part derivative case."""
    from bayesgp_tpu import postfit
    rng = np.random.default_rng(0)
    B = rng.normal(size=(300, 25))
    coefs = rng.normal(size=(25, 150))
    X = rng.normal(size=(300, 3))
    g = rng.normal(size=(3, 150))
    ref = postfit.extract_mean_interval_given_samps(
        np.arange(300.0), X @ g + B @ coefs, level=0.9)
    mean, lo, hi = postfit._summarize_linear_device(B, coefs, X, g, 0.9)
    assert np.abs(mean - ref["mean"]).max() < 5e-4
    assert np.abs(lo - ref["plower"]).max() < 5e-4
    assert np.abs(hi - ref["pupper"]).max() < 5e-4
    X0, g0 = np.zeros((300, 0)), np.zeros((0, 150))
    ref0 = postfit.extract_mean_interval_given_samps(
        np.arange(300.0), B @ coefs)
    mean0, lo0, hi0 = postfit._summarize_linear_device(B, coefs, X0, g0,
                                                       0.95)
    assert np.abs(mean0 - ref0["mean"]).max() < 5e-4
    assert np.abs(lo0 - ref0["plower"]).max() < 5e-4


def test_device_iwp_block_summarizer_matches_host():
    """_summarize_iwp_device_blocks (single-dispatch production predict:
    O-spline design built ON device per row block) agrees with the
    host-basis path to f32 tolerance, including degree > 0 and the
    padded last block."""
    import math
    from bayesgp_tpu import postfit

    rng = np.random.default_rng(1)
    p, k, M = 3, 12, 120
    knots = np.linspace(0.0, 10.0, k)
    xs = np.sort(rng.uniform(0.0, 10.0, 457))   # 457 % rows != 0
    coefs = rng.normal(size=(k - 1, M))
    gfull = rng.normal(size=(p, M))             # [intercept, x, x^2]
    for degree in (0, 1):
        p_eff = p - degree
        B = postfit.osplines.local_poly_helper(knots, xs, p=p_eff)
        X = postfit.osplines.global_poly_helper(xs, p=p)[:, :p_eff]
        X = X * np.array([math.factorial(i + degree) / math.factorial(i)
                          for i in range(p_eff)])[None, :]
        g = gfull[degree:p]
        ref = postfit.extract_mean_interval_given_samps(
            xs, X @ g + B @ coefs, level=0.95)
        mean, lo, hi = postfit._summarize_iwp_device_blocks(
            knots, xs, p_eff, coefs, X, g, 0.95, rows=100)
        assert np.abs(mean - ref["mean"]).max() < 5e-4, degree
        assert np.abs(lo - ref["plower"]).max() < 5e-4, degree
        assert np.abs(hi - ref["pupper"]).max() < 5e-4, degree


def test_device_bspline_matches_scipy():
    """_bspline_basis_jnp == scipy BSpline(extrapolate=True) values,
    inside the region, at the clamped ends, and extrapolated past both
    (the end pieces' polynomial extensions)."""
    import jax.numpy as jnp
    from bayesgp_tpu import postfit
    from bayesgp_tpu.basis import bsplines

    lo, hi, kb = 2.0, 12.0, 17
    t = bsplines.bspline_knots(lo, hi, kb, 4)
    xs = np.concatenate([np.linspace(1.2, 12.8, 333), [lo, hi]])
    ref = bsplines.eval_bspline_basis(xs, lo, hi, kb, 4)
    out = np.asarray(postfit._bspline_basis_jnp(
        jnp.asarray(t), kb, 3, jnp.asarray(xs)))
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-6)


def test_device_sgp_block_summarizer_matches_host():
    """_summarize_sgp_device_blocks (on-device sB design) agrees with
    the host path to f32 tolerance, boundary and m=2 included."""
    from bayesgp_tpu import postfit
    from bayesgp_tpu.basis import sgp as sgp_basis

    rng = np.random.default_rng(4)
    a, kb, m, M = 2 * np.pi / 5.0, 14, 2, 90
    region = (0.0, 20.0)
    xs = np.sort(rng.uniform(0.0, 20.0, 311))
    ncols = (3 * (kb - 2)) * m
    coefs = rng.normal(size=(ncols, M))
    g = rng.normal(size=(1 + 2 * m, M))
    B = sgp_basis.compute_B_sB_helper(xs, a=a, k=kb, m=m, region=region,
                                      boundary=True,
                                      initial_location=0.0)
    X = np.concatenate([np.ones((len(xs), 1)),
                        sgp_basis.global_poly_sgp(xs, a=a, m=m,
                                                  initial_location=0.0)],
                       axis=1)
    ref = postfit.extract_mean_interval_given_samps(
        xs, X @ g + B @ coefs, level=0.95)
    mean, lo, hi = postfit._summarize_sgp_device_blocks(
        xs, a, kb, m, region, True, coefs, X, g, 0.95, rows=128)
    assert np.abs(mean - ref["mean"]).max() < 1e-3
    assert np.abs(lo - ref["plower"]).max() < 1e-3
    assert np.abs(hi - ref["pupper"]).max() < 1e-3


def test_predict_device_branch_wiring(covid_fit, monkeypatch):
    """predict()'s production-scale device branch (single-dispatch IWP
    path) returns the same summaries as the host path. The branch gates
    on a non-CPU backend, so fake the backend check; the computation
    itself runs wherever jax is configured (CPU here)."""
    import jax
    from bayesgp_tpu import postfit

    t = covid_fit.md  # noqa: F841 — fixture builds the model
    newdata = {"t": np.linspace(0.0, 600.0, 7000)}  # 7000*3000 >= 2e7
    ref = covid_fit.predict("t", newdata=newdata)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out = covid_fit.predict("t", newdata=newdata)
    assert np.allclose(out["t"], ref["t"])
    for f in ("mean", "plower", "pupper"):
        scale = np.abs(ref[f]).max()
        assert np.abs(out[f] - ref[f]).max() < 2e-4 * (1.0 + scale), f
