"""sGP integration tests mirroring the reference's lynx vignette structure
(vignettes/BayesGP-sGP.Rmd:72-108: sGP(a=2pi/10) + IID overdispersion,
Poisson, PSD-converted prior, h recorded for PSD reporting)."""
import numpy as np
import pytest

import bayesgp_tpu as bg


def make_cyclic_data(n=140, period=10.0, seed=4):
    rng = np.random.default_rng(seed)
    year = np.linspace(1821, 1821 + n - 1, n)
    f = 1.2 * np.cos(2 * np.pi * year / period + 0.7)
    eta = 2.0 + f + rng.normal(0, 0.15, n)   # overdispersion
    y = rng.poisson(np.exp(eta)).astype(float)
    return {"y": y, "year": year, "x": np.arange(n, dtype=float)}, f


@pytest.fixture(scope="module")
def lynx_style_fit():
    data, f_true = make_cyclic_data()
    prior_PSD = {"u": 1.0, "alpha": 0.01}
    prior_SD = bg.prior_conversion_sgp(d=50, prior=prior_PSD,
                                       a=2 * np.pi / 10)
    fit = bg.model_fit(
        "y ~ f(x=year, model='sGP', a=a_val, k=30, "
        "sd_prior=dict(prior='exp', param=prior_SD, h=2)) "
        "+ f(x=x, model='IID', sd_prior=dict(prior='exp', param=0.5))",
        data=data, family="Poisson", method="aghq", M=1000, seed=6,
        env={"a_val": 2 * np.pi / 10, "prior_SD": prior_SD},
        control_fixed={"intercept": {"prec": 0.001, "mean": 0}})
    return fit, data, f_true


def test_sgp_recovers_cycle(lynx_style_fit):
    fit, data, f_true = lynx_style_fit
    pred = fit.predict("year")
    # the latent cycle + intercept should track eta's smooth part
    target = 2.0 + f_true
    resid = pred["mean"] - target[np.argsort(data["year"])]
    assert np.sqrt(np.mean(resid ** 2)) < 0.35
    inside = np.mean((target >= pred["plower"]) & (target <= pred["pupper"]))
    assert inside > 0.75


def test_sgp_psd_reporting(lynx_style_fit):
    """h=2 recorded in sd.prior => var_density reports PSD columns
    (reference quirk: h affects reporting only, SURVEY.md section 2.4)."""
    fit, _, _ = lynx_style_fit
    vd = fit.var_density(component="year")
    assert "PSD" in vd and "post.PSD" in vd
    table = fit.post_table()
    names = [r["name"] for r in table]
    assert "year (PSD)" in names
    assert "x (SD)" in names


def test_sgp_theta_count(lynx_style_fit):
    fit, _, _ = lynx_style_fit
    ts = fit.theta_summary()
    assert set(ts) == {"theta(year)", "theta(x)"}


def test_model_fit_loop_frequency_grid():
    """Grid empirical Bayes over the sGP frequency (model_fit_loop,
    reference R/02_model_fit.R:706-778): the log marginal likelihood
    should peak near the true period."""
    data, _ = make_cyclic_data(n=100, seed=8)
    periods = np.array([6.0, 8.0, 10.0, 13.0, 16.0])
    out = bg.model_fit_loop(
        loop_values=periods,
        formula="y ~ f(x=year, model='sGP', period=LOOP, k=20)",
        data=data, family="Poisson", method="aghq", M=10, loop_holder="LOOP")
    assert out["post"].shape == (5,)
    assert np.isclose(np.trapezoid(out["post"], periods), 1.0)
    assert periods[np.argmax(out["log_ml"])] == 10.0


def test_sgp_predict_window_invariance():
    """Predictions on a SUB-window must equal the matching slice of a
    full-range prediction (fit-coordinate evaluation; the reference's
    min(refined_x) re-centering silently changes the function on
    windows that exclude the training origin — documented deviation,
    see compute_post_fun_sgp)."""
    import bayesgp_tpu as bg

    rng = np.random.default_rng(12)
    n = 150
    x = np.sort(rng.uniform(0, 20, n))
    y = (np.sin(2 * np.pi * x / 5.0)
         + 0.3 * rng.normal(size=n))
    fit = bg.model_fit(
        "y ~ f(x=x, model='sGP', period=5, k=15, m=1)",
        {"x": x, "y": y}, family="Gaussian", M=60, seed=3,
        engine="dense")
    grid_full = np.linspace(1.0, 19.0, 91)
    full = fit.predict("x", newdata={"x": grid_full})
    sub = grid_full[40:70]            # window excluding the range start
    win = fit.predict("x", newdata={"x": sub})
    np.testing.assert_allclose(win["mean"], full["mean"][40:70],
                               atol=1e-10)
    np.testing.assert_allclose(win["pupper"], full["pupper"][40:70],
                               atol=1e-10)


def test_sgp_chunked_predict_matches_full():
    """Chunked sGP predict == single-pass (the chunk blocks must stay
    in the fit coordinate system)."""
    import bayesgp_tpu as bg
    from bayesgp_tpu import postfit

    rng = np.random.default_rng(13)
    n = 120
    x = np.sort(rng.uniform(0, 10, n))
    y = np.cos(2 * np.pi * x / 4.0) + 0.2 * rng.normal(size=n)
    fit = bg.model_fit(
        "y ~ f(x=x, model='sGP', period=4, k=12, m=1)",
        {"x": x, "y": y}, family="Gaussian", M=40, seed=4,
        engine="dense")
    grid = {"x": np.linspace(0.2, 9.8, 150)}
    full = fit.predict("x", newdata=grid)
    old = postfit._PREDICT_CHUNK_ELEMS
    try:
        postfit._PREDICT_CHUNK_ELEMS = 400
        chunked = fit.predict("x", newdata=grid)
    finally:
        postfit._PREDICT_CHUNK_ELEMS = old
    for key in full:
        np.testing.assert_allclose(chunked[key], full[key], atol=1e-12)


def test_sgp_predict_device_branch_wiring(lynx_style_fit, monkeypatch):
    """predict()'s single-dispatch device branch for sGP terms (sB
    design built on device) matches the host path. The branch gates on
    a non-CPU backend, so fake the backend check; the computation runs
    wherever jax is configured (CPU here)."""
    import jax
    fit, data, _ = lynx_style_fit
    lo, hi = float(data["year"].min()), float(data["year"].max())
    newdata = {"year": np.linspace(lo, hi, 25_000)}  # 25e3*1000 >= 2e7
    ref = fit.predict("year", newdata=newdata)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out = fit.predict("year", newdata=newdata)
    assert np.allclose(out["year"], ref["year"])
    for f in ("mean", "plower", "pupper"):
        scale = 1.0 + np.abs(ref[f]).max()
        assert np.abs(out[f] - ref[f]).max() < 5e-4 * scale, f
