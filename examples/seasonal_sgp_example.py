"""Seasonal sGP example (the reference lynx vignette structure: a cyclic
series modeled with an sGP(a = 2*pi/period) smooth plus an IID
overdispersion effect, Poisson family, with a PSD-converted prior).

Run: python examples/seasonal_sgp_example.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# small vignette-scale models: run on CPU f64 by default (the
# in-environment TPU plugin otherwise wins and emulates f64 — minutes
# of compile); set BAYESGP_EXAMPLE_TPU=1 to run on the accelerator.
if not os.environ.get("BAYESGP_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import bayesgp_tpu as bg  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n, period = 140, 10.0
    year = np.linspace(1821, 1821 + n - 1, n)
    f_true = 1.2 * np.cos(2 * np.pi * year / period + 0.7)
    y = rng.poisson(np.exp(2.0 + f_true + rng.normal(0, 0.15, n)))
    data = {"y": y.astype(float), "year": year,
            "idx": np.arange(n, dtype=float)}

    # prior on the 50-year predictive SD, converted to the sigma scale
    prior_PSD = {"u": 1.0, "alpha": 0.01}
    prior_SD = bg.prior_conversion_sgp(d=50, prior=prior_PSD,
                                       a=2 * np.pi / period)

    fit = bg.model_fit(
        "y ~ f(x=year, model='sGP', a=a_val, k=30, "
        "sd_prior=dict(prior='exp', param=prior_SD, h=2)) "
        "+ f(x=idx, model='IID', sd_prior=dict(prior='exp', param=0.5))",
        data=data, family="Poisson", method="aghq", M=3000,
        env={"a_val": 2 * np.pi / period, "prior_SD": prior_SD},
        control_fixed={"intercept": {"prec": 0.001, "mean": 0}})

    fit.summary()
    pred = fit.predict("year",
                       newdata={"year": np.arange(1821, 1961, 0.5)})
    print("cycle amplitude estimate:",
          0.5 * (pred["mean"].max() - pred["mean"].min()))
    vd = fit.var_density(component="year")
    print("PSD columns present:", "PSD" in vd)

    # empirical Bayes over the period via the marginal likelihood
    out = bg.model_fit_loop(
        loop_values=np.array([8.0, 9.0, 10.0, 11.0, 12.0]),
        formula="y ~ f(x=year, model='sGP', period=LOOP, k=20)",
        data=data, family="Poisson", M=10)
    best = out["var"][np.argmax(out["log_ml"])]
    print("period with highest marginal likelihood:", best)


if __name__ == "__main__":
    main()
