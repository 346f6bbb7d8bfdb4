"""Lynx example — mirrors the reference sGP vignette
(/root/reference/vignettes/BayesGP-sGP.Rmd:30-108) on the REAL bundled
Canadian lynx series (1821-1934):

    y_i | lambda_i ~ Poisson(lambda_i)
    log lambda_i = beta_0 + g(year_i) + xi_i
    g ~ sGP(a = 2*pi/10, sigma),  xi_i ~ N(0, sigma_xi)

with a PSD prior P(sigma(50) > 1) = 0.01 converted to the sigma scale,
P(sigma_xi > 1) = 0.01, and N(0, 1000) boundary/intercept priors.

Run: python examples/lynx_sgp_example.py
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
    lynx = bg.datasets.lynx()
    data = {"year": lynx["year"], "y": lynx["count"],
            "x": lynx["year"] - lynx["year"].min(),
            "idx": np.arange(len(lynx["year"]), dtype=float)}

    # PSD prior on the 50-year predictive SD (vignette lines 72-75)
    prior_PSD = {"u": 1.0, "alpha": 0.01}
    prior_SD = bg.prior_conversion_sgp(d=50, prior=prior_PSD,
                                       a=2 * np.pi / 10)

    fit = bg.model_fit(
        "y ~ f(x=year, model='sGP', a=a_val, k=30, "
        "sd_prior=dict(prior='exp', param=prior_SD, h=2), "
        "boundary_prior=dict(prec=0.001)) "
        "+ f(x=idx, model='IID', "
        "sd_prior=dict(prior='exp', param=dict(u=1, alpha=0.01)))",
        data=data, family="Poisson", method="aghq", M=3000,
        env={"a_val": 2 * np.pi / 10, "prior_SD": prior_SD},
        control_fixed={"intercept": {"prec": 0.001, "mean": 0}})

    fit.summary()
    pred = fit.predict("year", newdata={
        "year": np.arange(1821, 1934.01, 0.1)})
    print("posterior mean g(year): range",
          float(pred["mean"].min()), "..", float(pred["mean"].max()))
    vd = fit.var_density(component="year")
    print("sGP sigma posterior density computed:",
          bool(np.all(np.isfinite(vd["post"]))))


if __name__ == "__main__":
    main()
