"""Cox proportional-hazards example — mirrors the reference's CoxPH
vignette (/root/reference/vignettes/BayesGP-Partial_Likelihood.Rmd:73-93,
which uses survival::kidney) on simulated Weibull-PH survival data with
right censoring, two fixed effects and an IID cluster frailty:

    h_i(t) = h_0(t) exp(0.03 (age_i - 45) - 0.8 sex_i + u_{cluster_i})

Fitting uses the partial likelihood (min-tie ranks, rows pre-sorted by
the response — src/BayesGP.cpp:170-194, R/02_model_fit.R:346-350); the
intercept is not identifiable and is omitted, as in the reference.

Run: python examples/coxph_example.py
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


def make_survival_data(n=150, seed=5):
    rng = np.random.default_rng(seed)
    age = rng.uniform(20, 70, n)
    sex = rng.binomial(1, 0.5, n).astype(float)
    cluster = rng.integers(0, 10, n).astype(float)
    u = rng.normal(0, 0.3, 10)
    eta = 0.03 * (age - 45) - 0.8 * sex + u[cluster.astype(int)]
    t = rng.exponential(np.exp(-eta))
    c = rng.exponential(np.median(t) * 2.5, n)
    return {"time": np.minimum(t, c), "age": age, "sex": sex,
            "id": cluster, "status": (t <= c).astype(float)}


def main():
    data = make_survival_data()
    fit = bg.model_fit(
        "time ~ age + sex + f(x=id, model='IID', "
        "sd_prior=dict(prior='exp', param=dict(u=1, alpha=0.5)))",
        data=data, family="coxph", cens="status", method="aghq", M=3000)

    fit.summary()
    # posterior of each fixed effect (vignette: sample_fixed_effect)
    for name, truth in (("age", 0.03), ("sex", -0.8)):
        s = bg.sample_fixed_effect(fit, name)
        print(f"{name}: posterior mean {float(s.mean()):+.3f} "
              f"(truth {truth:+.2f}), sd {float(s.std()):.3f}")
    tab = fit.post_table()
    print(f"post_table rows: {[r['name'] for r in tab]}")


if __name__ == "__main__":
    main()
