"""Bundled lynx dataset + the reference sGP vignette workflow
(/root/reference/vignettes/BayesGP-sGP.Rmd:30-108) on the real series."""
import numpy as np

import bayesgp_tpu as bg


def test_lynx_dataset():
    d = bg.datasets.lynx()
    assert d["year"].shape == (114,)
    assert d["count"].shape == (114,)
    assert d["year"][0] == 1821 and d["year"][-1] == 1934
    # classic series invariants
    assert d["count"].max() == 6991          # 1885 peak
    assert d["count"].min() == 39            # 1889 trough
    assert int(d["count"][0]) == 269


def test_lynx_sgp_fit():
    """Vignette model: Poisson, sGP(2*pi/10) + IID overdispersion, PSD
    prior converted to the sigma scale."""
    lynx = bg.datasets.lynx()
    data = {"year": lynx["year"], "y": lynx["count"],
            "idx": np.arange(len(lynx["year"]), dtype=float)}
    prior_SD = bg.prior_conversion_sgp(d=50, prior={"u": 1.0, "alpha": 0.01},
                                       a=2 * np.pi / 10)
    fit = bg.model_fit(
        "y ~ f(x=year, model='sGP', a=a_val, k=20, "
        "sd_prior=dict(prior='exp', param=prior_SD, h=2), "
        "boundary_prior=dict(prec=0.001)) "
        "+ f(x=idx, model='IID', "
        "sd_prior=dict(prior='exp', param=dict(u=1, alpha=0.01)))",
        data=data, family="Poisson", method="aghq", M=500,
        env={"a_val": 2 * np.pi / 10, "prior_SD": prior_SD},
        control_fixed={"intercept": {"prec": 0.001, "mean": 0}})
    assert np.isfinite(fit.mod.lognormconst)
    pred = fit.predict("year")
    # the 10-year cycle must show up: g spans several log-units
    spread = pred["mean"].max() - pred["mean"].min()
    assert spread > 1.5
    vd = fit.var_density(component="year")
    assert np.all(np.isfinite(vd["post"]))
