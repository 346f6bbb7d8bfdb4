"""FitResult save/load round-trip."""
import numpy as np
import pytest

import bayesgp_tpu as bg
from bayesgp_tpu.serialize import save_fit, load_fit


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    n = 100
    x = np.sort(rng.uniform(0, 6, n))
    y = rng.poisson(np.exp(0.4 * np.sin(x) + 1.0)).astype(float)
    z = rng.normal(size=n)
    data = {"y": y, "x": x, "z": z}
    fit = bg.model_fit("y ~ z + f(x, model='IWP', order=2, k=8)",
                       data=data, family="Poisson", M=500, seed=3)
    path = str(tmp_path / "fit.npz")
    save_fit(fit, path)
    fit2 = load_fit(path)

    assert fit2.mod.lognormconst == pytest.approx(fit.mod.lognormconst)
    np.testing.assert_array_equal(fit2.samps, fit.samps)
    # predict works off the loaded fit (no refit)
    p1 = fit.predict("x", newdata={"x": np.linspace(0, 6, 11)})
    p2 = fit2.predict("x", newdata={"x": np.linspace(0, 6, 11)})
    np.testing.assert_allclose(p1["mean"], p2["mean"])
    # summaries and densities work
    assert fit2.theta_summary()["theta(x)"]["mean"] == pytest.approx(
        fit.theta_summary()["theta(x)"]["mean"])
    vd = fit2.var_density(component="x")
    assert np.all(np.isfinite(vd["post"]))
    t1 = fit.post_table()
    t2 = fit2.post_table()
    assert [r["name"] for r in t1] == [r["name"] for r in t2]
