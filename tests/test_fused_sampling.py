"""Fused fit+sample: posterior draws made INSIDE the fused fit program
(aghq_fit sample=(key, M) -> fit.presampled) must equal the separate
sample_marginal dispatches bit-for-bit (same key discipline, same
logits arithmetic) on both the fast and dense backends.
"""
import numpy as np
import jax
import jax.numpy as jnp

from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.fast.iwp import build_fast_iwp
from bayesgp_tpu.inference import aghq, sampling


def _data(n=300, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 5, n))
    f = 1.0 + 0.6 * np.sin(x * 2)
    y = rng.poisson(np.exp(f)).astype(float)
    return x, y


def test_fused_sampling_fast_backend():
    x, y = _data()
    n = len(x)
    inst = T.build_iwp_term("x", x, order=3, k=12, materialize_B=False)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson",
                            dense_design=False)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    be = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data)

    key = jax.random.PRNGKey(7)
    M = 150
    fit_s = aghq.aghq_fit(be, k=4, sample=(key, M))
    assert fit_s.presampled is not None
    samps_f, idx_f, th_f = sampling.sample_marginal(key, fit_s, M)

    fit_u = aghq.aghq_fit(be, k=4)
    assert fit_u.presampled is None
    samps_u, idx_u, th_u = sampling.sample_marginal(key, fit_u, M)

    assert np.array_equal(idx_f, idx_u)
    np.testing.assert_array_equal(samps_f, samps_u)
    np.testing.assert_array_equal(th_f, th_u)
    # fit quantities themselves are unchanged by the sampling fusion
    assert abs(fit_s.lognormconst - fit_u.lognormconst) < 1e-12
    # a different M than presampled falls back to fresh draws
    samps2, _, _ = sampling.sample_marginal(key, fit_s, 40)
    assert samps2.shape == (samps_f.shape[0], 40)


def test_fused_sampling_dense_backend():
    x, y = _data(seed=1)
    n = len(x)
    inst = T.build_iwp_term("x", x, order=2, k=10)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson")
    key = jax.random.PRNGKey(3)
    M = 120
    dense = aghq.DenseBackend(md)
    fit_s = aghq.aghq_fit(dense, k=4, sample=(key, M))
    s1, i1, _ = sampling.sample_marginal(key, fit_s, M)
    fit_u = aghq.aghq_fit(aghq.DenseBackend(md), k=4)
    s2, i2, _ = sampling.sample_marginal(key, fit_u, M)
    assert np.array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-12)


def test_model_fit_uses_fused_sampling():
    """model_fit's aghq path draws inside the fit program; results are
    reproducible across calls with the same seed."""
    import bayesgp_tpu as bg
    x, y = _data(seed=2)
    data = {"x": x, "y": y}
    fit1 = bg.model_fit("y ~ f(x, model='IWP', order=2, k=8)", data,
                        family="Poisson", M=60, seed=5, engine="dense")
    fit2 = bg.model_fit("y ~ f(x, model='IWP', order=2, k=8)", data,
                        family="Poisson", M=60, seed=5, engine="dense")
    assert fit1.mod.presampled is not None
    np.testing.assert_array_equal(fit1.samps, fit2.samps)


def test_fused_sampling_s2_nodes_program():
    """s>1 path: draws fused into the node-evaluation program (Gaussian
    IWP -> 2 hyperparameters) equal the separate-dispatch path."""
    rng = np.random.default_rng(4)
    n = 250
    x = np.sort(rng.uniform(0, 5, n))
    f = 0.8 * np.sin(x * 1.5)
    y = f + 0.3 * rng.normal(size=n)
    inst = T.build_iwp_term("x", x, order=2, k=10, materialize_B=False)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Gaussian",
                            dense_design=False)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    be = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data)
    assert be.n_theta == 2

    key = jax.random.PRNGKey(11)
    M = 100
    fit_s = aghq.aghq_fit(be, k=3, sample=(key, M))
    assert fit_s.presampled is not None
    s1, i1, t1 = sampling.sample_marginal(key, fit_s, M)

    fit_u = aghq.aghq_fit(be, k=3)
    assert fit_u.presampled is None
    s2, i2, t2 = sampling.sample_marginal(key, fit_u, M)
    assert np.array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(t1, t2)


def test_sample_zero_M_and_fresh_key():
    """Review regressions: sample=(key, 0) must fit without draws (not
    crash), and sample_marginal with a DIFFERENT key must produce fresh
    independent draws, not silently return the fit-time ones."""
    x, y = _data(seed=6)
    n = len(x)
    inst = T.build_iwp_term("x", x, order=2, k=8, materialize_B=False)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson",
                            dense_design=False)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    be = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data)

    k1 = jax.random.PRNGKey(0)
    fit0 = aghq.aghq_fit(be, k=3, sample=(k1, 0))
    assert fit0.presampled is None and np.isfinite(fit0.lognormconst)

    M = 80
    fit = aghq.aghq_fit(be, k=3, sample=(k1, M))
    s_same, i_same, _ = sampling.sample_marginal(k1, fit, M)
    np.testing.assert_array_equal(s_same, fit.presampled[0])
    k2 = jax.random.PRNGKey(99)
    s_new, i_new, _ = sampling.sample_marginal(k2, fit, M)
    assert not np.array_equal(s_new, s_same)


def test_fused_predict_inside_fit():
    """model_fit(predict_at=(var, xs)): fit + draws + predict summaries
    in ONE fused program on the fast path; results match the post-fit
    predict of the same draws to f32 summarizer noise."""
    import bayesgp_tpu as bg
    rng = np.random.default_rng(0)
    n = 600
    x = np.sort(rng.uniform(0.0, 10.0, n))
    y = rng.poisson(np.exp(0.4 * np.sin(x) + 1.0)).astype(float)
    xs = np.linspace(0.0, 10.0, 200)
    fit = bg.model_fit("y ~ f(x, model='IWP', order=3, k=30)",
                       data={"y": y, "x": x}, family="Poisson",
                       M=400, seed=1, engine="banded",
                       predict_at=("x", xs))
    assert fit.mod.prepredicted is not None      # actually fused
    pred_f = fit.predictions["x"]
    pred_h = fit.predict("x", newdata={"x": xs})
    assert np.allclose(pred_f["x"], pred_h["x"])
    for f in ("mean", "plower", "pupper"):
        scale = 1.0 + np.abs(pred_h[f]).max()
        assert np.abs(pred_f[f] - pred_h[f]).max() < 2e-3 * scale, f


def test_predict_at_fallback_dense():
    """predict_at on a non-fusable configuration (dense engine) falls
    back to a post-fit predict — the argument always works."""
    import bayesgp_tpu as bg
    rng = np.random.default_rng(1)
    n = 200
    x = np.sort(rng.uniform(0.0, 5.0, n))
    y = rng.poisson(np.exp(0.5 * np.sin(x) + 0.5)).astype(float)
    xs = np.linspace(0.0, 5.0, 50)
    fit = bg.model_fit("y ~ f(x, model='IWP', order=2, k=10)",
                       data={"y": y, "x": x}, family="Poisson",
                       M=200, seed=0, engine="dense",
                       predict_at=("x", xs))
    pred = fit.predictions["x"]
    assert np.all(np.isfinite(pred["mean"]))
    assert np.all(pred["plower"] <= pred["pupper"])
