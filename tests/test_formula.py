"""Formula parser tests mirroring the reference's only unit-test file
(tests/testthat/test-formula-parser.R:1-59: 1 RE; 2 REs; 2 REs + 2 fixed
effects, asserting response/smoothing_var/model/order/k extraction)."""
import numpy as np
import pytest

from bayesgp_tpu.formula import parse_formula, parse_f_call


def test_single_random_effect():
    pf = parse_formula("y ~ f(x, model='IWP', order=2, k=10)")
    assert pf.response == "y"
    assert pf.fixed_effects == []
    assert len(pf.rand_effects) == 1
    re = pf.rand_effects[0]
    assert re.smoothing_var == "x"
    assert re.options["model"] == "IWP"
    assert re.options["order"] == 2
    assert re.options["k"] == 10


def test_two_random_effects():
    pf = parse_formula(
        "y ~ f(t, model='IWP', order=3, k=30) + f(s, model='sGP', a=1.5, k=20)")
    assert pf.response == "y"
    assert [r.smoothing_var for r in pf.rand_effects] == ["t", "s"]
    assert pf.rand_effects[0].options["order"] == 3
    assert pf.rand_effects[1].options["a"] == 1.5


def test_mixed_fixed_and_random():
    pf = parse_formula(
        "cnt ~ x1 + x2 + f(t, model='IWP', order=2, k=5) "
        "+ f(u, model='IID')")
    assert pf.response == "cnt"
    assert pf.fixed_effects == ["x1", "x2"]
    assert [r.smoothing_var for r in pf.rand_effects] == ["t", "u"]
    assert pf.rand_effects[1].options["model"] == "IID"


def test_smoothing_var_keyword_forms():
    # reference f() accepts smoothing_var=, x=, or first positional
    # (R/02_model_fit.R:358-369)
    for s in ("f(smoothing_var=z, model='IWP', order=1)",
              "f(x=z, model='IWP', order=1)",
              "f(z, model='IWP', order=1)"):
        assert parse_f_call(s).smoothing_var == "z"


def test_positional_model():
    # reference f() signature: f(smoothing_var, model, ...)
    re = parse_f_call("f(z, 'sGP', k=12, period=10)")
    assert re.options["model"] == "sGP"
    assert re.options["period"] == 10


def test_sd_prior_dict_and_env():
    env = {"myprior": {"u": 2.0, "alpha": 0.1}}
    re = parse_f_call(
        "f(x, model='IWP', order=2, sd.prior=dict(prior='exp', param=myprior, h=1))",
        env)
    assert re.options["sd_prior"]["param"]["u"] == 2.0
    assert re.options["sd_prior"]["h"] == 1


def test_intercept_tokens_ignored():
    pf = parse_formula("y ~ 1 + x1 + f(t, model='IWP', order=2)")
    assert pf.fixed_effects == ["x1"]


def test_requires_response():
    with pytest.raises(ValueError):
        parse_formula("~ f(t, model='IWP', order=2)")


def test_f_callable_marker():
    # the Python-callable f() marker (reference exports `f`,
    # R/01_utility.R:1-15) builds the same RandomEffectCall as the
    # string parser
    from bayesgp_tpu import f

    via_str = parse_f_call("f(t, model='IWP', order=3, k=30)")
    via_fn = f("t", model="IWP", order=3, k=30)
    assert via_fn.smoothing_var == via_str.smoothing_var == "t"
    assert via_fn.options == via_str.options

    # dotted R spellings normalize to underscores like the string path
    via_fn2 = f("x", "sGP", k=12, **{"sd.prior": {"u": 2.0, "alpha": 0.1}})
    assert via_fn2.options["model"] == "sGP"
    assert via_fn2.options["sd_prior"]["u"] == 2.0


def test_f_callable_fits_end_to_end():
    # f()-built terms drive model_fit exactly like formula strings
    import numpy as np
    import bayesgp_tpu as bg

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 4, 60))
    y = rng.poisson(np.exp(0.4 * np.sin(x) + 1.0)).astype(float)
    data = {"x": x, "y": y}
    fit_f = bg.model_fit(response="y", data=data, family="Poisson",
                         terms=[bg.f("x", model="IWP", order=2, k=8)],
                         M=50, engine="dense")
    fit_s = bg.model_fit("y ~ f(x, model='IWP', order=2, k=8)", data,
                         family="Poisson", M=50, engine="dense")
    assert np.allclose(np.asarray(fit_f.mod.mode),
                       np.asarray(fit_s.mod.mode), rtol=1e-10, atol=1e-12)
    # function-style generics mirror the methods
    pred = bg.predict(fit_f, "x")
    assert np.all(np.isfinite(pred["mean"]))
    assert bg.summary(fit_f)
