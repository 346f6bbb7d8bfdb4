"""Fast banded backend vs the dense path: exact equivalence checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayesgp_tpu as bg
from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.inference import laplace as L
from bayesgp_tpu.inference import aghq as A
from bayesgp_tpu.fast.iwp import build_fast_iwp
from bayesgp_tpu.model.objective import neg_log_post


def make_problem(family="Poisson", n=120, k=12, p=3, seed=0, fixed_col=True):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 6.0, n))
    eta = 0.4 * np.sin(x) + 0.8
    if family == "Poisson":
        y = rng.poisson(np.exp(eta)).astype(float)
    elif family == "Gaussian":
        y = eta + rng.normal(0, 0.4, n)
    else:
        y = rng.binomial(2, 1 / (1 + np.exp(-eta))).astype(float)
    inst = T.build_iwp_term("x", x, order=p, k=k)
    dmf = [np.ones((n, 1))]
    if fixed_col:
        dmf.append(rng.normal(0, 1, (n, 1)))
    md = B.build_model_data(
        [inst], dmf, y, family,
        size=(np.full(n, 2.0) if family == "Binomial" else None))
    xf = np.concatenate([inst.X] + dmf, axis=1)
    q_prior = np.concatenate([np.full(p - 1, 0.01), np.full(len(dmf), 0.01)])
    backend = build_fast_iwp(inst, md, xf, q_prior, np.zeros_like(q_prior),
                             inst.x_data)
    return md, inst, backend


@pytest.mark.parametrize("family,p,k", [
    ("Poisson", 3, 12), ("Gaussian", 2, 10), ("Binomial", 2, 8),
    ("Poisson", 1, 7), ("Poisson", 4, 14)])
def test_objective_matches_dense(family, p, k):
    """f'(V', tail) == f_U(T(V' - Z0 t), tail) for random coordinates
    (the fast backend works in tail-orthogonalized primed coords)."""
    md, inst, be = make_problem(family, p=p, k=k, seed=p * 7 + k)
    rng = np.random.default_rng(1)
    Vp = np.zeros(be.dpad)
    Vp[:be.d] = rng.normal(0, 0.3, be.d)
    tail = rng.normal(0, 0.2, be.q)
    theta = rng.normal(0, 0.3, md.n_theta)

    Vact = be.to_V(jnp.asarray(Vp), jnp.asarray(tail))
    U = be.apply_T(Vact[:be.d])
    W = np.concatenate([np.asarray(U), tail])
    f_dense = float(neg_log_post(jnp.asarray(W), jnp.asarray(theta), md))
    f_fast = float(be.neg_log_post(jnp.asarray(Vp), jnp.asarray(tail),
                                   jnp.asarray(theta)))
    assert np.isclose(f_fast, f_dense, rtol=1e-10)


@pytest.mark.parametrize("family,p,k", [
    ("Poisson", 3, 12), ("Gaussian", 2, 10), ("Binomial", 2, 8),
    ("Poisson", 4, 14)])
def test_laplace_nll_matches_dense(family, p, k):
    md, inst, be = make_problem(family, p=p, k=k, seed=p + k)
    for th in ([0.0], [0.5], [-0.7]):
        theta = jnp.asarray(th * md.n_theta, jnp.float64)[:md.n_theta]
        nll_dense = float(L.laplace_nll(theta, md)[0])
        nll_fast = float(be.laplace_nll(theta)[0])
        assert np.isclose(nll_fast, nll_dense, rtol=1e-9, atol=1e-7), (
            th, nll_fast, nll_dense)


def test_gradient_matches_dense():
    md, inst, be = make_problem("Poisson", p=3, k=12, seed=3)
    theta = jnp.asarray([0.3])
    g_dense = jax.grad(lambda t: L.laplace_nll(t, md)[0])(theta)
    g_fast = jax.grad(lambda t: be.laplace_nll(t)[0])(theta)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_dense),
                               rtol=1e-6, atol=1e-7)


def test_full_fit_matches_dense_path():
    """End-to-end model_fit with engine='banded' vs engine='dense'."""
    rng = np.random.default_rng(10)
    n = 150
    x = np.sort(rng.uniform(0, 8, n))
    y = rng.poisson(np.exp(0.5 * np.sin(x) + 1.0)).astype(float)
    z = rng.normal(0, 1, n)
    data = {"y": y, "x": x, "z": z}
    f = "y ~ z + f(x, model='IWP', order=3, k=15)"
    fit_d = bg.model_fit(f, data=data, family="Poisson", engine="dense",
                         M=4000, seed=5)
    fit_b = bg.model_fit(f, data=data, family="Poisson", engine="banded",
                         M=4000, seed=5)
    assert abs(fit_d.mod.lognormconst - fit_b.mod.lognormconst) < 1e-6
    assert abs(fit_d.mod.mode[0] - fit_b.mod.mode[0]) < 1e-5
    np.testing.assert_allclose(fit_d.mod.hessian, fit_b.mod.hessian,
                               rtol=1e-4)
    # posterior component predictions agree within MC error
    pd_ = fit_d.predict("x")
    pb = fit_b.predict("x")
    scale = np.std(pd_["mean"])
    assert np.max(np.abs(pd_["mean"] - pb["mean"])) < 0.15 * scale
    # theta summaries
    td = fit_d.theta_summary()["theta(x)"]
    tb = fit_b.theta_summary()["theta(x)"]
    for key in ("mean", "sd", "median"):
        assert np.isclose(td[key], tb[key], rtol=1e-4, atol=1e-6), key


def test_sample_mixture_moments():
    """Fast-path samples have the right conditional covariance: compare
    sample mean/cov at a single fixed node with the dense computation."""
    md, inst, be = make_problem("Poisson", p=2, k=8, seed=11, fixed_col=False)
    theta = jnp.asarray([0.2])
    nll, (V, tail) = be.laplace_nll(theta)
    af = be.hessian_factor(V, tail, theta)
    states = jax.tree_util.tree_map(lambda x: x[None], (V, tail, af))
    key = jax.random.PRNGKey(0)
    M = 20000
    idx = jnp.zeros((M,), jnp.int64)
    samps = be.sample(key, states, idx, M)   # (w_ref, M)

    # dense reference: mode and covariance in U coordinates
    Ws = L.newton_solve(theta, md)
    from bayesgp_tpu.model.objective import hessian_W
    H = hessian_W(Ws, theta, md)
    cov = np.linalg.inv(np.asarray(H))
    mean_err = np.abs(samps.mean(axis=1) - np.asarray(Ws))
    sd = np.sqrt(np.diag(cov))
    assert np.all(mean_err < 5 * sd / np.sqrt(M) + 1e-3)
    emp_cov = np.cov(samps)
    assert np.abs(emp_cov - cov).max() < 0.1 * (np.abs(cov).max() + 0.1)


def test_multichunk_overlap_add_parity():
    """n >> CHUNK so the MXU path has several OVERLAPPING chunk windows:
    exercises ChunkDesign.rounds / overlap_add (round-colored static
    concatenations replacing the per-chunk DUS chain). Laplace nll and
    gradient must match the dense backend."""
    import numpy as np
    from bayesgp_tpu import terms as T
    from bayesgp_tpu.model import build as B
    from bayesgp_tpu.fast.iwp import build_fast_iwp
    from bayesgp_tpu.inference.aghq import DenseBackend

    rng = np.random.default_rng(0)
    n, k = 6000, 80
    x = np.sort(rng.uniform(0.0, 100.0, n))
    y = rng.poisson(np.exp(1.0 + 0.5 * np.sin(x / 5))).astype(np.float64)
    inst = T.build_iwp_term("x", x, order=3, k=k)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson")
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    be = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data)
    ck = be.chunks
    assert ck is not None and ck.nc > 2
    covered = sorted(c for r in ck.rounds for c in r)
    assert covered == list(range(ck.nc))       # each chunk exactly once
    th = jnp.asarray([1.0])
    v_f = float(jax.jit(be.nll)(th))
    v_d = float(jax.jit(DenseBackend(md).nll)(th))
    assert abs(v_f - v_d) < 1e-6 * (1 + abs(v_d))
    g_f = np.asarray(jax.grad(be.nll)(th))
    g_d = np.asarray(jax.grad(DenseBackend(md).nll)(th))
    np.testing.assert_allclose(g_f, g_d, rtol=1e-5, atol=1e-6)
