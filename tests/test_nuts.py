"""NUTS tree sampler tests.

The iterative tree builder (checkpointed in-subtree U-turn detection) is
checked leaf-for-leaf against a plain recursive reference; the full
kernel is checked statistically on a correlated Gaussian; the
model_fit(method='MCMC') path runs NUTS by default (the reference's
tmbstan sampler, R/02_model_fit.R:296-303).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayesgp_tpu as bg
from bayesgp_tpu.inference import nuts


def _make_gauss(dim, seed=0, scale=4.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(dim, dim))
    cov = A @ A.T + scale * np.eye(dim)
    prec = np.linalg.inv(cov)

    def logp(z):
        return -0.5 * z @ (jnp.asarray(prec) @ z)

    return logp, cov, prec


class _RefLeaf:
    def __init__(self, z, r, g, logp):
        self.z, self.r, self.g, self.logp = z, r, g, logp


def _ref_subtree(logp_grad_np, leaf, depth, eps_signed, inv_mass, energy0):
    """Recursive NUTS subtree reference (deterministic parts only):
    returns (far_leaf, first_r, turning, diverging, n_leaves, r_sum)."""
    def leapfrog(lf):
        r = lf.r + 0.5 * eps_signed * lf.g
        z = lf.z + eps_signed * inv_mass * r
        lp, g = logp_grad_np(z)
        r = r + 0.5 * eps_signed * g
        return _RefLeaf(z, r, g, lp)

    def energy(lf):
        return -lf.logp + 0.5 * lf.r @ (inv_mass * lf.r)

    def is_turning(r_l, r_r, r_sum):
        return (np.dot(r_sum, inv_mass * r_l) <= 0
                or np.dot(r_sum, inv_mass * r_r) <= 0)

    if depth == 0:
        nl = leapfrog(leaf)
        delta = energy(nl) - energy0
        div = (not np.isfinite(delta)) or delta > nuts.MAX_DELTA_ENERGY
        return nl, nl.r, False, div, 1, nl.r.copy()
    l1, fr1, t1, d1, n1, rs1 = _ref_subtree(
        logp_grad_np, leaf, depth - 1, eps_signed, inv_mass, energy0)
    if t1 or d1:
        return l1, fr1, t1, d1, n1, rs1
    l2, fr2, t2, d2, n2, rs2 = _ref_subtree(
        logp_grad_np, l1, depth - 1, eps_signed, inv_mass, energy0)
    n, rs = n1 + n2, rs1 + rs2
    if t2 or d2:
        return l2, fr1, t2, d2, n, rs
    return l2, fr1, is_turning(fr1, l2.r, rs), False, n, rs


@pytest.mark.parametrize("depth", [0, 1, 2, 3, 4, 5, 6])
@pytest.mark.parametrize("direction", [1, -1])
def test_iterative_subtree_matches_recursive(depth, direction):
    """Turning/divergence decisions, leaf counts, far-edge state and
    momentum sums of the iterative builder equal the recursive reference
    exactly (same leapfrog arithmetic, float64)."""
    dim = 3
    logp, cov, prec = _make_gauss(dim, seed=depth + 10)

    val_grad = jax.value_and_grad(logp)

    def logp_grad_np(z):
        v, g = val_grad(jnp.asarray(z))
        return float(v), np.asarray(g)

    rng = np.random.default_rng(depth * 7 + direction + 1)
    z0 = rng.normal(size=dim)
    r0 = rng.normal(size=dim)
    inv_mass = np.abs(rng.normal(size=dim)) + 0.5
    eps = 0.35   # big enough that U-turns occur within a few leaves
    lp0, g0 = logp_grad_np(z0)
    leaf0 = nuts._Leaf(jnp.asarray(z0), jnp.asarray(r0), jnp.asarray(g0),
                       jnp.asarray(lp0))
    energy0 = float(-lp0 + 0.5 * r0 @ (inv_mass * r0))

    st = jax.jit(lambda k: nuts._build_subtree(
        val_grad, leaf0, 8, depth, jnp.asarray(direction), eps,
        jnp.asarray(inv_mass), jnp.asarray(energy0), k))(
            jax.random.PRNGKey(0))

    ref_leaf0 = _RefLeaf(z0, r0, g0, lp0)
    far, _, turning, div, n, rsum = _ref_subtree(
        logp_grad_np, ref_leaf0, depth, eps * direction, inv_mass, energy0)

    assert bool(st.turning) == turning
    assert bool(st.diverging) == div
    assert int(st.n_leaves) == n
    np.testing.assert_allclose(np.asarray(st.leaf.z), far.z, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.leaf.r), far.r, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.r_sum), rsum, rtol=1e-12)


def test_nuts_gaussian_target_moments():
    """NUTS samples a correlated Gaussian with correct moments."""
    logp, cov, _ = _make_gauss(4, seed=0)
    zs, (acc, ndiv, nleap, eps) = jax.jit(lambda k: nuts.run_chain_nuts(
        logp, jnp.zeros(4), k, n_warmup=1000, n_samples=4000))(
            jax.random.PRNGKey(1))
    zs = np.asarray(zs)
    assert 0.6 < float(acc) <= 1.0
    assert int(ndiv) == 0
    assert float(nleap) >= 3.0          # trees actually grow
    emp = np.cov(zs.T)
    sd = np.sqrt(np.diag(cov))
    assert np.abs(zs.mean(0) / sd).max() < 0.15
    assert np.abs(emp - cov).max() / np.abs(cov).max() < 0.25


def test_nuts_divergence_flagging():
    """A pathologically large step size produces divergences, flagged
    not crashed."""
    logp, _, _ = _make_gauss(2, seed=3, scale=0.01)

    def sharp_logp(z):
        return 1e6 * logp(z)

    leaf_lp, leaf_g = jax.value_and_grad(sharp_logp)(jnp.zeros(2))
    leaf = nuts._Leaf(jnp.zeros(2), jnp.zeros(2), leaf_g, leaf_lp)
    new, info = jax.jit(lambda k: nuts.nuts_kernel(
        jax.value_and_grad(sharp_logp), leaf, k, 10.0, jnp.ones(2)))(
            jax.random.PRNGKey(0))
    assert bool(info.diverging)
    assert np.all(np.isfinite(np.asarray(new.z)))


def test_mcmc_fit_nuts_smoke():
    """model_fit(method='MCMC') runs the NUTS sampler by default and
    its posterior agrees with aghq on a small Poisson model."""
    rng = np.random.default_rng(5)
    n = 60
    x = np.sort(rng.uniform(0, 6, n))
    y = rng.poisson(np.exp(0.4 * np.sin(x) + 1.0)).astype(float)
    data = {"y": y, "x": x}
    f = "y ~ f(x, model='IWP', order=2, k=5)"
    fit_m = bg.model_fit(f, data=data, family="Poisson", method="MCMC",
                         M=2000, option_list={"warmup": 2000})
    assert fit_m.mod["algorithm"] == "NUTS"
    assert int(np.asarray(fit_m.mod["divergences"]).sum()) < 100
    fit_a = bg.model_fit(f, data=data, family="Poisson", method="aghq",
                         M=2000, seed=2)
    mu_a = float(fit_a.sample_fixed_effect("intercept").mean())
    mu_m = float(fit_m.sample_fixed_effect("intercept").mean())
    sd_a = float(fit_a.sample_fixed_effect("intercept").std())
    assert abs(mu_a - mu_m) < 0.6 * sd_a + 0.05
    pred = fit_m.predict("x")
    assert np.all(np.isfinite(pred["mean"]))
