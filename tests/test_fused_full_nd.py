"""Single-dispatch s>1 AGHQ fit (aghq.build_fused_full_nd): the
on-device s x s adaptation helpers and end-to-end parity with the
3-dispatch path's host adaptation semantics.

Mirrors aghq::marginal_laplace_tmb one-call semantics
(/root/reference/R/02_model_fit.R:284).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesgp_tpu.inference import aghq as A


@pytest.mark.parametrize("s", [2, 3])
def test_jacobi_eigh_small(s):
    rng = np.random.default_rng(s)
    for _ in range(20):
        M = rng.normal(size=(s, s))
        Asym = 0.5 * (M + M.T)
        lam, V = A._jacobi_eigh_small(jnp.asarray(Asym), s)
        lam, V = np.asarray(lam), np.asarray(V)
        # reconstruction + orthogonality (eigenvalue ORDER is free)
        np.testing.assert_allclose((V * lam) @ V.T, Asym, atol=1e-12)
        np.testing.assert_allclose(V @ V.T, np.eye(s), atol=1e-12)
        np.testing.assert_allclose(np.sort(lam),
                                   np.linalg.eigvalsh(Asym), atol=1e-12)


@pytest.mark.parametrize("s", [1, 2, 3])
def test_chol_small(s):
    rng = np.random.default_rng(10 + s)
    for _ in range(20):
        M = rng.normal(size=(s, s))
        Apd = M @ M.T + s * np.eye(s)
        L = np.asarray(A._chol_small(jnp.asarray(Apd), s))
        np.testing.assert_allclose(L, np.linalg.cholesky(Apd), rtol=1e-13)


def test_adaptation_clip_matches_host():
    """The device PD-clip (indefinite FD Hessian) reproduces the host
    branch: cov from |1/lam| clipped below at 1e-8 of the max."""
    H = np.array([[2.0, 0.3], [0.3, -0.5]])     # indefinite
    # host semantics (aghq_fit 3-dispatch branch)
    cov = np.linalg.inv(H)
    cov = 0.5 * (cov + cov.T)
    evals, evecs = np.linalg.eigh(cov)
    evals = np.clip(np.abs(evals),
                    1e-8 * max(np.abs(evals).max(), 1e-8), None)
    cov_host = (evecs * evals) @ evecs.T
    # device semantics via the helpers (mirrors build_fused_full_nd.adapt)
    lam, V = A._jacobi_eigh_small(jnp.asarray(0.5 * (H + H.T)), 2)
    inv_lam = 1.0 / np.asarray(lam)
    ev = np.abs(inv_lam)
    ev = np.maximum(ev, 1e-8 * max(ev.max(), 1e-8))
    Vn = np.asarray(V)
    cov_dev = (Vn * ev) @ Vn.T
    np.testing.assert_allclose(cov_dev, cov_host, atol=1e-10)


def _two_term_backend(n=700, seed=0):
    from bayesgp_tpu import terms as T
    from bayesgp_tpu.model import build as B
    from bayesgp_tpu.fast.banded import build_banded_backend
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 10.0, n))
    x2 = rng.uniform(0.0, 5.0, n)
    y = (0.6 * np.sin(x) + 0.3 * np.cos(2 * x2)
         + 0.1 * rng.normal(size=n))
    iwp = T.build_iwp_term("x", x, order=2, k=15, materialize_B=False)
    iwp2 = T.build_iwp_term("x2", np.sort(x2), order=2, k=8)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([iwp, iwp2], dmf, y, "Gaussian",
                            dense_design=False)
    return build_banded_backend([iwp, iwp2], md, dmf,
                                np.full(1, 0.01), np.zeros(1))


def test_single_dispatch_matches_three_dispatch():
    """aghq_fit (single-dispatch path, s=3: two smooths + Gaussian
    noise) matches the explicit 3-dispatch flow (fused opt -> host
    adaptation -> fused nodes -> fused marginals) to fp rounding."""
    be = _two_term_backend()
    s = be.n_theta
    assert s == 3
    fit_new = A.aghq_fit(be, k=3)

    # explicit old flow
    opt = A._lifted_jit(be, lambda b: A.build_fused_opt_nd(b, s, jit=False))
    mode_d, H_d, warm, _ = opt(jnp.zeros((s,), be.dtype),
                               be.init_state())
    mode, H = np.asarray(mode_d, np.float64), np.asarray(H_d, np.float64)
    cov = np.linalg.inv(H)
    cov = 0.5 * (cov + cov.T)
    L = np.linalg.cholesky(cov)
    z, logw_base = A.product_grid(3, s)
    nodes = mode[None, :] + z @ L.T
    logw = logw_base + np.log(np.diag(L)).sum()
    nlls = np.asarray(A._fused_nodes_cached(be, z, True)(
        jnp.asarray(nodes, be.dtype), warm)[0])
    lognormconst = A._logsumexp_np(-nlls + logw)

    np.testing.assert_allclose(fit_new.mode, mode, atol=1e-10)
    np.testing.assert_allclose(fit_new.hessian, H, atol=1e-10)
    # device Jacobi+closed-form chol vs LAPACK: fp-rounding level
    np.testing.assert_allclose(fit_new.L, L, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(fit_new.nodes, nodes, atol=1e-9)
    np.testing.assert_allclose(fit_new.lognll, nlls, rtol=1e-9)
    np.testing.assert_allclose(fit_new.lognormconst, lognormconst,
                               atol=1e-8)
    # marginals vs the per-j host path on the same fit
    for j in range(s):
        ref = A.marginal_posterior(fit_new, be, j, warm=warm)
        got = fit_new.marginals[j]
        np.testing.assert_allclose(got["theta"], ref["theta"], atol=1e-9)
        np.testing.assert_allclose(got["logmargpost"],
                                   ref["logmargpost"], atol=1e-7)


def test_single_dispatch_sampled():
    """sample=(key, M) runs the draws inside the same dispatch."""
    be = _two_term_backend(seed=2)
    key = jax.random.PRNGKey(3)
    fit = A.aghq_fit(be, k=3, sample=(key, 50))
    assert fit.presampled is not None
    samps, idx, _ = fit.presampled
    assert samps.shape[1] == 50 and idx.shape == (50,)
    assert np.all(np.isfinite(samps))
