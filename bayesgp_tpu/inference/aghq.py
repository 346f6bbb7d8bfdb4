"""Adaptive Gauss-Hermite Quadrature over the hyperparameters theta.

TPU-native reimplementation of the `aghq` R package machinery the
reference delegates to (`aghq::marginal_laplace_tmb` at
R/02_model_fit.R:284, defaults k=4): optimize the Laplace marginal
nll(theta), adapt a product Gauss-Hermite grid with the mode and the
lower Cholesky of the inverse Hessian, and form the log normalizing
constant and theta marginals. Quadrature nodes evaluate the (expensive)
Laplace nll via vmap — a parallel axis the reference executes serially.

Conventions match aghq/mvQuad 'GHe': nodes are probabilists' Hermite
roots; weights integrate f against Lebesgue measure for f ~ poly x
exp(-z^2/2), i.e. w_i = hermegauss_w_i * exp(z_i^2 / 2); adapted nodes
theta_j = mode + L z_j with weight multiplier det(L).
"""
from __future__ import annotations

import itertools
import math
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .laplace import laplace_nll, laplace_mode_hess


def ghe_rule(k: int):
    """Probabilists' Gauss-Hermite: integrates g(z) ~ poly * e^{-z^2/2}.

    Returns (nodes, weights) with sum_i w_i g(z_i) ~= int g(z) dz.
    """
    z, w = np.polynomial.hermite_e.hermegauss(k)
    return z, w * np.exp(z ** 2 / 2.0)


def product_grid(k: int, s: int):
    """(k^s, s) node matrix and (k^s,) log-weights of the product rule."""
    z1, w1 = ghe_rule(k)
    nodes = np.array(list(itertools.product(z1, repeat=s)))
    logw = np.sum(np.log(w1)[
        np.array(list(itertools.product(range(k), repeat=s)))], axis=1)
    return nodes, logw


class JitCacheMixin:
    """Caches jitted closures so repeated fits on one backend reuse the
    compiled executables (fresh lambdas would miss jax's jit cache)."""

    def val_grad_fn(self):
        if not hasattr(self, "_vg"):
            self._vg = jax.jit(jax.value_and_grad(self.nll))
        return self._vg

    def hess_fn(self):
        if not hasattr(self, "_hess"):
            self._hess = jax.jit(jax.hessian(self.nll))
        return self._hess

    def vmap_nll_fn(self):
        if not hasattr(self, "_vnll"):
            self._vnll = jax.jit(jax.vmap(self.nll))
        return self._vnll

    def val_grad_warm_fn(self):
        if not hasattr(self, "_vgw"):
            self._vgw = jax.jit(
                jax.value_and_grad(self.nll_warm, has_aux=True))
        return self._vgw

    def hess_warm_fn(self):
        if not hasattr(self, "_hessw"):
            self._hessw = jax.jit(
                jax.hessian(lambda th, st: self.nll_warm(th, st)[0]))
        return self._hessw

    def vmap_nll_warm_fn(self):
        if not hasattr(self, "_vnllw"):
            self._vnllw = jax.jit(jax.vmap(
                lambda th, wm: self.nll_warm(th, wm)[0], in_axes=(0, None)))
        return self._vnllw


class DenseBackend(JitCacheMixin):
    """Default inference backend: dense designs, dense Cholesky.

    Exact for every model structure; the banded fast backend
    (bayesgp_tpu.fast) shares this interface for large single-IWP models.
    """

    def __init__(self, md):
        self.md = md

    @property
    def n_theta(self):
        return self.md.n_theta

    @property
    def dtype(self):
        return self.md.A.dtype

    def nll(self, theta):
        return laplace_nll(theta, self.md)[0]

    def init_state(self):
        return jnp.zeros((self.md.w_count,), self.dtype)

    def nll_warm(self, theta, warm):
        val, Ws = laplace_nll(theta, self.md, W0=warm)
        return val, jax.lax.stop_gradient(Ws)

    def node_eval(self, thetas, warm=None):
        from ..model.objective import hessian_W

        def one(th, wm):
            nll, Ws = laplace_nll(th, self.md, W0=wm)
            Hw = hessian_W(Ws, th, self.md)
            Lw = jnp.linalg.cholesky(Hw)
            return nll, (Ws, Lw)

        if not hasattr(self, "_node_eval"):
            self._node_eval = jax.jit(jax.vmap(one, in_axes=(0, None)))
        if warm is None:
            warm = self.init_state()
        return self._node_eval(thetas, warm)

    def sample(self, key, states, idx, M):
        from jax.scipy.linalg import solve_triangular
        W_star, L = states
        w_dim = W_star.shape[1]
        z = jax.random.normal(key, (M, w_dim), dtype=W_star.dtype)

        def draw(i, zi):
            dev = solve_triangular(L[i], zi, lower=True, trans=1)
            return W_star[i] + dev

        samps = jax.jit(jax.vmap(draw))(idx, z)
        return np.asarray(samps).T


@dataclass
class AGHQFit:
    """Everything downstream code needs (mirrors aghq's fit object)."""
    mode: np.ndarray              # theta mode (s,)
    hessian: np.ndarray           # outer Hessian at mode (s, s)
    L: np.ndarray                 # lower chol of H^{-1} (adaptation)
    nodes: np.ndarray             # (J, s) adapted theta nodes
    logw: np.ndarray              # (J,) adapted log weights (incl. det L)
    lognll: np.ndarray            # (J,) laplace nll at nodes
    lognormconst: float
    states: Any                   # per-node latent modes/factors (backend)
    k: int
    backend: Any = None
    marginals: list = field(default_factory=list)  # per-dim (theta, logpdf)

    @property
    def logpost_nodes(self):
        """Normalized log posterior at the nodes."""
        return -self.lognll - self.lognormconst


def optimize_theta(backend, s: int, theta0=None, tol=1e-9, max_iter=100,
                   verbose=False):
    """Damped-Newton optimization of the Laplace marginal nll.

    The reference uses optim BFGS inside aghq (R/02_model_fit.R:284) and a
    numDeriv Hessian; here gradients and Hessians are exact via autodiff
    through the refined inner solve.
    """
    if theta0 is None:
        theta0 = np.zeros(s)
    theta = jnp.asarray(theta0, backend.dtype)

    # warm-started evaluation: the inner Newton for each nll call starts
    # from the previous theta's latent mode (2-4 iterations instead of
    # 10-20 from zero)
    val_grad = backend.val_grad_warm_fn()
    hess = backend.hess_warm_fn()
    state = backend.init_state()

    # fp resolution of the nll surface for the active precision: once f
    # stops improving beyond this, we are polishing inside the noise pit
    # (PARITY.md) and must stop. Mixed-precision backends are limited by
    # their O(n) compute dtype, not the solver dtype.
    cdt = getattr(backend, "compute_dtype", backend.dtype)
    f_eps = 1e-9 if cdt in (np.float64, jnp.float64) else 3e-7

    (f, state), g = val_grad(theta, state)
    stall = 0
    H = None
    H_age = 0
    for it in range(max_iter):
        gmax = float(jnp.max(jnp.abs(g)))
        if gmax < tol:
            break
        # tiny s x s system: solve on host (TPU lacks f64 LU).
        # The Laplace-marginal Hessian varies slowly — reuse it for up to
        # 3 accepted steps (each FD Hessian costs 2*s gradient evals,
        # the dominant cost of a fit at large n)
        if H is None or H_age >= 3:
            H = np.asarray(hess(theta, state), np.float64)
            H_age = 0
        g_np = np.asarray(g, np.float64)
        # ensure a descent direction: ridge up if needed
        ridge = 0.0
        step = None
        for _ in range(12):
            try:
                Hr = H + ridge * np.eye(s)
                cand = np.linalg.solve(Hr, g_np)
                if np.dot(cand, g_np) > 0 and np.all(np.isfinite(cand)):
                    step = cand
                    break
            except np.linalg.LinAlgError:
                pass
            ridge = max(ridge * 10.0, 1e-6)
        if step is None:
            step = g_np / max(np.abs(np.diag(H)).max(), 1.0)
        step = jnp.asarray(step, theta.dtype)
        # Newton decrement below fp resolution of f: converged (the
        # Laplace nll carries ~1e-5-level fp noise, see PARITY.md — an
        # absolute gradient threshold is not always reachable)
        dec = float(jnp.dot(g, step))
        if dec < 1e-13 * (1.0 + abs(float(f))):
            break
        alpha = 1.0
        accepted = False
        for _ in range(25):
            (f_try, state_try), g_try = val_grad(theta - alpha * step, state)
            if jnp.isfinite(f_try) and f_try <= f + 1e-12 * (1.0 + abs(float(f))):
                improved = (f - f_try) > f_eps * (1.0 + abs(float(f)))
                theta = theta - alpha * step
                f, g, state = f_try, g_try, state_try
                accepted = True
                break
            alpha *= 0.5
        if not accepted:
            break
        H_age += 1
        if alpha < 1.0:
            H = None   # backtracking => stale curvature, refresh
        # two consecutive noise-floor steps => converged within fp noise
        stall = 0 if improved else stall + 1
        if stall >= 2:
            break
        if verbose:
            print(f"  outer it={it} f={float(f):.10f} "
                  f"|g|={float(jnp.max(jnp.abs(g))):.2e} dec={dec:.2e}")
    H = hess(theta, state)
    return np.asarray(theta), np.asarray(H), float(f), state


def aghq_fit(md_or_backend, k: int = 4, theta0=None, verbose=False) -> AGHQFit:
    """Full AGHQ pipeline: optimize, adapt, quadrature, marginals."""
    backend = (md_or_backend if hasattr(md_or_backend, "node_eval")
               else DenseBackend(md_or_backend))
    s = backend.n_theta
    if s == 0:
        raise ValueError("aghq requires at least one hyperparameter")
    mode, H, _, warm = optimize_theta(backend, s, theta0=theta0,
                                      verbose=verbose)

    cov = np.linalg.inv(H)
    cov = 0.5 * (cov + cov.T)
    try:
        L = np.linalg.cholesky(cov)
    except np.linalg.LinAlgError:
        # fp-noisy outer Hessian (float32 paths): clip to PD — the
        # adaptation only places nodes, AGHQ stays correct regardless
        evals, evecs = np.linalg.eigh(cov)
        evals = np.clip(np.abs(evals), 1e-8 * max(np.abs(evals).max(), 1e-8),
                        None)
        cov = (evecs * evals) @ evecs.T
        L = np.linalg.cholesky(cov)

    z, logw_base = product_grid(k, s)
    nodes = mode[None, :] + z @ L.T
    logw = logw_base + np.log(np.diag(L)).sum()

    nodes_j = jnp.asarray(nodes, backend.dtype)
    nlls, states = backend.node_eval(nodes_j, warm=warm)
    nlls = np.asarray(nlls)

    logpost_w = -nlls + logw
    m = logpost_w.max()
    lognormconst = float(m + np.log(np.sum(np.exp(logpost_w - m))))

    fit = AGHQFit(mode=mode, hessian=H, L=L, nodes=nodes, logw=logw,
                  lognll=nlls, lognormconst=lognormconst,
                  states=states, k=k, backend=backend)
    fit.marginals = [marginal_posterior(fit, backend, j, warm=warm)
                     for j in range(s)]
    return fit


def marginal_posterior(fit: AGHQFit, backend, j: int, warm=None):
    """AGHQ marginal of theta_j: re-adapt with dim j ordered first so its
    node values collapse to k unique points, then integrate the remaining
    dims by the adapted quadrature (mirrors aghq::marginal_posterior).

    Returns dict(theta=(k,), logmargpost=(k,)) sorted by theta.
    """
    s = len(fit.mode)
    k = fit.k
    if s == 1:
        order = np.argsort(fit.nodes[:, 0])
        return {"theta": fit.nodes[order, 0],
                "logmargpost": (-fit.lognll - fit.lognormconst)[order]}

    idx = [j] + [i for i in range(s) if i != j]
    cov = np.linalg.inv(fit.hessian)
    cov = 0.5 * (cov + cov.T)
    cov_p = cov[np.ix_(idx, idx)]
    Lp = np.linalg.cholesky(cov_p)
    mode_p = fit.mode[idx]

    z, logw_base = product_grid(k, s)
    nodes_p = mode_p[None, :] + z @ Lp.T     # dim 0 is theta_j
    # invert permutation to evaluate nll with original ordering
    inv = np.argsort(idx)
    nodes_orig = nodes_p[:, inv]
    nodes_dev = jnp.asarray(nodes_orig, backend.dtype)
    if warm is not None and hasattr(backend, "vmap_nll_warm_fn"):
        nlls = np.asarray(backend.vmap_nll_warm_fn()(nodes_dev, warm))
    else:
        nlls = np.asarray(backend.vmap_nll_fn()(nodes_dev))

    z1, w1 = ghe_rule(k)
    # group nodes by leading z value: product() ordering has the first dim
    # slowest-varying in blocks of k^(s-1)
    block = k ** (s - 1)
    theta_vals = mode_p[0] + Lp[0, 0] * z1
    logpdf = np.empty(k)
    logw_other = logw_base.reshape(k, block) - np.log(w1)[:, None]
    det_other = np.sum(np.log(np.diag(Lp)[1:]))
    for i in range(k):
        vals = -nlls.reshape(k, block)[i] + logw_other[i] + det_other
        m = vals.max()
        logpdf[i] = m + np.log(np.sum(np.exp(vals - m))) - fit.lognormconst
    order = np.argsort(theta_vals)
    return {"theta": theta_vals[order], "logmargpost": logpdf[order]}


def compute_moment(fit: AGHQFit, fn: Callable = None):
    """E[fn(theta)] under the AGHQ posterior (aghq::compute_moment)."""
    if fn is None:
        fn = lambda x: x
    vals = np.array([fn(th) for th in fit.nodes])
    w = np.exp(fit.logpost_nodes + fit.logw)
    return (vals * w[:, None] if vals.ndim > 1 else vals * w).sum(axis=0)


def interpolate_log_marginal(marg, method: str = "spline"):
    """Interpolant of logmargpost on the log scale.

    aghq uses R's natural cubic spline (splinefun method='natural'),
    which extrapolates LINEARLY beyond the data range — verified against
    the reference's covid README quantiles (-3.87922 / -3.268308 /
    -2.760093 reproduce to the fine-grid resolution only with
    natural + linear tails)."""
    from scipy.interpolate import CubicSpline
    theta, lp = marg["theta"], marg["logmargpost"]
    if len(theta) < 3 or method == "polynomial":
        coef = np.polyfit(theta, lp, deg=len(theta) - 1)
        return lambda x: np.polyval(coef, x)
    cs = CubicSpline(theta, lp, bc_type="natural", extrapolate=True)
    dleft = float(cs.derivative()(theta[0]))
    dright = float(cs.derivative()(theta[-1]))

    def interp(x):
        x = np.asarray(x, np.float64)
        y = cs(x)
        y = np.where(x < theta[0], lp[0] + dleft * (x - theta[0]), y)
        y = np.where(x > theta[-1], lp[-1] + dright * (x - theta[-1]), y)
        return y

    return interp


def compute_pdf_and_cdf(marg, transformation=None, finegrid=None):
    """Fine-grid pdf/cdf of one theta marginal, optionally transformed
    (mirrors aghq::compute_pdf_and_cdf: range extended by half-range on
    each side, 1000 points, cdf by left-Riemann cumsum)."""
    interp = interpolate_log_marginal(marg)
    theta = marg["theta"]
    if finegrid is None:
        rn = theta.max() - theta.min()
        finegrid = np.linspace(theta.min() - rn / 2, theta.max() + rn / 2, 1000)
    logpdf = interp(finegrid)
    pdf = np.exp(logpdf)
    cdf = np.cumsum(pdf * np.concatenate([[0.0], np.diff(finegrid)]))
    out = {"theta": finegrid, "pdf": pdf, "cdf": cdf}
    if transformation is not None:
        fromtheta = transformation["fromtheta"]
        totheta = transformation["totheta"]
        tp = fromtheta(finegrid)
        eps = 1e-6
        # |d theta / d transparam| evaluated at the transformed values
        dtheta = np.abs((totheta(tp + eps) - totheta(tp - eps)) / (2 * eps))
        out["transparam"] = tp
        out["pdf_transparam"] = pdf * dtheta
    return out


def compute_quantiles(marg, q=(0.025, 0.5, 0.975)):
    """Quantiles from the interpolated cdf (aghq::compute_quantiles)."""
    pc = compute_pdf_and_cdf(marg)
    grid, cdf = pc["theta"], pc["cdf"]
    out = []
    for p in q:
        below = np.where(cdf < p)[0]
        out.append(grid[below.max()] if len(below) else grid[0])
    return np.array(out)


def summarize_marginals(fit: AGHQFit):
    """Per-theta mean/sd/quantiles (aghq::summary.aghq moments table)."""
    rows = []
    mean = compute_moment(fit)
    second = compute_moment(fit, lambda th: th ** 2)
    sd = np.sqrt(np.maximum(second - mean ** 2, 0.0))
    for jdim, marg in enumerate(fit.marginals):
        qs = compute_quantiles(marg)
        rows.append({"mean": float(np.atleast_1d(mean)[jdim]),
                     "sd": float(np.atleast_1d(sd)[jdim]),
                     "q2.5": float(qs[0]), "median": float(qs[1]),
                     "q97.5": float(qs[2])})
    return rows
