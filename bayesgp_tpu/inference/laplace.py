"""Laplace approximation over the latent block W.

TPU-native replacement for the TMB runtime's `MakeADFun(random="W")` inner
machinery (invoked at R/02_model_fit.R:276-284): a Newton solver for
W*(theta) under `lax.while_loop`, a Cholesky log-determinant, and the
Laplace-marginal negative log likelihood

    nll(theta) = f(W*, theta) + 1/2 log|H(W*, theta)| - d_W/2 log(2 pi).

Differentiability: the while_loop solve is wrapped in stop_gradient and
followed by `n_refine` unrolled Newton steps. The Newton map N(W, theta)
has zero Jacobian in W at the fixed point, so one refine step yields exact
first derivatives of W*(theta) and two yield exact second derivatives —
this replaces both TMB's implicit-function adjoints and the reference's
numDeriv finite differences (R/02_model_fit.R:283).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve, solve_triangular

from ..model.objective import neg_log_post, hessian_W

LOG2PI = math.log(2.0 * math.pi)


def _newton_direction(W, theta, md):
    """(gradient, step, decrement) — decrement = g^T H^{-1} g is the
    natural function-scale convergence measure (lambda^2)."""
    g = jax.grad(neg_log_post, argnums=0)(W, theta, md)
    H = hessian_W(W, theta, md)
    cf = cho_factor(H, lower=True)
    step = cho_solve(cf, g)
    # non-finite directions (numerically indefinite H at weak theta;
    # see linalg/block_tridiag.chol_guarded) are zeroed: 0 * inf = NaN
    # would otherwise poison W and every warm-chained eval after it
    step = jnp.where(jnp.isfinite(step), step, 0.0)
    return g, step, jnp.dot(g, step)


def newton_step(W, theta, md):
    """One damped Newton step with step-halving line search (max 30).

    The acceptance test tolerates fp-noise-level increases
    (1e-10 * (1 + |f|)) so that full Newton steps keep being taken near
    the optimum where f is flat to machine precision but the gradient can
    still be driven down — the half-logdet term of the Laplace marginal
    is first-order sensitive to the latent-mode error, so the inner
    gradient must reach ~1e-8, not just f-stationarity.
    """
    _, step, _ = _newton_direction(W, theta, md)
    f0 = neg_log_post(W, theta, md)
    # mixed-precision families (f32 n-axis likelihood on TPU): the
    # objective jitters at ~eps_f32 * |f|, so the f64-scale acceptance
    # band would reject noise-level full steps and burn all 30 halvings
    # per Newton iteration at the noise floor
    from ..model import families as _fam
    ftol = 3e-7 if _fam.mixed_naxis(md) else 1e-10

    def ls_cond(state):
        alpha, it = state
        f_try = neg_log_post(W - alpha * step, theta, md)
        bad = jnp.logical_or(jnp.isnan(f_try),
                             f_try > f0 + ftol * (1.0 + jnp.abs(f0)))
        return jnp.logical_and(bad, it < 30)

    def ls_body(state):
        alpha, it = state
        return alpha * 0.5, it + 1

    alpha, _ = jax.lax.while_loop(ls_cond, ls_body, (jnp.asarray(1.0, W.dtype), 0))
    return W - alpha * step


def newton_solve(theta, md, W0=None, gtol=1e-8, max_iter=100):
    """Converge W*(theta) with Newton iterations under lax.while_loop.

    Stops on |grad|_inf < gtol (TMB's inner criterion) or when the Newton
    decrement falls below fp resolution of f (no further progress
    possible), or at max_iter.
    """
    if W0 is None:
        W0 = jnp.zeros((md.w_count,), md.A.dtype)

    from ..model import families as _fam
    if _fam.mixed_naxis(md):
        # f32 n-axis likelihood (TPU): |g| never reaches the f64-scale
        # gtol and the decrement plateaus at the f32 noise floor — a
        # scale-free stall counter (3 consecutive iterations with
        # relative f progress below ~eps_f32) bounds the loop instead
        # of burning max_iter noise-level iterations per Laplace eval
        # f is CARRIED in the state (the value at the current W) so
        # cond reuses it instead of re-evaluating the full objective —
        # while_loop cond/body don't CSE, so an uncarried f costs one
        # extra O(n) objective pass per Newton iteration.
        def cond(state):
            W, it, f, stalls = state
            g, _, dec = _newton_direction(W, theta, md)
            not_done = jnp.logical_and(
                jnp.max(jnp.abs(g)) > gtol,
                dec > 1e-7 * (1.0 + jnp.abs(f)))
            return jnp.logical_and(jnp.logical_and(not_done, stalls < 3),
                                   it < max_iter)

        def body(state):
            W, it, f_prev, stalls = state
            Wn = newton_step(W, theta, md)
            f = neg_log_post(Wn, theta, md)
            stalled = f_prev - f < 3e-7 * (1.0 + jnp.abs(f))
            stalls = jnp.where(stalled, stalls + 1, 0)
            return Wn, it + 1, f, stalls

        W, _, _, _ = jax.lax.while_loop(
            cond, body,
            (W0, 0, neg_log_post(W0, theta, md), 0))
        return W

    def cond(state):
        W, it = state
        g, _, dec = _newton_direction(W, theta, md)
        f = neg_log_post(W, theta, md)
        not_done = jnp.logical_and(jnp.max(jnp.abs(g)) > gtol,
                                   dec > 1e-15 * (1.0 + jnp.abs(f)))
        return jnp.logical_and(not_done, it < max_iter)

    def body(state):
        W, it = state
        return newton_step(W, theta, md), it + 1

    W, _ = jax.lax.while_loop(cond, body, (W0, 0))
    return W


def _refine(W, theta, md):
    """Undamped Newton step (differentiable polish at the fixed point).
    Non-finite steps are zeroed — bit-identity at healthy fixed points,
    and the polish cannot catapult W on a sick factorization."""
    g = jax.grad(neg_log_post, argnums=0)(W, theta, md)
    H = hessian_W(W, theta, md)
    cf = cho_factor(H, lower=True)
    step = cho_solve(cf, g)
    step = jnp.where(jnp.isfinite(step), step, 0.0)
    return W - step


def solve_W_star(theta, md, W0=None, n_refine=2, gtol=1e-8, max_iter=100):
    """W*(theta), differentiable in theta (see module docstring)."""
    Wc = jax.lax.stop_gradient(
        newton_solve(jax.lax.stop_gradient(theta), md, W0=W0,
                     gtol=gtol, max_iter=max_iter))
    for _ in range(n_refine):
        Wc = _refine(Wc, theta, md)
    return Wc


def laplace_nll(theta, md, W0=None, n_refine=2, gtol=1e-8, max_iter=100):
    """Negative log Laplace-approximate marginal likelihood of theta.

    Matches TMB's `ff$fn(theta)` with random="W" up to solver tolerance.
    Returns (nll, W_star) so callers can warm-start/reuse the mode.
    """
    Ws = solve_W_star(theta, md, W0=W0, n_refine=n_refine, gtol=gtol,
                      max_iter=max_iter)
    H = hessian_W(Ws, theta, md)
    half_logdet = half_logdet_psd(H)
    val = (neg_log_post(Ws, theta, md) + half_logdet
           - 0.5 * md.w_count * LOG2PI)
    return val, Ws


def _equilibrated_chol(H):
    """(d, chol_lower(H/d/d), half_logdet) via Jacobi-equilibrated
    Cholesky.

    H mixes likelihood curvature (huge) with weak prior precisions, so its
    condition number can reach ~1e8; a raw Cholesky logdet then carries
    fp noise ~ w * eps * kappa (~1e-5) which corrupts the outer
    optimization of the Laplace marginal. Scaling to unit diagonal first
    (log|H| = log|D H D| - 2 sum log D_ii with D = diag(H)^{-1/2}) removes
    the scale disparity; the correction term is smooth. The full factor
    is recovered as chol(H) = d[:, None] * chol(Hs).
    """
    d = jnp.sqrt(jnp.diagonal(H))
    Ls = jnp.linalg.cholesky(H / d[:, None] / d[None, :])
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(Ls))) + jnp.sum(jnp.log(d))
    return d, Ls, half_logdet


def half_logdet_psd(H):
    """1/2 log|H| via Jacobi-equilibrated Cholesky (_equilibrated_chol)."""
    return _equilibrated_chol(H)[2]


def laplace_nll_with_factor(theta, md, W0=None, n_refine=2, gtol=1e-8,
                            max_iter=100):
    """(nll, W*, chol_lower(H)) in one pass: the sampling factor is
    recovered from the SAME equilibrated Cholesky the half log-det uses
    (H = D Hs D with D = diag(H)^{1/2}  =>  chol(H) = D chol(Hs)), so a
    per-node full evaluation costs one Hessian build + factorization
    instead of two (fused node programs, DenseBackend.laplace_eval_full).
    """
    Ws = solve_W_star(theta, md, W0=W0, n_refine=n_refine, gtol=gtol,
                      max_iter=max_iter)
    H = hessian_W(Ws, theta, md)
    d, Ls, half_logdet = _equilibrated_chol(H)
    val = (neg_log_post(Ws, theta, md) + half_logdet
           - 0.5 * md.w_count * LOG2PI)
    return val, Ws, d[:, None] * Ls


def laplace_mode_hess(theta, md, W0=None, gtol=1e-8, max_iter=100):
    """(W*, H, chol_lower(H)) at theta — for sampling W | theta."""
    Ws = newton_solve(theta, md, W0=W0, gtol=gtol, max_iter=max_iter)
    H = hessian_W(Ws, theta, md)
    L = jnp.linalg.cholesky(H)
    return Ws, H, L


def sample_gaussian_from_chol(key, mean, L, M):
    """M samples of N(mean, (L L^T)^{-1}) via triangular solves.

    L is the lower Cholesky of the PRECISION H; samples = mean + L^-T z.
    """
    z = jax.random.normal(key, (mean.shape[0], M), dtype=mean.dtype)
    dev = solve_triangular(L, z, lower=True, trans=1)
    return mean[:, None] + dev
