"""Joint negative log posterior — the pure-JAX equivalent of the TMB
template `objective_function<Type>::operator()` (src/BayesGP.cpp:30-253).

neg_log_post(W, theta, md) = -(log_lik + log_prior_W + log_prior_theta),
differentiable to any order with jax.grad / jax.hessian; vmappable over
quadrature nodes and replicate fits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import families


def linear_predictor(W, md):
    if families.mixed_naxis(md):
        # f64 (n, w) matmul over the observation axis is a TPU compile
        # landmine (see families._nax); the f32 MXU product costs
        # ~1e-7 relative eta noise, inside the mixed-precision
        # contract of these families' likelihood work
        return (md.A.astype(jnp.float32)
                @ W.astype(jnp.float32)).astype(W.dtype)
    return md.A @ W


def log_prior_W(W, theta, md):
    """Gaussian priors on W (src/BayesGP.cpp:219-238)."""
    lp = jnp.asarray(0.0, W.dtype)
    # spline weights: U_r ~ N(0, (exp(theta_r) P_r)^-1), plus log-det term
    for r, (off, d) in enumerate(md.u_slices()):
        U = jax.lax.dynamic_slice(W, (off,), (d,))
        quad = U @ (md.P_blocks[r] @ U)
        lp = lp - 0.5 * jnp.exp(theta[r]) * quad
        lp = lp + 0.5 * (d * theta[r] + md.logPdet[r])
    # boundary betas: N(betamean, 1/betaprec) per block
    for i, (off, b) in enumerate(md.beta_slices()):
        beta = jax.lax.dynamic_slice(W, (off,), (b,))
        bb = jnp.sum((beta - md.betamean[i]) ** 2)
        lp = lp - 0.5 * md.betaprec[i] * bb
    # fixed effects: independent normals per column
    off = md.fixed_offset()
    if md.xf_count:
        bf = jax.lax.dynamic_slice(W, (off,), (md.xf_count,))
        lp = lp - 0.5 * jnp.sum(md.bf_prec * (bf - md.bf_mean) ** 2)
    return lp


def log_prior_theta(theta, md):
    """Exponential (PC) prior on sigma = exp(-theta/2) per variance
    parameter: phi = -log(alpha)/u (src/BayesGP.cpp:241-246)."""
    phi = -jnp.log(md.alpha) / md.u
    return jnp.sum(jnp.log(0.5 * phi) - phi * jnp.exp(-0.5 * theta)
                   - 0.5 * theta)


def neg_log_post(W, theta, md):
    eta = linear_predictor(W, md)
    ll = families.log_lik(eta, md, theta)
    return -(ll + log_prior_W(W, theta, md) + log_prior_theta(theta, md))


def prior_precision(theta, md, dtype=None):
    """Q(theta): prior precision of W — blockdiag(exp(theta_r) P_r,
    betaprec blocks, fixed-effect precs) as a dense (w, w) matrix."""
    w = md.w_count
    dtype = dtype or md.A.dtype
    Q = jnp.zeros((w, w), dtype)
    for r, (off, d) in enumerate(md.u_slices()):
        Q = jax.lax.dynamic_update_slice(
            Q, jax.lax.dynamic_slice(Q, (off, off), (d, d))
            + jnp.exp(theta[r]) * md.P_blocks[r], (off, off))
    diag = jnp.zeros((w,), dtype)
    for i, (off, b) in enumerate(md.beta_slices()):
        diag = jax.lax.dynamic_update_slice(
            diag, jnp.full((b,), md.betaprec[i], dtype), (off,))
    off = md.fixed_offset()
    if md.xf_count:
        diag = jax.lax.dynamic_update_slice(
            diag, md.bf_prec.astype(dtype), (off,))
    # eye-product, not jnp.diag: diag(v) lowers to stablehlo.scatter
    # (TPU compile landmine, duplicated per traced copy)
    return Q + diag * jnp.eye(w, dtype=dtype)


def hessian_W(W, theta, md):
    """Exact Hessian of neg_log_post in W.

    For elementwise families: A^T diag(w) A + Q(theta) (exact — eta is
    linear in W). For Coxph/case-crossover: A^T M A + Q with the exact
    structured M from families.eta_hessian_full.
    """
    eta = linear_predictor(W, md)
    Q = prior_precision(theta, md)
    if families.eta_hessian_kind(md.family) == "diag":
        wts = families.eta_weights(eta, md, theta)
        return (md.A * wts[:, None]).T @ md.A + Q
    return families.eta_hessian_quadform(eta, md, theta, md.A) + Q
