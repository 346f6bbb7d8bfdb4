"""Posterior sampling of the latent W.

- `sample_marginal`: mixture-over-quadrature-nodes Gaussian sampling,
  the equivalent of `aghq::sample_marginal` (R/02_model_fit.R:688):
  draw a node j ~ Categorical(posterior node weights), then
  W ~ N(W*_j, H_j^{-1}) via batched triangular solves.
- `sample_mvn_precision`: precision-parameterized MVN draws, the
  equivalent of `LaplacesDemon::rmvnp` for the nlminb path
  (R/02_model_fit.R:691).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular


def sample_marginal(key, fit, M: int):
    """(w, M) latent samples + (M,) node indices + (M, s) theta samples."""
    logits = jnp.asarray(fit.logpost_nodes + fit.logw)
    k_idx, k_norm = jax.random.split(key)
    idx = jax.random.categorical(k_idx, logits, shape=(M,))
    W_star = jnp.asarray(fit.W_star)      # (J, w)
    L = jnp.asarray(fit.H_chol)           # (J, w, w) lower chol of precision
    w_dim = W_star.shape[1]
    z = jax.random.normal(k_norm, (M, w_dim), dtype=W_star.dtype)

    def draw(i, zi):
        dev = solve_triangular(L[i], zi, lower=True, trans=1)
        return W_star[i] + dev

    samps = jax.vmap(draw)(idx, z)        # (M, w)
    theta = jnp.asarray(fit.nodes)[idx]   # (M, s)
    return np.asarray(samps).T, np.asarray(idx), np.asarray(theta)


def sample_mvn_precision(key, mean, prec, M: int):
    """(w, M) samples of N(mean, prec^{-1}) via upper-tri solve."""
    mean = jnp.asarray(mean)
    U = jnp.linalg.cholesky(jnp.asarray(prec), upper=True)
    z = jax.random.normal(key, (mean.shape[0], M), dtype=mean.dtype)
    dev = solve_triangular(U, z, lower=False)
    return np.asarray(mean[:, None] + dev)
