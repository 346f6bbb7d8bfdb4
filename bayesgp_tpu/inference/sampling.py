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
    """(w, M) latent samples + (M,) node indices + (M, s) theta samples.

    Node selection ~ Categorical(posterior node weights); the Gaussian
    draw W | node is delegated to the fit's backend (dense triangular
    solves, or banded arrowhead solves for the fast path)."""
    pre = getattr(fit, "presampled", None)
    if (pre is not None and pre[0].shape[1] == M
            and np.array_equal(np.asarray(key), pre[2])):
        # draws already made INSIDE the fused fit program with THIS key
        # (aghq_fit sample=(key, M)): zero extra dispatches. A different
        # key (or M) falls through to fresh independent draws.
        samps, idx, _ = pre
        theta = np.asarray(fit.nodes)[np.asarray(idx)]
        return samps, np.asarray(idx), theta
    logits = jnp.asarray(fit.logpost_nodes + fit.logw)
    k_idx, k_draw = jax.random.split(key)
    idx = jax.random.categorical(k_idx, logits, shape=(M,))
    samps = fit.backend.sample(k_draw, fit.states, idx, M)
    theta = np.asarray(fit.nodes)[np.asarray(idx)]   # (M, s)
    return samps, np.asarray(idx), theta


def sample_mvn_precision(key, mean, prec, M: int):
    """(w, M) samples of N(mean, prec^{-1}) via upper-tri solve."""
    mean = jnp.asarray(mean)
    U = jnp.linalg.cholesky(jnp.asarray(prec), upper=True)
    z = jax.random.normal(key, (mean.shape[0], M), dtype=mean.dtype)
    dev = solve_triangular(U, z, lower=False)
    return np.asarray(mean[:, None] + dev)
