"""Sharded grid empirical Bayes: `model_fit_loop(parallel=True)`.

The reference parallelizes the grid over a PSOCK process cluster
(R/02_model_fit.R:754-769) — independent R processes each rebuilding the
model and running TMB+aghq. The TPU-native design makes the whole grid
ONE SPMD program: per-value ModelData pytrees (same shapes, different
basis/penalty values) are stacked along a leading axis, the full AGHQ
lognormconst computation is expressed in pure JAX (`fused_lognormconst`),
and `vmap` + `NamedSharding(P('fits'))` lays the grid out over the device
mesh so each chip runs its share of the fits with zero communication
until the final gather.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..inference import laplace as laplace_mod
from ..inference.aghq import product_grid


def fused_lognormconst(md, k: int = 4, n_outer: int = 25, tol: float = 1e-8):
    """AGHQ log normalizing constant for one (dense-path) ModelData,
    entirely inside jit: damped-Newton outer optimization of the Laplace
    marginal (autodiff gradient/Hessian through the refined inner solve),
    mode/Hessian adaptation of the product GH grid, vmapped node
    evaluation, logsumexp.

    Matches `aghq_fit(...).lognormconst` to solver tolerance (test:
    tests/test_parallel_loop.py). Everything is differentiable-free
    fixed-count control flow so it vmaps and shards cleanly.
    """
    s = md.n_theta
    dtype = md.A.dtype

    def nll(theta, W0):
        val, Ws = laplace_mod.laplace_nll(theta, md, W0=W0)
        return val, jax.lax.stop_gradient(Ws)

    val_grad = jax.value_and_grad(nll, has_aux=True)

    def hess(theta, W0):
        # FD of the exact autodiff gradient (matches aghq.optimize_theta's
        # robustness; the dense nll is smooth so 1e-5 central steps are
        # plenty at f64)
        h = jnp.asarray(1e-5, dtype)
        eye = jnp.eye(s, dtype=dtype)

        def col(i):
            gp = val_grad(theta + h * eye[i], W0)[1]
            gm = val_grad(theta - h * eye[i], W0)[1]
            return (gp - gm) / (2 * h)

        H = jnp.stack([col(i) for i in range(s)])
        return 0.5 * (H + H.T)

    def outer_body(carry, _):
        theta, f, g, W0, done = carry
        H = hess(theta, W0)
        # Levenberg ridge: lift until positive-definite enough to give a
        # descent direction (branchless: try 3 ridge levels, take first
        # finite descent step)
        def try_ridge(r):
            Hr = H + r * jnp.eye(s, dtype=dtype)
            step = jnp.linalg.solve(Hr, g)
            ok = jnp.isfinite(step).all() & (jnp.dot(step, g) > 0)
            return step, ok

        s0, ok0 = try_ridge(jnp.asarray(0.0, dtype))
        s1, ok1 = try_ridge(jnp.asarray(1e-3, dtype))
        s2, ok2 = try_ridge(jnp.asarray(1.0, dtype))
        step = jnp.where(ok0, s0, jnp.where(ok1, s1, s2))
        step = jnp.where(jnp.isfinite(step), step, 0.0)

        # backtracking line search, 8 halvings, batched evaluation
        alphas = 0.5 ** jnp.arange(8, dtype=dtype)

        def eval_alpha(a):
            (fv, W), gv = val_grad(theta - a * step, W0)
            return fv, gv, W

        fs, gs, Wss = jax.lax.map(eval_alpha, alphas)
        fs_ok = jnp.where(jnp.isnan(fs), jnp.inf, fs)
        # first alpha with improvement (fall back to argmin)
        improved = fs_ok <= f + 1e-12 * (1.0 + jnp.abs(f))
        first = jnp.argmax(improved)
        any_improved = jnp.any(improved)
        idx = jnp.where(any_improved, first, jnp.argmin(fs_ok))
        new_theta = theta - alphas[idx] * step
        new_f, new_g, new_W = fs[idx], gs[idx], Wss[idx]
        take = jnp.isfinite(new_f) & (new_f <= f)
        theta2 = jnp.where(take & ~done, new_theta, theta)
        f2 = jnp.where(take & ~done, new_f, f)
        g2 = jnp.where(take & ~done, new_g, g)
        W2 = jnp.where(take & ~done, new_W, W0)
        done2 = done | (jnp.max(jnp.abs(g2)) < tol) | ~take
        return (theta2, f2, g2, W2, done2), None

    theta0 = jnp.zeros((s,), dtype)
    W_init = jnp.zeros((md.w_count,), dtype)
    (f0, W0), g0 = val_grad(theta0, W_init)
    carry = (theta0, f0, g0, W0,
             jnp.asarray(False))
    (mode, f_mode, g_mode, W_mode, _), _ = jax.lax.scan(
        outer_body, carry, None, length=n_outer)

    H = hess(mode, W_mode)
    cov = jnp.linalg.inv(H)
    cov = 0.5 * (cov + cov.T)
    L = jnp.linalg.cholesky(cov)
    # fall back to a diagonal adaptation if the FD Hessian came out
    # non-PD (noise): AGHQ stays correct under any adaptation
    L_ok = jnp.isfinite(L).all()
    L = jnp.where(L_ok, L,
                  jnp.diag(jnp.sqrt(jnp.abs(jnp.diagonal(cov)) + 1e-8)))

    z, logw_base = product_grid(k, s)
    nodes = mode[None, :] + jnp.asarray(z, dtype) @ L.T
    logw = (jnp.asarray(logw_base, dtype)
            + jnp.sum(jnp.log(jnp.diagonal(L))))

    nlls = jax.lax.map(lambda th: nll(th, W_mode)[0], nodes)
    logpost_w = -nlls + logw
    m = jnp.max(logpost_w)
    return m + jnp.log(jnp.sum(jnp.exp(logpost_w - m)))


def _stack_mds(mds):
    """Stack same-structure ModelData pytrees along a new leading axis."""
    leaves = [jax.tree_util.tree_leaves(m) for m in mds]
    treedef = jax.tree_util.tree_structure(mds[0])
    stacked = [jnp.stack([np.asarray(l[i]) for l in leaves])
               for i in range(len(leaves[0]))]
    return jax.tree_util.tree_unflatten(treedef, stacked)


def parallel_lognormconst(mds, k: int = 4, mesh=None, n_outer: int = 25):
    """Log marginal likelihoods for a list of same-shape ModelData,
    computed as one vmapped (and, given a mesh, 'fits'-sharded) program.

    Pads the batch to a multiple of the mesh size; returns (R,) array.
    """
    R = len(mds)
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(mesh.devices.shape))
    Rp = -(-R // n_dev) * n_dev
    mds_p = list(mds) + [mds[-1]] * (Rp - R)
    batched = _stack_mds(mds_p)

    fn = jax.vmap(partial(fused_lognormconst, k=k, n_outer=n_outer))
    if mesh is not None:
        sharding = NamedSharding(mesh, P("fits"))
        in_shard = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P("fits")), batched)
        fn = jax.jit(fn, in_shardings=(in_shard,),
                     out_shardings=sharding)
    else:
        fn = jax.jit(fn)
    out = np.asarray(fn(batched))
    return out[:R]
