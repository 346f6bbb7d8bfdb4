"""No-U-Turn Sampler (NUTS) over the joint (W, theta) posterior.

TPU-native equivalent of the Stan NUTS sampler the reference reaches via
tmbstan (R/02_model_fit.R:296-303): dynamic trajectory lengths by tree
doubling, multinomial sampling over the trajectory (Betancourt 2017,
matching Stan's current sampler rather than the original slice variant),
generalized U-turn criterion on momentum sums, and divergence handling.

The tree is built ITERATIVELY (Phan & Pradhan's formulation, as in
numpyro): a subtree of 2^depth leapfrog steps is a `lax.fori_loop` whose
in-subtree U-turn checks use O(max_depth) momentum checkpoints indexed by
a popcount scheme (derivation in `_ckpt` notes below) — no recursion, so
everything jits and vmaps over chains.

Warmup follows Stan's windowed scheme in simplified form: dual-averaging
step-size adaptation throughout, one diagonal mass-matrix re-estimation
at mid-warmup (matching the existing HMC warmup here).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_DELTA_ENERGY = 1000.0     # Stan's divergence threshold


def _popcount(n):
    """Population count of a nonnegative int32 scalar (vectorized ok)."""
    n = n - ((n >> 1) & 0x55555555)
    n = (n & 0x33333333) + ((n >> 2) & 0x33333333)
    n = (n + (n >> 4)) & 0x0F0F0F0F
    return (n * 0x01010101) >> 24


def _is_turning(inv_mass, r_left, r_right, r_sum):
    """Generalized U-turn criterion (Betancourt / Stan):
    turning iff <r_sum, v_left> <= 0 or <r_sum, v_right> <= 0 with
    velocities v = inv_mass * r."""
    v_left = inv_mass * r_left
    v_right = inv_mass * r_right
    return ((jnp.dot(r_sum, v_left) <= 0.0)
            | (jnp.dot(r_sum, v_right) <= 0.0))


class _Leaf(NamedTuple):
    z: jnp.ndarray
    r: jnp.ndarray
    g: jnp.ndarray      # gradient of logp at z
    logp: jnp.ndarray


def _leapfrog(logp_grad, leaf, eps, inv_mass):
    r = leaf.r + 0.5 * eps * leaf.g
    z = leaf.z + eps * inv_mass * r
    logp, g = logp_grad(z)
    r = r + 0.5 * eps * g
    return _Leaf(z, r, g, logp)


def _energy(leaf, inv_mass):
    """H = -logp + kinetic. Lower is better; weights are exp(-H)."""
    return -leaf.logp + 0.5 * jnp.dot(leaf.r, inv_mass * leaf.r)


class _SubtreeState(NamedTuple):
    leaf: _Leaf             # current (rightmost-in-build-order) leaf
    prop: _Leaf             # multinomial proposal within the subtree
    log_w: jnp.ndarray      # logsumexp of exp(-H) weights over leaves
    r_sum: jnp.ndarray      # sum of momenta over the subtree's leaves
    r_ckpt: jnp.ndarray     # (max_depth, dim) left-edge momenta
    rsum_ckpt: jnp.ndarray  # (max_depth, dim) exclusive prefix r-sums
    turning: jnp.ndarray    # bool
    diverging: jnp.ndarray  # bool
    sum_accept: jnp.ndarray # accumulates min(1, exp(H0 - H)) for adaptation
    n_leaves: jnp.ndarray   # leaves actually integrated (for accept mean)


def _build_subtree(logp_grad, leaf0, depth_max, depth, direction, eps,
                   inv_mass, energy0, key):
    """Integrate 2^depth leapfrog steps from `leaf0` (exclusive) in
    `direction`, with progressive multinomial proposal sampling and
    in-subtree generalized-U-turn checks.

    Checkpoint scheme: leaves are indexed n = 0..2^depth-1 in build
    order. A complete binary subtree of size 2^k ends at leaf n iff
    (n+1) % 2^k == 0; its left edge is m = n+1-2^k. Left edges are even,
    and the set of left edges of subtrees CONTAINING the current leaf are
    binary prefixes of n, whose popcounts strictly decrease as low bits
    are cleared — so slot = popcount(m) is collision-free among active
    checkpoints and bounded by max_depth. For n+1 = c*2^t (c odd), the
    slots to check after leaf n are the contiguous range
    popcount(c-1) .. popcount(c-1)+t-1 (k = t..1).

    Returns a _SubtreeState whose `leaf` is the subtree's far edge and
    `turning`/`diverging` say whether the build stopped early (its
    contents are then only valid up to the stopping leaf, which is fine:
    the caller discards the subtree entirely in that case, as NUTS
    requires).
    """
    dim = leaf0.z.shape[0]
    dtype = leaf0.z.dtype
    n_leaf = 2 ** depth
    eps_signed = eps * direction.astype(dtype)

    def body(n, carry):
        st, key = carry

        def step(st, key):
            key, k_mn = jax.random.split(key)
            leaf = _leapfrog(logp_grad, st.leaf, eps_signed, inv_mass)
            h = _energy(leaf, inv_mass)
            delta = h - energy0
            diverging = (~jnp.isfinite(delta)) | (delta > MAX_DELTA_ENERGY)
            log_w_leaf = jnp.where(diverging, -jnp.inf, -delta)
            # progressive multinomial: replace proposal with prob
            # exp(log_w_leaf - logsumexp(new total))
            log_w_new = jnp.logaddexp(st.log_w, log_w_leaf)
            take = (jnp.log(jax.random.uniform(k_mn, (), dtype))
                    < log_w_leaf - log_w_new)
            prop = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), leaf, st.prop)
            accept = jnp.minimum(1.0, jnp.exp(jnp.where(
                jnp.isfinite(delta), -delta, -jnp.inf)))

            # checkpoint BEFORE including leaf n in r_sum (exclusive prefix)
            is_left_edge = (n % 2) == 0
            slot = _popcount(n)
            r_ckpt = jnp.where(
                is_left_edge, st.r_ckpt.at[slot].set(leaf.r), st.r_ckpt)
            rsum_ckpt = jnp.where(
                is_left_edge, st.rsum_ckpt.at[slot].set(st.r_sum),
                st.rsum_ckpt)
            r_sum = st.r_sum + leaf.r

            # U-turn checks over completed subtrees ending at n:
            # ctz(x) = popcount(~x & (x-1))
            np1 = n + 1
            t = _popcount((~np1) & (np1 - 1))
            c = np1 >> t
            s_lo = _popcount(c - 1)

            def check(i, turning):
                # i = 0..t-1 maps to slot s_lo + i
                s = s_lo + i
                sub_rsum = r_sum - rsum_ckpt[s]
                return turning | _is_turning(inv_mass, r_ckpt[s], leaf.r,
                                             sub_rsum)

            turning = jax.lax.fori_loop(0, t, check,
                                        jnp.asarray(False))
            return _SubtreeState(
                leaf=leaf, prop=prop, log_w=log_w_new, r_sum=r_sum,
                r_ckpt=r_ckpt, rsum_ckpt=rsum_ckpt, turning=turning,
                diverging=diverging,
                sum_accept=st.sum_accept + accept,
                n_leaves=st.n_leaves + 1), key

        stop = carry[0].turning | carry[0].diverging
        st, key = jax.lax.cond(stop, lambda a: a,
                               lambda a: step(a[0], a[1]), (st, key))
        return st, key

    init = _SubtreeState(
        leaf=leaf0,
        prop=leaf0,                       # overwritten by first leaf
        log_w=jnp.asarray(-jnp.inf, dtype),
        r_sum=jnp.zeros((dim,), dtype),
        r_ckpt=jnp.zeros((depth_max + 1, dim), dtype),
        rsum_ckpt=jnp.zeros((depth_max + 1, dim), dtype),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        sum_accept=jnp.asarray(0.0, dtype),
        n_leaves=jnp.asarray(0, jnp.int32))
    st, _ = jax.lax.fori_loop(0, n_leaf, body, (init, key))
    return st


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray
    diverging: jnp.ndarray
    depth: jnp.ndarray
    n_leapfrog: jnp.ndarray


class _TrajState(NamedTuple):
    left: _Leaf
    right: _Leaf
    prop: _Leaf
    log_w: jnp.ndarray
    r_sum: jnp.ndarray
    depth: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leaves: jnp.ndarray


def nuts_kernel(logp_grad, leaf, key, eps, inv_mass, max_depth=10):
    """One NUTS transition from `leaf` (a _Leaf with fresh logp/grad).

    Returns (new_leaf, NUTSInfo)."""
    dtype = leaf.z.dtype
    k_mom, k_loop = jax.random.split(key)
    r0 = (jax.random.normal(k_mom, leaf.z.shape, dtype)
          / jnp.sqrt(inv_mass))
    leaf = leaf._replace(r=r0)
    energy0 = _energy(leaf, inv_mass)

    init = _TrajState(
        left=leaf, right=leaf, prop=leaf,
        log_w=jnp.asarray(0.0, dtype),       # weight exp(-(H0-H0)) = 1
        r_sum=r0,
        depth=jnp.asarray(0, jnp.int32),
        turning=jnp.asarray(False), diverging=jnp.asarray(False),
        sum_accept=jnp.asarray(0.0, dtype),
        n_leaves=jnp.asarray(0, jnp.int32))

    def cond(carry):
        st, _ = carry
        return (~st.turning) & (~st.diverging) & (st.depth < max_depth)

    def body(carry):
        st, key = carry
        key, k_dir, k_sub, k_bias = jax.random.split(key, 4)
        go_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1, -1)
        edge = jax.tree_util.tree_map(
            lambda a, b: jnp.where(go_right, a, b), st.right, st.left)

        # build subtree of 2^depth leaves; biased progressive merge
        sub = jax.lax.switch(
            jnp.minimum(st.depth, max_depth - 1),
            [partial(_build_subtree, logp_grad, edge, max_depth, d,
                     direction, eps, inv_mass, energy0)
             for d in range(max_depth)], k_sub)

        invalid = sub.turning | sub.diverging
        # biased progressive sampling: take subtree proposal with
        # prob min(1, w_sub / w_traj)
        take = (jnp.log(jax.random.uniform(k_bias, (), dtype))
                < sub.log_w - st.log_w) & ~invalid
        prop = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take, a, b), sub.prop, st.prop)

        new_left = jax.tree_util.tree_map(
            lambda a, b: jnp.where(go_right, b, a), sub.leaf, st.left)
        new_right = jax.tree_util.tree_map(
            lambda a, b: jnp.where(go_right, a, b), sub.leaf, st.right)
        r_sum = st.r_sum + sub.r_sum
        turning_top = _is_turning(inv_mass, new_left.r, new_right.r, r_sum)

        new = _TrajState(
            left=jax.tree_util.tree_map(
                lambda a, b: jnp.where(invalid, a, b), st.left, new_left),
            right=jax.tree_util.tree_map(
                lambda a, b: jnp.where(invalid, a, b), st.right, new_right),
            prop=prop,
            log_w=jnp.where(invalid, st.log_w,
                            jnp.logaddexp(st.log_w, sub.log_w)),
            r_sum=jnp.where(invalid, st.r_sum, r_sum),
            depth=st.depth + 1,
            turning=sub.turning | (~invalid & turning_top),
            diverging=sub.diverging,
            sum_accept=st.sum_accept + sub.sum_accept,
            n_leaves=st.n_leaves + sub.n_leaves)
        return new, key

    st, _ = jax.lax.while_loop(cond, body, (init, k_loop))
    accept_prob = st.sum_accept / jnp.maximum(st.n_leaves, 1).astype(dtype)
    info = NUTSInfo(accept_prob=accept_prob, diverging=st.diverging,
                    depth=st.depth, n_leapfrog=st.n_leaves)
    return st.prop, info


# ---------------------------------------------------------------------------
# chain driver (warmup adaptation shared with mcmc.py conventions)
# ---------------------------------------------------------------------------

def run_chain_nuts(logp_fn, z0, key, n_warmup, n_samples, max_depth=10,
                   target_accept=0.8, val_grad_fn=None):
    """One adaptive NUTS chain; returns (samples (n_samples, dim), info).

    val_grad_fn: optional z -> (logp, grad) override for targets whose
    gradient is hand-assembled (the fast backends' scatter-free design
    products, mcmc.mcmc_fit_fast) instead of autodiffed."""
    from .mcmc import _init_adapt, _dual_avg, _welford

    dtype = z0.dtype
    dim = z0.shape[0]
    val_grad = (jax.value_and_grad(logp_fn) if val_grad_fn is None
                else val_grad_fn)

    def logp_grad(z):
        return val_grad(z)

    lp0, g0 = logp_grad(z0)
    leaf0 = _Leaf(z0, jnp.zeros_like(z0), g0, lp0)
    adapt0 = _init_adapt(dim, 0.1, dtype)
    inv_mass0 = jnp.ones(dim, dtype)

    def warm_step(carry, key):
        leaf, adapt, inv_mass = carry
        eps = jnp.exp(adapt.log_eps)
        new, info = nuts_kernel(logp_grad, leaf, key, eps, inv_mass,
                                max_depth)
        adapt = _dual_avg(adapt, info.accept_prob, target_accept)
        adapt = _welford(adapt, new.z)
        return (new, adapt, inv_mass), info.accept_prob

    keys = jax.random.split(key, n_warmup + n_samples)
    h1 = n_warmup // 2
    (leaf, adapt, _), _ = jax.lax.scan(
        warm_step, (leaf0, adapt0, inv_mass0), keys[:h1])
    var = adapt.m2 / jnp.maximum(adapt.count - 1.0, 1.0)
    inv_mass = jnp.where(var > 1e-10, var, 1.0)
    adapt = _init_adapt(dim, 1.0, dtype)._replace(
        log_eps=adapt.log_eps_avg, log_eps_avg=adapt.log_eps_avg,
        mu=adapt.log_eps_avg + jnp.log(10.0))
    (leaf, adapt, _), _ = jax.lax.scan(
        warm_step, (leaf, adapt, inv_mass), keys[h1:n_warmup])

    eps_final = jnp.exp(adapt.log_eps_avg)

    def sample_step(leaf, key):
        new, info = nuts_kernel(logp_grad, leaf, key, eps_final, inv_mass,
                                max_depth)
        return new, (new.z, info.accept_prob, info.diverging,
                     info.n_leapfrog)

    leaf, (zs, accs, divs, nleaps) = jax.lax.scan(
        sample_step, leaf, keys[n_warmup:])
    return zs, (jnp.mean(accs), jnp.sum(divs), jnp.mean(nleaps),
                eps_final)
