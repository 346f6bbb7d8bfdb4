"""MCMC over the joint (W, theta) posterior.

TPU-native replacement for the reference's `method="MCMC"` path, which
delegates to tmbstan/Stan NUTS over the TMB joint objective
(R/02_model_fit.R:286-304, defaults chains=1, warmup=10000, seed=123 from
R/01_utility.R:491-500).

The sampler is adaptive Hamiltonian Monte Carlo: leapfrog integration of
the exact joint gradient (autodiff of the pure-JAX objective),
Metropolis-exact accept/reject, dual-averaging step-size adaptation to a
0.8 target acceptance, diagonal mass-matrix adaptation from warmup
variance, and uniformly jittered trajectory lengths (which breaks the
resonance pathologies static HMC is prone to). Chains are a vmapped axis
— multi-chain runs are one SPMD program (the reference forks R processes
per chain).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model.objective import neg_log_post


def default_option_list(option_list=None):
    """Reference defaults (R/01_utility.R:491-500)."""
    opts = dict(option_list or {})
    opts.setdefault("chains", 1)
    opts.setdefault("cores", 1)       # accepted for API parity; unused
    opts.setdefault("init", "random")
    opts.setdefault("seed", 123)
    opts.setdefault("warmup", 10000)
    opts.setdefault("num_leapfrog", 32)
    opts.setdefault("target_accept", 0.8)
    opts.setdefault("algorithm", "NUTS")   # tmbstan's sampler; or "HMC"
    opts.setdefault("max_treedepth", 10)
    return opts


class HMCState(NamedTuple):
    z: jnp.ndarray          # position (W ++ theta)
    logp: jnp.ndarray       # log posterior at z
    grad: jnp.ndarray       # gradient of log posterior at z


class AdaptState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_avg: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray
    mean: jnp.ndarray       # Welford mean
    m2: jnp.ndarray         # Welford sum of squares


def hmc_kernel(logp_grad, state, key, eps, inv_mass, n_leapfrog_max):
    """One jittered-HMC transition."""
    k_mom, k_steps, k_acc = jax.random.split(key, 3)
    r0 = jax.random.normal(k_mom, state.z.shape, state.z.dtype) / jnp.sqrt(
        inv_mass)
    n_steps = jax.random.randint(k_steps, (), 1, n_leapfrog_max + 1)

    def do_leapfrog(_):
        def step(carry, i):
            z, r, g, lp = carry
            do = i < n_steps

            def leap(zrg):
                z, r, g, lp = zrg
                r = r + 0.5 * eps * g
                z = z + eps * inv_mass * r
                lp, g = logp_grad(z)
                r = r + 0.5 * eps * g
                return z, r, g, lp

            carry = jax.lax.cond(do, leap, lambda x: x, (z, r, g, lp))
            return carry, None

        init = (state.z, r0, state.grad, state.logp)
        (z, r, g, lp), _ = jax.lax.scan(step, init, jnp.arange(n_leapfrog_max))
        return z, r, g, lp

    z1, r1, g1, lp1 = do_leapfrog(None)
    h0 = state.logp - 0.5 * jnp.sum(r0 * inv_mass * r0)
    h1 = lp1 - 0.5 * jnp.sum(r1 * inv_mass * r1)
    log_alpha = jnp.minimum(0.0, h1 - h0)
    log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
    accept = jnp.log(jax.random.uniform(k_acc, (), state.z.dtype)) < log_alpha
    new = HMCState(
        z=jnp.where(accept, z1, state.z),
        logp=jnp.where(accept, lp1, state.logp),
        grad=jnp.where(accept, g1, state.grad))
    return new, jnp.exp(log_alpha)


def _init_adapt(dim, eps0, dtype):
    return AdaptState(
        log_eps=jnp.log(jnp.asarray(eps0, dtype)),
        log_eps_avg=jnp.log(jnp.asarray(eps0, dtype)),
        h_avg=jnp.asarray(0.0, dtype),
        mu=jnp.log(10.0 * jnp.asarray(eps0, dtype)),
        count=jnp.asarray(0.0, dtype),
        mean=jnp.zeros(dim, dtype), m2=jnp.zeros(dim, dtype))


def _dual_avg(adapt, accept_prob, target):
    """Nesterov dual averaging (Hoffman & Gelman 2014, sec 3.2)."""
    t0, gamma, kappa = 10.0, 0.05, 0.75
    count = adapt.count + 1.0
    eta_h = 1.0 / (count + t0)
    h_avg = (1.0 - eta_h) * adapt.h_avg + eta_h * (target - accept_prob)
    log_eps = adapt.mu - jnp.sqrt(count) / gamma * h_avg
    eta = count ** (-kappa)
    log_eps_avg = eta * log_eps + (1.0 - eta) * adapt.log_eps_avg
    return adapt._replace(log_eps=log_eps, log_eps_avg=log_eps_avg,
                          h_avg=h_avg, count=count)


def _welford(adapt, z):
    delta = z - adapt.mean
    mean = adapt.mean + delta / jnp.maximum(adapt.count, 1.0)
    m2 = adapt.m2 + delta * (z - mean)
    return adapt._replace(mean=mean, m2=m2)


def run_chain(logp_fn, z0, key, n_warmup, n_samples, n_leapfrog=32,
              target_accept=0.8, val_grad_fn=None):
    """One adaptive HMC chain; returns (samples (n_samples, dim), accept).

    val_grad_fn: optional z -> (logp, grad) override (hand-assembled
    gradients, see nuts.run_chain_nuts)."""
    dtype = z0.dtype
    dim = z0.shape[0]
    val_grad = (jax.value_and_grad(logp_fn) if val_grad_fn is None
                else val_grad_fn)

    def logp_grad(z):
        return val_grad(z)

    lp0, g0 = logp_grad(z0)
    state0 = HMCState(z0, lp0, g0)
    adapt0 = _init_adapt(dim, 0.1, dtype)
    inv_mass0 = jnp.ones(dim, dtype)

    # phase 1: warmup with step-size + mass adaptation
    def warm_step(carry, key):
        state, adapt, inv_mass = carry
        eps = jnp.exp(adapt.log_eps)
        new, acc = hmc_kernel(logp_grad, state, key, eps, inv_mass,
                              n_leapfrog)
        adapt = _dual_avg(adapt, acc, target_accept)
        adapt = _welford(adapt, new.z)
        return (new, adapt, inv_mass), acc

    # split warmup: first half adapts eps with unit mass, second half
    # re-estimates the diagonal mass then re-adapts eps
    keys = jax.random.split(key, n_warmup + n_samples + 1)
    h1 = n_warmup // 2
    (state, adapt, _), _ = jax.lax.scan(
        warm_step, (state0, adapt0, inv_mass0), keys[:h1])
    var = adapt.m2 / jnp.maximum(adapt.count - 1.0, 1.0)
    inv_mass = jnp.where(var > 1e-10, var, 1.0)
    adapt = _init_adapt(dim, float(np.exp(0.0)), dtype)._replace(
        log_eps=adapt.log_eps_avg, log_eps_avg=adapt.log_eps_avg,
        mu=adapt.log_eps_avg + jnp.log(10.0))
    (state, adapt, _), _ = jax.lax.scan(
        warm_step, (state, adapt, inv_mass), keys[h1:n_warmup])

    eps_final = jnp.exp(adapt.log_eps_avg)

    def sample_step(state, key):
        new, acc = hmc_kernel(logp_grad, state, key, eps_final, inv_mass,
                              n_leapfrog)
        return new, (new.z, acc)

    state, (zs, accs) = jax.lax.scan(sample_step, state,
                                     keys[n_warmup:n_warmup + n_samples])
    return zs, jnp.mean(accs)


def _fast_logp_val_grad(be):
    """(logp, val_grad) closures of a fast backend's joint (W, theta)
    posterior over z = [V'_d | tail | theta] — shared by mcmc_fit_fast
    and its gradient-consistency test (so the test exercises the very
    function the sampler integrates)."""
    from ..model import families

    d, q = be.d, be.q
    dtype = be.dtype

    def split(z):
        Vp = jnp.pad(z[:d], (0, be.dpad - d))
        return Vp, z[d:d + q], z[d + q:]

    def logp(z):
        Vp, tail, theta = split(z)
        return -be.neg_log_post(Vp, tail, theta)

    def val_grad(z):
        Vp, tail, theta = split(z)
        e = be.eta(Vp, tail)
        thc = theta.astype(be.compute_dtype)
        lp = (families.log_lik(e, be.md, thc).astype(dtype)
              - be._prior_neg(Vp, tail, theta))
        gV, gt = be.grad_W(Vp, tail, theta, eta=e)
        # theta gradient: likelihood part at fixed eta (nonzero only for
        # the Gaussian noise theta) + prior part — both cheap autodiff
        # with no design products involved
        gth = jax.grad(
            lambda th: -families.log_lik(
                e, be.md, th.astype(be.compute_dtype)).astype(dtype)
            + be._prior_neg(Vp, tail, th))(theta)
        return lp, -jnp.concatenate([gV[:d], gt, gth])

    return logp, val_grad


def mcmc_fit_fast(backend, M=3000, options=None):
    """Joint (W, theta) NUTS on a FAST backend (fast/iwp.FastIWPBackend
    or fast/banded.BandedBackend) — the production-scale method='MCMC'
    path. Where `mcmc_fit` autodiffs the dense-design objective (O(n w)
    memory, infeasible at n=1e5/k=2000), this one evaluates log density
    and gradient through the backend's O(n) primitives: the chunked MXU
    design products for eta, hand-assembled scatter-free gradients
    (grad_W), banded prior quadforms — no dense design and no
    factorization anywhere (the Laplace machinery is bypassed
    entirely; NUTS needs only logp/grad).

    Sampling runs in the backend's PRIMED latent coordinates (V', t) —
    a constant-Jacobian (unit-determinant times det T) change of
    variables, so the chain targets the same posterior; draws are
    mapped back to reference coordinates [U = T(V' - Z0 t) | beta |
    fixed] for output, matching `mcmc_fit`'s (w_ref, M_total) layout.
    The orthogonalized coordinates are also better conditioned for
    NUTS than raw W (the same reason they exist for the Newton solver).
    """
    opts = default_option_list(options)
    be = backend
    d, q, s = be.d, be.q, be.n_theta
    dim = d + q + s
    dtype = be.dtype
    logp, val_grad = _fast_logp_val_grad(be)

    key = jax.random.PRNGKey(opts["seed"])
    chains = int(opts["chains"])
    keys = jax.random.split(key, chains + 1)
    if opts["init"] == "random":
        z0 = jax.random.uniform(keys[-1], (chains, dim), dtype, -2.0, 2.0)
    else:
        z0 = jnp.zeros((chains, dim), dtype)

    algo = str(opts["algorithm"]).upper()
    if algo == "NUTS":
        from .nuts import run_chain_nuts
        run = jax.jit(jax.vmap(
            partial(run_chain_nuts, logp, n_warmup=int(opts["warmup"]),
                    n_samples=int(M),
                    max_depth=int(opts["max_treedepth"]),
                    target_accept=float(opts["target_accept"]),
                    val_grad_fn=val_grad)))
        zs, (acc, ndiv, nleap, eps) = run(z0, keys[:chains])
        mod = {"accept_rate": np.asarray(acc), "chains": chains,
               "warmup": opts["warmup"], "algorithm": "NUTS-fast",
               "divergences": np.asarray(ndiv),
               "mean_leapfrogs": np.asarray(nleap),
               "step_size": np.asarray(eps)}
    else:
        run = jax.jit(jax.vmap(
            partial(run_chain, logp, n_warmup=int(opts["warmup"]),
                    n_samples=int(M),
                    n_leapfrog=int(opts["num_leapfrog"]),
                    target_accept=float(opts["target_accept"]),
                    val_grad_fn=val_grad)))
        zs, acc = run(z0, keys[:chains])
        mod = {"accept_rate": np.asarray(acc), "chains": chains,
               "warmup": opts["warmup"], "algorithm": "adaptive-HMC-fast"}

    @jax.jit
    def to_ref(Z):
        Vs = jnp.pad(Z[:, :d], ((0, 0), (0, be.dpad - d)))
        ts = Z[:, d:d + q]
        Vact = jax.vmap(be.to_V)(Vs, ts)
        U = be.apply_T(Vact[:, :d])
        full = jnp.concatenate([U, ts], axis=1)
        rp = getattr(be, "ref_perm", None)
        return full if rp is None else full[:, rp]

    zs = np.asarray(zs).reshape(chains * int(M), dim)
    samps = np.asarray(to_ref(jnp.asarray(zs)), np.float64).T
    theta_samps = zs[:, d + q:]
    return mod, samps, theta_samps


def mcmc_fit(md, M=3000, options=None):
    """Joint (W, theta) MCMC on a ModelData; reference-equivalent output
    shapes: samps (w, M_total), theta_samps (M_total, s)."""
    opts = default_option_list(options)
    w, s = md.w_count, md.n_theta
    dim = w + s
    dtype = md.A.dtype

    def logp(z):
        return -neg_log_post(z[:w], z[w:], md)

    key = jax.random.PRNGKey(opts["seed"])
    chains = int(opts["chains"])
    keys = jax.random.split(key, chains + 1)
    if opts["init"] == "random":
        z0 = jax.random.uniform(keys[-1], (chains, dim), dtype, -2.0, 2.0)
    else:
        z0 = jnp.zeros((chains, dim), dtype)

    algo = str(opts["algorithm"]).upper()
    if algo == "NUTS":
        from .nuts import run_chain_nuts
        run = jax.jit(jax.vmap(
            partial(run_chain_nuts, logp, n_warmup=int(opts["warmup"]),
                    n_samples=int(M),
                    max_depth=int(opts["max_treedepth"]),
                    target_accept=float(opts["target_accept"]))))
        zs, (acc, ndiv, nleap, eps) = run(z0, keys[:chains])
        mod = {"accept_rate": np.asarray(acc), "chains": chains,
               "warmup": opts["warmup"], "algorithm": "NUTS",
               "divergences": np.asarray(ndiv),
               "mean_leapfrogs": np.asarray(nleap),
               "step_size": np.asarray(eps)}
    else:
        run = jax.jit(jax.vmap(
            partial(run_chain, logp, n_warmup=int(opts["warmup"]),
                    n_samples=int(M), n_leapfrog=int(opts["num_leapfrog"]),
                    target_accept=float(opts["target_accept"]))))
        zs, acc = run(z0, keys[:chains])      # (chains, M, dim)
        mod = {"accept_rate": np.asarray(acc), "chains": chains,
               "warmup": opts["warmup"], "algorithm": "adaptive-HMC"}
    zs = np.asarray(zs).reshape(chains * M, dim)
    samps = zs[:, :w].T                       # (w, M_total)
    theta_samps = zs[:, w:]                   # (M_total, s)
    return mod, samps, theta_samps
