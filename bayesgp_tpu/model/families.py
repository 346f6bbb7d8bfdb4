"""Likelihood families as pure JAX functions of the linear predictor.

TPU-native rewrite of the family dispatch in the reference's C++ objective
(src/BayesGP.cpp:155-214). Each family exposes:
  - `log_lik(eta, md, theta)` — scalar log likelihood
  - `eta_hessian_kind(fam)` — "diag" (elementwise) or "full"
  - `eta_weights(eta, md, theta)` — diag of d^2(-ll)/d eta^2 for "diag"
  - `eta_hessian_full(eta, md, theta)` — (n, n) for structured families

The Cox partial likelihood (O(n^2) nested loops at src/BayesGP.cpp:170-194)
is vectorized as a suffix log-cum-sum-exp over the time-sorted data via
`lax.associative_scan` (logaddexp is associative — O(log n) depth on TPU).
The case-crossover conditional likelihood (src/BayesGP.cpp:196-210) is a
masked padded logsumexp, seeded with the reference's implicit exp(0) term.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


# --- customized families (reference family_type -1: user-compiled TMB
# template named via `customized_template`, R/02_model_fit.R:19-24;
# here: a registered JAX-callable log likelihood) ---
CUSTOM_FAMILIES = {}


def register_family(name: str, loglik, n_theta_extra: int = 0):
    """Register a customized likelihood: loglik(eta, y, theta) -> scalar,
    differentiable JAX code. `n_theta_extra` extra hyperparameters are
    appended to theta (with the control.family exponential prior)."""
    CUSTOM_FAMILIES[name] = (loglik, int(n_theta_extra))


def _suffix_logsumexp(eta):
    """s[i] = logsumexp(eta[i:]) via an associative scan (parallel on TPU)."""
    rev = eta[::-1]
    cum = jax.lax.associative_scan(jnp.logaddexp, rev)
    return cum[::-1]


def _cumsum_as(x, axis=0):
    """cumsum via associative scan. jnp.cumsum lowers to reduce_window,
    which under f64 emulation on TPU is a server-side compile landmine
    (CLAUDE.md gotcha 3: minutes per traced copy at n=4000); the
    associative scan is log2(n) full-width vector adds."""
    return jax.lax.associative_scan(jnp.add, x, axis=axis)


def _revcumsum_as(x, axis=0):
    return jnp.flip(_cumsum_as(jnp.flip(x, axis), axis=axis), axis)


def _acc_nT(A, B):
    """A^T B with the contraction over the (long, sorted) observation
    axis. On TPU the emulated f64 matmul both compiles pathologically
    and accumulates at only ~1e-6 over long contractions — route
    through the split-f32 two-level accumulator (linalg.band_arrow.
    acc_dot_d, ~1e-8). CPU keeps the exact f64 matmul (golden tests)."""
    if jax.default_backend() == "tpu":
        from ..linalg.band_arrow import acc_dot_d
        return acc_dot_d(A, B)
    return A.T @ B


def _nax(eta):
    """n-axis compute cast: f32 on TPU, identity elsewhere.

    f64 exp/log/matmul over the observation axis is a server-side XLA
    compile landmine on the TPU tunnel (CLAUDE.md gotcha 3) — measured
    round 15: the dense CoxPH fused program (169 f64 n-shaped
    dot_generals, 1844 f64 exponentials) compiled for >20 min, twice.
    Mirrors the fast backends' mixed-precision contract: O(n) data
    work f32, O(d) solver work f64. High-precision reductions back to
    f64 ride _acc_nT (split-f32 two-level accumulation)."""
    if jax.default_backend() == "tpu" and eta.dtype == jnp.float64:
        return eta.astype(jnp.float32)
    return eta


def mixed_naxis(md):
    """True when this model's n-axis likelihood work runs in f32 (the
    TPU mixed-precision dense path, CoxPH/case-crossover). Inner-solver
    tolerances must then be noise-aware (inference/laplace.py)."""
    return (md.family in (3, 4) and jax.default_backend() == "tpu"
            and md.A.dtype == jnp.float64)


def _acc_sum(x):
    """High-precision scalar sum of a (n,) vector via the split-f32
    two-level accumulator (exact f64 path on CPU)."""
    one = jnp.ones((x.shape[0], 1), x.dtype)
    return _acc_nT(x[:, None], one)[0, 0]


def _coxph_static(md):
    """Host-precomputed CoxPH index structure, available whenever
    md.ranks/md.cens are numpy (the dense backend keeps them on host —
    CLAUDE.md gotcha 11). ranks are min-ranks of the time-sorted rows,
    hence NONDECREASING; returns (rank_wts, pos) with
      rank_wts[j] = sum_{i: r_i = j+1} cens_i     (event mass per rank)
      pos[j]      = #{i: r_i <= j+1}              (searchsorted bound)
    or None when the fields are traced (lifted fast backends) or the
    monotone precondition fails. Regrouping every per-row rank term as
    a per-RANK term weighted by rank_wts removes ALL gathers and
    scatter-adds from the partial likelihood and its quadform —
    scatter-add (including the scatter VJP of a rank gather under AD)
    is a minutes-scale XLA compile landmine on this TPU (CLAUDE.md
    gotcha 3)."""
    r = getattr(md, "ranks", None)
    c = getattr(md, "cens", None)
    if not (isinstance(r, np.ndarray) and isinstance(c, np.ndarray)):
        return None
    r0 = np.asarray(r, np.int64) - 1
    if np.any(np.diff(r0) < 0):
        return None
    wts = np.zeros(len(r0))
    np.add.at(wts, r0, np.asarray(c, np.float64))
    return wts


def _sum_hp(x):
    """Observation-axis likelihood sum. On TPU (f32 n-axis work) a
    plain f32 jnp.sum over n ~ 1e5 O(1..1e2) terms carries O(0.01..1)
    absolute accumulation error — which `model_fit_loop` then
    EXPONENTIATES as lognormconst differences across grid points
    (reference R/02_model_fit.R:771-776), so nats of node-value noise
    make grid posteriors garbage (VERDICT r4 #5, gauss2 ±4-nat pit).
    Route through the split-f32 two-level accumulator (~1e-8 over
    1e5-long contractions). Applies only to f32 summands (the fast
    backends' n-axis compute dtype): CPU and the dense f64 TPU path
    keep the exact jnp.sum ordering — golden f64 values are
    bit-preserved."""
    if jax.default_backend() == "tpu" and x.dtype == jnp.float32:
        return _acc_sum(x)
    return jnp.sum(x)


def log_lik(eta, md, theta):
    fam = md.family
    y = md.y
    if fam == 0:    # Gaussian; sigma = exp(-theta_last/2) (BayesGP.cpp:159-161)
        sigma = jnp.exp(-0.5 * theta[-1])
        return _sum_hp(-0.5 * jnp.log(2 * jnp.pi) - jnp.log(sigma)
                       - 0.5 * ((y - eta) / sigma) ** 2)
    if fam == 1:    # Poisson log link (BayesGP.cpp:163-165)
        return _sum_hp(y * eta - jnp.exp(eta) - gammaln(y + 1.0))
    if fam == 2:    # Binomial logit, dbinom_robust (BayesGP.cpp:166-168)
        size = md.size
        lchoose = gammaln(size + 1.0) - gammaln(y + 1.0) - gammaln(size - y + 1.0)
        return _sum_hp(lchoose + y * eta - size * jax.nn.softplus(eta))
    if fam == 3:    # Cox PH partial likelihood (BayesGP.cpp:170-194)
        # data pre-sorted by response; risk set of i = suffix from rank_i - 1
        e = _nax(eta)                        # f32 n-axis work on TPU
        s = _suffix_logsumexp(e)
        st = _coxph_static(md)
        if st is not None:
            # sum_i c_i (eta_i - s[r_i]) regrouped as c.eta - wts.s:
            # identical math, but no rank gather — whose VJP would be a
            # scatter-add inside every Newton gradient (TPU compile
            # landmine, see _coxph_static)
            return (_acc_sum(jnp.asarray(md.cens, e.dtype) * e)
                    - _acc_sum(jnp.asarray(st, e.dtype) * s)
                    ).astype(eta.dtype)
        risk_lse = s[md.ranks - 1]
        return _acc_sum(jnp.asarray(md.cens, e.dtype)
                        * (e - risk_lse)).astype(eta.dtype)
    if fam == 4:    # case-crossover conditional likelihood (BayesGP.cpp:196-210)
        e = _nax(eta)                        # f32 n-axis work on TPU
        eta_case = e[md.case_day - 1]
        mask = md.control_days > 0
        idx = jnp.where(mask, md.control_days - 1, 0)
        z = jnp.where(mask, e[idx] - eta_case[:, None], -jnp.inf)
        # logspace_add chain seeded at 0 => implicit extra exp(0) term
        zmax = jnp.maximum(jnp.max(jnp.where(mask, z, -jnp.inf), axis=1), 0.0)
        denom = zmax + jnp.log(
            jnp.exp(-zmax)
            + jnp.sum(jnp.where(mask, jnp.exp(z - zmax[:, None]), 0.0), axis=1))
        return -_acc_sum(jnp.asarray(md.count, e.dtype)
                         * denom).astype(eta.dtype)
    if fam == -2:   # prior only (BayesGP.cpp:212-214)
        return jnp.asarray(0.0, eta.dtype)
    if fam == -1:   # customized (registered callable)
        loglik, _ = CUSTOM_FAMILIES[md.custom_family]
        return loglik(eta, y, theta)
    raise ValueError(f"unknown family code {fam}")


def eta_hessian_kind(fam: int) -> str:
    return "diag" if fam in (0, 1, 2, -2) else "full"


def eta_weights(eta, md, theta):
    """Diagonal of d^2(-log_lik)/d eta^2 for elementwise families."""
    fam = md.family
    if fam == 0:
        return jnp.full(eta.shape, jnp.exp(theta[-1]))  # 1/sigma^2
    if fam == 1:
        return jnp.exp(eta)
    if fam == 2:
        p = jax.nn.sigmoid(eta)
        return md.size * p * (1.0 - p)
    if fam == -2:
        return jnp.zeros(eta.shape, eta.dtype)
    raise ValueError(f"family {fam} is not elementwise")


def eta_hessian_quadform(eta, md, theta, A):
    """A^T M A for the structured families WITHOUT materializing the
    (n, n) Hessian M — O(n w + n w^2) using the suffix/strata structure.

    CoxPH: M = sum_i c_i (diag(p_i) - p_i p_i^T) with p_i the softmax
    over the risk set (suffix) of i:
      A^T M A = A^T diag(u * e^eta) A - (PA)^T diag(c) (PA)
      where (PA)[i] = e^{-lse_i} * revcumsum(e^eta A)[r_i]
      and   u[j]    = cumsum_over_ranks(c_i e^{-lse_i})[j].

    Case-crossover: M = sum_i cnt_i [ sum_j q_ij v_ij v_ij^T - g_i g_i^T ]
    with v_ij = a_{cd_ij} - a_{case_i}, g_i = sum_j q_ij v_ij — assembled
    from gathered design rows (nc x K x w), no scatters.
    """
    fam = md.family
    n = eta.shape[0]
    A = jnp.asarray(A)
    if fam == 3:
        e = _nax(eta)                        # f32 n-axis work on TPU
        mixed = e is not eta
        A = A.astype(e.dtype)
        # f32 path: shift by max(eta) so every exp argument is <= 0 —
        # exp overflows f32 at 88 (f64 at 709) and wild etas appear in
        # line-search trials. The shift cancels exactly in every
        # product below (e - s is shift-invariant), so the f64 path is
        # left bit-identical with shift 0.
        m = (jax.lax.stop_gradient(jnp.max(e)) if mixed
             else jnp.asarray(0.0, e.dtype))    # analytically cancels
        s = _suffix_logsumexp(e) - m
        expeta = jnp.exp(e - m)
        # revcum[m] = sum_{j >= m} e^{eta_j} a_j
        revcum = _revcumsum_as(expeta[:, None] * A, axis=0)
        st = _coxph_static(md)
        if st is not None:
            # per-row rank terms regrouped per RANK (rank_wts): the
            # gathered PA rows i collapse onto their rank j with weight
            # wts_j, and u becomes a plain cumsum — identical math,
            # zero gathers/scatters (see _coxph_static)
            wts = jnp.asarray(st, e.dtype)
            Pall = jnp.exp(-s)[:, None] * revcum              # (n, w)
            u = _cumsum_as(wts * jnp.exp(-s))
            diagw = u * expeta
            return (_acc_nT(A * diagw[:, None], A)
                    - _acc_nT(Pall * wts[:, None], Pall)
                    ).astype(eta.dtype)
        r = md.ranks - 1
        PA = jnp.exp(-s[r])[:, None] * revcum[r]          # (n, w)
        t = md.cens * jnp.exp(-s[r])
        z = jnp.zeros((n,), e.dtype).at[r].add(t.astype(e.dtype))
        u = _cumsum_as(z)
        diagw = u * expeta
        return ((A * diagw[:, None]).T @ A
                - (PA * md.cens[:, None].astype(e.dtype)).T @ PA
                ).astype(eta.dtype)
    if fam == 4:
        e = _nax(eta)                        # f32 n-axis work on TPU
        A = A.astype(e.dtype)
        eta_case = e[md.case_day - 1]
        mask = md.control_days > 0
        idx = jnp.where(mask, md.control_days - 1, 0)
        z = jnp.where(mask, e[idx] - eta_case[:, None], -jnp.inf)
        zmax = jnp.maximum(jnp.max(jnp.where(mask, z, -jnp.inf), axis=1), 0.0)
        denom = zmax + jnp.log(
            jnp.exp(-zmax)
            + jnp.sum(jnp.where(mask, jnp.exp(z - zmax[:, None]), 0.0), axis=1))
        q = jnp.where(mask, jnp.exp(z - denom[:, None]), 0.0)  # (nc, K)
        Vrows = A[idx] - A[md.case_day - 1][:, None, :]        # (nc, K, w)
        cnt = jnp.asarray(md.count, e.dtype)
        qc = q * cnt[:, None]
        H1 = jnp.einsum("ik,ika,ikb->ab", qc, Vrows, Vrows)
        g = jnp.einsum("ik,ika->ia", q, Vrows)                 # (nc, w)
        H2 = jnp.einsum("i,ia,ib->ab", cnt, g, g)
        return (H1 - H2).astype(eta.dtype)
    if fam == -1:
        # generic exact path for customized likelihoods: autodiff the
        # (n, n) eta-Hessian (O(n^2) — fine at customized-family scales)
        M = -jax.hessian(lambda e: log_lik(e, md, theta))(eta)
        return A.T @ (M @ A)
    raise ValueError(f"family {fam} has no structured quadform path")


def eta_hessian_full(eta, md, theta):
    """Exact (n, n) Hessian of -log_lik in eta for Coxph / case-crossover."""
    fam = md.family
    n = eta.shape[0]
    if fam == 3:
        s = _suffix_logsumexp(eta)                    # (n,)
        # Pmat[i, j] = softmax over risk set of i = exp(eta_j - s[r_i]) 1[j >= r_i]
        r = md.ranks - 1
        j_idx = jnp.arange(n)[None, :]
        in_risk = j_idx >= r[:, None]
        Pmat = jnp.where(in_risk, jnp.exp(eta[None, :] - s[r][:, None]), 0.0)
        c = md.cens
        diag_term = jnp.diag(jnp.sum(c[:, None] * Pmat, axis=0))
        return diag_term - Pmat.T @ (c[:, None] * Pmat)
    if fam == 4:
        # -ll = sum_i count_i * log(1 + sum_j exp(z_ij)), z_ij = eta_cd - eta_case
        eta_case = eta[md.case_day - 1]
        mask = md.control_days > 0
        idx = jnp.where(mask, md.control_days - 1, 0)
        z = jnp.where(mask, eta[idx] - eta_case[:, None], -jnp.inf)
        zmax = jnp.maximum(jnp.max(jnp.where(mask, z, -jnp.inf), axis=1), 0.0)
        denom = zmax + jnp.log(
            jnp.exp(-zmax)
            + jnp.sum(jnp.where(mask, jnp.exp(z - zmax[:, None]), 0.0), axis=1))
        q = jnp.where(mask, jnp.exp(z - denom[:, None]), 0.0)  # (nc, K)
        nc, K = q.shape
        # Build M = sum_i count_i [ sum_j q_ij v_ij v_ij^T - g_i g_i^T ]
        # where v_ij = e_{cd_ij} - e_{case_i},  g_i = sum_j q_ij v_ij,
        # via dense scatter matrices (nc*K small for reference workloads).
        rows_cd = idx.reshape(-1)                      # (nc*K,)
        rows_case = jnp.repeat(md.case_day - 1, K)
        qflat = (q * md.count[:, None]).reshape(-1)
        # E1 = sum q_ij c_i (e_cd - e_case)(e_cd - e_case)^T
        M = jnp.zeros((n, n), eta.dtype)
        M = M.at[rows_cd, rows_cd].add(qflat)
        M = M.at[rows_case, rows_case].add(qflat)
        M = M.at[rows_cd, rows_case].add(-qflat)
        M = M.at[rows_case, rows_cd].add(-qflat)
        # g_i = sum_j q_ij (e_cd - e_case): sparse vector per case
        # G matrix (nc, n): scatter q into cd cols, -sum q into case col
        G = jnp.zeros((nc, n), eta.dtype)
        G = G.at[jnp.arange(nc)[:, None], idx].add(q)
        G = G.at[jnp.arange(nc), md.case_day - 1].add(-jnp.sum(q, axis=1))
        M = M - G.T @ (md.count[:, None] * G)
        return M
    raise ValueError(f"family {fam} has no full-hessian path")
