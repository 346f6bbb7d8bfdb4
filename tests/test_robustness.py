"""Regression tests for the round-14 weak-theta robustness machinery
(VERDICT r3 weak #2): guarded factorizations must (a) stay FINITE on
engineered indefinite / essentially-singular systems and (b) be
bit-identical no-ops on healthy systems; the fused s>1 optimizer's
per-dispatch iteration budget (aghq._OPT_ND_MAX_ITER) exhaustion must
fall back to host-segmented dispatches that still reach the true mode.

Reference behavior being matched: TMB's inner Newton retreats on a
failed CHOLMOD factor and converges without babysitting
(/root/reference/R/02_model_fit.R:276-284); here the Laplace value must
stay finite so the theta optimizer can walk out of the sick region.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayesgp_tpu.linalg import band_kernels as bk
from bayesgp_tpu.linalg import block_tridiag as bt
from bayesgp_tpu.inference import aghq as A


# --------------------------------------------------------------------
# guarded dd band factorization (pivot clamp + magnitude caps)
# --------------------------------------------------------------------

def _spd_band(rng, d, bw):
    L0 = 0.4 * np.tril(rng.normal(size=(d, d)), -1)
    L0 *= np.abs(np.arange(d)[:, None] - np.arange(d)[None, :]) <= bw
    np.fill_diagonal(L0, 1.5 + rng.uniform(0, 1, d))
    Amat = L0 @ L0.T
    s = 1.0 / np.sqrt(np.diag(Amat))
    Amat = Amat * s[:, None] * s[None, :]
    band = np.zeros((bw + 1, d))
    for o in range(bw + 1):
        band[o, :d - o] = np.diag(Amat, -o)
    return Amat, band


def _band_of(Amat, bw):
    d = Amat.shape[0]
    band = np.zeros((bw + 1, d))
    for o in range(bw + 1):
        band[o, :d - o] = np.diag(Amat, -o)
    return band


@pytest.mark.parametrize("kind", ["tiny_negative", "order_one_negative"])
def test_guarded_band_factor_finite_on_indefinite(kind):
    """An engineered indefinite band (the weak-theta signature:
    lambda_min ~ -5e-7 'numerically indefinite', and intermediate
    pivots negative by O(1) on essentially-singular systems) must
    produce FINITE L, half log-det and solves through the pivot-clamped
    dd kernels — a NaN here was absorbing through every warm-chained
    Laplace eval (round-14 root cause)."""
    rng = np.random.default_rng(0)
    d, bw = 64, 3
    Amat, _ = _spd_band(rng, d, bw)
    if kind == "tiny_negative":
        # push lambda_min just below zero (numerically indefinite)
        lam_min = np.linalg.eigvalsh(Amat).min()
        Amat = Amat - (lam_min + 5e-7) * np.eye(d)
    else:
        # essentially singular: O(1) negative pivots mid-elimination
        Amat = Amat.copy()
        Amat[10, 10] = -0.8
        Amat[40, 40] = 1e-14
    band = _band_of(Amat, bw)

    q = 3
    C = rng.normal(size=(d, q))
    bh, bl = bk.pack_band(jnp.asarray(band), d, bw)
    ch, cl = bk.pack_rhs(jnp.asarray(C), d, bw)
    Lh, Ll, Yh, Yl, misc = bk.factor_fn(d, bw, interpret=True)(
        bh, bl, ch, cl)
    for name, arr in [("Lh", Lh), ("Ll", Ll), ("Yh", Yh), ("Yl", Yl)]:
        assert np.all(np.isfinite(np.asarray(arr))), f"{name} not finite"
    # misc row 0 lanes 0-1 hold the dd half log-det (the only defined
    # cells — the rest of the buffer is uninitialized scratch)
    assert np.all(np.isfinite(np.asarray(misc)[0, :2])), "logdet not finite"
    # factor magnitudes bounded by the cap (would blow to inf unclamped)
    assert np.abs(np.asarray(Lh)).max() <= 1e3 + 1.0

    rh, rl = bk.pack_rhs(jnp.asarray(rng.normal(size=(d, 2))), d, bw)
    y = np.asarray(bk.unpack(
        bk.fwd_solve_fn(d, bw, interpret=True)(Lh, Ll, rh, rl), d, bw, 2))
    x = np.asarray(bk.unpack(
        bk.bwd_solve_fn(d, bw, interpret=True)(Lh, Ll, rh, rl), d, bw, 2))
    assert np.all(np.isfinite(y)) and np.all(np.isfinite(x))


def test_guarded_band_factor_healthy_bit_identity():
    """On a healthy equilibrated SPD band every guard (pivot clamp,
    |L| cap) is a conditional no-op: the factor must agree with
    numpy's Cholesky at full dd precision AND no clamp threshold may
    be anywhere near binding."""
    rng = np.random.default_rng(1)
    d, bw = 64, 3
    Amat, band = _spd_band(rng, d, bw)
    Lnp = np.linalg.cholesky(Amat)
    bh, bl = bk.pack_band(jnp.asarray(band), d, bw)
    z = jnp.zeros_like(bh)
    Lh, Ll, _, _, misc = bk.factor_fn(d, bw, interpret=True)(bh, bl, z, z)
    W, _ = bk.plan_rows(d, bw)
    Lrows = np.asarray(jnp.asarray(Lh, jnp.float64)
                       + jnp.asarray(Ll, jnp.float64))[W:W + d]
    for o in range(bw + 1):
        col = Lrows[:d - o, o] if o else Lrows[:, 0]
        np.testing.assert_allclose(col, np.diag(Lnp, -o), atol=1e-12)
    # clamp margins: pivots O(1) >> 1e-12 floor, |L| <= ~1 << 1e3 cap
    assert np.abs(Lrows[:, :bw + 1]).max() < 10.0
    hld = 0.5 * (float(misc[0, 0]) + float(misc[0, 1]))
    assert abs(hld - np.sum(np.log(np.diag(Lnp)))) < 1e-11


def test_chol_guarded_escalation():
    """block_tridiag.chol_guarded: healthy input -> BIT-IDENTICAL to the
    plain factorization (zero jitter, surrogate not taken); numerically
    indefinite -> finite via jitter; O(1)-indefinite -> finite via the
    diagonal surrogate."""
    rng = np.random.default_rng(2)
    s = 12
    M = rng.normal(size=(s, s))
    Apd = jnp.asarray(M @ M.T + s * np.eye(s))
    L_guard = np.asarray(bt.chol_guarded(Apd))
    L_plain = np.asarray(jnp.linalg.cholesky(Apd))
    assert np.array_equal(L_guard, L_plain)          # bitwise

    lam = np.linalg.eigvalsh(np.asarray(Apd))
    A_tiny = Apd - (lam.min() + 1e-9) * jnp.eye(s)   # numerically indef
    assert np.all(np.isfinite(np.asarray(bt.chol_guarded(A_tiny))))

    A_bad = np.asarray(Apd).copy()
    A_bad[3, 3] = -5.0                                # O(1) indefinite
    Lb = np.asarray(bt.chol_guarded(jnp.asarray(A_bad)))
    assert np.all(np.isfinite(Lb))
    # and under jit (the guards live inside compiled Laplace programs)
    Lj = np.asarray(jax.jit(bt.chol_guarded)(jnp.asarray(A_bad)))
    assert np.all(np.isfinite(Lj))


# --------------------------------------------------------------------
# fused s>1 optimizer: per-dispatch budget exhaustion -> host fallback
# --------------------------------------------------------------------

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


def test_opt_nd_budget_exhaustion_falls_back(monkeypatch):
    """Force a per-dispatch iteration budget far below what the s=3
    optimization needs: (a) the single-dispatch program must REPORT
    exhaustion and _aghq_fit_full_nd must return None (the round-14
    fallback contract, aghq.py), and (b) aghq_fit must still reach the
    same mode through the host segmentation loop that re-dispatches the
    bounded program."""
    ref_fit = A.aghq_fit(_two_term_backend(), k=3)   # default budget
    assert np.all(np.isfinite(ref_fit.mode))

    # the unconstrained optimization needs 21 BFGS iterations on this
    # model (measured); 10 per dispatch forces exhaustion on the first
    # dispatch while leaving the 6-restart host loop room to converge
    monkeypatch.setattr(A, "_OPT_ND_MAX_ITER", 10)
    be = _two_term_backend()
    s = be.n_theta
    # (a) direct single-dispatch call reports exhaustion -> None
    assert A._aghq_fit_full_nd(be, s, 3, None, None) is None

    # (b) end-to-end fit recovers via segmented dispatches. On this
    # model theta_1 sits on a flat sGP-precision ridge; the starved
    # segments may stop there with |g|~0.3 (the host loop's
    # no-progress break), which AGHQ is insensitive to by construction
    # (adaptation-only role, PARITY.md Group B) — so pin the INTEGRAL
    # tightly and the mode loosely.
    fit = A.aghq_fit(be, k=3)
    assert np.all(np.isfinite(fit.mode))
    np.testing.assert_allclose(fit.mode, ref_fit.mode, atol=0.5)
    np.testing.assert_allclose(fit.lognormconst, ref_fit.lognormconst,
                               atol=0.02)
