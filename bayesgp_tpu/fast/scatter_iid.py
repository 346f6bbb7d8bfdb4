"""Scattered large-q IID backend: diagonal-first Schur elimination.

Model class: ONE IWP driver smooth + fixed effects + ONE large IID
random effect whose levels are SCATTERED against the driver axis (each
level's observations span the x range — e.g. subject effects in a
longitudinal smooth). The merged-IID band path (fast/banded.py)
requires x-clustered levels; the dense arrow tail is O(n q + d q^2 +
q^3). The reference runs this regime through CHOLMOD's fill-reducing
sparse Cholesky (R/02_model_fit.R:276-284, IID P=I at
R/01_utility.R:214-219) — but for scattered couplings no ordering
bounds the fill, and the TPU-native answer is different:

The conditional Hessian in latent order (u | V' | t) is

    H = [[ D(diag),  K          ],          K = [C_vu^T  C_ut]
         [ K^T,      M(arrow)   ]]

with D = diag(per-level weight sums) + e^{theta_iid} I — DIAGONAL,
because an IID term's design is an indicator and its precision is the
identity. Eliminating u FIRST is exact and cheap, leaving an
(d + q_f)-dimensional DENSE Schur complement

    S = M - K^T D^{-1} K

factored by one dense Cholesky on the MXU. Every quantity the Laplace
machinery needs (log-det, solves, precision sampling) reduces to the
diagonal D plus dense (d+q_f) ops:

    log det H       = sum log D + 2 sum log diag chol(S)
    H z = g         : z_vt = S^{-1}(g_vt - K^T D^{-1} g_u),
                      z_u  = D^{-1}(g_u - K z_vt)
    x ~ N(0, H^-1)  : x_vt = L_S^{-T} z_vt,
                      x_u  = D^{-1/2} z_u - D^{-1} K x_vt

Cost: O(n) chunked one-hot MXU matmuls to form K (no scatter, no
gather: per-chunk (CH, q) indicator built from iota comparison), plus
O((d+q_f)^2 q) for the Schur product and O((d+q_f)^3) for the dense
factor — independent of how levels scatter. Memory O((d+q_f) q).

Reuses the FastIWPBackend core (fast/iwp.py) for every driver/tail
structure: eta, band/cross assembly, priors, the penalized tail
orthogonalization, mixed-precision segment sums. theta layout:
[theta_drv, theta_iid (+ theta_noise last for Gaussian)]; the core
sees [theta_drv (+ theta_noise)].
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..model import families
from ..linalg import block_tridiag as bt
from ..linalg import chol_dd
from .iwp import FastIWPBackend, build_fast_iwp, _JitCacheMixin

LOG2PI = math.log(2.0 * math.pi)


# --- dense-factor routing --------------------------------------------------
# XLA's native f64 cholesky/triangular-solve lower to per-column
# while-loops of emulated-f64 ops on TPU; at (dpad + qf) ~ 2000 the
# program CRASHES the v5-lite worker (CLAUDE.md fact 17 — the bigiid
# k=2000 + q=1e4 composite had no viable engine). Above the
# chol_dd.use_dd_dense threshold the factor/solves run the blocked
# double-float path instead: dd Pallas kernels for the sequential
# work, f64 MXU matmuls for the O(d^3) updates (linalg/chol_dd.py).

def _chol_dense(S):
    if chol_dd.use_dd_dense(S.dtype, S.shape[-1]):
        return chol_dd.cholesky_dd_f64(S)
    return bt.chol_guarded(S)


def _solve_L_dense(L, B):
    if chol_dd.use_dd_dense(L.dtype, L.shape[-1]):
        return chol_dd.solve_lower_blocked(L, B)
    return bt._solve_L(L, B)


def _solve_Lt_dense(L, B):
    if chol_dd.use_dd_dense(L.dtype, L.shape[-1]):
        return chol_dd.solve_lower_t_blocked(L, B)
    return bt._solve_Lt(L, B)


@dataclass
class IIDChunks:
    """Per-chunk windowed driver design + level codes, the operands of
    the one-hot cross products. Separate from the core's ChunkDesign:
    the core falls back to gathers when chunk windows exceed 64 columns,
    while the cross products tolerate wider windows (they are formed
    once per Hessian, not once per design product)."""
    D: Any          # (nc, CH, w) windowed driver design rows
    XF_rows: Any    # (nc, CH, qf) dense tail rows
    codes: Any      # (nc, CH) int32 level codes, q_iid on padding
    bases: Any      # (nc,) static np.int64 window starts
    nc: int
    CH: int
    w: int
    n: int
    # level-window compression: when codes are x-clustered (the
    # overdispersion pattern), each chunk touches only a narrow level
    # range [cbases[c], cbases[c] + qwin) — the one-hot then has qwin
    # columns instead of q (10-100x less HBM traffic per Hessian).
    # Scattered codes degenerate to qwin == q with cbases == 0.
    cbases: Any = None   # (nc,) static np.int64 level-window starts
    qwin: int = 0
    codes_rel: Any = None  # (nc, CH) int32 codes - cbases, qwin on pad


class _Unsupported(ValueError):
    pass


@dataclass
class ScatterIIDBackend(_JitCacheMixin):
    """FastIWPBackend core + scattered IID block. Protocol-compatible
    with the AGHQ/MCMC drivers (nll_warm/init_state/node_eval/
    laplace_eval_full/sample)."""
    supports_fused_1d = False      # always >= 2 hyperparameters
    supports_fused_nd = True       # generic nll_warm BFGS + nodes
    supports_fused_full_nd = False  # dense chol inside one giant
    #                                 program: unproven on-chip

    core: FastIWPBackend
    md: Any                 # FULL ModelData (includes the IID term)
    q_iid: int
    iid_theta: int          # index of the IID precision in full theta
    core_theta_idx: Any     # static np indices: full theta -> core theta
    codes: Any              # (n,) int32, core row order
    ick: IIDChunks
    logPdet_iid: float
    ref_perm: Any           # (w_ref,) identity here; kept for parity

    # ---------------- basic properties ----------------
    @property
    def n_theta(self):
        return self.md.n_theta

    @property
    def dtype(self):
        return self.core.dtype

    @property
    def compute_dtype(self):
        return self.core.compute_dtype

    @property
    def row_order(self):
        return self.core.row_order

    @property
    def em_dims(self):
        """Penalized dimension per theta: driver d, IID q, Gaussian n
        (see FastIWPBackend.em_dims)."""
        if self.md.family == -1 and getattr(self.md, "custom_family", ""):
            return None
        dims = np.zeros(self.n_theta)
        dims[0] = float(self.core.d)
        dims[self.iid_theta] = float(self.q_iid)
        if self.md.family == 0:
            dims[-1] = float(self.md.n)
        return dims

    def _theta_core(self, theta):
        return theta[np.asarray(self.core_theta_idx)]

    # ---------------- linear predictor ----------------
    def eta(self, Vp, u, tail):
        e = self.core.eta(Vp, tail)
        # level lookup: jnp.take compiles fine at O(n) (a single gather
        # pass, unlike per-iteration scatter-adds); clipped codes make
        # padding rows read level 0 harmlessly (their design is zero)
        return e + jnp.take(u.astype(e.dtype),
                            jnp.clip(self.codes, 0, self.q_iid - 1))

    # ---------------- one-hot cross products ----------------
    def _iid_products(self, wts):
        """(sw, C_vu, C_ut): per-level weight sums (q,), driver cross
        block (dpad, q), tail cross block (q, qf). ONE lax.scan over
        row chunks; the per-chunk indicator is built branch-free from
        an iota comparison (no scatter, no gather), and every product
        is a dense MXU matmul. Accumulation in solve dtype."""
        ick = self.ick
        sdt = self.dtype
        cdt = self.compute_dtype
        q = self.q_iid
        qw = ick.qwin or q
        lane = jax.lax.broadcasted_iota(jnp.int32, (ick.CH, qw), 1)
        nc_pad = ick.nc * ick.CH - ick.n
        wch = jnp.pad(wts, (0, nc_pad)).reshape(ick.nc, ick.CH)
        z32 = jnp.asarray(0, jnp.int32)

        def body(carry, inp):
            C_acc, T_acc, s_acc = carry
            Dc, Xc, crel, wc, base, cbase = inp
            oh = (crel[:, None] == lane).astype(cdt)     # (CH, qwin)
            woh = wc[:, None] * oh
            cb = jnp.einsum("nw,nq->wq", Dc, woh)        # (w, qwin) MXU
            C_acc = jax.lax.dynamic_update_slice(
                C_acc, jax.lax.dynamic_slice(
                    C_acc, (base, cbase), (ick.w, qw)) + cb.astype(sdt),
                (base, cbase))
            tb = jnp.einsum("nq,nf->qf", woh, Xc).astype(sdt)
            T_acc = jax.lax.dynamic_update_slice(
                T_acc, jax.lax.dynamic_slice(
                    T_acc, (cbase, z32), (qw, max(self.core.q, 1)))
                + tb, (cbase, z32))
            s_acc = jax.lax.dynamic_update_slice(
                s_acc, jax.lax.dynamic_slice(s_acc, (cbase,), (qw,))
                + (wc @ oh).astype(sdt), (cbase,))
            return (C_acc, T_acc, s_acc), None

        C0 = jnp.zeros((self.core.dpad + ick.w, q), sdt)
        T0 = jnp.zeros((q, max(self.core.q, 1)), sdt)
        s0 = jnp.zeros((q,), sdt)
        (C, T, sw), _ = jax.lax.scan(
            body, (C0, T0, s0),
            (ick.D, ick.XF_rows, ick.codes_rel, wch,
             jnp.asarray(np.asarray(ick.bases, np.int32)),
             jnp.asarray(np.asarray(ick.cbases, np.int32))))
        return sw, C[:self.core.dpad], T[:, :self.core.q]

    def _level_sums(self, r):
        """Ind^T r: per-level sums of a row vector (adjoint of the
        level lookup). Same windowed one-hot chunk scan."""
        ick = self.ick
        q = self.q_iid
        qw = ick.qwin or q
        lane = jax.lax.broadcasted_iota(jnp.int32, (ick.CH, qw), 1)
        pad = ick.nc * ick.CH - ick.n
        rch = jnp.pad(r, (0, pad)).reshape(ick.nc, ick.CH)

        def body(s_acc, inp):
            crel, rc, cbase = inp
            oh = (crel[:, None] == lane).astype(rc.dtype)
            return jax.lax.dynamic_update_slice(
                s_acc, jax.lax.dynamic_slice(s_acc, (cbase,), (qw,))
                + (rc @ oh).astype(self.dtype), (cbase,)), None

        s, _ = jax.lax.scan(
            body, jnp.zeros((q,), self.dtype),
            (ick.codes_rel, rch,
             jnp.asarray(np.asarray(ick.cbases, np.int32))))
        return s

    # ---------------- joint neg log posterior ----------------
    def _prior_neg(self, Vp, u, tail, theta):
        """Core driver/tail priors + hyperpriors for the core thetas,
        plus the IID prior and its hyperprior."""
        thc = self._theta_core(theta)
        base = self.core._prior_neg(Vp, tail, thc)
        th_i = theta[self.iid_theta]
        lp_iid = (0.5 * (self.q_iid * th_i + self.logPdet_iid)
                  - 0.5 * jnp.exp(th_i) * jnp.sum(u * u))
        phi = -jnp.log(self.md.alpha[self.iid_theta]) \
            / self.md.u[self.iid_theta]
        lpT = jnp.log(0.5 * phi) - phi * jnp.exp(-0.5 * th_i) - 0.5 * th_i
        return base - (lp_iid + lpT)

    def neg_log_post(self, Vp, u, tail, theta):
        e = self.eta(Vp, u, tail)
        thc = self._theta_core(theta)
        ll = families.log_lik(e, self.core.md,
                              thc.astype(self.compute_dtype))
        return -ll.astype(self.dtype) + self._prior_neg(Vp, u, tail, theta)

    def grad_W(self, Vp, u, tail, theta, eta=None):
        thc = self._theta_core(theta)
        e = self.eta(Vp, u, tail) if eta is None else eta
        th_c = thc.astype(self.compute_dtype)
        r = jax.grad(lambda ee: -families.log_lik(ee, self.core.md,
                                                  th_c))(e)
        gV, gt = self._core_grad_parts(Vp, tail, thc, r)
        gu = self._level_sums(r) + jnp.exp(theta[self.iid_theta]) * u
        return gV, gu, gt

    def _core_grad_parts(self, Vp, tail, thc, r):
        """FastIWPBackend.grad_W with the likelihood residual already
        computed on the FULL eta (the core would recompute it on the
        partial eta otherwise)."""
        c = self.core
        gV = c.Bt(r)
        lam = jnp.exp(thc[0])
        Vd = Vp[:c.d]
        pv = c._applyP(Vd)
        if c.q:
            pv = pv - c.PZ0 @ tail
        gV = gV.at[:c.d].add(lam * pv)
        if c.q:
            gt = ((c.XFpT @ r).astype(c.dtype)
                  + lam * (c.Z0PZ0 @ tail - c.PZ0.T @ Vd)
                  + c.prior_diag_tail * (tail - c.prior_mean_tail))
        else:
            gt = jnp.zeros((0,), c.dtype)
        return gV, gt

    # ---------------- Hessian: diag-first Schur ----------------
    def _band_to_dense(self, band):
        """(p+1, dpad) lower band -> symmetric dense (dpad, dpad).
        Built from iota masks + broadcasts — advanced-index scatter
        assembly compiles pathologically on TPU (CLAUDE.md gotcha)."""
        dpad = self.core.dpad
        ii = jax.lax.broadcasted_iota(jnp.int32, (dpad, dpad), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (dpad, dpad), 1)
        diff = ii - jj
        M = jnp.where(diff == 0, band[0][None, :], 0.0)
        for o in range(1, self.core.p + 1):
            # band[o, j] = H[j+o, j]: row i = j+o reads band[o, i-o];
            # cols shifted so the broadcast indexes column j
            lower = jnp.where(diff == o, band[o][None, :], 0.0)
            M = M + lower + lower.T
        return M.astype(band.dtype)

    def hessian_factor(self, Vp, u, tail, theta, eta=None):
        """(L_S, Dvec, Ks, su, svt): Jacobi-equilibrated diag-first
        factor. L_S = guarded dense Cholesky of the (dpad+qf) Schur
        complement; Ks the scaled u-coupling; su/svt the scales."""
        c = self.core
        thc = self._theta_core(theta)
        e = self.eta(Vp, u, tail) if eta is None else eta
        wts = families.eta_weights(e, self.core.md,
                                   thc.astype(self.compute_dtype))
        band = c.band_H(wts, thc)
        C_vt = c.C_block(wts, thc)
        if c.q:
            Htt = (c._gram64(c.XFpT * wts[None, :], c.XFpT)
                   + jnp.exp(thc[0]) * c.Z0PZ0
                   + jnp.diag(c.prior_diag_tail))
        else:
            Htt = jnp.zeros((0, 0), self.dtype)
        sw, C_vu, C_ut = self._iid_products(wts)
        Dvec = sw + jnp.exp(theta[self.iid_theta])

        # Jacobi equilibration (unit diagonal)
        su = jax.lax.rsqrt(Dvec)
        sc = jax.lax.rsqrt(band[0])
        sd = (jax.lax.rsqrt(jnp.diagonal(Htt)) if c.q
              else jnp.zeros((0,), self.dtype))
        svt = jnp.concatenate([sc, sd])

        Mvv = self._band_to_dense(band) * sc[:, None] * sc[None, :]
        Mvt = C_vt * sc[:, None] * sd[None, :]
        Mtt = Htt * sd[:, None] * sd[None, :]
        M = jnp.block([[Mvv, Mvt], [Mvt.T, Mtt]])
        Ks = jnp.concatenate(
            [C_vu.T * sc[None, :], C_ut * sd[None, :]],
            axis=1) * su[:, None]                        # (q, dpad+qf)
        # Schur product: the q-axis contraction is the heavy op at
        # large q — (2009, 1e4) x (1e4, 2009) is ~80 GFLOP, which the
        # emulated f64 matmul runs at ~0.5 TFLOP/s (~160 ms PER NEWTON
        # ITERATION at bigiid scale; a 60-iteration BFGS dispatch then
        # blows the tunnel RPC deadline and kills the worker —
        # tools/crash_ladder.py re-framing). Route through the
        # split-f32 two-level accumulator (~1e-8 absolute on the
        # unit-equilibrated entries, f32 MXU speed); the equilibrated
        # Schur pivots are guarded downstream, and 1e-8 in S is far
        # below the f32 likelihood noise floor of this backend. CPU
        # keeps the exact f64 matmul (parity tests bit-preserved).
        if jax.default_backend() == "tpu":
            from ..linalg.band_arrow import acc_dot_d
            KtK = acc_dot_d(Ks, Ks)
        else:
            KtK = Ks.T @ Ks
        S = M - KtK
        S = 0.5 * (S + S.T)
        L = _chol_dense(S)
        return L, Dvec, Ks, su, svt

    def half_logdet_H(self, factor):
        L, Dvec, _, su, svt = factor
        dj = jnp.abs(jnp.diagonal(L))
        dj = jnp.maximum(dj, jnp.asarray(1e-150, dj.dtype))
        return (0.5 * jnp.sum(jnp.log(Dvec)) + jnp.sum(jnp.log(dj))
                - jnp.sum(jnp.log(svt)))

    def solve_H(self, factor, gV, gu, gt):
        """H [zV; zu; zt] = [gV; gu; gt]."""
        L, Dvec, Ks, su, svt = factor
        gvt = jnp.concatenate([gV, gt]) * svt
        gus = gu * su
        rhs = gvt - Ks.T @ gus
        y = _solve_L_dense(L, rhs[:, None])
        zvt = _solve_Lt_dense(L, y)[:, 0]
        zus = gus - Ks @ zvt
        zvt = zvt * svt
        zu = zus * su
        dpad = self.core.dpad
        return zvt[:dpad], zu, zvt[dpad:]

    def sample_dev_H(self, factor, zv, zu, zt):
        """x = S~ L^{-T}-style draw with cov H^{-1} (see module doc)."""
        L, Dvec, Ks, su, svt = factor
        zvt = jnp.concatenate([zv, zt])
        xvt = _solve_Lt_dense(L, zvt[:, None])[:, 0]
        xu = zu * su - (Ks @ xvt) * su
        xvt = xvt * svt
        dpad = self.core.dpad
        return xvt[:dpad], xu, xvt[dpad:]

    def sample_multi_H(self, factor, Zv, Zu, Zt):
        """(dpad, M), (q, M), (qf, M) noise -> correlated draws."""
        L, Dvec, Ks, su, svt = factor
        Zvt = jnp.concatenate([Zv, Zt], axis=0)
        Xvt = _solve_Lt_dense(L, Zvt)
        Xu = Zu * su[:, None] - (Ks @ Xvt) * su[:, None]
        Xvt = Xvt * svt[:, None]
        dpad = self.core.dpad
        return Xvt[:dpad], Xu, Xvt[dpad:]

    # ---------------- Newton inner solver ----------------
    def newton_step(self, Vp, u, tail, theta, eta_cap=8.0):
        e0 = self.eta(Vp, u, tail)
        gV, gu, gt = self.grad_W(Vp, u, tail, theta, eta=e0)
        factor = self.hessian_factor(Vp, u, tail, theta, eta=e0)
        sV, su_, st = self.solve_H(factor, gV, gu, gt)
        sV = jnp.where(jnp.isfinite(sV), sV, 0.0)
        su_ = jnp.where(jnp.isfinite(su_), su_, 0.0)
        st = jnp.where(jnp.isfinite(st), st, 0.0)
        d_eta = self.eta(sV, su_, st)
        max_de = jnp.max(jnp.abs(d_eta))
        d_eta = jnp.where(jnp.isfinite(d_eta), d_eta, 0.0)
        alpha0 = jnp.minimum(1.0, eta_cap / jnp.maximum(max_de, 1e-30))
        cands = alpha0 * jnp.asarray([1.0, 0.3, 0.1, 0.03], self.dtype)
        alphas = jnp.concatenate([jnp.zeros((1,), self.dtype), cands])
        cdt = self.compute_dtype
        thc_c = self._theta_core(theta).astype(cdt)
        cmd = self.core.md
        etas = e0[None, :] - alphas[:, None].astype(cdt) * d_eta[None, :]
        lls = jax.vmap(lambda ee: families.log_lik(ee, cmd, thc_c))(etas)
        p_0 = self._prior_neg(Vp, u, tail, theta)
        p_p = self._prior_neg(Vp - sV, u - su_, tail - st, theta)
        p_m = self._prior_neg(Vp + sV, u + su_, tail + st, theta)
        c2 = 0.5 * (p_p + p_m) - p_0
        c1 = 0.5 * (p_p - p_m)
        fall = -lls.astype(self.dtype) + (p_0 + c1 * alphas
                                          + c2 * alphas ** 2)
        f0 = fall[0]
        fs = jnp.where(jnp.isnan(fall[1:]), jnp.inf, fall[1:])
        best = jnp.argmin(fs)
        eps_c = 1e-12 if cdt == jnp.float64 else 3e-7
        noise = eps_c * (1.0 + jnp.abs(f0))
        idx = jnp.argmax(fs <= fs[best] + noise)
        alpha = jnp.where(fs[best] <= f0 + noise, cands[idx],
                          0.01 * alpha0)
        smax = jnp.maximum(jnp.max(jnp.abs(sV)),
                           jnp.maximum(jnp.max(jnp.abs(su_)),
                                       jnp.max(jnp.abs(st))
                                       if self.core.q else 0.0))
        return (Vp - alpha * sV, u - alpha * su_, tail - alpha * st,
                smax)

    def init_state(self):
        return (jnp.zeros((self.core.dpad,), self.dtype),
                jnp.zeros((self.q_iid,), self.dtype),
                jnp.zeros((self.core.q,), self.dtype))

    def newton_solve(self, theta, max_iter=100, warm=None):
        if warm is None:
            V0, u0, t0 = self.init_state()
        else:
            V0, u0, t0 = warm
            ok = jnp.isfinite(jnp.sum(V0) + jnp.sum(u0) + jnp.sum(t0))
            V0 = jnp.where(ok, V0, 0.0)
            u0 = jnp.where(ok, u0, 0.0)
            t0 = jnp.where(ok, t0, 0.0)
        steptol = (1e-9 if self.compute_dtype == jnp.float64 else 3e-6)

        def cond(state):
            V, u, t, it, smax, best, since = state
            small = smax < steptol * (1.0 + jnp.max(jnp.abs(V)))
            stalled = since >= 10.0
            return jnp.logical_and(~(small | stalled), it < max_iter)

        def body(state):
            V, u, t, it, _, best, since = state
            V2, u2, t2, smax = self.newton_step(V, u, t, theta)
            improved = smax < 0.95 * best
            best2 = jnp.minimum(best, smax)
            since2 = jnp.where(improved, 0.0 * since, since + 1.0)
            return V2, u2, t2, it + 1, smax, best2, since2

        big = jnp.asarray(1e30, self.dtype) + 0.0 * V0[0]
        V, u, t, *_ = jax.lax.while_loop(
            cond, body, (V0, u0, t0, 0, big, big, 0.0 * big))
        return V, u, t

    def _refine(self, Vp, u, tail, theta, eta_cap=8.0):
        e0 = self.eta(Vp, u, tail)
        gV, gu, gt = self.grad_W(Vp, u, tail, theta, eta=e0)
        factor = self.hessian_factor(Vp, u, tail, theta, eta=e0)
        sV, su_, st = self.solve_H(factor, gV, gu, gt)
        sV = jnp.where(jnp.isfinite(sV), sV, 0.0)
        su_ = jnp.where(jnp.isfinite(su_), su_, 0.0)
        st = jnp.where(jnp.isfinite(st), st, 0.0)
        d_eta = self.eta(sV, su_, st)
        alpha = jnp.minimum(
            1.0, eta_cap / jnp.maximum(jnp.max(jnp.abs(d_eta)), 1e-30))
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        return Vp - alpha * sV, u - alpha * su_, tail - alpha * st

    def solve_W_star(self, theta, n_refine=1, warm=None):
        if warm is not None:
            warm = jax.lax.stop_gradient(warm)
        V, u, t = self.newton_solve(jax.lax.stop_gradient(theta),
                                    warm=warm)
        V, u, t = map(jax.lax.stop_gradient, (V, u, t))
        for _ in range(n_refine):
            V, u, t = self._refine(V, u, t, theta)
        return tuple(map(jax.lax.stop_gradient, (V, u, t)))

    # ---------------- Laplace value + implicit VJP ----------------
    @property
    def _w_count(self):
        return self.core.d + self.core.q + self.q_iid

    def _laplace_value(self, Vp, u, tail, theta):
        """AD-friendly Laplace value (recomputes the factor; XLA AD
        through the dense Cholesky replaces the band engine's Takahashi
        custom VJP)."""
        e0 = self.eta(Vp, u, tail)
        factor = self.hessian_factor(Vp, u, tail, theta, eta=e0)
        hld = self.half_logdet_H(factor)
        thc = self._theta_core(theta)
        ll = families.log_lik(e0, self.core.md,
                              thc.astype(self.compute_dtype))
        f = -ll.astype(self.dtype) + self._prior_neg(Vp, u, tail, theta)
        return (f + hld - 0.5 * self._w_count * LOG2PI
                - self.core.logdetT)

    def _laplace_value_direct(self, Vp, u, tail, theta, factor,
                              eta=None):
        e0 = self.eta(Vp, u, tail) if eta is None else eta
        thc = self._theta_core(theta)
        ll = families.log_lik(e0, self.core.md,
                              thc.astype(self.compute_dtype))
        f = -ll.astype(self.dtype) + self._prior_neg(Vp, u, tail, theta)
        return (f + self.half_logdet_H(factor)
                - 0.5 * self._w_count * LOG2PI - self.core.logdetT)

    def laplace_eval_full(self, theta, warm):
        V, u, t = self.solve_W_star(theta, warm=warm)
        e0 = self.eta(V, u, t)
        factor = self.hessian_factor(V, u, t, theta, eta=e0)
        val = self._laplace_value_direct(V, u, t, theta, factor, eta=e0)
        return val, (V, u, t), factor

    @property
    def _nll_custom(self):
        if hasattr(self, "_nll_cvjp"):
            return self._nll_cvjp

        @jax.custom_vjp
        def nll_fn(theta, warm):
            V, u, t = self.solve_W_star(theta, warm=warm)
            e0 = self.eta(V, u, t)
            factor = self.hessian_factor(V, u, t, theta, eta=e0)
            return self._laplace_value_direct(V, u, t, theta, factor,
                                              eta=e0), (V, u, t)

        def fwd(theta, warm):
            V, u, t = self.solve_W_star(theta, warm=warm)
            e0 = self.eta(V, u, t)
            factor = self.hessian_factor(V, u, t, theta, eta=e0)
            val = self._laplace_value_direct(V, u, t, theta, factor,
                                             eta=e0)
            return (val, (V, u, t)), (theta, V, u, t, factor)

        def bwd(res, cts):
            theta, V, u, t, factor = res
            ct_val = cts[0]
            gF = jax.grad(
                lambda V_, u_, t_, th_: self._laplace_value(
                    V_, u_, t_, th_), argnums=(0, 1, 2, 3))(V, u, t,
                                                            theta)
            _san = lambda x: jnp.where(jnp.isfinite(x), x,
                                       jnp.zeros_like(x))
            gF_V, gF_u, gF_t = _san(gF[0]), _san(gF[1]), _san(gF[2])
            vV, vu, vt = self.solve_H(factor, gF_V, gF_u, gF_t)
            vV, vu, vt = _san(vV), _san(vu), _san(vt)

            def gdotv(th):
                gV, gu, gt = self.grad_W(V, u, t, th)
                out = jnp.dot(gV, vV) + jnp.dot(gu, vu)
                if self.core.q:
                    out = out + jnp.dot(gt, vt)
                return out

            term2 = jax.grad(gdotv)(theta)
            dth = (gF[3] - term2) * ct_val
            return dth, jax.tree_util.tree_map(jnp.zeros_like,
                                               (V, u, t))

        nll_fn.defvjp(fwd, bwd)
        self._nll_cvjp = nll_fn
        return nll_fn

    def laplace_nll(self, theta, warm=None):
        val, state = self._nll_custom(
            theta, warm if warm is not None else self.init_state())
        return val, state

    def nll(self, theta):
        return self.laplace_nll(theta)[0]

    def nll_warm(self, theta, warm):
        return self.laplace_nll(theta, warm=warm)

    # ---------------- AGHQ node + sampling protocol ----------------
    def node_eval(self, thetas, warm=None):
        if not hasattr(self, "_node_eval_fn"):
            def one(th, wm):
                nll, st, factor = self.laplace_eval_full(th, wm)
                return nll, st + (factor,)

            self._node_eval_fn = jax.jit(one)
        if warm is None:
            warm = self.init_state()
        outs = [self._node_eval_fn(thetas[j], warm)
                for j in range(thetas.shape[0])]
        nlls = jnp.stack([o[0] for o in outs])
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[o[1] for o in outs])
        return nlls, states

    def node_pack(self, st, factor):
        """Packed per-node sampling state for the fused node programs
        (aghq._node_eval_packed): 3-part latent + factor."""
        return st + (factor,)

    def hess_warm_fn(self):
        """Outer Hessian by central differences of the exact implicit
        gradient (the dd dense factor's custom VJP blocks forward-mode
        AD — same contract as FastIWPBackend.hess_warm_fn). Columns
        dispatch from the HOST (2s separate grad calls): at bigiid
        scale one grad eval costs seconds, and bundling 2s of them in
        one program is exactly the long-dispatch class that kills the
        worker (tools/bigiid_bisect.py)."""
        if not hasattr(self, "_hessw"):
            grad_fn = jax.jit(jax.grad(
                lambda th, st: self.nll_warm(th, st)[0]))

            def hess(theta, st):
                s = theta.shape[0]
                h = 1e-4 if self.compute_dtype == jnp.float64 else 0.3
                eye = np.eye(s)
                cols = []
                for i in range(s):
                    ei = jnp.asarray(h * eye[i], theta.dtype)
                    gp = grad_fn(theta + ei, st)
                    gm = grad_fn(theta - ei, st)
                    cols.append(np.asarray(jax.device_get(
                        (gp - gm))) / (2 * h))
                H = np.stack(cols)
                return 0.5 * (H + H.T)

            self._hessw = hess
        return self._hessw

    def sample_traceable(self, key, states, idx, M):
        """(M, w_ref) f32 posterior draws in reference order
        [U_drv | u_iid | betas | fixed] (which IS this backend's
        natural order)."""
        V, u, t, factor = states
        J = jax.tree_util.tree_leaves(factor)[0].shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        Zv = jax.random.normal(k1, (self.core.dpad, M), self.dtype)
        Zu = jax.random.normal(k2, (self.q_iid, M), self.dtype)
        Zt = jax.random.normal(k3, (self.core.q, M), self.dtype)
        outs = [self.sample_multi_H(
            jax.tree_util.tree_map(lambda x: x[j], factor), Zv, Zu, Zt)
            for j in range(J)]
        xvs = jnp.stack([o[0] for o in outs])
        xus = jnp.stack([o[1] for o in outs])
        xts = jnp.stack([o[2] for o in outs])
        m_ar = jnp.arange(M)
        Vs = V[idx] + xvs[idx, :, m_ar]
        us = u[idx] + xus[idx, :, m_ar]
        ts = t[idx] + xts[idx, :, m_ar]
        Vact = jax.vmap(self.core.to_V)(Vs, ts)
        U = self.core.apply_T(Vact[:, :self.core.d])
        full = jnp.concatenate([U, us, ts], axis=1)
        return full.astype(jnp.float32)

    def sample(self, key, states, idx, M):
        if not hasattr(self, "_sample_jit"):
            self._sample_jit = jax.jit(self.sample_traceable,
                                       static_argnums=(3,))
        samps = self._sample_jit(key, states, idx, M)
        return np.asarray(samps, np.float64).T

    # ---- lifted fused programs (inference/aghq._lifted_jit) ----
    # Without these, every O(n) array here (ick.D windowed design,
    # ick.XF_rows, codes) embeds as a closure CONSTANT in the fused
    # s>1 programs — at n=1e5 that is tens of MB of StableHLO and a
    # pathological server-side XLA compile through the tunnel (same
    # failure measured for the dense CoxPH program, round 15).
    # ick.bases/cbases stay host: they are np.asarray'd at trace time.
    def device_args(self):
        from .iwp import backend_device_args
        out = {"core_" + k: v
               for k, v in backend_device_args(self.core).items()}
        for f in ("D", "XF_rows", "codes_rel"):
            v = getattr(self.ick, f, None)
            if v is not None and np.ndim(v) >= 1 and np.size(v) > 1:
                out["ick_" + f] = v
        out["codes"] = self.codes
        return out

    def rebind(self, arrs):
        import dataclasses as _dcs
        from .iwp import backend_rebind
        core = backend_rebind(
            self.core, {k[5:]: v for k, v in arrs.items()
                        if k.startswith("core_")})
        ick_kw = {k[4:]: arrs[k] for k in arrs if k.startswith("ick_")}
        ick = _dcs.replace(self.ick, **ick_kw) if ick_kw else self.ick
        return _dcs.replace(self, core=core, ick=ick,
                            codes=arrs.get("codes", self.codes))


def build_scatter_iid(instances, md, design_mat_fixed, bf_prec, bf_mean,
                      dtype=None, max_window=512):
    """Construct a ScatterIIDBackend.

    instances: exactly [one IWP driver, one lazy IID term] in any
    order; md: the FULL ModelData (both terms); design_mat_fixed: fixed
    columns. Raises _Unsupported (a ValueError) when the model shape
    doesn't fit, so callers can fall through to other engines.
    """
    from ..model import build as B

    kinds = [t.kind for t in instances]
    if sorted(kinds) != ["IID", "IWP"]:
        raise _Unsupported("scatter_iid engine needs exactly one IWP "
                           "driver + one IID term")
    drv_i = kinds.index("IWP")
    iid_i = kinds.index("IID")
    drv = instances[drv_i]
    t_iid = instances[iid_i]
    if t_iid.extra is None or "codes" not in t_iid.extra:
        raise _Unsupported("IID term carries no level codes")
    if np.asarray(drv.knots).min() < 0:
        raise _Unsupported("scatter_iid needs nonnegative driver knots")

    q_iid = len(t_iid.levels)
    codes_raw = np.asarray(t_iid.extra["codes"], np.int64)

    # core model: driver + fixed only. Same y/likelihood arrays; prior
    # metadata trimmed to the driver (+ Gaussian noise) thetas.
    n_theta_full = md.n_theta
    keep = [i for i in range(n_theta_full) if i != iid_i]
    iid_theta = iid_i          # per-term thetas come first, in order
    core_md = dataclasses.replace(
        md,
        logPdet=np.asarray([np.asarray(md.logPdet)[drv_i]]),
        u=np.asarray(md.u)[keep], alpha=np.asarray(md.alpha)[keep],
        P_blocks=(), d_sizes=(drv.num_basis,),
        x_sizes=(drv.X.shape[1],))

    xf_dense = np.concatenate([drv.X] + list(design_mat_fixed), axis=1)
    n_fix = sum(x.shape[1] for x in design_mat_fixed)
    nb_cols = drv.X.shape[1]
    prior_diag_tail = np.concatenate([
        np.repeat(np.asarray(md.betaprec)[drv_i]
                  if np.ndim(md.betaprec) else md.betaprec, nb_cols)
        if nb_cols else np.zeros(0),
        np.asarray(bf_prec, np.float64)])
    prior_mean_tail = np.concatenate([
        np.repeat(np.asarray(md.betamean)[drv_i]
                  if np.ndim(md.betamean) else md.betamean, nb_cols)
        if nb_cols else np.zeros(0),
        np.asarray(bf_mean, np.float64)])

    core = build_fast_iwp(drv, core_md, xf_dense, prior_diag_tail,
                          prior_mean_tail, drv.x_data, dtype=dtype)
    codes = codes_raw[core.row_order]

    # ---- per-chunk windowed design for the cross products ----
    from ..basis import reparam as _rp
    vals, start = _rp.sparse_rows(drv.x_data, np.asarray(drv.knots,
                                                         np.float64),
                                  drv.order)
    vals = vals[core.row_order]
    start = start[core.row_order]
    n = len(start)
    cdt = core.compute_dtype
    CH = int(min(1024, max(128, 1 << int(np.ceil(np.log2(max(n // 8,
                                                             1)))))))
    nc = -(-n // CH)
    p = drv.order
    bases, wmax = [], 0
    for c in range(nc):
        lo, hi = c * CH, min((c + 1) * CH, n)
        b = int(start[lo])
        wmax = max(wmax, int(start[hi - 1]) - b + p + 1)
        bases.append(b)
    w_win = max(8, -(-wmax // 8) * 8)
    if w_win > max_window:
        raise _Unsupported(
            f"scatter_iid chunk window {w_win} exceeds {max_window}: "
            "x values are too clustered for the chunked cross products")
    D = np.zeros((nc, CH, w_win), cdt)
    rows_i = np.arange(n)
    rel = start - np.asarray(bases, np.int64)[rows_i // CH]
    for a in range(p + 1):
        D[rows_i // CH, rows_i % CH, rel + a] = vals[:, a]
    qf = core.q
    XFp = np.asarray(core.XFpT).T          # (n, qf), already row-sorted
    XF_rows = np.zeros((nc, CH, max(qf, 1)), cdt)
    if qf:
        XF_rows[rows_i // CH, rows_i % CH, :] = XFp
    codes_ch = np.full((nc, CH), q_iid, np.int32)   # padding -> no match
    codes_ch[rows_i // CH, rows_i % CH] = codes

    # level-window compression: per-chunk code range. x-clustered codes
    # (the overdispersion pattern) give qwin ~ q*CH/n + spread, so the
    # one-hot shrinks from (CH, q) to (CH, qwin); scattered codes
    # degenerate to qwin = q (cbases = 0) with identical semantics.
    cbases = np.zeros(nc, np.int64)
    qwin = 0
    for c in range(nc):
        cc = codes_ch[c][codes_ch[c] < q_iid]
        if len(cc):
            cbases[c] = int(cc.min())
            qwin = max(qwin, int(cc.max()) - int(cc.min()) + 1)
    qwin = max(8, min(q_iid, -(-qwin // 8) * 8))
    cbases = np.minimum(cbases, max(q_iid - qwin, 0))
    rel = codes_ch.astype(np.int64) - cbases[:, None]
    rel = np.where((rel < 0) | (rel >= qwin), qwin, rel)
    ick = IIDChunks(D=jnp.asarray(D), XF_rows=jnp.asarray(XF_rows),
                    codes=jnp.asarray(codes_ch),
                    bases=np.asarray(bases, np.int64),
                    nc=nc, CH=CH, w=w_win, n=n,
                    cbases=cbases, qwin=qwin,
                    codes_rel=jnp.asarray(rel, np.int32))

    w_ref = sum(md.d_sizes) + sum(md.x_sizes) + md.xf_count
    be = ScatterIIDBackend(
        core=core, md=md, q_iid=q_iid, iid_theta=iid_theta,
        core_theta_idx=np.asarray(keep, np.int64),
        codes=jnp.asarray(codes, np.int32), ick=ick,
        logPdet_iid=float(np.asarray(md.logPdet)[iid_i]),
        ref_perm=np.arange(w_ref))
    # Heavy-per-eval regime (bigiid scale): one outer eval is a Newton
    # chain of dense Schur assemblies costing SECONDS — run the outer
    # BFGS as per-eval dispatches (prefer_host_opt). Measured
    # (tools/bigiid_bisect.py, d+qf=2051, q=1e4): nll / grad / newton
    # single-eval programs all pass on-chip; the 16-eval fused optnd
    # dispatch faults the worker mid-dispatch. Per-eval dispatch
    # overhead (~30 ms) is noise at these eval costs.
    if q_iid * max(core.dpad + core.q, 1) > 4_000_000:
        be.prefer_host_opt = True
        be.opt_nd_max_iter = 16      # belt-and-braces if fused is forced
    return be
