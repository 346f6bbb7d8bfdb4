"""Multi-replicate (lane-packed) fast IWP backend: R fits in ONE program.

Batched counterpart of fast/iwp.FastIWPBackend for R replicate
responses on the SAME design — the per-chip engine of BASELINE.json's
stretch configuration. Where `parallel/replicates.py` runs one fused
fit per replicate under `lax.map` (sequential: each fit's band
factorization is a latency-bound recurrence), this backend carries a
leading replicate axis through every O(n) data pass (batched MXU
matmuls) and factors/solves ALL replicates in one lane-packed Pallas
kernel pass (linalg/band_batched.py, ~6% -> ~full lane utilization at
the headline bandwidth). The reference's only analogue is one PSOCK
process per replicate (R/02_model_fit.R:754-769).

Scope (asserted at build): single-IWP models with the chunked MXU
design, ONE hyperparameter (elementwise Poisson/Binomial families —
Gaussian adds the noise theta and the s>1 path), R <= 128/G lane
groups. Mixed precision identical to the scalar backend: O(n) work in
compute_dtype (f32 on TPU), O(d) solver state in float64.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..linalg import band_batched as bb
from ..linalg.band_arrow_batched import PallasBatchedEngine
from ..linalg import band_arrow
from ..linalg import block_tridiag as btl

LOG2PI = math.log(2.0 * math.pi)


class BlockVmapEngine:
    """CPU/f64 fallback: vmap over the block-tridiagonal scan engine
    (vmapping the scan path is fine off-TPU; the TPU worker fault is
    specific to the on-chip kernels, CLAUDE.md fact 4)."""

    def __init__(self, d: int, bw: int, q: int, s: int):
        self.inner = band_arrow.BlockEngine(d, bw, q, s)

    def factor(self, bands, C, Hd):
        return jax.vmap(self.inner.factor)(bands, C, Hd)

    def half_logdet(self, f):
        return jax.vmap(self.inner.half_logdet)(f)

    def solve(self, f, rb, rd):
        return jax.vmap(self.inner.solve)(f, rb, rd)

    def arrow_half_logdet(self, bands, C, Hd):
        return jax.vmap(self.inner.arrow_half_logdet)(bands, C, Hd)

    def arrow_half_logdet_given(self, bands, C, Hd, f):
        return jax.vmap(self.inner.arrow_half_logdet)(bands, C, Hd)


@dataclass
class BatchedFastIWP:
    """R-replicate view of a FastIWPBackend (shared static design).

    All latent state carries a leading replicate axis: V (R, dpad),
    tail (R, q), theta (R,). Method semantics mirror fast/iwp.py
    one-to-one; see the scalar docstrings for the numerical-design
    rationale (two-level precision, equilibration, orthogonalized
    tail)."""
    base: Any              # FastIWPBackend
    Y: Any                 # (R, n) responses, INTERNAL row order, f32
    ll_const: Any          # (R,) response-only loglik constant
    engine: Any            # PallasBatchedEngine | BlockVmapEngine
    R: int

    # -- statics forwarded from the base --------------------------------
    @property
    def d(self):
        return self.base.d

    @property
    def dpad(self):
        return self.base.dpad

    @property
    def p(self):
        return self.base.p

    @property
    def q(self):
        return self.base.q

    @property
    def dtype(self):
        return self.base.dtype

    @property
    def compute_dtype(self):
        return self.base.compute_dtype

    @property
    def md(self):
        return self.base.md

    # -- batched family kernels (elementwise families only) -------------
    def _loglik(self, e):
        """(R, n) eta -> (R,) log-likelihoods."""
        fam = self.md.family
        if fam == 1:
            return jnp.sum(self.Y * e - jnp.exp(e), axis=1) + self.ll_const
        if fam == 2:
            size = self.md.size.astype(e.dtype)
            return (jnp.sum(self.Y * e - size[None] * jax.nn.softplus(e),
                            axis=1) + self.ll_const)
        raise ValueError(f"batched path: family {fam} unsupported")

    def _dneg(self, e):
        """d(-loglik)/d eta, (R, n)."""
        fam = self.md.family
        if fam == 1:
            return jnp.exp(e) - self.Y
        size = self.md.size.astype(e.dtype)
        return size[None] * jax.nn.sigmoid(e) - self.Y

    def _wts(self, e):
        fam = self.md.family
        if fam == 1:
            return jnp.exp(e)
        size = self.md.size.astype(e.dtype)
        pr = jax.nn.sigmoid(e)
        return size[None] * pr * (1.0 - pr)

    # -- O(n) design passes, replicate-batched ---------------------------
    def _v_windows(self, Vc):
        """(R, dpad + w) -> (R, nc, w) per-chunk windows."""
        ck = self.base.chunks
        return jnp.stack([
            jax.lax.dynamic_slice_in_dim(Vc, int(b), ck.w, axis=1)
            for b in ck.bases], axis=1)

    def eta(self, Vp, tail):
        ck = self.base.chunks
        cd = self.compute_dtype
        Vc = Vp.astype(cd)
        Vw = self._v_windows(jnp.pad(Vc, ((0, 0), (0, ck.w))))
        e = jnp.einsum("cnw,rcw->rcn", ck.D, Vw).reshape(self.R, -1)[
            :, :ck.n]
        if self.q:
            e = e + tail.astype(cd) @ self.base.XFpT
        return e

    def _rows_chunked(self, u):
        """(R, n) -> (R, nc, CH)."""
        ck = self.base.chunks
        pad = ck.nc * ck.CH - ck.n
        return jnp.pad(u, ((0, 0), (0, pad))).reshape(self.R, ck.nc, ck.CH)

    def Bt(self, u):
        """(R, n) -> (R, dpad) in solve_dtype."""
        ck = self.base.chunks
        uc = self._rows_chunked(u)
        contrib = jnp.einsum("cnw,rcn->crw", ck.D, uc)     # (nc, R, w) f32
        out = ck.overlap_add(contrib.astype(self.dtype),
                             self.dpad + ck.w)
        return out[:, :self.dpad]

    def band_H(self, wts, theta):
        """(R, n) weights -> (R, p+1, dpad) lower bands.

        Per-offset formulation: band diagonal o of the chunk Gram is
        sum_n w_rn D[n, j+o] D[n, j] — the shifted products D*shift(D, o)
        are REPLICATE-SHARED (p+1 arrays of the design's size), so the
        contraction against the (R, nc, CH) weights avoids both the
        (R, nc, CH, w) weighted-design intermediate (~R x the design in
        HBM) and the off-band 7/8 of a full (w, w) Gram."""
        base, ck, p = self.base, self.base.chunks, self.p
        wc = self._rows_chunked(wts)
        pieces = []
        for o in range(p + 1):
            Po = ck.D[:, :, o:] * ck.D[:, :, :ck.w - o]    # (nc, CH, w-o)
            dg = jnp.einsum("rcn,cnw->rcw", wc, Po)        # f32 MXU
            pieces.append(jnp.pad(dg.astype(self.dtype),
                                  ((0, 0), (0, 0), (0, o))))
        piece = jnp.stack(pieces, axis=2)                  # (R, nc, p+1, w)
        piece = jnp.moveaxis(piece, 1, 0)                  # (nc, R, p+1, w)
        band = ck.overlap_add(piece, self.dpad + ck.w)[..., :self.dpad]
        lam = jnp.exp(theta).astype(self.dtype)            # (R,)
        band = band.at[:, :, :self.d].add(
            lam[:, None, None] * base.P_band[None])
        if self.dpad > self.d:
            band = band.at[:, 0, self.d:].set(1.0)
        return band

    def C_block(self, wts, theta):
        """(R, dpad, q) cross blocks."""
        base, ck = self.base, self.base.chunks
        if not self.q:
            return jnp.zeros((self.R, self.dpad, 0), self.dtype)
        wc = self._rows_chunked(wts)
        WX = wc[:, :, :, None] * ck.XFp_rows[None]         # (R, nc, CH, q)
        CC = jnp.einsum("cnw,rcnq->rcqw", ck.D, WX)
        C64 = jnp.moveaxis(CC.astype(self.dtype), 1, 0)    # (nc, R, q, w)
        C = ck.overlap_add(C64, self.dpad + ck.w)[..., :self.dpad]
        C = jnp.swapaxes(C, 1, 2)                          # (R, dpad, q)
        lam = jnp.exp(theta).astype(self.dtype)
        C = C.at[:, :self.d].add(-lam[:, None, None] * base.PZ0[None])
        return C

    def _gram64_w(self, wts):
        """XFp^T diag(w_r) XFp -> (R, q, q) via chunked f32 partials."""
        base = self.base
        ch = base._CHUNK
        q, n = base.XFpT.shape
        nc = -(-n // ch)
        pad = nc * ch - n
        X = jnp.pad(base.XFpT, ((0, 0), (0, pad))).reshape(q, nc, ch)
        Wr = jnp.pad(wts, ((0, 0), (0, pad))).reshape(self.R, nc, ch)
        # (nc, q, ch) x (R, nc, ch) -> per-chunk (nc, R, q, q)
        Xc = jnp.swapaxes(X, 0, 1)                         # (nc, q, ch)
        WX = Wr[:, :, None, :] * Xc[None]                  # (R, nc, q, ch)
        partial = jnp.einsum("cqn,rcpn->rcqp", Xc, WX)
        return jnp.sum(partial.astype(self.dtype), axis=1)

    # -- prior pieces -----------------------------------------------------
    def prior_quad_V(self, V):
        base = self.base
        d = self.d
        qd = base.P_band[0, :d][None] * V[:, :d] ** 2
        total = jnp.sum(qd, axis=1)
        for o in range(1, self.p + 1):
            total = total + 2.0 * jnp.sum(
                base.P_band[o, :d - o][None] * V[:, o:d] * V[:, :d - o],
                axis=1)
        return total

    def _applyP(self, Vd):
        base = self.base
        pv = base.P_band[0, :self.d][None] * Vd
        for o in range(1, self.p + 1):
            pv = pv.at[:, o:].add(base.P_band[o, :self.d - o][None]
                                  * Vd[:, :-o])
            pv = pv.at[:, :-o].add(base.P_band[o, :self.d - o][None]
                                   * Vd[:, o:])
        return pv

    def _prior_neg(self, Vp, tail, theta):
        """(R,) negative log prior (+ hyperprior)."""
        base, md = self.base, self.md
        Vd = Vp[:, :self.d]
        quad = self.prior_quad_V(Vp)
        if self.q:
            quad = quad - 2.0 * jnp.sum(tail * (Vd @ base.PZ0), axis=1)
            quad = quad + jnp.sum(tail * (tail @ base.Z0PZ0.T), axis=1)
        lam = jnp.exp(theta)
        lp = -0.5 * lam * quad + 0.5 * (self.d * theta + md.logPdet[0])
        if self.q:
            dt = tail - base.prior_mean_tail[None]
            lp = lp - 0.5 * jnp.sum(base.prior_diag_tail[None] * dt ** 2,
                                    axis=1)
        phi = -jnp.log(md.alpha) / md.u
        lpT = jnp.sum(jnp.log(0.5 * phi)) - jnp.sum(phi) \
            * jnp.exp(-0.5 * theta) - 0.5 * theta
        return -(lp + lpT)

    def neg_log_post(self, Vp, tail, theta):
        e = self.eta(Vp, tail)
        return -self._loglik(e).astype(self.dtype) \
            + self._prior_neg(Vp, tail, theta)

    def grad_W(self, Vp, tail, theta, eta=None):
        base = self.base
        e = self.eta(Vp, tail) if eta is None else eta
        r = self._dneg(e)
        gV = self.Bt(r)
        lam = jnp.exp(theta).astype(self.dtype)
        Vd = Vp[:, :self.d]
        pv = self._applyP(Vd)
        if self.q:
            pv = pv - tail @ base.PZ0.T
        gV = gV.at[:, :self.d].add(lam[:, None] * pv)
        if self.q:
            gt = ((r @ base.XFpT.T).astype(self.dtype)
                  + lam[:, None] * (tail @ base.Z0PZ0.T - Vd @ base.PZ0)
                  + base.prior_diag_tail[None]
                  * (tail - base.prior_mean_tail[None]))
        else:
            gt = jnp.zeros((self.R, 0), self.dtype)
        return gV, gt

    # -- assembly / factorization ----------------------------------------
    def _assemble_scaled(self, V, tail, theta, eta=None):
        base = self.base
        e = self.eta(V, tail) if eta is None else eta
        wts = self._wts(e)
        band = self.band_H(wts, theta)
        C = self.C_block(wts, theta)
        if self.q:
            lam = jnp.exp(theta).astype(self.dtype)
            Hd = (self._gram64_w(wts)
                  + lam[:, None, None] * base.Z0PZ0[None]
                  + jnp.diag(base.prior_diag_tail)[None])
            sd = jax.lax.rsqrt(jnp.diagonal(Hd, axis1=1, axis2=2))
            Hd = Hd * sd[:, :, None] * sd[:, None, :]
        else:
            Hd = jnp.zeros((self.R, 0, 0), V.dtype)
            sd = jnp.zeros((self.R, 0), V.dtype)
        sc = jax.lax.rsqrt(band[:, 0])                      # (R, dpad)
        band_s = band.at[:, 0].multiply(sc * sc)
        for o in range(1, self.p + 1):
            band_s = band_s.at[:, o, :self.dpad - o].multiply(
                sc[:, o:] * sc[:, :self.dpad - o])
        C_s = (C * sc[:, :, None] * sd[:, None, :]) if self.q else C
        return band_s, C_s, Hd, sc, sd

    def hessian_factor(self, V, tail, theta, eta=None):
        band_s, C_s, Hd, sc, sd = self._assemble_scaled(V, tail, theta,
                                                        eta=eta)
        af = self.engine.factor(band_s, C_s, Hd)
        return af, sc, sd

    def solve_H(self, factor, gV, gt):
        af, sc, sd = factor
        zb, zd = self.engine.solve(af, gV * sc, gt * sd)
        return zb * sc, zd * sd

    def half_logdet_H(self, factor):
        af, sc, sd = factor
        return (self.engine.half_logdet(af)
                - jnp.sum(jnp.log(sc), axis=1)
                - jnp.sum(jnp.log(sd), axis=1))

    # -- Newton -----------------------------------------------------------
    def newton_step(self, V, tail, theta, eta_cap=8.0):
        """Batched version of fast/iwp.newton_step: per-replicate capped
        steps + branchless 4-candidate backtracking on ONE (5, R, n)
        likelihood pass; see the scalar docstring for the rationale."""
        e0 = self.eta(V, tail)
        gV, gt = self.grad_W(V, tail, theta, eta=e0)
        factor = self.hessian_factor(V, tail, theta, eta=e0)
        step_V, step_t = self.solve_H(factor, gV, gt)
        # zero non-finite step entries per slot (0 * inf = NaN is
        # ABSORBING through warm chains — see fast/banded.newton_step);
        # raw max_de keeps overflowed eta directions forcing alpha -> 0
        step_V = jnp.where(jnp.isfinite(step_V), step_V, 0.0)
        step_t = jnp.where(jnp.isfinite(step_t), step_t, 0.0)
        d_eta = self.eta(step_V, step_t)
        max_de = jnp.max(jnp.abs(d_eta), axis=1)            # (R,)
        d_eta = jnp.where(jnp.isfinite(d_eta), d_eta, 0.0)
        alpha0 = jnp.minimum(1.0, eta_cap / jnp.maximum(max_de, 1e-30))
        cands = alpha0[None, :] * jnp.asarray(
            [1.0, 0.3, 0.1, 0.03], self.dtype)[:, None]     # (4, R)
        alphas = jnp.concatenate([jnp.zeros((1, self.R), self.dtype),
                                  cands])                   # (5, R)
        cd = self.compute_dtype
        etas = e0[None] - alphas[:, :, None].astype(cd) * d_eta[None]
        lls = jnp.stack([self._loglik(etas[i]) for i in range(5)])
        p_0 = self._prior_neg(V, tail, theta)
        p_p = self._prior_neg(V - step_V, tail - step_t, theta)
        p_m = self._prior_neg(V + step_V, tail + step_t, theta)
        c2 = 0.5 * (p_p + p_m) - p_0
        c1 = 0.5 * (p_p - p_m)
        fall = -lls.astype(self.dtype) + (p_0[None] + c1[None] * alphas
                                          + c2[None] * alphas ** 2)
        f0 = fall[0]                                        # (R,)
        fs = jnp.where(jnp.isnan(fall[1:]), jnp.inf, fall[1:])  # (4, R)
        fbest = jnp.min(fs, axis=0)
        eps_c = 1e-12 if self.compute_dtype == jnp.float64 else 3e-7
        noise = eps_c * (1.0 + jnp.abs(f0))
        # largest alpha within noise of the best (scalar kernel logic)
        okc = fs <= fbest[None] + noise[None]
        idx = jnp.argmax(okc, axis=0)                       # (R,)
        cand_alpha = jnp.take_along_axis(cands, idx[None], axis=0)[0]
        alpha = jnp.where(fbest <= f0 + noise, cand_alpha, 0.01 * alpha0)
        smax = jnp.max(jnp.abs(step_V), axis=1)
        if self.q:
            smax = jnp.maximum(smax, jnp.max(jnp.abs(step_t), axis=1))
        return (V - alpha[:, None] * step_V,
                tail - alpha[:, None] * step_t, smax)

    # stall cutoff of newton_solve: a slot whose step norm hasn't beaten
    # 0.95x its historical best for 10 consecutive iterations has hit
    # its f32 noise floor and exits the convergence condition. Without
    # this, ONE noise-floor-limited slot holds the whole batch at
    # max_iter: measured on-chip at headline scale (n=1e5, d=2009), a
    # lane slot at theta=20 stalls at relative step 7.5e-5 (> steptol
    # 3e-6) while the other 7 converge in 7 iterations — the ladder's
    # pass-0 then burned 100 batched steps (~0.9 s of the 1.9 s
    # regression, bench round 11). Converged slots are unaffected and
    # f64 runs (everything reaches steptol) are bit-identical.
    _STALL_WINDOW = 10
    _STALL_FACTOR = 0.95

    def newton_solve(self, theta, max_iter=100, warm=None):
        if warm is None:
            V0, t0 = self.init_state()
        else:
            V0, t0 = warm
            # non-finite warm slots are absorbing — cold-start them
            okr = jnp.isfinite(jnp.sum(V0, axis=1)
                               + jnp.sum(t0, axis=1))       # (R,)
            V0 = jnp.where(okr[:, None], V0, 0.0)
            t0 = jnp.where(okr[:, None], t0, 0.0)
        steptol = 1e-9 if self.compute_dtype == jnp.float64 else 3e-6

        def cond(state):
            V, tail, it, smax, best, since = state
            small = smax < steptol * (1.0 + jnp.max(jnp.abs(V), axis=1))
            live = ~(small | (since >= self._STALL_WINDOW))
            return jnp.logical_and(jnp.any(live), it < max_iter)

        def body(state):
            V, tail, it, _, best, since = state
            V2, t2, smax = self.newton_step(V, tail, theta)
            improved = smax < self._STALL_FACTOR * best
            return (V2, t2, it + 1, smax, jnp.minimum(best, smax),
                    jnp.where(improved, 0, since + 1))

        # both extra carries inherit V0's vma (varying under shard_map)
        # like `big` does, or the while_loop carry types mismatch
        big = jnp.full((self.R,), 1e30, self.dtype) + 0.0 * V0[:, 0]
        zero = (0.0 * V0[:, 0]).astype(jnp.int32)
        V, tail, _, _, _, _ = jax.lax.while_loop(
            cond, body, (V0, t0, 0, big, big, zero))
        return V, tail

    def _refine(self, V, tail, theta, eta_cap=8.0):
        e0 = self.eta(V, tail)
        gV, gt = self.grad_W(V, tail, theta, eta=e0)
        factor = self.hessian_factor(V, tail, theta, eta=e0)
        step_V, step_t = self.solve_H(factor, gV, gt)
        # per-slot guards, bit-identical at healthy fixed points — see
        # fast/banded.py _refine
        step_V = jnp.where(jnp.isfinite(step_V), step_V, 0.0)
        step_t = jnp.where(jnp.isfinite(step_t), step_t, 0.0)
        d_eta = self.eta(step_V, step_t)
        alpha = jnp.minimum(
            1.0, eta_cap / jnp.maximum(
                jnp.max(jnp.abs(d_eta), axis=1), 1e-30))
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        return (V - alpha[:, None] * step_V,
                tail - alpha[:, None] * step_t)

    def solve_W_star(self, theta, n_refine=1, warm=None):
        if warm is not None:
            warm = jax.lax.stop_gradient(warm)
        V, tail = self.newton_solve(jax.lax.stop_gradient(theta),
                                    warm=warm)
        V = jax.lax.stop_gradient(V)
        tail = jax.lax.stop_gradient(tail)
        for _ in range(n_refine):
            V, tail = self._refine(V, tail, theta)
        return jax.lax.stop_gradient(V), jax.lax.stop_gradient(tail)

    # -- Laplace values ----------------------------------------------------
    def _laplace_value(self, V, tail, theta, factor=None):
        """(R,) differentiable Laplace values (Takahashi custom VJP
        behind arrow_half_logdet; see fast/iwp._laplace_value)."""
        e0 = self.eta(V, tail)
        band_s, C_s, Hd, sc, sd = self._assemble_scaled(V, tail, theta,
                                                        eta=e0)
        if factor is None:
            hld = self.engine.arrow_half_logdet(band_s, C_s, Hd)
        else:
            hld = self.engine.arrow_half_logdet_given(
                band_s, C_s, Hd, jax.lax.stop_gradient(factor[0]))
        half_logdet = hld - jnp.sum(jnp.log(sc), axis=1) \
            - jnp.sum(jnp.log(sd), axis=1)
        f = -self._loglik(e0).astype(self.dtype) \
            + self._prior_neg(V, tail, theta)
        w_count = self.d + self.q
        return (f + half_logdet - 0.5 * w_count * LOG2PI
                - self.base.logdetT)

    def _laplace_value_direct(self, V, tail, theta, factor, eta=None):
        e0 = self.eta(V, tail) if eta is None else eta
        f = -self._loglik(e0).astype(self.dtype) \
            + self._prior_neg(V, tail, theta)
        w_count = self.d + self.q
        return (f + self.half_logdet_H(factor)
                - 0.5 * w_count * LOG2PI - self.base.logdetT)

    def laplace_eval_full(self, theta, warm):
        V, tail = self.solve_W_star(theta, warm=warm)
        e0 = self.eta(V, tail)
        factor = self.hessian_factor(V, tail, theta, eta=e0)
        val = self._laplace_value_direct(V, tail, theta, factor, eta=e0)
        return val, (V, tail), factor

    # -- implicit-function custom VJP (per replicate) ----------------------
    @property
    def _nll_custom(self):
        if hasattr(self, "_nll_cvjp"):
            return self._nll_cvjp

        @jax.custom_vjp
        def nll_fn(theta, warm):
            V, tail = self.solve_W_star(theta, warm=warm)
            e0 = self.eta(V, tail)
            factor = self.hessian_factor(V, tail, theta, eta=e0)
            return self._laplace_value_direct(V, tail, theta, factor,
                                              eta=e0), (V, tail)

        def fwd(theta, warm):
            V, tail = self.solve_W_star(theta, warm=warm)
            e0 = self.eta(V, tail)
            factor = self.hessian_factor(V, tail, theta, eta=e0)
            val = self._laplace_value_direct(V, tail, theta, factor,
                                             eta=e0)
            return (val, (V, tail)), (theta, V, tail, factor)

        def bwd(res, cts):
            theta, V, tail, factor = res
            ct_val = cts[0]                                 # (R,)
            # independent replicates: grad of the SUM gives each
            # replicate its own gradient block
            gF_V, gF_t, gF_th = jax.grad(
                lambda V_, t_, th_: jnp.sum(self._laplace_value(
                    V_, t_, th_, factor=factor)),
                argnums=(0, 1, 2))(V, tail, theta)
            vV, vt = self.solve_H(factor, gF_V, gF_t)

            def gdotv(th):
                gV, gt = self.grad_W(V, tail, th)
                out = jnp.sum(gV * vV, axis=1)
                if self.q:
                    out = out + jnp.sum(gt * vt, axis=1)
                return jnp.sum(out)

            term2 = jax.grad(gdotv)(theta)
            dth = (gF_th - term2) * ct_val
            return dth, jax.tree_util.tree_map(jnp.zeros_like, (V, tail))

        nll_fn.defvjp(fwd, bwd)
        self._nll_cvjp = nll_fn
        return nll_fn

    def init_state(self):
        return (jnp.zeros((self.R, self.dpad), self.dtype),
                jnp.zeros((self.R, self.q), self.dtype))

    def nll_warm(self, theta, warm):
        return self._nll_custom(theta, warm)


def ll_const_np(base, ys_internal):
    """(R,) response-only log-likelihood constants, host numpy (f64
    lgamma — keep this OUT of traced programs: on TPU it would emulate
    f64 gammaln over (R, n) per call)."""
    fam = base.md.family
    Y64 = np.asarray(ys_internal, np.float64)
    lg = np.vectorize(math.lgamma)
    if fam == 1:
        return -np.sum(lg(Y64 + 1.0), axis=1)
    if fam == 2:
        size = np.asarray(base.md.size, np.float64)
        return np.sum(lg(size + 1.0)[None] - lg(Y64 + 1.0)
                      - lg(size[None] - Y64 + 1.0), axis=1)
    raise ValueError(f"batched path: family {fam} unsupported")


def make_engine_batched(base, R: int, force_engine: str = None):
    bw = base.p
    if force_engine == "block_vmap":
        return BlockVmapEngine(base.dpad, bw, base.q, base.s)
    if force_engine == "pallas_interpret":
        return PallasBatchedEngine(base.dpad, bw, base.q, R,
                                   interpret=True)
    if force_engine == "pallas" or (force_engine is None
                                    and jax.default_backend() == "tpu"):
        return PallasBatchedEngine(base.dpad, bw, base.q, R)
    return BlockVmapEngine(base.dpad, bw, base.q, base.s)


def make_batched(base, Y_internal, ll_const, R: int, engine):
    """Traceable constructor: Y_internal (R, n) INTERNAL-order responses
    and ll_const (R,) may be tracers (for jitted wrappers that pass the
    responses as arguments — program reuse across groups, shard_map)."""
    if base.chunks is None:
        raise ValueError("batched path requires the chunked MXU design")
    if base.n_theta != 1:
        raise ValueError("batched path supports 1 hyperparameter "
                         "(elementwise non-Gaussian families)")
    return BatchedFastIWP(
        base=base, Y=jnp.asarray(Y_internal, base.compute_dtype),
        ll_const=jnp.asarray(ll_const, base.dtype), engine=engine, R=R)


def build_batched(base, ys_raw, force_engine: str = None):
    """BatchedFastIWP from a FastIWPBackend + (R, n) RAW-order responses
    (eager convenience; responses become program constants).

    force_engine: None (Pallas on TPU, block-vmap otherwise) |
    'pallas' | 'pallas_interpret' | 'block_vmap'."""
    ys_raw = np.asarray(ys_raw)
    R = ys_raw.shape[0]
    ys_int = ys_raw[:, np.asarray(base.row_order)]
    return make_batched(base, ys_int, ll_const_np(base, ys_int), R,
                        make_engine_batched(base, R, force_engine))


def max_replicates(p: int) -> int:
    """Lane-group capacity of the packed kernels at IWP order p."""
    return bb.LANES // bb.group_size(p)
