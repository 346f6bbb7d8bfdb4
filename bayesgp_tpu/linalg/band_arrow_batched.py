"""Multi-replicate arrowhead engine over the lane-packed band kernels.

Batched counterpart of band_arrow.PallasEngine: NR independent
arrowhead SPD systems

    H_r = [[Hb_r (band bw), C_r], [C_r^T, Hd_r (dense q x q)]]

factored/solved TOGETHER — the banded part advances all replicates in
one lane-packed kernel pass (band_batched.py), the dense q x q tail
algebra is vmapped XLA f64 (tiny). This is the per-chip engine of the
BASELINE stretch configuration (R replicate fits on one chip); the
reference's analogue is one CHOLMOD factorization per PSOCK process
(R/02_model_fit.R:754-769).

`arrow_half_logdet` carries the same Takahashi-selected-inverse custom
VJP as the scalar engine, batched: d(0.5 log|H_r|)/dH_r = 0.5 H_r^{-1}
restricted to the band / cross / dense blocks.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import band_batched as bb
from . import band_kernels as bk
from .band_arrow import small_chol, small_solve_L, small_solve_Lt


class BatchedFactor(NamedTuple):
    Lh: jnp.ndarray      # (R, 128) f32 lane-packed L + 1/Ljj stash
    Ll: jnp.ndarray      # (R, 128) f32
    Y: jnp.ndarray       # (NR, d, q) f64: L_r^{-1} C_r
    Ls: jnp.ndarray      # (NR, q, q) f64: lower chol of Schur complement
    hld_b: jnp.ndarray   # (NR,) f64 half log-det of the banded parts


class PallasBatchedEngine:
    """Statics (d, bw, q, NR) fixed per program; methods traceable."""

    def __init__(self, d: int, bw: int, q: int, NR: int,
                 interpret: bool = False):
        self.d, self.bw, self.q, self.NR = d, bw, q, NR
        self.G = bb.group_size(bw)
        if NR * self.G > bb.LANES:
            raise ValueError(
                f"NR={NR} replicates exceed {bb.LANES // self.G} lane "
                f"groups at bandwidth {bw}")
        self.interpret = interpret
        self.W, self.R = bk.plan_rows(d, bw)
        self._hld = None
        self._hld_given = None

    # -- batched solves over the packed layout ---------------------------
    def _fwd_multi(self, Lh, Ll, B):
        """L_r^{-1} B_r for (NR, d, m) f64 B, chunked G columns/pass."""
        d, bw, G, NR = self.d, self.bw, self.G, self.NR
        m = B.shape[2]
        outs = []
        for c0 in range(0, m, G):
            blk = B[:, :, c0:c0 + G]
            rh, rl = bb.pack_rhs_batched(blk, d, bw, G)
            yp = bb.bfwd_fn(d, bw, G, self.interpret)(Lh, Ll, rh, rl)
            outs.append(bb.unpack_batched(yp, d, bw, G, NR, blk.shape[2]))
        return jnp.concatenate(outs, axis=2)

    def _bwd_multi(self, Lh, Ll, B):
        """L_r^{-T} B_r for (NR, d, m) f64 B."""
        d, bw, G, NR = self.d, self.bw, self.G, self.NR
        m = B.shape[2]
        outs = []
        for c0 in range(0, m, G):
            blk = B[:, :, c0:c0 + G]
            rh, rl = bb.pack_rhs_batched(blk, d, bw, G)
            xp = bb.bbwd_fn(d, bw, G, self.interpret)(Lh, Ll, rh, rl)
            outs.append(bb.unpack_batched(xp, d, bw, G, NR, blk.shape[2]))
        return jnp.concatenate(outs, axis=2)

    # -- core -------------------------------------------------------------
    def factor(self, bands, C, Hd):
        """bands (NR, bw+1, dpad), C (NR, dpad, q), Hd (NR, q, q)."""
        d, bw, q, G, NR = self.d, self.bw, self.q, self.G, self.NR
        bh, bl = bb.pack_band_batched(bands.astype(jnp.float64), d, bw, G)
        Lh, Ll, misc = bb.bfactor_fn(d, bw, G, self.interpret)(bh, bl)
        lanes0 = G * np.arange(NR)
        hld_b = 0.5 * (misc[0, lanes0].astype(jnp.float64)
                       + misc[1, lanes0].astype(jnp.float64))
        if q:
            Y = self._fwd_multi(Lh, Ll, C.astype(jnp.float64))
            S = Hd - jnp.einsum("rdp,rdq->rpq", Y, Y)
            Ls = jax.vmap(small_chol)(S)
        else:
            Y = jnp.zeros((NR, d, 0), jnp.float64)
            Ls = jnp.zeros((NR, 0, 0), jnp.float64)
        return BatchedFactor(Lh, Ll, Y, Ls, hld_b)

    def half_logdet(self, f: BatchedFactor):
        if self.q:
            return f.hld_b + jnp.sum(
                jnp.log(jnp.diagonal(f.Ls, axis1=1, axis2=2)), axis=1)
        return f.hld_b

    def solve(self, f: BatchedFactor, rb, rd):
        """H_r [zb_r; zd_r] = [rb_r; rd_r]; rb (NR, d), rd (NR, q)."""
        q = self.q
        u = self._fwd_multi(f.Lh, f.Ll, rb[:, :, None])[:, :, 0]
        if q:
            rhs_d = rd - jnp.einsum("rdq,rd->rq", f.Y, u)
            zd = jax.vmap(lambda L, b: small_solve_Lt(L, small_solve_L(L, b))
                          )(f.Ls, rhs_d)
            u = u - jnp.einsum("rdq,rq->rd", f.Y, zd)
        else:
            zd = rd
        zb = self._bwd_multi(f.Lh, f.Ll, u[:, :, None])[:, :, 0]
        return zb, zd

    # -- half log-det with Takahashi custom VJP ---------------------------
    def _hld_bwd(self, f: BatchedFactor, ct):
        """ct (NR,) -> cotangents for (bands, C, Hd)."""
        d, bw, q, G, NR, W_ = self.d, self.bw, self.q, self.G, self.NR, \
            self.W
        Z = bb.btakahashi_fn(d, bw, G, self.interpret)(f.Lh)
        Zg = Z[W_:W_ + d, :NR * G].reshape(d, NR, G)
        Zb = jnp.transpose(Zg[:, :, :bw + 1], (1, 2, 0)).astype(
            jnp.float64)                                  # (NR, bw+1, d)
        if q:
            Wm = self._bwd_multi(f.Lh, f.Ll, f.Y)          # (NR, d, q)
            eye = jnp.eye(q, dtype=f.Ls.dtype)
            Sinv = jax.vmap(lambda L: small_solve_Lt(
                L, small_solve_L(L, eye)))(f.Ls)           # (NR, q, q)
            A = jnp.einsum("rdq,rqp->rdp", Wm, Sinv)       # (NR, d, q)
            rows = []
            for o in range(bw + 1):
                v = jnp.sum(A[:, o:, :] * Wm[:, :d - o, :], axis=2)
                rows.append(jnp.pad(v, ((0, 0), (0, o))))
            corr = jnp.stack(rows, axis=1)                 # (NR, bw+1, d)
            ct_C = (-ct)[:, None, None] * A
            ct_Hd = (0.5 * ct)[:, None, None] * Sinv
        else:
            corr = 0.0
            ct_C = jnp.zeros((NR, d, 0), jnp.float64)
            ct_Hd = jnp.zeros((NR, 0, 0), jnp.float64)
        hinv_band = Zb + corr
        w = jnp.concatenate([jnp.full((1, d), 0.5), jnp.ones((bw, d))])
        ct_band = ct[:, None, None] * w[None] * hinv_band
        return ct_band.astype(jnp.float64), ct_C, ct_Hd

    def arrow_half_logdet(self, bands, C, Hd):
        if self._hld is None:
            @jax.custom_vjp
            def hld(bands, C, Hd):
                return self.half_logdet(self.factor(bands, C, Hd))

            def fwd(bands, C, Hd):
                f = self.factor(bands, C, Hd)
                return self.half_logdet(f), (f, bands.shape[2])

            def bwd(res, ct):
                f, dpad = res
                ct_band, ct_C, ct_Hd = self._hld_bwd(f, ct)
                if dpad > self.d:
                    ct_band = jnp.pad(
                        ct_band, ((0, 0), (0, 0), (0, dpad - self.d)))
                    ct_C = jnp.pad(
                        ct_C, ((0, 0), (0, dpad - self.d), (0, 0)))
                return ct_band, ct_C, ct_Hd

            hld.defvjp(fwd, bwd)
            self._hld = hld
        return self._hld(bands, C, Hd)

    def arrow_half_logdet_given(self, bands, C, Hd, f: BatchedFactor):
        """Primal skips the factorization (precomputed `f` of the SAME
        system); cotangents identical to arrow_half_logdet; `f` gets
        zeros."""
        if self._hld_given is None:
            @jax.custom_vjp
            def hldg(bands, C, Hd, f):
                return self.half_logdet(f)

            def fwd(bands, C, Hd, f):
                return self.half_logdet(f), (f, bands.shape[2])

            def bwd(res, ct):
                f, dpad = res
                ct_band, ct_C, ct_Hd = self._hld_bwd(f, ct)
                if dpad > self.d:
                    ct_band = jnp.pad(
                        ct_band, ((0, 0), (0, 0), (0, dpad - self.d)))
                    ct_C = jnp.pad(
                        ct_C, ((0, 0), (0, dpad - self.d), (0, 0)))
                zf = jax.tree_util.tree_map(jnp.zeros_like, f)
                return ct_band, ct_C, ct_Hd, zf

            hldg.defvjp(fwd, bwd)
            self._hld_given = hldg
        return self._hld_given(bands, C, Hd, f)
