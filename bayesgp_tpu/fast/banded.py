"""Generalized banded backend: ONE banded "driver" term + dense tail.

Extends the single-IWP fast path (fast/iwp.py) to sGP driver terms and
multi-term models. The latent is split as

    [ V (driver coefficients, banded coupling) | tail t ]
    tail t = [ other terms' U blocks | boundary betas | fixed effects ]

with the conditional Hessian an arrowhead system

    H = [[ Bd^T D Bd + e^{th_drv} P_drv   (band W),   C ],
         [ C^T,                            Hd(theta)     ]]

factored by the linalg/band_arrow engine (Pallas double-float band
kernels on TPU; block-tridiagonal + Schur scan of
linalg/block_tridiag.py on CPU).

Driver structures:
  - IWP  — O-spline space reparametrized to compact-support B-splines
    (basis/reparam.py): window p+1, stride 1, latent U = T V with
    constant log|det T| subtracted for parity (same as fast/iwp.py).
  - sGP  — the sB design [B cos | B sin | B] x m harmonics is reordered
    by INTERLEAVING the G = 3m groups per B-spline index: every data row
    then touches a CONTIGUOUS window of W = 4G columns, and the
    (block-diagonal-over-harmonics) precision Q becomes banded with the
    same bandwidth. No coordinate change (Q is full-rank): V = U in
    interleaved order, recovered at sample time by the inverse
    permutation.

The tail prior is theta-dependent when other smooth terms live in it:
Hd(theta) = Xd-Gram + diag(boundary/fixed precs) + sum_r e^{th_r} P_r
(+ e^{th_drv} Z0'P Z0 from the orthogonalization change of coordinates).

Numerical design (measured on TPU v5, see fast/iwp.py and BENCH_NOTES):
mixed precision (O(n) data work in compute_dtype, O(d) solver state in
solve_dtype), two-level chunked segment sums, penalized tail
orthogonalization V' = V + Z0 t, Jacobi equilibration before
factorization. Reference semantics: src/BayesGP.cpp:155-246.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..basis import reparam
from ..model import families
from ..linalg import band_arrow
from .iwp import ChunkDesign

LOG2PI = math.log(2.0 * math.pi)


def _choose_block(d: int, bw: int) -> int:
    """Block size >= bandwidth + 1, MXU-shaped when d is large."""
    lo = bw + 1
    if d >= 1024:
        return max(128, lo)
    if d >= 256:
        return max(32, lo)
    return max(8, lo)


# ---------------------------------------------------------------------------
# driver construction
# ---------------------------------------------------------------------------

def _sgp_interleave_perm(kb: int, G: int) -> np.ndarray:
    """perm[j_inter] = j_group for the group->interleaved reorder.

    Group order (reference layout): column g*kb + b (g = 3*(i-1)+{cos,sin,
    plain}, b = B-spline index). Interleaved: column b*G + g.
    """
    j_group = np.arange(kb * G).reshape(G, kb)      # [g, b]
    return j_group.T.reshape(-1)                    # [b*G + g]


def _band_from_dense(P: np.ndarray, bw: int) -> np.ndarray:
    """(bw+1, d) lower band storage; asserts bandedness."""
    d = P.shape[0]
    band = np.zeros((bw + 1, d))
    for o in range(bw + 1):
        band[o, :d - o] = np.diagonal(P, -o)
    if d > bw + 1:
        tail = np.tril(P, -(bw + 1))
        assert np.abs(tail).max() <= 1e-9 * max(1.0, np.abs(P).max()), \
            "driver precision is not banded at the declared bandwidth"
    return band


def _sgp_sparse_rows(term):
    """Sparse-window rows of the interleaved sB design.

    Returns (vals (n, W), start (n,), kb, G) with row i of the
    interleaved design equal to vals[i] at columns
    start[i]..start[i]+W-1. All 3m groups share the 4-wide B-spline
    support, so interleaving makes it one contiguous 4G window.

    When the term was built with materialize_B=False the windows come
    straight from the sparse B-spline design (O(n), never materializing
    the (n, 3m*kb) dense B); otherwise they are extracted from term.B.
    """
    if term.B is None and term.x_data is not None:
        return _sgp_sparse_rows_from_x(term)
    Bg = np.asarray(term.ensure_B(), np.float64)   # (n, 3m*kb), group order
    m = term.m
    G = 3 * m
    kb = Bg.shape[1] // G
    if kb < 4:
        raise ValueError("sGP banded driver needs k >= 6 (kb >= 4)")
    perm = _sgp_interleave_perm(kb, G)
    Bi = Bg[:, perm]                                # interleaved
    W = 4 * G
    n = Bi.shape[0]
    # first active B-spline index per row, from the plain block (group 2)
    plain = Bg[:, 2 * kb:3 * kb]
    nz = plain != 0.0
    first = np.where(nz.any(axis=1), nz.argmax(axis=1), 0)
    start_b = np.clip(first, 0, kb - 4)
    start = (start_b * G).astype(np.int64)
    cols = start[:, None] + np.arange(W)[None, :]
    vals = Bi[np.arange(n)[:, None], cols]
    # exactness: windows must cover every nonzero of the design
    total = np.abs(Bi).sum()
    covered = np.abs(vals).sum()
    assert abs(total - covered) <= 1e-9 * max(total, 1.0), \
        "sGP window extraction missed design mass"
    return vals, start, kb, G


def _sgp_sparse_rows_from_x(term):
    """O(n) sparse construction of the interleaved sB windows from the
    raw (shifted) x values — equivalent to extracting windows from the
    dense B (same (vals, start, kb, G) contract as _sgp_sparse_rows)
    without ever materializing it.

    Each sB group column is (B-spline column) x (rowwise cos/sin/1
    multiplier), so row i's 4G window is the outer product of its 4
    B-spline values with its G multipliers.
    """
    from ..basis.bsplines import eval_bspline_basis, sparse_design

    xs = np.asarray(term.x_data, np.float64)
    k, m = term.k, term.m
    lo = float(np.min(term.region))
    hi = float(np.max(term.region))
    kb = k - 2                       # fit-time boundary=True drops 2
    if kb < 4:
        raise ValueError("sGP banded driver needs k >= 6 (kb >= 4)")
    G = 3 * m
    n = len(xs)

    vals4 = np.zeros((n, 4))
    start_b = np.zeros(n, np.int64)
    inside = (xs >= lo) & (xs <= hi)
    if inside.any():
        S = sparse_design(xs[inside], lo, hi, k, 4, deriv=0).tocsr()
        # design_matrix stores exactly degree+1 = 4 contiguous columns/row
        data4 = S.data.reshape(-1, 4)
        cold = S.indices.reshape(-1, 4).astype(np.int64) - 2  # dropped idx
        sb = np.clip(cold[:, 0], 0, kb - 4)
        off = cold - sb[:, None]
        ok = (cold >= 0) & (off >= 0) & (off <= 3)
        ridx = np.broadcast_to(np.arange(len(sb))[:, None], off.shape)
        v_in = np.zeros((len(sb), 4))
        v_in[ridx[ok], off[ok]] = data4[ok]
        vals4[inside] = v_in
        start_b[inside] = sb
    if (~inside).any():
        # polynomial continuation / zero region (rare points): dense eval
        # of the boundary-dropped basis, windowed
        xo = xs[~inside]
        Bo = eval_bspline_basis(xo, lo, hi, k, 4, deriv=0, dropind=(1, 2))
        so = np.where(xo > hi, kb - 4, 0).astype(np.int64)
        cols = so[:, None] + np.arange(4)[None, :]
        vals4[~inside] = Bo[np.arange(len(xo))[:, None], cols]
        start_b[~inside] = so
        # coverage: nonzeros outside the window would be silently dropped
        outside_mass = np.abs(Bo).sum() - np.abs(vals4[~inside]).sum()
        assert outside_mass <= 1e-9 * max(np.abs(Bo).sum(), 1.0), \
            "sGP window extraction missed design mass (outside region)"

    # group multipliers in Bg group order: per harmonic i, [cos, sin, 1]
    mults = np.empty((n, G))
    for i in range(1, m + 1):
        mults[:, 3 * (i - 1)] = np.cos(term.a * i * xs)
        mults[:, 3 * (i - 1) + 1] = np.sin(term.a * i * xs)
        mults[:, 3 * (i - 1) + 2] = 1.0
    vals = (vals4[:, :, None] * mults[:, None, :]).reshape(n, 4 * G)
    start = (start_b * G).astype(np.int64)
    return vals, start, kb, G


@dataclass
class TailTermBlock:
    """A non-driver smooth term living in the dense tail."""
    offset: int          # offset of its U block within the tail vector
    size: int
    theta_idx: int       # index into theta
    P: Any               # (size, size) penalty
    logPdet: float
    d_size: int          # = size (for the 0.5*d*theta term)


@dataclass
class BandDiagTerm:
    """A theta-scaled DIAGONAL prior component merged into the band:
    large-q IID levels interleaved with the driver columns (the
    merged-IID path — see build_banded_backend). The level coefficients
    live at band columns mask==1; their precision is e^{theta} I_q.

    The reference rides CHOLMOD's general sparse Cholesky for this
    regime (R/02_model_fit.R:276-284, IID P=I at R/01_utility.R:245-250);
    here the diagonal IID Hessian block merges into the band so the
    whole fit stays one Pallas band factorization with a modestly wider
    band — no scatter, no dense (q, q) tail."""
    theta_idx: int
    mask: Any            # (d,) 1.0 at this term's band columns
    d_size: int          # number of real levels q_r (excludes padding)
    logPdet: float       # log det of P = I_q -> 0.0
    Z0PZ0: Any           # (q_tail, q_tail) Z0^T diag(mask) Z0


@dataclass
class BandedBackend:
    """Generalized banded arrowhead backend. Interface-compatible with
    aghq.DenseBackend / fast.iwp.FastIWPBackend (init_state, nll_warm,
    val_grad_warm_fn, hess_warm_fn, vmap_nll_warm_fn, node_eval, sample).
    """
    supports_fused_1d = True   # inference/aghq.fused_fit_1d eligible
    supports_fused_nd = True   # fused BFGS + node programs (s > 1)

    @property
    def supports_fused_full_nd(self):
        """Single-dispatch s>1 eligibility. On TPU this requires the
        VMEM-safe Pallas engine (single-call within budget, or the
        chunked HBM-streaming kernels): the round-13 worker crashes
        were whole-array band kernels overflowing VMEM in the
        wide-band/arrow regime; a BlockEngine fallback on TPU would
        instead hit the pathological f64 scan path. CPU is always
        eligible (f64 test parity)."""
        import jax as _jax
        from ..linalg import band_arrow as _ba
        if _jax.default_backend() != "tpu":
            return True
        if not isinstance(self.engine, _ba.PallasEngine):
            return False
        # Dispatch-length budget (round-5 bisect): the s=3 wide-band
        # full_nd program (opt + k^s nodes + s*k^s marginal nodes in
        # ONE dispatch, ~90 ms per warm eval at Wl=12) intermittently
        # runs past the tunnel's dispatch budget and KILLS the worker
        # — while the segmented 60-eval optnd dispatch (5.6 s) and
        # per-phase fused programs all survive. s <= 2 keeps the
        # proven single-dispatch fits (gauss2/lynx class); wide-band
        # s >= 3 takes the 3-dispatch flow.
        return self.n_theta <= 2 or self.Wl <= 8

    md: Any
    drv_theta: int    # driver's theta index
    Wl: int           # window length
    G: int            # column stride of window starts
    d: int
    dpad: int
    s: int
    nb: int
    q: int

    valsT: Any        # (Wl, n)
    start: Any        # (n,) nondecreasing multiples of G
    seg_lo: Any       # (n_seg,) static row-range boundaries per segment
    seg_hi: Any
    n_seg: int        # dpad // G segments (some empty)

    XFpT: Any         # (q, n) orthogonalized tail design, transposed
    Z0: Any           # (d, q)
    PZ0: Any          # (d, q) = P_drv Z0
    Z0PZ0: Any        # (q, q)
    P_band: Any       # (Wl, d) driver prior band
    logPdet_drv: float
    d_drv: int        # rank/dimension entering 0.5*d*theta

    # IWP driver extras (identity for sGP)
    Tdiags: Any       # (p+1, d) or None
    logdetT: float

    prior_diag_tail: Any   # (q,) boundary/fixed precisions (0 on U blocks)
    prior_mean_tail: Any   # (q,)
    tail_terms: tuple      # TailTermBlock tuple
    ref_perm: Any          # (w_ref,) backend->reference row permutation
    solve_dtype: Any = None
    engine: Any = None     # linalg.band_arrow engine (Pallas on TPU)
    chunks: Any = None     # ChunkDesign (MXU path) or None (gather path)
    data_sharded: Any = None  # (mesh, axis) when the chunk arrays carry a
    #                           NamedSharding over the observation axis —
    #                           see fast/iwp.FastIWPBackend.data_sharded
    #                           and parallel/data_sharded.py
    # merged-IID extras (see BandDiagTerm): theta-scaled diagonal prior
    # components inside the band, plus a theta-INDEPENDENT unit diagonal
    # on padded (empty) level slots, and the count of REAL latent
    # coordinates (padded slots are excluded from w_count/log(2pi))
    band_terms: tuple = ()
    prior_diag_band: Any = None   # (d,) or None
    Z0PZ0_pad: Any = None         # (q_tail, q_tail) for prior_diag_band
    w_real: Any = None            # int; defaults to d + q

    @property
    def n_theta(self):
        return self.md.n_theta

    @property
    def em_dims(self):
        """Per-theta penalized dimensions for the fused optimizers'
        EM-style jump (see fast/iwp.py em_dims): the driver's d_drv,
        each tail term's d_size at its theta index, and n for any
        remaining theta (the Gaussian noise precision)."""
        dims = np.zeros(self.n_theta)
        dims[self.drv_theta] = self.d_drv
        for tb in self.tail_terms:
            dims[tb.theta_idx] = tb.d_size
        for bt in self.band_terms:
            dims[bt.theta_idx] = bt.d_size
        dims[dims == 0] = self.md.n
        return dims

    def _band_extra_diag(self, theta):
        """Merged-IID diagonal prior inside the band: sum of the
        theta-scaled level masks plus the unit diagonal on padded
        slots. None when the model has no merged band terms."""
        if not self.band_terms and self.prior_diag_band is None:
            return None
        diag = jnp.zeros((self.d,), self.dtype)
        for bt in self.band_terms:
            diag = diag + jnp.exp(theta[bt.theta_idx]) * bt.mask
        if self.prior_diag_band is not None:
            diag = diag + self.prior_diag_band
        return diag

    @property
    def compute_dtype(self):
        return self.valsT.dtype

    @property
    def dtype(self):
        return self.solve_dtype or self.valsT.dtype

    # -- chunked mixed-precision reductions (see fast/iwp.py) ----------
    _CHUNK = 1024

    def _segsum(self, rows):
        """(..., n) -> (..., n_seg) two-level chunked segment sums."""
        ch = self._CHUNK
        n = rows.shape[-1]
        nc = -(-n // ch)
        pad = nc * ch - n
        if pad:
            rows = jnp.pad(rows, ((0, 0),) * (rows.ndim - 1) + ((0, pad),))
        r = rows.reshape(rows.shape[:-1] + (nc, ch))
        c32 = jnp.cumsum(r, axis=-1)
        tot = c32[..., -1].astype(self.dtype)
        pre64 = jnp.cumsum(tot, axis=-1)
        flat32 = c32.reshape(rows.shape[:-1] + (nc * ch,))

        def prefix(idx):
            ci = idx // ch
            base = jnp.where(jnp.asarray(ci > 0),
                             pre64[..., np.maximum(ci - 1, 0)], 0.0)
            intra_mask = (idx % ch) > 0
            intra = jnp.where(jnp.asarray(intra_mask),
                              flat32[..., np.maximum(idx - 1, 0)].astype(
                                  self.dtype), 0.0)
            return base + intra

        return prefix(np.asarray(self.seg_hi)) - prefix(np.asarray(self.seg_lo))

    def _gram64(self, A, B):
        ch = self._CHUNK
        q, n = A.shape
        nc = -(-n // ch)
        pad = nc * ch - n
        if pad:
            A = jnp.pad(A, ((0, 0), (0, pad)))
            B = jnp.pad(B, ((0, 0), (0, pad)))
        Ar = A.reshape(q, nc, ch).swapaxes(0, 1)
        Br = B.reshape(q, nc, ch).swapaxes(0, 1)
        partial = jnp.einsum("cqn,crn->cqr", Ar, Br)
        return jnp.sum(partial.astype(self.dtype), axis=0)

    # -- banded products ------------------------------------------------
    def _place(self, col, b, out):
        """Add col (n_seg,) into out (dpad,) at positions seg*G + b."""
        G = self.G
        grid = out.reshape(self.dpad // G, G)
        shift = b // G
        sub = b % G
        L = min(self.n_seg, self.dpad // G - shift)
        grid = grid.at[shift:shift + L, sub].add(col[:L])
        return grid.reshape(self.dpad)

    def _v_windows(self, Vc):
        ck = self.chunks
        return jnp.stack([
            jax.lax.dynamic_slice(Vc, (int(b),), (ck.w,))
            for b in ck.bases])

    def _rows_chunked(self, u):
        ck = self.chunks
        pad = ck.nc * ck.CH - ck.n
        return jnp.pad(u, (0, pad)).reshape(ck.nc, ck.CH)

    def eta(self, Vp, tail):
        cd = self.compute_dtype
        Vc = Vp.astype(cd)
        if self.chunks is not None:
            ck = self.chunks
            Vw = self._v_windows(jnp.pad(Vc, (0, ck.w)))
            e = jnp.einsum("cnw,cw->cn", ck.D, Vw).reshape(-1)[:ck.n]
        else:
            e = jnp.zeros((self.start.shape[0],), cd)
            for a in range(self.Wl):
                e = e + self.valsT[a] * Vc[self.start + a]
        if self.q:
            e = e + tail.astype(cd) @ self.XFpT
        return e

    def to_V(self, Vp, tail):
        if not self.q:
            return Vp
        return Vp.at[..., :self.d].add(-(self.Z0 @ tail))

    def Bt(self, u):
        """B^T u -> (dpad,) in solve_dtype."""
        if self.chunks is not None:
            ck = self.chunks
            uc = self._rows_chunked(u)
            contrib = jnp.einsum("cnw,cn->cw", ck.D, uc)
            c64 = contrib.astype(self.dtype)
            return ck.overlap_add(c64, self.dpad + ck.w)[:self.dpad]
        seg = self._segsum(self.valsT * u[None, :]).astype(self.dtype)
        out = jnp.zeros((self.dpad,), self.dtype)
        for a in range(self.Wl):
            out = self._place(seg[a], a, out)
        return out

    def band_H(self, wts, theta):
        """(Wl, dpad) lower band of B^T diag(wts) B + e^th P, identity-
        padded beyond d."""
        Wl = self.Wl
        if self.chunks is not None:
            # per-chunk local Gram on the MXU (see fast/iwp.py band_H)
            ck = self.chunks
            wc = self._rows_chunked(wts)
            WD = wc[:, :, None] * ck.D
            G = jnp.einsum("cnw,cnv->cwv", ck.D, WD)    # (nc, w, w)
            G64 = G.astype(self.dtype)
            pieces = []
            for o in range(Wl):
                dg = jnp.diagonal(G64, offset=-o, axis1=1, axis2=2)
                pieces.append(jnp.pad(dg, ((0, 0), (0, o))))
            piece = jnp.stack(pieces, axis=1)           # (nc, Wl, w)
            band = ck.overlap_add(piece, self.dpad + ck.w)[:, :self.dpad]
        else:
            outersT = (wts[None, None, :] * self.valsT[:, None, :]
                       * self.valsT[None, :, :])
            M = self._segsum(outersT).astype(self.dtype)  # (Wl, Wl, n_seg)
            rows = []
            for o in range(Wl):
                row = jnp.zeros((self.dpad,), self.dtype)
                for b in range(Wl - o):
                    a = b + o
                    row = self._place(M[a, b], b, row)
                rows.append(row)
            band = jnp.stack(rows)
        band = band.at[:, :self.d].add(
            jnp.exp(theta[self.drv_theta]) * self.P_band)
        extra = self._band_extra_diag(theta)
        if extra is not None:
            band = band.at[0, :self.d].add(extra)
        if self.dpad > self.d:
            band = band.at[0, self.d:].set(1.0)
        return band

    def C_block(self, wts, theta):
        if not self.q:
            return jnp.zeros((self.dpad, 0), self.dtype)
        if self.chunks is not None:
            ck = self.chunks
            wc = self._rows_chunked(wts)
            WX = wc[:, :, None] * ck.XFp_rows
            CC = jnp.einsum("cnw,cnq->cqw", ck.D, WX)
            C64 = CC.astype(self.dtype)
            C = ck.overlap_add(C64, self.dpad + ck.w)[:, :self.dpad].T
        else:
            wXFT = wts[None, :] * self.XFpT
            M = self._segsum(
                self.valsT[:, None, :] * wXFT[None, :, :]).astype(self.dtype)
            C = jnp.zeros((self.dpad, self.q), self.dtype)
            for a in range(self.Wl):
                # place M[a] (q, n_seg) rows at seg*G + a
                Cg = C.reshape(self.dpad // self.G, self.G, self.q)
                shift, sub = a // self.G, a % self.G
                L = min(self.n_seg, self.dpad // self.G - shift)
                Cg = Cg.at[shift:shift + L, sub, :].add(M[a][:, :L].T)
                C = Cg.reshape(self.dpad, self.q)
        C = C.at[:self.d].add(-jnp.exp(theta[self.drv_theta]) * self.PZ0)
        extra = self._band_extra_diag(theta)
        if extra is not None:
            # PZ0 analogue of the merged diagonal components:
            # diag(extra) Z0, rows of Z0 scaled elementwise
            C = C.at[:self.d].add(-(extra[:, None] * self.Z0))
        return C

    # -- priors ----------------------------------------------------------
    def prior_quad_V(self, V):
        q = self.P_band[0, :self.d] * V[:self.d] ** 2
        total = jnp.sum(q)
        for o in range(1, self.Wl):
            total = total + 2.0 * jnp.sum(
                self.P_band[o, :self.d - o] * V[o:self.d] * V[:self.d - o])
        return total

    def _applyP(self, Vd):
        pv = self.P_band[0, :self.d] * Vd
        for o in range(1, self.Wl):
            pv = pv.at[o:].add(self.P_band[o, :self.d - o] * Vd[:-o])
            pv = pv.at[:-o].add(self.P_band[o, :self.d - o] * Vd[o:])
        return pv

    def apply_T(self, V):
        """IWP driver: U = T V; identity for sGP."""
        if self.Tdiags is None:
            return V
        U = self.Tdiags[0] * V
        for o in range(1, self.Tdiags.shape[0]):
            U = U.at[..., o:].add(self.Tdiags[o, o:] * V[..., :-o])
        return U

    def _tail_prior_mat(self, theta):
        """Hd_prior(theta) = diag + sum_r e^{th_r} P_r (q, q)."""
        # eye-product, not jnp.diag: diag(v) lowers to stablehlo.scatter
        # (a TPU compile landmine, duplicated per traced copy)
        Hd = self.prior_diag_tail * jnp.eye(
            self.prior_diag_tail.shape[0], dtype=self.dtype)
        for tb in self.tail_terms:
            blk = jnp.exp(theta[tb.theta_idx]) * jnp.asarray(tb.P, self.dtype)
            Hd = Hd.at[tb.offset:tb.offset + tb.size,
                       tb.offset:tb.offset + tb.size].add(blk)
        return Hd

    def _tail_prior_quad(self, tail, theta):
        """-2 log prior (quad parts) of the tail, EXCLUDING driver terms:
        sum_r e^{th_r} t_r' P_r t_r + diag part, minus the logdet/theta
        constants (added in neg_log_post)."""
        quad = jnp.sum(self.prior_diag_tail
                       * (tail - self.prior_mean_tail) ** 2)
        for tb in self.tail_terms:
            tr = jax.lax.dynamic_slice(tail, (tb.offset,), (tb.size,))
            quad = quad + jnp.exp(theta[tb.theta_idx]) * (
                tr @ (jnp.asarray(tb.P, self.dtype) @ tr))
        return quad

    def _tail_prior_grad(self, tail, theta):
        g = self.prior_diag_tail * (tail - self.prior_mean_tail)
        for tb in self.tail_terms:
            tr = jax.lax.dynamic_slice(tail, (tb.offset,), (tb.size,))
            gr = jnp.exp(theta[tb.theta_idx]) * (
                jnp.asarray(tb.P, self.dtype) @ tr)
            g = jax.lax.dynamic_update_slice(
                g, jax.lax.dynamic_slice(g, (tb.offset,), (tb.size,)) + gr,
                (tb.offset,))
        return g

    # -- objective/grad/hessian ------------------------------------------
    def _prior_neg(self, Vp, tail, theta):
        """Non-likelihood part of neg_log_post — quadratic in (V', t)
        for fixed theta (see fast/iwp.py)."""
        md = self.md
        Vd = Vp[:self.d]
        quad = self.prior_quad_V(Vp)
        if self.q:
            quad = quad - 2.0 * jnp.dot(tail, self.PZ0.T @ Vd)
            quad = quad + tail @ (self.Z0PZ0 @ tail)
        lp = -0.5 * jnp.exp(theta[self.drv_theta]) * quad
        lp = lp + 0.5 * (self.d_drv * theta[self.drv_theta]
                         + self.logPdet_drv)
        # merged-IID diagonal components: quad in primed coordinates
        # expands like the driver's ((V - Z0 t)^T D (V - Z0 t))
        for bt in self.band_terms:
            mv = bt.mask * Vd
            qr = jnp.sum(mv * Vd)
            if self.q:
                qr = qr - 2.0 * jnp.dot(tail, self.Z0.T @ mv)
                qr = qr + tail @ (bt.Z0PZ0 @ tail)
            lp = lp - 0.5 * jnp.exp(theta[bt.theta_idx]) * qr
            lp = lp + 0.5 * (bt.d_size * theta[bt.theta_idx] + bt.logPdet)
        if self.prior_diag_band is not None:
            pv = self.prior_diag_band * Vd
            qc = jnp.sum(pv * Vd)
            if self.q:
                qc = qc - 2.0 * jnp.dot(tail, self.Z0.T @ pv)
                qc = qc + tail @ (self.Z0PZ0_pad @ tail)
            lp = lp - 0.5 * qc
        if self.q:
            lp = lp - 0.5 * self._tail_prior_quad(tail, theta)
            for tb in self.tail_terms:
                lp = lp + 0.5 * (tb.d_size * theta[tb.theta_idx]
                                 + tb.logPdet)
        phi = -jnp.log(md.alpha) / md.u
        lpT = jnp.sum(jnp.log(0.5 * phi) - phi * jnp.exp(-0.5 * theta)
                      - 0.5 * theta)
        return -(lp + lpT)

    def neg_log_post(self, Vp, tail, theta):
        e = self.eta(Vp, tail)
        ll = families.log_lik(e, self.md, theta.astype(self.compute_dtype))
        return -ll.astype(self.dtype) + self._prior_neg(Vp, tail, theta)

    def grad_W(self, Vp, tail, theta, eta=None):
        md = self.md
        e = self.eta(Vp, tail) if eta is None else eta
        th_c = theta.astype(self.compute_dtype)
        r = jax.grad(lambda ee: -families.log_lik(ee, md, th_c))(e)
        gV = self.Bt(r)
        lam = jnp.exp(theta[self.drv_theta])
        Vd = Vp[:self.d]
        pv = self._applyP(Vd)
        if self.q:
            pv = pv - self.PZ0 @ tail
        gV = gV.at[:self.d].add(lam * pv)
        if self.q:
            gt = ((self.XFpT @ r).astype(self.dtype)
                  + lam * (self.Z0PZ0 @ tail - self.PZ0.T @ Vd)
                  + self._tail_prior_grad(tail, theta))
        else:
            gt = jnp.zeros((0,), self.dtype)
        # merged-IID diagonal components (PZ0_r = diag(mask_r) Z0)
        for bt in self.band_terms:
            lr = jnp.exp(theta[bt.theta_idx])
            pr = bt.mask * Vd
            if self.q:
                pr = pr - bt.mask * (self.Z0 @ tail)
                gt = gt + lr * (bt.Z0PZ0 @ tail
                                - self.Z0.T @ (bt.mask * Vd))
            gV = gV.at[:self.d].add(lr * pr)
        if self.prior_diag_band is not None:
            pc = self.prior_diag_band * Vd
            if self.q:
                pc = pc - self.prior_diag_band * (self.Z0 @ tail)
                gt = gt + (self.Z0PZ0_pad @ tail
                           - self.Z0.T @ (self.prior_diag_band * Vd))
            gV = gV.at[:self.d].add(pc)
        return gV, gt

    def _assemble_scaled(self, V, tail, theta, eta=None):
        md = self.md
        e = self.eta(V, tail) if eta is None else eta
        wts = families.eta_weights(e, md, theta.astype(self.compute_dtype))
        band = self.band_H(wts, theta)
        C = self.C_block(wts, theta)
        if self.q:
            Hd = (self._gram64(self.XFpT * wts[None, :], self.XFpT)
                  + jnp.exp(theta[self.drv_theta]) * self.Z0PZ0
                  + self._tail_prior_mat(theta))
            for bt in self.band_terms:
                Hd = Hd + jnp.exp(theta[bt.theta_idx]) * bt.Z0PZ0
            if self.prior_diag_band is not None:
                Hd = Hd + self.Z0PZ0_pad
            sd = jax.lax.rsqrt(jnp.diagonal(Hd))
            Hd = Hd * sd[:, None] * sd[None, :]
        else:
            Hd = jnp.zeros((0, 0), self.dtype)
            sd = jnp.zeros((0,), self.dtype)
        sc = jax.lax.rsqrt(band[0])
        band_s = band.at[0].multiply(sc * sc)
        for o in range(1, self.Wl):
            band_s = band_s.at[o, :self.dpad - o].multiply(
                sc[o:] * sc[:self.dpad - o])
        C_s = (C * sc[:, None] * sd[None, :]) if self.q else C
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
        return (self.engine.half_logdet(af) - jnp.sum(jnp.log(sc))
                - jnp.sum(jnp.log(sd)))

    # -- Newton / Laplace (same scheme as fast/iwp.py) --------------------
    def newton_step(self, V, tail, theta, eta_cap=8.0):
        # one shared eta pass + batched line-search likelihoods + exact
        # quadratic prior expansion (see fast/iwp.py newton_step)
        e0 = self.eta(V, tail)
        gV, gt = self.grad_W(V, tail, theta, eta=e0)
        factor = self.hessian_factor(V, tail, theta, eta=e0)
        step_V, step_t = self.solve_H(factor, gV, gt)
        # non-finite step entries (solves through guarded factors of
        # essentially-singular weak-theta Hessians can overflow) are
        # zeroed: 0 * inf = NaN would otherwise make the state NaN, and
        # a NaN state is ABSORBING through every later warm-chained
        # evaluation (measured round 14). max_de keeps the RAW max so
        # an overflowed eta direction still forces alpha -> 0.
        step_V = jnp.where(jnp.isfinite(step_V), step_V, 0.0)
        step_t = jnp.where(jnp.isfinite(step_t), step_t, 0.0)
        d_eta = self.eta(step_V, step_t)
        max_de = jnp.max(jnp.abs(d_eta))
        d_eta = jnp.where(jnp.isfinite(d_eta), d_eta, 0.0)
        alpha0 = jnp.minimum(1.0, eta_cap / jnp.maximum(max_de, 1e-30))
        cands = alpha0 * jnp.asarray([1.0, 0.3, 0.1, 0.03], self.dtype)
        alphas = jnp.concatenate([jnp.zeros((1,), self.dtype), cands])
        md, cdt = self.md, self.compute_dtype
        th_c = theta.astype(cdt)
        etas = e0[None, :] - alphas[:, None].astype(cdt) * d_eta[None, :]
        lls = jax.vmap(lambda ee: families.log_lik(ee, md, th_c))(etas)
        p_0 = self._prior_neg(V, tail, theta)
        p_p = self._prior_neg(V - step_V, tail - step_t, theta)
        p_m = self._prior_neg(V + step_V, tail + step_t, theta)
        c2 = 0.5 * (p_p + p_m) - p_0
        c1 = 0.5 * (p_p - p_m)
        fall = -lls.astype(self.dtype) + (p_0 + c1 * alphas
                                          + c2 * alphas ** 2)
        f0 = fall[0]
        fs = jnp.where(jnp.isnan(fall[1:]), jnp.inf, fall[1:])
        best = jnp.argmin(fs)
        # prefer the largest alpha within fp noise of the best (see
        # fast/iwp.py newton_step)
        eps_c = 1e-12 if self.compute_dtype == jnp.float64 else 3e-7
        noise = eps_c * (1.0 + jnp.abs(f0))
        idx = jnp.argmax(fs <= fs[best] + noise)
        alpha = jnp.where(fs[best] <= f0 + noise, cands[idx], 0.01 * alpha0)
        smax = jnp.max(jnp.abs(step_V))
        if self.q:
            smax = jnp.maximum(smax, jnp.max(jnp.abs(step_t)))
        return V - alpha * step_V, tail - alpha * step_t, smax

    def newton_solve(self, theta, max_iter=100, warm=None):
        if warm is None:
            V0, t0 = self.init_state()
        else:
            V0, t0 = warm
            # a non-finite warm start (an upstream eval in a sick theta
            # region) would be absorbing — fall back to the cold start
            ok = jnp.isfinite(jnp.sum(V0) + jnp.sum(t0))
            V0 = jnp.where(ok, V0, 0.0)
            t0 = jnp.where(ok, t0, 0.0)
        steptol = 1e-9 if self.compute_dtype == jnp.float64 else 3e-6

        # stall cutoff (same rationale as fast/batched.py): in a SICK
        # theta region (essentially-singular Hessian, guarded factors)
        # the step norm never reaches steptol and each fused node eval
        # would burn all max_iter iterations — an 81-node warm-chained
        # scan then runs minutes in ONE dispatch, long enough to trip
        # the tunnel's RPC deadline and take the worker down (round-14
        # crash analysis). Healthy evals converge monotonically to
        # steptol long before 10 non-improving steps accumulate.
        def cond(state):
            V, tail, it, smax, best, since = state
            small = smax < steptol * (1.0 + jnp.max(jnp.abs(V)))
            stalled = since >= 10.0
            return jnp.logical_and(~(small | stalled), it < max_iter)

        def body(state):
            V, tail, it, _, best, since = state
            V2, t2, smax = self.newton_step(V, tail, theta)
            improved = smax < 0.95 * best
            best2 = jnp.minimum(best, smax)
            # float carry tied to the state (see `big` below): int
            # zeros get the wrong varying-axis type under shard_map
            since2 = jnp.where(improved, 0.0 * since, since + 1.0)
            return V2, t2, it + 1, smax, best2, since2

        # tie the carry init to the state so its sharding 'varying'
        # status matches the body outputs under shard_map
        big = jnp.asarray(1e30, self.dtype) + 0.0 * V0[0]
        V, tail, _, _, _, _ = jax.lax.while_loop(
            cond, body, (V0, t0, 0, big, big, 0.0 * big))
        return V, tail

    def _refine(self, V, tail, theta, eta_cap=8.0):
        e0 = self.eta(V, tail)
        gV, gt = self.grad_W(V, tail, theta, eta=e0)
        factor = self.hessian_factor(V, tail, theta, eta=e0)
        step_V, step_t = self.solve_H(factor, gV, gt)
        # at a healthy fixed point the step is ~0 (alpha = 1 exactly,
        # bit-identical); on essentially-singular systems the undamped
        # polish would catapult V to overflow — same guards as
        # newton_step
        step_V = jnp.where(jnp.isfinite(step_V), step_V, 0.0)
        step_t = jnp.where(jnp.isfinite(step_t), step_t, 0.0)
        d_eta = self.eta(step_V, step_t)
        alpha = jnp.minimum(
            1.0, eta_cap / jnp.maximum(jnp.max(jnp.abs(d_eta)), 1e-30))
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        return V - alpha * step_V, tail - alpha * step_t

    def solve_W_star(self, theta, n_refine=1, warm=None):
        if warm is not None:
            warm = jax.lax.stop_gradient(warm)
        V, tail = self.newton_solve(jax.lax.stop_gradient(theta), warm=warm)
        V = jax.lax.stop_gradient(V)
        tail = jax.lax.stop_gradient(tail)
        for _ in range(n_refine):
            V, tail = self._refine(V, tail, theta)
        return jax.lax.stop_gradient(V), jax.lax.stop_gradient(tail)

    def _laplace_value(self, V, tail, theta, factor=None):
        # arrow_half_logdet: Takahashi custom VJP on the Pallas engine;
        # `factor` skips re-factorizing (see fast/iwp.py._laplace_value)
        e0 = self.eta(V, tail)
        band_s, C_s, Hd, sc, sd = self._assemble_scaled(V, tail, theta,
                                                        eta=e0)
        if factor is None:
            hld = self.engine.arrow_half_logdet(band_s, C_s, Hd)
        else:
            hld = self.engine.arrow_half_logdet_given(
                band_s, C_s, Hd, jax.lax.stop_gradient(factor[0]))
        half_logdet = hld - jnp.sum(jnp.log(sc)) - jnp.sum(jnp.log(sd))
        ll = families.log_lik(e0, self.md, theta.astype(self.compute_dtype))
        f = -ll.astype(self.dtype) + self._prior_neg(V, tail, theta)
        w_count = self.w_real if self.w_real is not None else self.d + self.q
        return (f + half_logdet - 0.5 * w_count * LOG2PI - self.logdetT)

    def _laplace_value_direct(self, V, tail, theta, factor, eta=None):
        """Primal-only Laplace value from a precomputed factor (no
        Hessian assembly; see fast/iwp.py). `eta` skips the O(n) design
        pass when the caller already computed it."""
        e0 = self.eta(V, tail) if eta is None else eta
        ll = families.log_lik(e0, self.md, theta.astype(self.compute_dtype))
        f = -ll.astype(self.dtype) + self._prior_neg(V, tail, theta)
        w_count = self.w_real if self.w_real is not None else self.d + self.q
        return (f + self.half_logdet_H(factor)
                - 0.5 * w_count * LOG2PI - self.logdetT)

    def laplace_eval_full(self, theta, warm):
        """(nll, (V, tail), factor) in one pass — the quadrature-node
        evaluation primitive (see fast/iwp.py)."""
        V, tail = self.solve_W_star(theta, warm=warm)
        e0 = self.eta(V, tail)
        factor = self.hessian_factor(V, tail, theta, eta=e0)
        val = self._laplace_value_direct(V, tail, theta, factor, eta=e0)
        return val, (V, tail), factor

    def laplace_nll(self, theta, warm=None):
        val, (V, tail) = self._nll_custom(theta, warm if warm is not None
                                          else self.init_state())
        return val, (V, tail)

    def nll(self, theta):
        return self.laplace_nll(theta)[0]

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
            # ONE eta pass + ONE assembly+factorization shared by value
            # and backward
            e0 = self.eta(V, tail)
            factor = self.hessian_factor(V, tail, theta, eta=e0)
            val = self._laplace_value_direct(V, tail, theta, factor,
                                             eta=e0)
            return (val, (V, tail)), (theta, V, tail, factor)

        def bwd(res, cts):
            theta, V, tail, factor = res
            ct_val = cts[0]
            gF_V, gF_t, gF_th = jax.grad(
                lambda V_, t_, th_: self._laplace_value(V_, t_, th_,
                                                        factor=factor),
                argnums=(0, 1, 2))(V, tail, theta)
            # sanitize the implicit-correction pieces: solves through a
            # guarded factor of a sick (weak-theta) system can be
            # non-finite, which would put NaN into the OUTER gradient
            # and strand the theta optimizer. Healthy evals:
            # bit-identity. The explicit gF_th signal survives, so the
            # sick-region gradient still points up the precision scale.
            _san = lambda x: jnp.where(jnp.isfinite(x), x,
                                       jnp.zeros_like(x))
            gF_V, gF_t = _san(gF_V), _san(gF_t)
            vV, vt = self.solve_H(factor, gF_V, gF_t)
            vV, vt = _san(vV), _san(vt)

            def gdotv(th):
                gV, gt = self.grad_W(V, tail, th)
                out = jnp.dot(gV, vV)
                if self.q:
                    out = out + jnp.dot(gt, vt)
                return out

            term2 = jax.grad(gdotv)(theta)
            dth = (gF_th - term2) * ct_val
            return dth, jax.tree_util.tree_map(jnp.zeros_like, (V, tail))

        nll_fn.defvjp(fwd, bwd)
        self._nll_cvjp = nll_fn
        return nll_fn

    # -- outer-optimizer interface ----------------------------------------
    def init_state(self):
        return (jnp.zeros((self.dpad,), self.dtype),
                jnp.zeros((self.q,), self.dtype))

    def nll_warm(self, theta, warm):
        return self.laplace_nll(theta, warm=warm)

    def val_grad_fn(self):
        if not hasattr(self, "_vg"):
            self._vg = jax.jit(jax.value_and_grad(self.nll))
        return self._vg

    def hess_fn(self):
        if not hasattr(self, "_hess"):
            hw = self.hess_warm_fn()
            self._hess = lambda th: hw(th, self.init_state())
        return self._hess

    def vmap_nll_fn(self):
        if not hasattr(self, "_vnll"):
            one = jax.jit(self.nll)
            self._vnll = lambda ths: jnp.stack(
                [one(ths[j]) for j in range(ths.shape[0])])
        return self._vnll

    def val_grad_warm_fn(self):
        if not hasattr(self, "_vgw"):
            self._vgw = jax.jit(
                jax.value_and_grad(self.nll_warm, has_aux=True))
        return self._vgw

    def hess_warm_fn(self):
        """Outer Hessian: central differences of the exact implicit
        gradient (see fast/iwp.py)."""
        if not hasattr(self, "_hessw"):
            grad_fn = jax.grad(lambda th, st: self.nll_warm(th, st)[0])

            def hess(theta, st):
                s = theta.shape[0]
                # f32: FD step large enough that H*h >> gradient noise
                # (see fast/iwp.py hess_warm_fn)
                h = 1e-4 if self.compute_dtype == jnp.float64 else 0.3
                eye = jnp.eye(s, dtype=theta.dtype)

                def col(i):
                    gp = grad_fn(theta + h * eye[i], st)
                    gm = grad_fn(theta - h * eye[i], st)
                    return (gp - gm) / (2 * h)

                H = jnp.stack([col(i) for i in range(s)])
                return 0.5 * (H + H.T)

            self._hessw = jax.jit(hess)
        return self._hessw

    def vmap_nll_warm_fn(self):
        # host loop over nodes (vmap over the solver kernels faults the
        # TPU worker at large d — see fast/iwp.py)
        if not hasattr(self, "_vnllw"):
            one = jax.jit(lambda th, wm: self.nll_warm(th, wm)[0])

            def run(ths, wm):
                return jnp.stack([one(ths[j], wm)
                                  for j in range(ths.shape[0])])

            self._vnllw = run
        return self._vnllw

    def node_eval(self, thetas, warm=None):
        if not hasattr(self, "_node_eval_fn"):
            def one(th, wm):
                nll, (V, tail), factor = self.laplace_eval_full(th, wm)
                return nll, (V, tail, factor)

            self._node_eval_fn = jax.jit(one)
        if warm is None:
            warm = self.init_state()
        outs = [self._node_eval_fn(thetas[j], warm)
                for j in range(thetas.shape[0])]
        nlls = jnp.stack([o[0] for o in outs])
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[o[1] for o in outs])
        return nlls, states

    def sample_traceable(self, key, states, idx, M):
        """Mixture sampling body: (M, w_ref) f32 draws in REFERENCE
        coordinates/order; traceable (runs inside the fused fit program
        for one-dispatch fit + posterior draws). Static unroll over the
        quadrature nodes — lax.map over the solver kernels is a
        TPU-worker landmine at large d. f32 output: Monte-Carlo error
        >> 1e-7 and the f64 transfer dominated sampling wall time."""
        V, tail, factor = states

        J = jax.tree_util.tree_leaves(factor)[0].shape[0]
        k1, k2 = jax.random.split(key)
        zb = jax.random.normal(k1, (self.dpad, M), self.dtype)
        zd = jax.random.normal(k2, (self.q, M), self.dtype)

        def one_node(fi):
            af, sc, sd = fi
            xb, xd = self.engine.sample_multi(af, zb, zd)
            return (xb * sc[:, None],
                    xd * sd[:, None] if self.q else xd)

        outs = [one_node(jax.tree_util.tree_map(lambda x: x[j], factor))
                for j in range(J)]
        xbs = jnp.stack([o[0] for o in outs])
        xds = jnp.stack([o[1] for o in outs])
        m_ar = jnp.arange(M)
        devV = xbs[idx, :, m_ar]
        devt = xds[idx, :, m_ar]
        Vs = V[idx] + devV
        ts = tail[idx] + devt
        Vact = jax.vmap(self.to_V)(Vs, ts)
        U = self.apply_T(Vact[:, :self.d])
        full = jnp.concatenate([U, ts], axis=1)          # backend order
        return full[:, self.ref_perm].astype(jnp.float32)

    def sample(self, key, states, idx, M):
        """(w_ref, M) posterior samples (host numpy); see
        sample_traceable."""
        if not hasattr(self, "_sample_jit"):
            self._sample_jit = jax.jit(
                self.sample_traceable, static_argnums=(3,))
        samps = self._sample_jit(key, states, idx, M)
        return np.asarray(samps, np.float64).T


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def _merge_iid_into_band(vals_d, start_d, p, d_drv, P_band_d, Tdiags_d,
                         codes, q, max_span_periods=None):
    """Interleave q IID level coefficients into the IWP driver band.

    Layout: uniform periods of Pm = 1 + Gi merged columns — driver
    column b at b*Pm, its mapped levels at b*Pm + 1 + g (g < Gi; unused
    slots are PADDED with a unit-precision empty coordinate). Level j
    maps to the period of the median driver window start among its
    rows. The merge is band-limited iff every row's level sits within a
    few periods of its driver window (x-CLUSTERED levels: an
    observation-level / binned random effect on the same axis as the
    smooth — the overdispersion pattern). Scattered levels raise.

    This is the TPU-native counterpart of the reference's CHOLMOD
    sparse Cholesky for large-q IID terms (R/02_model_fit.R:276-284):
    the IID Hessian block is DIAGONAL (one indicator per row), so
    eliminating it alongside the driver keeps one banded factorization
    with a modestly wider band — no scatter ops, no (q, q) tail.

    Returns (vals_m, start_m, P_band_m, Tdiags_m, G, Wl, d_m, iid_cols,
    pad_cols) with P_band_m containing ONLY the driver entries (the IID
    diagonal enters theta-scaled through BandDiagTerm.mask).
    """
    n = len(start_d)
    p1 = vals_d.shape[1]                       # p + 1 window values
    counts = np.bincount(codes, minlength=q)
    order_lv = np.argsort(codes, kind="stable")
    sorted_starts = start_d[order_lv]
    ends = np.cumsum(counts)
    med_idx = np.minimum(ends - counts + counts // 2, n - 1)
    lev_period = np.clip(sorted_starts[med_idx], 0, d_drv - 1)

    # capacity-capped rebalancing: the natural (median-start) mapping
    # can pile 2-3x the average level count onto a few periods, which
    # multiplies the merged bandwidth for EVERY row. Spill overflow
    # greedily to later periods — levels are x-ordered, so the drift is
    # small and the span check below accounts for it exactly.
    cap = max(1, -(-q // d_drv))
    cnt_nat = np.zeros(d_drv, np.int64)
    order_j = np.argsort(lev_period, kind="stable")
    for j in order_j:
        t = int(lev_period[j])
        while cnt_nat[t] >= cap and t < d_drv - 1:
            t += 1
        lev_period[j] = t
        cnt_nat[t] += 1

    row_lev = lev_period[codes]                # (n,) level period per row
    row_off = row_lev - start_d
    span = int(max(int(row_off.max(initial=0)), p1 - 1)
               - min(int(row_off.min(initial=0)), 0) + 1)
    limit = max_span_periods or (p1 + 8)
    if span > d_drv:
        raise ValueError(
            f"merged-IID window span {span} exceeds the driver dimension "
            f"{d_drv}; the driver term is too small to band-merge")
    if span > limit:
        raise ValueError(
            f"merged-IID band span {span} knot intervals exceeds {limit}: "
            "the IID levels are not x-clustered against the driver (each "
            "level's observations must fall within a few knot intervals "
            "of each other). This regime needs a general sparse "
            "factorization; reduce the level count below "
            "terms.IID_LAZY_MIN_LEVELS to use the dense-tail path.")

    percnt = np.bincount(lev_period, minlength=d_drv)
    Gi = int(percnt.max())
    Pm = 1 + Gi
    d_m = d_drv * Pm
    # slot index per level within its period (levels are in sorted-x /
    # reference factor order; stable order within a period)
    slot = np.zeros(q, np.int64)
    seen = np.zeros(d_drv, np.int64)
    for j in np.argsort(lev_period, kind="stable"):
        t = lev_period[j]
        slot[j] = seen[t]
        seen[t] += 1
    iid_cols = lev_period * Pm + 1 + slot
    used = np.zeros(d_m, bool)
    used[np.arange(d_drv) * Pm] = True
    used[iid_cols] = True
    pad_cols = np.nonzero(~used)[0]

    # merged row windows
    Wl = span * Pm
    base = np.minimum(start_d, row_lev)
    base = np.minimum(base, d_drv - span)      # keep window inside d_m
    base = np.maximum(base, 0)
    vals_m = np.zeros((n, Wl), vals_d.dtype)
    rows = np.arange(n)
    for a in range(p1):
        vals_m[rows, (start_d - base + a) * Pm] = vals_d[:, a]
    lev_rel = (row_lev - base) * Pm + 1 + slot[codes]
    vals_m[rows, lev_rel] += 1.0
    start_m = base * Pm

    # driver prior band at stride Pm
    P_band_m = np.zeros((Wl, d_m))
    for o in range(min(P_band_d.shape[0], span)):
        P_band_m[o * Pm, np.arange(d_drv - o) * Pm] = P_band_d[o, :d_drv - o]

    # driver T at stride Pm; identity on level and padded columns
    Tdiags_m = np.zeros(((p1 - 1) * Pm + 1, d_m))
    for o in range(p1):
        cols = np.arange(o, d_drv)
        Tdiags_m[o * Pm, cols * Pm] = Tdiags_d[o, o:]
    Tdiags_m[0, iid_cols] = 1.0
    if len(pad_cols):
        Tdiags_m[0, pad_cols] = 1.0

    return (vals_m, start_m, P_band_m, Tdiags_m, Pm, Wl, d_m,
            iid_cols, pad_cols)


def build_banded_backend(instances, md, design_mat_fixed, bf_prec, bf_mean,
                         dtype=None, driver_idx: Optional[int] = None):
    """Build a BandedBackend for a multi-term / sGP model.

    instances: list of TermDesign (any mix of IWP/sGP/IID/Customized);
    the driver is the largest IWP or sGP term (or `driver_idx`).
    """
    import dataclasses as _dc
    from scipy.linalg import solveh_banded

    # ---- choose driver ----
    eligible = [i for i, t in enumerate(instances)
                if t.kind in ("IWP", "sGP")
                and (t.kind != "IWP" or np.asarray(t.knots).min() >= 0)]
    if driver_idx is None:
        if not eligible:
            raise ValueError("banded backend needs an IWP or sGP term")
        driver_idx = max(eligible, key=lambda i: instances[i].num_basis)
    drv = instances[driver_idx]

    # ---- driver banded structures ----
    if drv.kind == "IWP":
        p = drv.order
        knots = np.asarray(drv.knots, np.float64)
        if knots.min() < 0:
            raise ValueError("banded IWP driver requires nonnegative knots")
        d = len(knots) - 1
        G, Wl = 1, p + 1
        vals, start = reparam.sparse_rows(drv.x_data, knots, p)
        P_band_d, logdetT, T = reparam.prior_band(knots, p)
        P_band = np.zeros((Wl, d))
        P_band[:P_band_d.shape[0]] = P_band_d
        Tdiags = np.zeros((p + 1, d))
        for o in range(p + 1):
            Tdiags[o, o:] = np.diagonal(T, -o)
        logPdet_drv = float(md.logPdet[driver_idx])
        d_drv = d
        inv_perm = np.arange(d)      # U (ref) index for each V index via T
    else:  # sGP
        vals, start, kb, G = _sgp_sparse_rows(drv)
        Wl = 4 * G
        d = kb * G
        perm = _sgp_interleave_perm(kb, G)
        Q_group = np.asarray(drv.P, np.float64)
        Qi = Q_group[np.ix_(perm, perm)]
        P_band = _band_from_dense(Qi, Wl - 1)
        Tdiags = None
        logdetT = 0.0
        logPdet_drv = float(md.logPdet[driver_idx])
        d_drv = d
        inv_perm = perm              # ref column index of interleaved col j

    # ---- merged-IID detection (lazy terms: B is None, P = I implied) --
    lazy_iid = [i for i, t in enumerate(instances)
                if i != driver_idx and t.kind == "IID" and t.B is None]
    iid_cols = pad_cols = None
    d_drv_real = d
    merged_iid_idx = None
    if lazy_iid:
        q_iid = sum(len(instances[i].levels) for i in lazy_iid)

        def _densify_or_raise(msg):
            if q_iid <= 4000:
                import warnings
                warnings.warn(msg + " — densifying the IID term into the "
                              "tail (O(q^2) memory, fine at this size)")
                for i in lazy_iid:
                    instances[i].ensure_B()
                return True
            raise ValueError(msg + f" (q={q_iid} is too large for the "
                             "dense-tail fallback)")

        if len(lazy_iid) > 1:
            if _densify_or_raise("merged-IID supports one large IID term"):
                lazy_iid = []
        elif drv.kind != "IWP":
            if _densify_or_raise("merged-IID needs an IWP driver term"):
                lazy_iid = []
    if lazy_iid:
        i_iid = lazy_iid[0]
        t_iid = instances[i_iid]
        codes_iid = t_iid.extra["codes"]
        q_iid = len(t_iid.levels)
        try:
            (vals, start, P_band, Tdiags, G, Wl, d,
             iid_cols, pad_cols) = _merge_iid_into_band(
                vals, start, p + 1, d, P_band_d, Tdiags, codes_iid, q_iid)
            merged_iid_idx = i_iid
        except ValueError as e:
            if _densify_or_raise(str(e)):
                iid_cols = pad_cols = None

    bw = Wl - 1
    s = _choose_block(d, bw)
    # round the block size to a multiple of G so dpad is G-aligned (the
    # strided band assembly views band rows as a (dpad/G, G) grid)
    s = -(-s // G) * G
    nb = -(-d // s)
    dpad = nb * s

    # ---- sort rows by segment ----
    order = np.argsort(start, kind="stable")
    vals = vals[order]
    start = start[order]
    n = len(start)

    # segments = start // G; n_seg = dpad // G
    n_seg = dpad // G
    seg_ids = start // G
    counts = np.bincount(seg_ids, minlength=n_seg)[:n_seg]
    seg_hi = np.cumsum(counts)
    seg_lo = seg_hi - counts

    # ---- tail assembly: [other U blocks | boundary betas | fixed] ----
    tail_cols = []
    tail_terms = []
    off = 0
    for i, t in enumerate(instances):
        if i == driver_idx or i == merged_iid_idx:
            continue
        Bt_ = t.ensure_B()
        tail_cols.append(np.asarray(Bt_, np.float64))
        tail_terms.append(TailTermBlock(
            offset=off, size=Bt_.shape[1], theta_idx=i,
            P=np.asarray(t.P, np.float64),
            logPdet=float(md.logPdet[i]), d_size=Bt_.shape[1]))
        off += Bt_.shape[1]
    diag_list = [np.zeros(off)]
    mean_list = [np.zeros(off)]
    for i, t in enumerate(instances):
        if t.X.shape[1] > 0:
            tail_cols.append(np.asarray(t.X, np.float64))
            diag_list.append(np.full(t.X.shape[1],
                                     t.boundary_prior["prec"]))
            mean_list.append(np.full(t.X.shape[1],
                                     t.boundary_prior["mean"]))
    for c in design_mat_fixed:
        tail_cols.append(np.asarray(c, np.float64))
    diag_list.append(np.asarray(bf_prec, np.float64))
    mean_list.append(np.asarray(bf_mean, np.float64))
    xf_dense = (np.concatenate(tail_cols, axis=1) if tail_cols
                else np.zeros((n, 0)))
    xf_dense = xf_dense[order]
    prior_diag_tail = np.concatenate(diag_list)
    prior_mean_tail = np.concatenate(mean_list)
    q = xf_dense.shape[1]

    md_perm = _dc.replace(
        md, y=np.asarray(md.y)[order],
        size=(np.asarray(md.size)[order] if np.ndim(md.size) and
              np.shape(md.size)[0] == n else md.size))

    # ---- penalized tail orthogonalization (host, float64) ----
    if q:
        Gband = np.zeros((Wl, d))
        for o in range(Wl):
            for b in range(Wl - o):
                a = b + o
                w_ = vals[:, a] * vals[:, b]
                Gband[o] += np.bincount(start + b, weights=w_,
                                        minlength=d)[:d]
        BX = np.zeros((d, q))
        for a in range(Wl):
            cols = np.clip(start + a, 0, d - 1)
            for c in range(q):
                BX[:, c] += np.bincount(cols, weights=vals[:, a]
                                        * xf_dense[:, c], minlength=d)[:d]
        tau = 1e2 * (Gband[0].mean() / max(P_band[0].mean(), 1e-30))
        Gb = Gband + tau * P_band
        Gb[0] += 1e-9 * max(Gband[0].max(), 1.0)
        if pad_cols is not None and len(pad_cols):
            # padded merged slots have no data/prior mass in Gb; their
            # unit prior keeps the orthogonalization solve conditioned
            Gb[0, pad_cols] += 1.0
        Z0 = solveh_banded(Gb, BX, lower=True)
        XFp = xf_dense.copy()
        for a in range(Wl):
            XFp -= vals[:, a, None] * Z0[np.clip(start + a, 0, d - 1), :]
        # P Z0 and Z0' P Z0 via factored forms where available
        if drv.kind == "IWP":
            wk = np.diff(np.asarray(drv.knots, np.float64))
            if merged_iid_idx is not None:
                # driver weights at stride G in the merged layout; the
                # level/padded columns carry ZERO driver-prior weight
                wk_m = np.zeros(d)
                wk_m[np.arange(d_drv_real) * G] = wk
                wk = wk_m
            Tdiags_np = Tdiags
            nTo = Tdiags_np.shape[0]
            G0 = Tdiags_np[0][:, None] * Z0
            for o in range(1, nTo):
                G0[o:] += Tdiags_np[o, o:, None] * Z0[:-o]
            wG0 = wk[:, None] * G0
            PZ0 = Tdiags_np[0][:, None] * wG0
            for o in range(1, nTo):
                PZ0[:-o] += Tdiags_np[o, o:, None] * wG0[o:]
            Z0PZ0 = ((np.sqrt(wk)[:, None] * G0).T
                     @ (np.sqrt(wk)[:, None] * G0))
        else:
            # sGP precision is well-conditioned full-rank: direct banded
            # products in float64 suffice (no 1e8-scale null-space
            # cancellation — Q has no polynomial null space)
            Pd = np.zeros((d, d))
            for o in range(Wl):
                diag_vals = P_band[o, :d - o]
                Pd[np.arange(o, d), np.arange(d - o)] = diag_vals
                if o:
                    Pd[np.arange(d - o), np.arange(o, d)] = diag_vals
            PZ0 = Pd @ Z0
            Z0PZ0 = Z0.T @ PZ0
            Z0PZ0 = 0.5 * (Z0PZ0 + Z0PZ0.T)
    else:
        Z0 = np.zeros((d, 0))
        PZ0 = np.zeros((d, 0))
        Z0PZ0 = np.zeros((0, 0))
        XFp = xf_dense

    # ---- reference-order permutation ----
    # backend order: [driver U (d) | other U blocks | betas | fixed]
    # reference order: [U_1..U_r | beta_1..beta_rX | fixed]
    w_ref = sum(md.d_sizes) + sum(md.x_sizes) + md.xf_count
    ref_of_backend = np.zeros(d + q, dtype=np.int64)
    # driver U block -> its reference slot, through inv_perm for sGP
    drv_off = int(np.sum(np.asarray(md.d_sizes)[:driver_idx]))
    if merged_iid_idx is not None:
        # merged layout: driver col b at b*G, IID level j at iid_cols[j],
        # padded slots get out-of-range sentinels (never sampled)
        ref_of_backend[np.arange(d_drv_real) * G] = (
            drv_off + np.arange(d_drv_real))
        iid_off = int(np.sum(np.asarray(md.d_sizes)[:merged_iid_idx]))
        q_iid_m = len(iid_cols)
        ref_of_backend[iid_cols] = iid_off + np.arange(q_iid_m)
        if len(pad_cols):
            ref_of_backend[pad_cols] = w_ref + np.arange(len(pad_cols))
    elif drv.kind == "sGP":
        # backend col j holds U[inv_perm[j]]
        ref_of_backend[:d] = drv_off + inv_perm
    else:
        ref_of_backend[:d] = drv_off + np.arange(d)
    pos = d
    for i, t in enumerate(instances):
        if i == driver_idx or i == merged_iid_idx:
            continue
        off_r = int(np.sum(np.asarray(md.d_sizes)[:i]))
        ref_of_backend[pos:pos + t.num_basis] = off_r + np.arange(t.num_basis)
        pos += t.num_basis
    beta_off = sum(md.d_sizes)
    for i, t in enumerate(instances):
        xc = t.X.shape[1]
        if xc > 0:
            ref_of_backend[pos:pos + xc] = beta_off + np.arange(xc)
            beta_off += xc
            pos += xc
    nfix = md.xf_count
    fix_off = sum(md.d_sizes) + sum(md.x_sizes)
    ref_of_backend[pos:pos + nfix] = fix_off + np.arange(nfix)
    pos += nfix
    n_pad = len(pad_cols) if pad_cols is not None else 0
    assert pos == d + q and pos - n_pad == w_ref
    # sample() produces backend-order rows [U_drv | tail]; we need
    # full[:, ref_perm][j] = column that lands at reference j: padded
    # merged slots sort past w_ref and are dropped
    ref_perm = np.argsort(ref_of_backend)[:w_ref]

    # ---- merged-IID prior components ----
    x64 = bool(jax.config.read("jax_enable_x64"))
    dt = dtype or (np.float64 if x64 else np.float32)
    if not x64:
        dt = np.float32
    sdt = jnp.float64 if x64 else jnp.float32

    band_terms = ()
    prior_diag_band = None
    Z0PZ0_pad = None
    w_real = None
    if merged_iid_idx is not None:
        t_iid = instances[merged_iid_idx]
        q_iid_m = len(t_iid.levels)
        mask_iid = np.zeros(d)
        mask_iid[iid_cols] = 1.0
        Z0PZ0_iid = (Z0.T @ (mask_iid[:, None] * Z0) if q
                     else np.zeros((0, 0)))
        band_terms = (BandDiagTerm(
            theta_idx=merged_iid_idx, mask=np.asarray(mask_iid, sdt),
            d_size=q_iid_m, logPdet=0.0,
            Z0PZ0=np.asarray(Z0PZ0_iid, sdt)),)
        if len(pad_cols):
            pd = np.zeros(d)
            pd[pad_cols] = 1.0
            prior_diag_band = np.asarray(pd, sdt)
            Z0PZ0_pad = np.asarray(
                Z0.T @ (pd[:, None] * Z0) if q else np.zeros((0, 0)), sdt)
        w_real = w_ref
    md_perm = _dc.replace(
        md_perm, y=np.asarray(md_perm.y, dt),
        size=np.asarray(md_perm.size, dt))

    # dense per-chunk windowed design (MXU path; see fast/iwp.py).
    # Merged-IID bands are wider, so the window cap scales with Wl and
    # the chunk length backs off before giving up on the MXU path.
    chunks = None
    w_cap = max(128, min(512, 2 * Wl))
    for CH in (1024, 512, 256):
        nchk = -(-n // CH)
        if not n:
            break
        bases_w = []
        wmax = 0
        for c in range(nchk):
            lo, hi = c * CH, min((c + 1) * CH, n)
            b = int(start[lo])
            wmax = max(wmax, int(start[hi - 1]) - b + Wl)
            bases_w.append(b)
        w_win = max(8, -(-wmax // 8) * 8)
        if w_win <= w_cap:
            Dm = np.zeros((nchk, CH, w_win), dt)
            rows_i = np.arange(n)
            rel = start - np.asarray(bases_w, np.int64)[rows_i // CH]
            for a in range(Wl):
                Dm[rows_i // CH, rows_i % CH, rel + a] = vals[:, a]
            XFp_rows = np.zeros((nchk, CH, max(q, 1)), dt)
            if q:
                XFp_rows[rows_i // CH, rows_i % CH, :] = XFp
            chunks = ChunkDesign(
                D=jnp.asarray(Dm), XFp_rows=jnp.asarray(XFp_rows),
                bases=np.asarray(bases_w, np.int64), nc=nchk, CH=CH,
                w=w_win, n=n)
            break

    return BandedBackend(
        md=md_perm, drv_theta=driver_idx, Wl=Wl, G=G, d=d, dpad=dpad,
        s=s, nb=nb, q=q,
        valsT=jnp.asarray(np.ascontiguousarray(vals.T), dt),
        start=jnp.asarray(start),
        seg_lo=np.asarray(seg_lo, np.int64),
        seg_hi=np.asarray(seg_hi, np.int64), n_seg=n_seg,
        XFpT=jnp.asarray(np.ascontiguousarray(XFp.T), dt),
        # non-lifted fields stay HOST numpy — device constants cost one
        # tunnel round trip EACH at MLIR-lowering time (see
        # fast/iwp.py build_fast_iwp return)
        Z0=np.asarray(Z0, sdt), PZ0=np.asarray(PZ0, sdt),
        Z0PZ0=np.asarray(Z0PZ0, sdt),
        P_band=np.asarray(P_band, sdt),
        logPdet_drv=logPdet_drv, d_drv=d_drv,
        Tdiags=(np.asarray(Tdiags, sdt) if Tdiags is not None else None),
        logdetT=float(logdetT),
        prior_diag_tail=np.asarray(prior_diag_tail, sdt),
        prior_mean_tail=np.asarray(prior_mean_tail, sdt),
        tail_terms=tuple(tail_terms),
        ref_perm=np.asarray(ref_perm),
        solve_dtype=sdt,
        engine=band_arrow.make_engine(dpad, Wl - 1, q, s),
        chunks=chunks,
        band_terms=band_terms, prior_diag_band=prior_diag_band,
        Z0PZ0_pad=Z0PZ0_pad, w_real=w_real)
