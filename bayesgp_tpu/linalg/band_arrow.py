"""Arrowhead (banded + dense tail) SPD linear algebra with two engines.

The conditional Hessian of every model in this framework has the form

    H = [[Hb (banded, bw small), C], [C^T, Hd (dense q x q)]]

(SURVEY.md §7 layer 3). This module provides factor / solve /
half-logdet / precision-sampling on that structure behind one API with
two interchangeable engines:

  - PallasEngine (TPU): double-float band kernels from band_kernels.py
    — one on-core loop per factorization instead of XLA's ~d
    dispatched while-iterations (the measured 100x overhead,
    BENCH_NOTES.md). The dense q x q tail algebra runs as unrolled
    f64 XLA (chol_kernels.py) so no sequential while-loops remain.
  - BlockEngine (CPU/fallback): the block-tridiagonal scan path of
    block_tridiag.py (float64; used by the CPU test suite and whenever
    q > 128 or bw > 31).

`arrow_half_logdet` is the AD entry point for Laplace values: on the
Pallas engine it carries a custom VJP computed from the TAKAHASHI
selected inverse (band of H^{-1} from one extra O(d bw^2) kernel pass)
— the gradient of log|H| never differentiates through the
factorization recurrence. d(0.5 log|H|)/dH = 0.5 H^{-1}, restricted to
the band / cross / dense blocks that parameterize H. (Reference
counterpart: TMB's inner-problem log-det derivatives via CHOLMOD's
selected inverse.)
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import band_kernels as bk
from . import block_tridiag as btl
from . import chol_dd
from . import chol_kernels as ck
from . import dd


# -- small dense helpers (unrolled; no sequential while-loops on TPU) -------

def _pad_dim(q: int) -> int:
    if q <= 16:
        return q
    for cand in (32, 64, 128):
        if q <= cand:
            return cand
    # q > 128 always takes the native-tail path; pad size is unused
    return q


def _native_tail(q: int) -> bool:
    """Use XLA's native cholesky/solve_triangular for the dense tail
    when the padded size exceeds the 16-wide unrolled base.

    Measured on the axon TPU backend: the blocked/unrolled f64 kernels
    COMPILE catastrophically at large pads (~145 s for a 128 cholesky,
    ~48 s per trsm — and they are traced into every Laplace body, which
    turned a q=117 sGP+IID fit into a 75+ min XLA compile), while the
    native primitives compile in ~1 s at the SAME ~9 ms runtime
    (chol_kernels.use_blocked notes). Below pad 16 the unrolled base is
    fine and keeps the proven q<=16 programs (headline bench) unchanged."""
    return _pad_dim(q) > 16


def _chol_jittered(cholfn, S):
    """Failure escalation around any chol implementation: plain ->
    + jitter*scale*I -> diagonal-only surrogate (always factors).
    Healthy matrices factor bit-identically; see
    linalg/block_tridiag.chol_guarded for why the surrogate level is
    needed (intermediate Schur blocks of essentially-singular
    weak-theta Hessians go indefinite by O(1)). Probes run on
    stop_gradient copies so no NaN reaches gradients."""
    q = S.shape[0]
    eye = jnp.eye(q, dtype=S.dtype)
    Ssg = jax.lax.stop_gradient(S)
    diag_sg = jnp.diagonal(Ssg)
    scale = jnp.maximum(jnp.mean(jnp.abs(diag_sg)),
                        jnp.asarray(1e-30, S.dtype))

    def _ok(L):
        return jnp.all(jnp.isfinite(jnp.diagonal(L)))

    ok0 = _ok(cholfn(Ssg))
    jit = jnp.where(ok0, jnp.asarray(0.0, S.dtype),
                    (btl.CHOL_JITTER * scale).astype(S.dtype))
    ok1 = _ok(cholfn(Ssg + jit * eye))
    dsafe = jnp.maximum(jnp.abs(jnp.diagonal(S)),
                        (1e-8 * scale).astype(S.dtype))
    Sfin = jnp.where(ok1, S + jit * eye, eye * dsafe[None, :])
    return cholfn(Sfin)


def small_chol(S):
    """Lower Cholesky of a (q, q) SPD matrix via the unrolled/blocked
    kernels (identity-padded to a supported size)."""
    q = S.shape[0]
    if q == 0:
        return S
    if chol_dd.use_dd_dense(S.dtype, q):
        # large dense tails: XLA's native f64 cholesky CRASHES the
        # v5-lite worker from q ~ 300 (round-13/15 landmine) — route
        # through the blocked double-float factor (pivots clamp
        # in-kernel, so no jitter escalation needed)
        return chol_dd.cholesky_dd_f64(S)
    if _native_tail(q):
        return _chol_jittered(jnp.linalg.cholesky, S)
    m = _pad_dim(q)
    if m != q:
        def padded(Sx):
            Sp = jnp.eye(m, dtype=Sx.dtype).at[:q, :q].set(Sx)
            return ck.cholesky_blocked(Sp)[:q, :q]
        return _chol_jittered(padded, S)
    return _chol_jittered(ck.cholesky_blocked, S)


def small_solve_L(L, b):
    q = L.shape[0]
    if q == 0:
        return b
    if chol_dd.use_dd_dense(L.dtype, q):
        return chol_dd.solve_lower_blocked(L, b)
    if _native_tail(q):
        return jax.scipy.linalg.solve_triangular(L, b, lower=True)
    m = _pad_dim(q)
    if m != q:
        Lp = jnp.eye(m, dtype=L.dtype).at[:q, :q].set(L)
        bp = jnp.zeros((m,) + b.shape[1:], b.dtype).at[:q].set(b)
        return ck.trsm_left_lower(Lp, bp)[:q]
    return ck.trsm_left_lower(L, b)


def small_solve_Lt(L, b):
    q = L.shape[0]
    if q == 0:
        return b
    if chol_dd.use_dd_dense(L.dtype, q):
        return chol_dd.solve_lower_t_blocked(L, b)
    if _native_tail(q):
        return jax.scipy.linalg.solve_triangular(L, b, trans="T",
                                                 lower=True)
    m = _pad_dim(q)
    if m != q:
        Lp = jnp.eye(m, dtype=L.dtype).at[:q, :q].set(L)
        bp = jnp.zeros((m,) + b.shape[1:], b.dtype).at[:q].set(b)
        return ck.trsm_left_lower_t(Lp, bp)[:q]
    return ck.trsm_left_lower_t(L, b)


# ---------------------------------------------------------------------------

# Contraction length beyond which the Schur-tail products route through
# the split-f32 accumulator below. XLA's emulated f64 matmul on this
# TPU accumulates at ~4e-6 ABSOLUTE over a 16k contraction (measured
# round 14, tools/chunked_onchip_check.py) — fine at the headline
# d~2000 (errors well under the f32 likelihood noise, and the proven
# cached programs stay byte-identical under this gate) but 100x too
# coarse for the chunked d ~ 1e4 regime.
_ACC_DOT_MIN_D = 4096


def _use_acc_dot(d: int) -> bool:
    return d > _ACC_DOT_MIN_D and jax.default_backend() == "tpu"


def acc_dot_d(A, B, chunk: int = 512):
    """A^T B for f64 (d, p) x (d, r) with two-level accumulation:
    operands split into (hi, lo) f32 pairs, three f32 MXU matmuls per
    row-chunk (the lo*lo term is ~2^-48 relative, dropped), partials
    summed in f64 across the ~d/chunk chunks. Keeps the arrow tail's
    Gram/cross products at ~1e-8 absolute where the emulated f64
    matmul gives ~1e-5 (see _ACC_DOT_MIN_D)."""
    d = A.shape[0]
    nc = -(-d // chunk)
    pad = nc * chunk - d
    if pad:
        A = jnp.pad(A, ((0, pad), (0, 0)))
        B = jnp.pad(B, ((0, pad), (0, 0)))
    Ar = A.reshape(nc, chunk, A.shape[1])
    Br = B.reshape(nc, chunk, B.shape[1])
    Ah = Ar.astype(jnp.float32)
    Al = (Ar - Ah.astype(jnp.float64)).astype(jnp.float32)
    Bh = Br.astype(jnp.float32)
    Bl = (Br - Bh.astype(jnp.float64)).astype(jnp.float32)
    hi = jnp.einsum("cdp,cdr->cpr", Ah, Bh)
    mid = (jnp.einsum("cdp,cdr->cpr", Ah, Bl)
           + jnp.einsum("cdp,cdr->cpr", Al, Bh))
    return jnp.sum(hi.astype(jnp.float64) + mid.astype(jnp.float64),
                   axis=0)


class PallasFactor(NamedTuple):
    Lh: jnp.ndarray      # (R, 128) f32 band of L + 1/Ljj stash
    Ll: jnp.ndarray      # (R, 128) f32
    Y: jnp.ndarray       # (d, q) f64: L^{-1} C
    Ls: jnp.ndarray      # (q, q) f64: lower chol of Schur complement
    hld_b: jnp.ndarray   # () f64: half log-det of the banded part


class PallasEngine:
    """Statics (d, bw, q) fixed per model; methods are traceable.

    `chunk=None` uses the proven single-call kernels (whole (R, 128)
    arrays VMEM-resident — only safe while ~9 of them fit in the
    ~16 MB/core VMEM). `chunk=cr` switches every kernel to the
    HBM-streaming chunked variants (band_kernels chunked section),
    lifting the d limit to HBM scale; make_engine picks this
    automatically from a VMEM-footprint estimate. Tail widths q > 128
    are handled by tiling C into 128-column lane tiles (factor carries
    tile 0; extra tiles ride the forward-solve kernel) with the dense
    q x q Schur algebra on XLA's native f64 primitives."""

    def __init__(self, d: int, bw: int, q: int, interpret: bool = False,
                 chunk: int = None):
        self.d, self.bw, self.q = d, bw, q
        self.interpret = interpret
        self.chunk = chunk
        if chunk:
            self.W, self.R = bk.plan_rows_chunked(d, bw, chunk)
        else:
            self.W, self.R = bk.plan_rows(d, bw)
        self._hld = None

    def signature_fields(self):
        """Statics entering traced programs (aghq.backend_signature)."""
        return (self.d, self.bw, self.q, self.interpret, self.chunk)

    # -- kernel selection ----------------------------------------------
    def _factor_fn(self):
        if self.chunk:
            return bk.factor_chunked_fn(self.d, self.bw, self.chunk,
                                        self.interpret)
        return bk.factor_fn(self.d, self.bw, self.interpret)

    def _fwd_fn(self):
        if self.chunk:
            return bk.fwd_solve_chunked_fn(self.d, self.bw, self.chunk,
                                           self.interpret)
        return bk.fwd_solve_fn(self.d, self.bw, self.interpret)

    def _bwd_fn(self):
        if self.chunk:
            return bk.bwd_solve_chunked_fn(self.d, self.bw, self.chunk,
                                           self.interpret)
        return bk.bwd_solve_fn(self.d, self.bw, self.interpret)

    def _bwd_multi(self, mt, tile):
        if self.chunk:
            return bk.bwd_multi_chunked_fn(self.d, self.bw, mt, tile,
                                           self.chunk, self.interpret)
        return bk.bwd_multi_fn(self.d, self.bw, mt, tile, self.interpret)

    def _takahashi_fn(self):
        if self.chunk:
            return bk.takahashi_chunked_fn(self.d, self.bw, self.chunk,
                                           self.interpret)
        return bk.takahashi_fn(self.d, self.bw, self.interpret)

    def _pack_rhs(self, rhs):
        return bk.pack_rhs(rhs, self.d, self.bw, self.R)

    # -- core ----------------------------------------------------------
    def factor(self, band, C, Hd):
        d, bw, q = self.d, self.bw, self.q
        bh, bl = bk.pack_band(band.astype(jnp.float64), d, bw, self.R)
        q0 = min(q, bk.LANES)
        if q:
            ch, cl = self._pack_rhs(C[:, :q0].astype(jnp.float64))
        else:
            z = jnp.zeros((self.R, bk.LANES), jnp.float32)
            ch, cl = z, z
        Lh, Ll, Yh, Yl, misc = self._factor_fn()(bh, bl, ch, cl)
        hld_b = 0.5 * (misc[0, 0].astype(jnp.float64)
                       + misc[0, 1].astype(jnp.float64))
        if q:
            tiles = [bk.unpack((Yh, Yl), d, bw, q0)]
            fwd = self._fwd_fn() if q > q0 else None
            for t0 in range(q0, q, bk.LANES):
                t1 = min(t0 + bk.LANES, q)
                th, tl = self._pack_rhs(C[:, t0:t1].astype(jnp.float64))
                yt = fwd(Lh, Ll, th, tl)
                tiles.append(bk.unpack(yt, d, bw, t1 - t0))
            Y = (jnp.concatenate(tiles, axis=1) if len(tiles) > 1
                 else tiles[0])
            if _use_acc_dot(d):
                S = Hd - acc_dot_d(Y, Y)
            else:
                S = Hd - Y.T @ Y
            Ls = small_chol(S)
        else:
            Y = jnp.zeros((d, 0), jnp.float64)
            Ls = jnp.zeros((0, 0), jnp.float64)
        return PallasFactor(Lh, Ll, Y, Ls, hld_b)

    def half_logdet(self, f: PallasFactor):
        if self.q:
            return f.hld_b + jnp.sum(jnp.log(jnp.diagonal(f.Ls)))
        return f.hld_b

    def solve(self, f: PallasFactor, rb, rd):
        """H [zb; zd] = [rb; rd]; rb (d,), rd (q,)."""
        d, bw, q = self.d, self.bw, self.q
        rh, rl = self._pack_rhs(rb)
        u = bk.unpack(self._fwd_fn()(f.Lh, f.Ll, rh, rl), d, bw)
        if q:
            if _use_acc_dot(d):
                rhs_d = rd - acc_dot_d(f.Y, u[:, None])[:, 0]
            else:
                rhs_d = rd - f.Y.T @ u
            zd = small_solve_Lt(f.Ls, small_solve_L(f.Ls, rhs_d))
            u = u - f.Y @ zd
        else:
            zd = rd
        uh, ul = self._pack_rhs(u)
        zb = bk.unpack(self._bwd_fn()(f.Lh, f.Ll, uh, ul), d, bw)
        return zb, zd

    def solve_Lt_dd(self, f: PallasFactor, B):
        """L^{-T} B for (d, r) f64 B (used for W = Hb^{-1} C); columns
        beyond 128 run as extra lane tiles."""
        d, bw = self.d, self.bw
        r = B.shape[1]
        bwd = self._bwd_fn()
        tiles = []
        for t0 in range(0, r, bk.LANES):
            t1 = min(t0 + bk.LANES, r)
            bh, bl = self._pack_rhs(B[:, t0:t1])
            tiles.append(bk.unpack(bwd(f.Lh, f.Ll, bh, bl),
                                   d, bw, t1 - t0))
        return tiles[0] if len(tiles) == 1 else jnp.concatenate(
            tiles, axis=1)

    def sample_multi(self, f: PallasFactor, zb, zd):
        """x = L_full^{-T} z: each column ~ N(0, H^{-1}).
        zb (d, M), zd (q, M); f32 arithmetic (Monte-Carlo use)."""
        d, bw, q = self.d, self.bw, self.q
        M = zb.shape[1]
        if q:
            xd = small_solve_Lt(f.Ls, zd.astype(jnp.float64))
            rhs = zb.astype(jnp.float32) - (
                f.Y.astype(jnp.float32) @ xd.astype(jnp.float32))
        else:
            xd = zd
            rhs = zb.astype(jnp.float32)
        tile = 512
        mt = -(-M // tile)
        W, R = self.W, self.R
        pad = jnp.zeros((R, mt * tile), jnp.float32)
        pad = pad.at[W:W + d, :M].set(rhs)
        xb = self._bwd_multi(mt, tile)(f.Lh, pad)
        return xb[W:W + d, :M].astype(zb.dtype), xd.astype(zd.dtype)

    def _hld_bwd(self, f: PallasFactor, ct):
        """Shared backward of the half log-det: d(0.5 log|H|)/dH =
        0.5 H^{-1}, selected entries via the Takahashi kernel:
        Hinv_bb|band = Takahashi(Hb) + band(W S^{-1} W^T),
        Hinv_bd = -W S^{-1}, Hinv_dd = S^{-1}."""
        d, bw, q = self.d, self.bw, self.q
        W_ = self.W
        Z = self._takahashi_fn()(f.Lh)
        Zb = Z[W_:W_ + d, :bw + 1].astype(jnp.float64)      # (d, bw+1)
        if q:
            Wm = self.solve_Lt_dd(f, f.Y)                   # (d, q)
            Sinv = small_solve_Lt(
                f.Ls, small_solve_L(f.Ls, jnp.eye(q, dtype=f.Ls.dtype)))
            A = Wm @ Sinv                                   # (d, q)
            rows = []
            for o in range(bw + 1):
                v = jnp.sum(A[o:] * Wm[:d - o], axis=1)
                rows.append(jnp.pad(v, (0, o)))
            corr = jnp.stack(rows)                          # (bw+1, d)
            ct_C = (-ct) * A
            ct_Hd = (0.5 * ct) * Sinv
        else:
            corr = 0.0
            ct_C = jnp.zeros((d, 0), jnp.float64)
            ct_Hd = jnp.zeros((0, 0), jnp.float64)
        hinv_band = Zb.T + corr
        w = jnp.concatenate([jnp.full((1, d), 0.5), jnp.ones((bw, d))])
        # sick-factor cutoff: on a pivot-clamped factor of an
        # essentially-singular (weak-theta) system the Takahashi
        # recurrence overflows — NaN, or finite-but-astronomical
        # values whose backward products overflow FURTHER back in the
        # assembly chain. A healthy equilibrated system has
        # |H^{-1}| <= cond ~ 1e8, so the 1e12 gate is bit-identity
        # there; sick factors contribute ZERO log-det cotangents and
        # the (finite) explicit value gradient still points the theta
        # optimizer up the precision scale.
        gate_in = jnp.abs(jnp.where(jnp.isfinite(hinv_band),
                                    hinv_band, jnp.inf))
        healthy = jnp.max(gate_in) < 1e12
        if q:
            gA = jnp.abs(jnp.where(jnp.isfinite(A), A, jnp.inf))
            healthy = jnp.logical_and(healthy, jnp.max(gA) < 1e12)
        okf = jnp.where(healthy, 1.0, 0.0)

        def _san(x):
            return okf * jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))
        return (_san((ct * w * hinv_band).astype(jnp.float64)),
                _san(ct_C), _san(ct_Hd))

    # -- AD entry point --------------------------------------------------
    def arrow_half_logdet(self, band, C, Hd):
        if self._hld is None:
            @jax.custom_vjp
            def hld(band, C, Hd):
                return self.half_logdet(self.factor(band, C, Hd))

            def fwd(band, C, Hd):
                f = self.factor(band, C, Hd)
                return self.half_logdet(f), f

            def bwd(f, ct):
                return self._hld_bwd(f, ct)

            hld.defvjp(fwd, bwd)
            self._hld = hld
        return self._hld(band, C, Hd)

    def arrow_half_logdet_given(self, band, C, Hd, f: PallasFactor):
        """arrow_half_logdet with a PRECOMPUTED factor of the same
        system: the primal skips the factorization (the caller already
        paid for it, e.g. hessian_factor inside the Laplace-value custom
        VJP) and the backward pass computes the identical Takahashi-
        based cotangents for (band, C, Hd) from `f`. `f` itself is
        non-differentiable (zero cotangents)."""
        if getattr(self, "_hld_given", None) is None:
            @jax.custom_vjp
            def hldg(band, C, Hd, f):
                return self.half_logdet(f)

            def fwd(band, C, Hd, f):
                return self.half_logdet(f), f

            def bwd_given(f, ct):
                ct_band, ct_C, ct_Hd = self._hld_bwd(f, ct)
                zf = jax.tree_util.tree_map(jnp.zeros_like, f)
                return ct_band, ct_C, ct_Hd, zf

            hldg.defvjp(fwd, bwd_given)
            self._hld_given = hldg
        return self._hld_given(band, C, Hd, f)


class BlockEngine:
    """block_tridiag-based fallback (CPU tests, oversize q/bw)."""

    def __init__(self, d: int, bw: int, q: int, s: int):
        assert d % s == 0 and s > bw
        self.d, self.bw, self.q, self.s = d, bw, q, s
        self.nb = d // s

    def signature_fields(self):
        """Statics entering traced programs (aghq.backend_signature)."""
        return (self.d, self.bw, self.q, self.s)

    def factor(self, band, C, Hd):
        D, E = btl.band_to_blocks(band, self.s)
        return btl.arrow_factor(D, E, C.reshape(self.nb, self.s, self.q), Hd)

    def half_logdet(self, af):
        return btl.arrow_half_logdet(af)

    def solve(self, af, rb, rd):
        zb, zd = btl.arrow_solve(af, rb.reshape(self.nb, self.s), rd)
        return zb.reshape(self.d), zd

    def sample_multi(self, af, zb, zd):
        M = zb.shape[1]
        xb, xd = btl.arrow_sample_multi(
            af, zb.reshape(self.nb, self.s, M), zd)
        return xb.reshape(self.d, M), xd

    def arrow_half_logdet(self, band, C, Hd):
        # plain composition: XLA AD through the factorization scan is
        # fine on CPU float64
        return self.half_logdet(self.factor(band, C, Hd))

    def arrow_half_logdet_given(self, band, C, Hd, f):
        # CPU path: no factorization-skip win; recompute through the scan
        return self.half_logdet(self.factor(band, C, Hd))


# VMEM budget for the single-call kernels: the factor kernel keeps ~9
# whole (R, 128) f32 arrays resident; past ~12 of the ~16 MB/core VMEM
# the v5-lite worker FAULTS instead of erroring (round-13 crash
# configs, BENCH_NOTES). Beyond it the chunked kernels stream rows
# from HBM with a bounded footprint.
_SINGLE_CALL_VMEM = 12 * 2 ** 20
# dense Schur-tail width cap for the Pallas engine (native f64 tail
# primitives; the q x q algebra is O(q^3) XLA work per factorization)
TAIL_MAX = 512


def single_call_ok(d: int, bw: int, q: int) -> bool:
    """Whole-array kernels are safe: small band, tail on the factor
    kernel's lanes, and all resident rows within the VMEM budget."""
    if bw > 31 or q > 128:
        return False
    _, R = bk.plan_rows(d, bw)
    return 9 * R * bk.LANES * 4 <= _SINGLE_CALL_VMEM


def make_engine(d: int, bw: int, q: int, s: int, force: str = None):
    """Pick the engine: Pallas on TPU (single-call kernels within the
    VMEM budget, HBM-streaming chunked kernels beyond it), blocks
    otherwise. force in {None, 'pallas', 'pallas_interpret',
    'pallas_chunked', 'pallas_chunked_interpret', 'block'}."""
    if force == "pallas":
        return PallasEngine(d, bw, q)
    if force == "pallas_interpret":
        return PallasEngine(d, bw, q, interpret=True)
    if force == "pallas_chunked":
        return PallasEngine(d, bw, q, chunk=bk.CHUNK_ROWS)
    if force == "pallas_chunked_interpret":
        return PallasEngine(d, bw, q, interpret=True, chunk=bk.CHUNK_ROWS)
    if force == "block":
        return BlockEngine(d, bw, q, s)
    if (jax.default_backend() == "tpu" and 1 <= bw <= 125
            and q <= TAIL_MAX):
        if single_call_ok(d, bw, q):
            return PallasEngine(d, bw, q)
        return PallasEngine(d, bw, q, chunk=bk.CHUNK_ROWS)
    return BlockEngine(d, bw, q, s)
