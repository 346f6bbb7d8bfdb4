"""Blocked double-float (two-f32) DENSE Cholesky for TPU.

Why this exists (VERDICT r4 #1): the v5-lite worker crashes on large
f64 dense factorization programs — the scatter_iid engine's
(d + q_f) ~ 2009 f64 Schur factor (`jnp.linalg.cholesky`, which XLA
lowers to a per-column while-loop of emulated-f64 ops) killed the
worker on the bigiid k=2000 + q=1e4 composite, leaving that config
with NO viable engine. This module re-structures the dense factor the
TPU way:

  - the O(d^3) trailing (Schur) updates are f64 MATMULS — the one f64
    op class XLA emulates efficiently on the MXU (and the one rung of
    tools/crash_ladder.py that is unconditionally safe);
  - the SEQUENTIAL work (diagonal-block factor, block triangular
    solves) runs as Pallas double-float kernels (hi+lo f32 pairs,
    ~2^-48 relative, linalg/dd.py) with on-core fori loops — no f64
    emulation, no per-column while-loop dispatch;
  - block size = 128 (one lane tile).

This is the dense analogue of linalg/band_kernels.py (same dd
arithmetic, same Mosaic constraints: no scatter -> masked selects and
dynamic-slice row stores, iota-built masks, bitcasts on vectors).

The reference delegates every factorization to CHOLMOD inside TMB
(reference src/BayesGP.cpp via MakeADFun; R/02_model_fit.R:276-284);
this replaces the DENSE corner of that surface (Schur complements of
eliminated IID blocks, wide arrow tails) which the banded kernels
don't cover.

Accuracy: ~1e-13 relative on the factor (dd pivots/solves, f64
trailing updates) — measured against CPU f64 `np.linalg.cholesky` in
tests/test_chol_dd.py. Matrices are expected Jacobi-equilibrated
(unit-ish diagonal) by callers, as everywhere else in this package.

Layout conventions:
  - blocks are (B, B) = (128, 128) f32 pairs in VMEM;
  - `Lt` denotes the TRANSPOSED factor (Lt[j, i] = L[i, j]): the
    factor kernel writes Lt rows (column j of L lives on the lane
    axis at sublane j), and the lower-solve kernel reads L's row i as
    a lane-masked reduction over Lt's column i;
  - L^T solves reuse the lower-solve kernel on double-flipped inputs
    (J L^T J is lower-triangular; no reverse fori index arithmetic —
    Mosaic gotcha);
  - right-hand sides ride the LANE axis, padded to a multiple of 128.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dd

B = 128          # block size = one lane tile
_F0 = np.float32(0.0)

# Tests set this True (with a monkeypatched use_dd_dense) to run the
# dd path end-to-end on CPU through the Pallas interpreter.
INTERPRET_DEFAULT = False


# ---------------------------------------------------------------------------
# kernel 1: dense dd Cholesky of one (B, B) block
# ---------------------------------------------------------------------------

def _factor_block_kernel(Sh, Sl, Lth, Ltl):
    """Right-looking dd Cholesky of the symmetric (B, B) block in
    (Sh, Sl). Writes Lt (= L^T) rows: row j holds column j of L
    (pivot at lane j, sub-diagonal entries at lanes > j).

    Pivots are clamped exactly like the band kernel (modified
    Cholesky): numerically indefinite conditional Hessians must yield
    a FINITE factor with the right log-det magnitude so the outer
    optimizer can walk out of the sick region (see
    band_kernels._factor_body for the measurements)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    f0 = jnp.float32(0.0)

    def body(j, S):
        Sh_, Sl_ = S
        # row j of the carried S via sublane-masked reduce (Mosaic has
        # no dynamic_slice lowering for VALUES, only for refs)
        selj = sub == j                                          # (B, 1)
        rowj = (jnp.sum(jnp.where(selj, Sh_, f0), axis=0,
                        keepdims=True),
                jnp.sum(jnp.where(selj, Sl_, f0), axis=0,
                        keepdims=True))                          # (1, B)
        pv_h = jnp.sum(jnp.where(lane == j, rowj[0], f0),
                       axis=1, keepdims=True)                     # (1, 1)
        pv_l = jnp.sum(jnp.where(lane == j, rowj[1], f0),
                       axis=1, keepdims=True)
        bad = pv_h < jnp.float32(1e-12)
        pvh = jnp.where(bad, jnp.maximum(jnp.abs(pv_h),
                                         jnp.float32(1e-12)), pv_h)
        pvl = jnp.where(bad, jnp.where(pv_h < f0, -pv_l, f0), pv_l)
        rs = dd.rsqrt((jnp.broadcast_to(pvh, (1, B)),
                       jnp.broadcast_to(pvl, (1, B))))            # (1, B)
        colmask = lane >= j
        lj = dd.mul(rowj, rs)
        lj = (jnp.where(colmask, lj[0], f0),
              jnp.where(colmask, lj[1], f0))
        # cap (essentially-singular systems under clamped pivots)
        big = jnp.abs(lj[0]) > jnp.float32(1e3)
        lj = (jnp.clip(lj[0], jnp.float32(-1e3), jnp.float32(1e3)),
              jnp.where(big, f0, lj[1]))
        Lth[pl.ds(j, 1), :] = lj[0]
        Ltl[pl.ds(j, 1), :] = lj[1]
        # symmetric column j as a sublane vector (lane-masked reduce)
        cjT_h = jnp.sum(jnp.where(lane == j, Sh_, f0), axis=1,
                        keepdims=True)                            # (B, 1)
        cjT_l = jnp.sum(jnp.where(lane == j, Sl_, f0), axis=1,
                        keepdims=True)
        rs_col = dd.rsqrt((jnp.broadcast_to(pvh, (B, 1)),
                           jnp.broadcast_to(pvl, (B, 1))))
        ljT = dd.mul((cjT_h, cjT_l), rs_col)
        rowmask = sub >= j
        ljT = (jnp.where(rowmask, ljT[0], f0),
               jnp.where(rowmask, ljT[1], f0))
        bigT = jnp.abs(ljT[0]) > jnp.float32(1e3)
        ljT = (jnp.clip(ljT[0], jnp.float32(-1e3), jnp.float32(1e3)),
               jnp.where(bigT, f0, ljT[1]))
        # trailing rank-1 update: S -= ljT (x) lj  (masks make the
        # update zero outside the trailing block, keeping S symmetric)
        upd = dd.mul((jnp.broadcast_to(ljT[0], (B, B)),
                      jnp.broadcast_to(ljT[1], (B, B))),
                     (jnp.broadcast_to(lj[0], (B, B)),
                      jnp.broadcast_to(lj[1], (B, B))))
        Sn = dd.sub((Sh_, Sl_), upd)
        return Sn

    # i32 loop bounds: an i64 fori index (x64 default) promotes the
    # iota comparisons to i64 vectors, whose Mosaic legalization
    # recurses without bound (RecursionError at lowering — measured)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), body,
                      (Sh[...], Sl[...]))


@functools.lru_cache(maxsize=None)
def factor_block_fn(interpret: bool = False):
    out = [jax.ShapeDtypeStruct((B, B), jnp.float32)] * 2
    call = pl.pallas_call(
        _factor_block_kernel,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )
    return jax.jit(call)


# ---------------------------------------------------------------------------
# kernel 2: dd lower-triangular solve  L X = Bmat,  rhs on lanes
# ---------------------------------------------------------------------------

def _reduce_sublanes_dd(ph, plo):
    """Error-preserving sum over the sublane axis of a (B, r) dd pair
    -> (1, r): 7 static halving steps of dd adds."""
    h, l = ph, plo
    size = B
    while size > 1:
        half = size // 2
        h, l = dd.add((h[:half], l[:half]), (h[half:size], l[half:size]))
        size = half
    return h, l


def _solve_lower_kernel(r, Lth, Ltl, Bh, Bl, Xh, Xl):
    """Solve L X = B for X (B, r), L given TRANSPOSED (Lt). Forward
    substitution over the B rows; the running X (rows >= i still zero)
    makes masking unnecessary in the dot."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    f0 = jnp.float32(0.0)

    def body(i, X):
        Xh_, Xl_ = X
        # v[t] = L[i, t] = Lt[t, i]: lane-masked reduce of Lt col i
        vh = jnp.sum(jnp.where(lane == i, Lth[...], f0), axis=1,
                     keepdims=True)                               # (B, 1)
        vl = jnp.sum(jnp.where(lane == i, Ltl[...], f0), axis=1,
                     keepdims=True)
        prod = dd.mul((Xh_, Xl_),
                      (jnp.broadcast_to(vh, (B, r)),
                       jnp.broadcast_to(vl, (B, r))))
        sh, sl = _reduce_sublanes_dd(prod[0], prod[1])            # (1, r)
        bi = (Bh[pl.ds(i, 1), :], Bl[pl.ds(i, 1), :])
        num = dd.sub(bi, (sh, sl))
        # pivot L[i, i] = Lt[i, i]: sublane-masked reduce of vh/vl
        pvh = jnp.sum(jnp.where(lane == i, Lth[pl.ds(i, 1), :], f0),
                      axis=1, keepdims=True)                      # (1, 1)
        pvl = jnp.sum(jnp.where(lane == i, Ltl[pl.ds(i, 1), :], f0),
                      axis=1, keepdims=True)
        rc = dd.recip((jnp.broadcast_to(pvh, (1, r)),
                       jnp.broadcast_to(pvl, (1, r))))
        xi = dd.mul(num, rc)
        Xh[pl.ds(i, 1), :] = xi[0]
        Xl[pl.ds(i, 1), :] = xi[1]
        sub = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        seti = sub == i
        Xh_ = jnp.where(seti, jnp.broadcast_to(xi[0], (B, r)), Xh_)
        Xl_ = jnp.where(seti, jnp.broadcast_to(xi[1], (B, r)), Xl_)
        return Xh_, Xl_

    z = jnp.zeros((B, r), jnp.float32)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), body, (z, z))


@functools.lru_cache(maxsize=None)
def solve_lower_fn(r: int, interpret: bool = False):
    assert r % 128 == 0
    out = [jax.ShapeDtypeStruct((B, r), jnp.float32)] * 2
    kern = functools.partial(_solve_lower_kernel, r)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )
    return jax.jit(call)


# ---------------------------------------------------------------------------
# JAX-level blocked driver (f64 in / f64 out)
# ---------------------------------------------------------------------------

def _eye_tail(dp, d, dtype):
    """Identity restricted to indices >= d, built from iota (jnp.diag /
    advanced-index scatter lower pathologically on TPU)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 1)
    return ((ii == jj) & (ii >= d)).astype(dtype)


def _pad_spd(A, dp):
    """Pad (d, d) -> (dp, dp) with identity (factor of the padding is
    identity; padded rows of solves are discarded)."""
    d = A.shape[0]
    if d == dp:
        return A
    Ap = jnp.zeros((dp, dp), A.dtype)
    Ap = Ap.at[:d, :d].set(A)
    return Ap + _eye_tail(dp, d, A.dtype)


def _blocks(d):
    nb = -(-d // B)
    return nb, nb * B


def _factor_block(Akk, interpret):
    hi, lo = dd.from_f64(Akk.astype(jnp.float64))
    Lth, Ltl = factor_block_fn(interpret or INTERPRET_DEFAULT)(hi, lo)
    return Lth, Ltl


def _block_solve_lower(Ltkk, Bmat, interpret):
    """X = Lkk^{-1} Bmat for (B, r) f64 Bmat (r multiple of 128)."""
    bh, bl = dd.from_f64(Bmat.astype(jnp.float64))
    Xh, Xl = solve_lower_fn(Bmat.shape[1],
                            interpret or INTERPRET_DEFAULT)(
        Ltkk[0], Ltkk[1], bh, bl)
    return dd.to_f64((Xh, Xl))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def cholesky_dd_f64(A, interpret: bool = False):
    """Lower Cholesky of an SPD f64 (d, d) matrix; returns L f64.

    Blocked right-looking: dd Pallas kernels for the (128, 128)
    diagonal factors and panel solves, f64 MXU matmuls for the O(d^3)
    trailing updates. The per-step Python loop unrolls (~d/128 steps)
    into one traced program; shapes are static and shrink per step.

    Differentiable: a custom VJP implements the standard Cholesky
    pullback (Murray 2016) with the blocked dd solves — Pallas kernels
    themselves are never differentiated. Callers that differentiate a
    log-det through this factor (scatter_iid._laplace_value in the
    implicit-function bwd) get the same cotangents as
    jnp.linalg.cholesky to dd accuracy."""
    return _cholesky_dd_impl(A, interpret)


def _cholesky_dd_impl(A, interpret):
    d = A.shape[0]
    nb, dp = _blocks(d)
    S = _pad_spd(A.astype(jnp.float64), dp)
    Lcols = []
    for k in range(nb):
        lo = k * B
        Akk = S[lo:lo + B, lo:lo + B]
        Ltkk = _factor_block(Akk, interpret)
        Lkk = dd.to_f64(Ltkk).T
        if k < nb - 1:
            P = S[lo + B:, lo:lo + B]                    # (m, B)
            # X Lkk^T = P  <=>  Lkk X^T = P^T
            Xt = _block_solve_lower(Ltkk, P.T, interpret)  # (B, m)
            X = Xt.T
            T = S[lo + B:, lo + B:]
            S = S.at[lo + B:, lo + B:].set(
                T - X @ Xt)                              # f64 MXU matmul
            col = jnp.concatenate([Lkk, X], axis=0)      # (dp - lo, B)
        else:
            col = Lkk
        Lcols.append(jnp.concatenate(
            [jnp.zeros((lo, B), jnp.float64), col], axis=0))
    L = jnp.concatenate(Lcols, axis=1)
    return L[:d, :d]


def _chol_fwd(A, interpret):
    L = _cholesky_dd_impl(A, interpret)
    return L, L


def _chol_bwd(interpret, L, Lbar):
    """A_bar = (S + S^T)/2 with S = L^{-T} Phi(L^T Lbar) L^{-1},
    Phi = tril with halved diagonal (Murray 2016, eq. 8)."""
    W = L.T @ Lbar                                        # f64 MXU
    P = jnp.tril(W) - 0.5 * jnp.tril(jnp.triu(W))         # Phi(W)
    Y = solve_lower_t_blocked(L, P, interpret)            # L^{-T} P
    St = solve_lower_t_blocked(L, Y.T, interpret)         # L^{-T} Y^T
    S = St.T                                              # Y L^{-1}
    return (0.5 * (S + S.T),)


cholesky_dd_f64.defvjp(_chol_fwd, _chol_bwd)


def _pad_rhs(Bmat, dp, rp):
    d, r = Bmat.shape
    out = jnp.zeros((dp, rp), Bmat.dtype)
    return out.at[:d, :r].set(Bmat)


def _lt_blocks(L, nb):
    """Per-diagonal-block dd Lt pairs of an f64 factor L."""
    out = []
    for k in range(nb):
        lo = k * B
        out.append(dd.from_f64(L[lo:lo + B, lo:lo + B].T))
    return out


def solve_lower_blocked(L, Bmat, interpret: bool = False):
    """Solve L Y = Bmat for f64 L (d, d) from cholesky_dd_f64, Bmat
    (d, r) or (d,). Off-diagonal propagation via f64 matmuls; diagonal
    blocks via the dd kernel."""
    vec = Bmat.ndim == 1
    Bm = Bmat[:, None] if vec else Bmat
    d, r = Bm.shape
    nb, dp = _blocks(d)
    rp = -(-r // 128) * 128
    Bp = _pad_rhs(Bm.astype(jnp.float64), dp, rp)
    Lp = jnp.zeros((dp, dp), jnp.float64).at[:d, :d].set(
        L.astype(jnp.float64))
    if dp != d:
        Lp = Lp + _eye_tail(dp, d, jnp.float64)
    Lts = _lt_blocks(Lp, nb)
    Ys = []
    for k in range(nb):
        lo = k * B
        rhs = Bp[lo:lo + B]
        if k:
            Yprev = jnp.concatenate(Ys, axis=0)          # (lo, rp)
            rhs = rhs - Lp[lo:lo + B, :lo] @ Yprev       # f64 MXU
        Ys.append(_block_solve_lower(Lts[k], rhs, interpret))
    Y = jnp.concatenate(Ys, axis=0)[:d, :r]
    return Y[:, 0] if vec else Y


def solve_lower_t_blocked(L, Bmat, interpret: bool = False):
    """Solve L^T X = Bmat. Double-flip: J L^T J is lower-triangular,
    so X = J * solve_lower(J L J, J Bmat) with M = (J L J)^T ... i.e.
    flip rows/cols, run the lower solve, flip back. All flips are f64
    JAX ops OUTSIDE kernels (no reverse index arithmetic in Mosaic)."""
    vec = Bmat.ndim == 1
    Bm = Bmat[:, None] if vec else Bmat
    M = jnp.flip(jnp.flip(L.T, 0), 1)                    # lower-tri
    Bf = jnp.flip(Bm, 0)
    Xf = solve_lower_blocked(M, Bf, interpret)
    X = jnp.flip(Xf, 0)
    return X[:, 0] if vec else X


def half_logdet(L):
    """0.5 log det (L L^T) = sum log diag L — f64 elementwise outside
    kernels (d-length vector op; not the n-axis landmine class)."""
    dj = jnp.maximum(jnp.abs(jnp.diagonal(L)),
                     jnp.asarray(1e-150, L.dtype))
    return jnp.sum(jnp.log(dj))


def use_dd_dense(dtype, dim: int) -> bool:
    """Route policy: on TPU, f64 dense factors above this size run the
    blocked dd path (XLA's per-column emulated-f64 cholesky crashes
    the v5-lite worker at d ~ 2000 — tools/crash_ladder.py); below it
    the native lowering is fine and cheaper to compile. CPU keeps
    LAPACK-exact f64."""
    if dtype not in (jnp.float64, np.float64):
        return False
    if jax.default_backend() == "cpu":
        return False
    # crash class observed from q ~ 300 dense arrow tails up through
    # the (d+qf) ~ 2009 Schur factor (CLAUDE.md fact 17 + round-13
    # landmine); native lowering is proven safe at d ~ 128 and faster
    # to compile there
    return dim >= 256
