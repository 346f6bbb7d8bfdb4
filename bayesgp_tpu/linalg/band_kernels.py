"""Pallas TPU kernels for banded SPD Cholesky in double-float (two-f32).

Why these exist (measured, see BENCH_NOTES.md): XLA's f64
cholesky/triangular-solve on TPU lower to per-column while-loops of
tiny emulated-f64 ops, each carrying ~50-100 us of on-device
serialization — ~100+ ms per factorization of the d~2000 headline
system, 100x its arithmetic cost. Pallas has no f64 at all. These
kernels run the entire factorization/solve as ONE kernel with an
on-core fori_loop and double-float (hi+lo f32 pair, ~2^-48 relative)
arithmetic from linalg/dd.py: no per-op dispatch, no f64 emulation.

This is the TPU-native replacement for the sparse CHOLMOD Cholesky the
reference's TMB runtime performs inside `MakeADFun(random="W")`
(SURVEY.md §2.2; reference call site R/02_model_fit.R:276-284).

Storage convention (all arrays (R, 128) float32):
  - R = W + d rows rounded up to a multiple of 8, where W (window size,
    a power of two >= bw+1) leading rows are identity padding so the
    windowed recurrences never index before the start.
  - Band row j, lane o  = H[j+o, j] (lower band, o = 0..bw); identity
    rows have lane0 = 1. The matrix must be SPD and is expected
    Jacobi-equilibrated by the caller (unit diagonal) for conditioning.
  - L output row j, lane o = L[j+o, j]; lanes bw+1 / bw+2 stash the
    (hi, lo) of 1/L[j,j] for the solve kernels.
  - RHS / solution blocks put the RHS index on the lane axis (<= 128
    for the dd kernels; tiled grid for the f32 multi-RHS kernel).

A `jacobi`-style sequential dependence over columns is unavoidable
(Cholesky is a prefix recurrence); the point is that each of the ~d
steps is ~10 ns-scale VPU work instead of ~100 us-scale dispatched ops.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dd

LANES = 128


def _push(win, row):
    """Shift the (W, LANES) window up one row and append `row` (1, LANES)
    at the bottom. (jnp .at[].set lowers to `scatter`, which Mosaic does
    not implement — concatenation lowers cleanly.)"""
    return jnp.concatenate([win[1:], row], axis=0)


def _push_front(win, row):
    """Shift the window down one row and place `row` at the top."""
    return jnp.concatenate([row, win[:-1]], axis=0)


def plan_rows(d: int, bw: int):
    """(W, R): window size and padded row count for a d-column band.

    bw <= 125 (the L stash uses lanes bw+1, bw+2 of the 128-lane row);
    bandwidths beyond ~31 should use the chunked kernels (W > 32 keeps
    large per-row windows resident, fine per chunk, heavy whole-array).
    """
    W = 8
    while W < bw + 1:
        W *= 2
    if bw > 125 or W > 128:
        raise ValueError(f"bandwidth {bw} too large for the band kernels")
    R = -(-(W + d) // 8) * 8
    return W, R


# Rows processed per chunked-kernel invocation. The chunked kernels
# stream the (R, 128) row arrays through VMEM CHUNK_ROWS at a time with
# the recurrence window carried across calls by a lax.scan — total VMEM
# per call is ~8 * CHUNK_ROWS * 128 * 4 B ~ 4 MB, independent of d.
# (The single-call kernels keep ~9 whole (R, 128) arrays resident;
# past R ~ 2.5k that exceeds the ~16 MB/core VMEM and FAULTS the
# worker — the round-13 wide-band crashes.)
CHUNK_ROWS = 1024


def plan_rows_chunked(d: int, bw: int, cr: int = CHUNK_ROWS):
    """(W, R) with R a multiple of the chunk length."""
    W, _ = plan_rows(d, bw)
    R = -(-(W + d) // cr) * cr
    return W, R


# ---------------------------------------------------------------------------
# factor: band -> L (+ 1/Ljj stash), Y = L^{-1} C, half log-det
# ---------------------------------------------------------------------------

def _factor_body(bw, W, bh, bl, ch, cl, Lh, Ll, yh, yl):
    """Per-row factor recurrence, shared by the single-call and chunked
    kernels. carry = (wh, wl, ywh, ywl, ldh, ldl)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    band_mask = lane <= bw
    f0 = jnp.float32(0.0)

    def body(j, carry):
        wh, wl, ywh, ywl, ldh, ldl = carry
        acc = (bh[pl.ds(j, 1), :], bl[pl.ds(j, 1), :])
        yacc = (ch[pl.ds(j, 1), :], cl[pl.ds(j, 1), :])
        for t in range(1, bw + 1):
            r = W - t
            s = (wh[r, t], wl[r, t])
            rolled = (jnp.roll(wh[r:r + 1, :], -t, axis=1),
                      jnp.roll(wl[r:r + 1, :], -t, axis=1))
            acc = dd.sub(acc, dd.mul(rolled, s))
            yacc = dd.sub(yacc, dd.mul((ywh[r:r + 1, :], ywl[r:r + 1, :]), s))
        # pivot clamp (modified Cholesky): conditional Hessians at
        # weak-theta evaluation points can be NUMERICALLY indefinite
        # (lambda_min ~ -5e-7 measured on equilibrated two-smooth
        # systems); a non-positive pivot would put NaN into the factor
        # AND the log-det, poisoning the theta optimizer. Healthy
        # pivots (unit-diagonal systems: ~1e-3..1) are untouched.
        raw_h, raw_l = acc[0][0, 0], acc[1][0, 0]
        bad = raw_h < jnp.float32(1e-12)
        # |pivot| keeps factor magnitudes bounded when the pivot is
        # NEGATIVE by O(1) (an essentially-singular system under a
        # fixed elimination order); a tiny floor would put 1/sqrt ~ 1e6
        # into the window and overflow the downstream f32 recurrences
        pvh = jnp.where(bad, jnp.maximum(jnp.abs(raw_h),
                                         jnp.float32(1e-12)), raw_h)
        pvl = jnp.where(bad, jnp.where(raw_h < f0, -raw_l, f0), raw_l)
        # healthy pivots: pvh/pvl ARE the lane-0 values, so these
        # wheres are bit-identity and the dd arithmetic is unchanged
        acc = (jnp.where(lane == 0, pvh, acc[0]),
               jnp.where(lane == 0, pvl, acc[1]))
        rs = dd.rsqrt((pvh, pvl))
        Lcol = dd.mul(acc, rs)
        Lcol = (jnp.where(band_mask, Lcol[0], f0),
                jnp.where(band_mask, Lcol[1], f0))
        # magnitude cap: a HEALTHY equilibrated SPD factor has
        # |L_ij| <= sqrt(A_jj) <= 1, so +-1e3 never binds there (clip
        # is then bit-identity); on essentially-singular systems the
        # clamped-pivot recurrence otherwise grows geometrically to
        # f32 inf, and inf - inf = NaN wipes the whole factor
        # (measured round 14 at theta=(4,4,4) on the two-smooth model)
        big = jnp.abs(Lcol[0]) > jnp.float32(1e3)
        Lcol = (jnp.clip(Lcol[0], jnp.float32(-1e3), jnp.float32(1e3)),
                jnp.where(big, f0, Lcol[1]))
        ynew = dd.mul(yacc, rs)
        ybig = jnp.abs(ynew[0]) > jnp.float32(1e8)
        ynew = (jnp.clip(ynew[0], jnp.float32(-1e8), jnp.float32(1e8)),
                jnp.where(ybig, f0, ynew[1]))
        # pivot log on the whole row (Mosaic bitcast needs vectors, not
        # scalars); only lane 0 (the clamped pivot) is read — other
        # lanes hold off-band values whose "logs" are garbage and ignored
        lprow = dd.log_precise(acc)
        ldh, ldl = dd.add((ldh, ldl), (lprow[0][0, 0], lprow[1][0, 0]))
        Lh[pl.ds(j, 1), :] = (Lcol[0]
                              + jnp.where(lane == bw + 1, rs[0], f0)
                              + jnp.where(lane == bw + 2, rs[1], f0))
        Ll[pl.ds(j, 1), :] = Lcol[1]
        yh[pl.ds(j, 1), :] = ynew[0]
        yl[pl.ds(j, 1), :] = ynew[1]
        wh = _push(wh, Lcol[0])
        wl = _push(wl, Lcol[1])
        ywh = _push(ywh, ynew[0])
        ywl = _push(ywl, ynew[1])
        return wh, wl, ywh, ywl, ldh, ldl

    return body


def _factor_kernel(bw, W, R, bh, bl, ch, cl, Lh, Ll, yh, yl, misc):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    f0 = jnp.float32(0.0)
    body = _factor_body(bw, W, bh, bl, ch, cl, Lh, Ll, yh, yl)
    z = jnp.zeros((W, LANES), jnp.float32)
    *_, ldh, ldl = jax.lax.fori_loop(
        0, R, body, (z, z, z, z, jnp.float32(0.0), jnp.float32(0.0)))
    misc[pl.ds(0, 1), :] = (jnp.where(lane == 0, ldh, f0)
                            + jnp.where(lane == 1, ldl, f0))


@functools.lru_cache(maxsize=None)
def factor_fn(d: int, bw: int, interpret: bool = False):
    W, R = plan_rows(d, bw)
    out = [jax.ShapeDtypeStruct((R, LANES), jnp.float32)] * 4 \
        + [jax.ShapeDtypeStruct((8, LANES), jnp.float32)]
    kern = functools.partial(_factor_kernel, bw, W, R)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        interpret=interpret,
    )
    return jax.jit(call)


# ---------------------------------------------------------------------------
# forward solve: L y = b (dd), RHS on lanes
# ---------------------------------------------------------------------------

def _fwd_body(bw, W, Lh, Ll, bh, bl, xh, xl):
    def body(j, carry):
        lwh, lwl, ywh, ywl = carry
        Lrow = (Lh[pl.ds(j, 1), :], Ll[pl.ds(j, 1), :])
        rs = (Lrow[0][0, bw + 1], Lrow[0][0, bw + 2])
        acc = (bh[pl.ds(j, 1), :], bl[pl.ds(j, 1), :])
        for t in range(1, bw + 1):
            r = W - t
            s = (lwh[r, t], lwl[r, t])
            acc = dd.sub(acc, dd.mul((ywh[r:r + 1, :], ywl[r:r + 1, :]), s))
        ynew = dd.mul(acc, rs)
        xh[pl.ds(j, 1), :] = ynew[0]
        xl[pl.ds(j, 1), :] = ynew[1]
        lwh = _push(lwh, Lrow[0])
        lwl = _push(lwl, Lrow[1])
        ywh = _push(ywh, ynew[0])
        ywl = _push(ywl, ynew[1])
        return lwh, lwl, ywh, ywl

    return body


def _fwd_kernel(bw, W, R, Lh, Ll, bh, bl, xh, xl):
    body = _fwd_body(bw, W, Lh, Ll, bh, bl, xh, xl)
    z = jnp.zeros((W, LANES), jnp.float32)
    jax.lax.fori_loop(0, R, body, (z, z, z, z))


@functools.lru_cache(maxsize=None)
def fwd_solve_fn(d: int, bw: int, interpret: bool = False):
    W, R = plan_rows(d, bw)
    out = [jax.ShapeDtypeStruct((R, LANES), jnp.float32)] * 2
    kern = functools.partial(_fwd_kernel, bw, W, R)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )
    return jax.jit(call)


# ---------------------------------------------------------------------------
# backward solve: L^T x = y (dd), RHS on lanes
# ---------------------------------------------------------------------------

def _bwd_kernel(bw, W, R, Lh, Ll, bh, bl, xh, xl):
    """Backward substitution as a FORWARD loop over row-FLIPPED inputs
    (Mosaic lowers the fori index as i32 while tracing it as i64, so
    reverse index arithmetic cannot be expressed in-kernel; the caller
    flips rows with an XLA reverse instead). Flipped row j holds
    original column R-1-j; the multipliers L[orig+t, orig] sit on lanes
    t of that row, and x[orig+t] is the window row W-t."""
    body = _bwd_body(bw, W, Lh, Ll, bh, bl, xh, xl)
    z = jnp.zeros((W, LANES), jnp.float32)
    jax.lax.fori_loop(0, R, body, (z, z))


def _bwd_body(bw, W, Lh, Ll, bh, bl, xh, xl):
    def body(j, carry):
        xwh, xwl = carry
        Lrow = (Lh[pl.ds(j, 1), :], Ll[pl.ds(j, 1), :])
        rs = (Lrow[0][0, bw + 1], Lrow[0][0, bw + 2])
        acc = (bh[pl.ds(j, 1), :], bl[pl.ds(j, 1), :])
        for t in range(1, bw + 1):
            r = W - t
            s = (Lrow[0][0, t], Lrow[1][0, t])     # L[orig+t, orig]
            acc = dd.sub(acc, dd.mul((xwh[r:r + 1, :], xwl[r:r + 1, :]), s))
        xnew = dd.mul(acc, rs)
        xh[pl.ds(j, 1), :] = xnew[0]
        xl[pl.ds(j, 1), :] = xnew[1]
        xwh = _push(xwh, xnew[0])
        xwl = _push(xwl, xnew[1])
        return xwh, xwl

    return body


@functools.lru_cache(maxsize=None)
def bwd_solve_fn(d: int, bw: int, interpret: bool = False):
    W, R = plan_rows(d, bw)
    out = [jax.ShapeDtypeStruct((R, LANES), jnp.float32)] * 2
    kern = functools.partial(_bwd_kernel, bw, W, R)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )

    def run(Lh, Ll, bh, bl):
        fl = lambda a: jnp.flip(a, axis=0)
        xh, xl = call(fl(Lh), fl(Ll), fl(bh), fl(bl))
        return fl(xh), fl(xl)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# backward solve, plain f32, many RHS tiled over the lane axis (sampling:
# Monte-Carlo accuracy only — factor stays dd, arithmetic here is f32)
# ---------------------------------------------------------------------------

def _bwd_multi_body(bw, W, Lh, b, x):
    # forward loop over row-flipped inputs (see _bwd_kernel)
    def body(j, xw):
        Lrow = Lh[pl.ds(j, 1), :]
        rs = Lrow[0, bw + 1]
        acc = b[pl.ds(j, 1), :]
        for t in range(1, bw + 1):
            acc = acc - Lrow[0, t] * xw[W - t:W - t + 1, :]
        xnew = acc * rs
        x[pl.ds(j, 1), :] = xnew
        return _push(xw, xnew)

    return body


def _bwd_multi_kernel(bw, W, R, Lh, b, x):
    tile = b.shape[-1]
    jax.lax.fori_loop(0, R, _bwd_multi_body(bw, W, Lh, b, x),
                      jnp.zeros((W, tile), jnp.float32))


@functools.lru_cache(maxsize=None)
def bwd_multi_fn(d: int, bw: int, m_tiles: int, tile: int = 512,
                 interpret: bool = False):
    """Backward solve with m_tiles*tile f32 RHS. Tiles run as separate
    grid-less pallas calls inside one jitted program (a pallas grid
    index_map traces i64 under x64, which Mosaic cannot legalize)."""
    W, R = plan_rows(d, bw)
    kern = functools.partial(_bwd_multi_kernel, bw, W, R)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, tile), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def run(Lh, b):
        fl = lambda a: jnp.flip(a, axis=0)
        Lf = fl(Lh)
        bf = fl(b)
        outs = [call(Lf, bf[:, i * tile:(i + 1) * tile])
                for i in range(m_tiles)]
        return fl(jnp.concatenate(outs, axis=1))

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Takahashi selected inverse: band of H^{-1} from L (f32 — feeds only
# gradients; the equilibrated system keeps it well-conditioned)
# ---------------------------------------------------------------------------

def _takahashi_body(bw, W, Lh, Z):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    f0 = jnp.float32(0.0)
    col_mask = jnp.logical_and(lane >= 1, lane <= bw)
    # iota-generated masks (pallas kernels cannot capture array consts,
    # and Mosaic has no scatter — masked selects lower cleanly)
    rr = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 1)
    row0 = rr == 0
    col0 = jnp.logical_and(cc == 0,
                           jnp.logical_and(rr >= 1, rr <= bw))
    keep = jnp.logical_not(jnp.logical_or(row0, col0))
    onehot = [jnp.logical_and(rr == r, cc == 0) for r in range(1, bw + 1)]

    # forward loop over row-flipped inputs (see _bwd_kernel)
    def body(j, zblk):
        Lrow = Lh[pl.ds(j, 1), :]
        rs = Lrow[0, bw + 1]
        m = jnp.zeros((1, LANES), jnp.float32)
        for t in range(1, bw + 1):
            m = m + (Lrow[0, t] * rs) * zblk[t - 1:t, :]
        zc = jnp.where(col_mask, -jnp.roll(m, 1, axis=1), f0)
        zjj = rs * rs
        for t in range(1, bw + 1):
            zjj = zjj + (Lrow[0, t] * rs) * m[0, t - 1]
        outrow = jnp.where(lane == 0, zjj, zc)
        Z[pl.ds(j, 1), :] = outrow
        # window block for j-1: interior shifts down-right; row 0 is the
        # new column written as a row; column 0 mirrors it (symmetry)
        zero_row = jnp.zeros((1, LANES), jnp.float32)
        shifted = jnp.roll(_push_front(zblk, zero_row), 1, axis=1)
        new = jnp.where(keep, shifted, f0)
        new = new + jnp.where(row0, outrow, f0)
        for r in range(1, bw + 1):
            new = new + jnp.where(onehot[r - 1], zc[0, r], f0)
        return new

    return body


def _takahashi_kernel(bw, W, R, Lh, Z):
    jax.lax.fori_loop(0, R, _takahashi_body(bw, W, Lh, Z),
                      jnp.zeros((W, LANES), jnp.float32))


@functools.lru_cache(maxsize=None)
def takahashi_fn(d: int, bw: int, interpret: bool = False):
    W, R = plan_rows(d, bw)
    kern = functools.partial(_takahashi_kernel, bw, W, R)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def run(Lh):
        fl = lambda a: jnp.flip(a, axis=0)
        return fl(call(fl(Lh)))

    return jax.jit(run)


# ---------------------------------------------------------------------------
# chunked (HBM-streaming) variants — same recurrences, CHUNK_ROWS rows
# per pallas call, window carried across calls by lax.scan.
#
# Why: the single-call kernels keep every (R, 128) array fully
# VMEM-resident; at R >~ 2.5k the ~9 resident arrays of the factor
# kernel exceed the ~16 MB/core VMEM and FAULT the v5-lite worker (the
# round-13 crash configs: merged-IID bands d~6k-16k, wide-band s>1
# programs). These variants bound VMEM at ~8 * cr * 128 * 4 B
# regardless of d by streaming rows HBM->VMEM chunk by chunk. The
# chunk loop is a lax.scan, NOT a pallas grid: grid index_maps trace
# i64 under x64, which Mosaic cannot legalize (BENCH_NOTES constraint
# 5), and a scan re-uses one traced kernel body.
# ---------------------------------------------------------------------------

def _chunked_call(call, n_carry):
    """Wrap a chunk kernel `call(*chunk_xs, *carry) -> (*chunk_ys,
    *new_carry)` into a lax.scan over the leading chunk axis."""
    def step(carry, x):
        outs = call(*x, *carry)
        ys = outs[:len(outs) - n_carry]
        return tuple(outs[len(outs) - n_carry:]), tuple(ys)
    return step


def _factor_chunk_kernel(bw, W, CR, bh, bl, ch, cl, wih, wil, ywih, ywil,
                         ldi, Lh, Ll, yh, yl, woh, wol, ywoh, ywol, ldo):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    f0 = jnp.float32(0.0)
    body = _factor_body(bw, W, bh, bl, ch, cl, Lh, Ll, yh, yl)
    ldrow = ldi[pl.ds(0, 1), :]
    init = (wih[...], wil[...], ywih[...], ywil[...],
            ldrow[0, 0], ldrow[0, 1])
    wh, wl, ywh, ywl, ldh, ldl = jax.lax.fori_loop(0, CR, body, init)
    woh[...] = wh
    wol[...] = wl
    ywoh[...] = ywh
    ywol[...] = ywl
    ldo[pl.ds(0, 1), :] = (jnp.where(lane == 0, ldh, f0)
                           + jnp.where(lane == 1, ldl, f0))


@functools.lru_cache(maxsize=None)
def factor_chunked_fn(d: int, bw: int, cr: int = CHUNK_ROWS,
                      interpret: bool = False):
    """Chunk-streamed `factor_fn`: same (Lh, Ll, yh, yl, misc) outputs,
    arrays laid out with R = plan_rows_chunked(d, bw, cr)."""
    W, R = plan_rows_chunked(d, bw, cr)
    nc = R // cr
    out = ([jax.ShapeDtypeStruct((cr, LANES), jnp.float32)] * 4
           + [jax.ShapeDtypeStruct((W, LANES), jnp.float32)] * 4
           + [jax.ShapeDtypeStruct((8, LANES), jnp.float32)])
    kern = functools.partial(_factor_chunk_kernel, bw, W, cr)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        interpret=interpret,
    )

    def run(bh, bl, ch, cl):
        xs = tuple(a.reshape(nc, cr, LANES) for a in (bh, bl, ch, cl))
        z = jnp.zeros((W, LANES), jnp.float32)
        ld0 = jnp.zeros((8, LANES), jnp.float32)
        carry, ys = jax.lax.scan(
            _chunked_call(call, 5), (z, z, z, z, ld0), xs)
        Lh, Ll, yh, yl = (y.reshape(R, LANES) for y in ys)
        return Lh, Ll, yh, yl, carry[4]

    return jax.jit(run)


def _fwd_chunk_kernel(bw, W, CR, Lh, Ll, bh, bl, wih, wil, ywih, ywil,
                      xh, xl, woh, wol, ywoh, ywol):
    body = _fwd_body(bw, W, Lh, Ll, bh, bl, xh, xl)
    init = (wih[...], wil[...], ywih[...], ywil[...])
    lwh, lwl, ywh, ywl = jax.lax.fori_loop(0, CR, body, init)
    woh[...] = lwh
    wol[...] = lwl
    ywoh[...] = ywh
    ywol[...] = ywl


@functools.lru_cache(maxsize=None)
def fwd_solve_chunked_fn(d: int, bw: int, cr: int = CHUNK_ROWS,
                         interpret: bool = False):
    W, R = plan_rows_chunked(d, bw, cr)
    nc = R // cr
    out = ([jax.ShapeDtypeStruct((cr, LANES), jnp.float32)] * 2
           + [jax.ShapeDtypeStruct((W, LANES), jnp.float32)] * 4)
    kern = functools.partial(_fwd_chunk_kernel, bw, W, cr)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        interpret=interpret,
    )

    def run(Lh, Ll, bh, bl):
        xs = tuple(a.reshape(nc, cr, LANES) for a in (Lh, Ll, bh, bl))
        z = jnp.zeros((W, LANES), jnp.float32)
        _, ys = jax.lax.scan(_chunked_call(call, 4), (z, z, z, z), xs)
        return tuple(y.reshape(R, LANES) for y in ys)

    return jax.jit(run)


def _bwd_chunk_kernel(bw, W, CR, Lh, Ll, bh, bl, wih, wil,
                      xh, xl, woh, wol):
    body = _bwd_body(bw, W, Lh, Ll, bh, bl, xh, xl)
    xwh, xwl = jax.lax.fori_loop(0, CR, body, (wih[...], wil[...]))
    woh[...] = xwh
    wol[...] = xwl


@functools.lru_cache(maxsize=None)
def bwd_solve_chunked_fn(d: int, bw: int, cr: int = CHUNK_ROWS,
                         interpret: bool = False):
    """Backward solve, chunk-streamed; rows flipped outside the scan
    (see _bwd_kernel)."""
    W, R = plan_rows_chunked(d, bw, cr)
    nc = R // cr
    out = ([jax.ShapeDtypeStruct((cr, LANES), jnp.float32)] * 2
           + [jax.ShapeDtypeStruct((W, LANES), jnp.float32)] * 2)
    kern = functools.partial(_bwd_chunk_kernel, bw, W, cr)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        interpret=interpret,
    )

    def run(Lh, Ll, bh, bl):
        fl = lambda a: jnp.flip(a, axis=0)
        xs = tuple(fl(a).reshape(nc, cr, LANES)
                   for a in (Lh, Ll, bh, bl))
        z = jnp.zeros((W, LANES), jnp.float32)
        _, ys = jax.lax.scan(_chunked_call(call, 2), (z, z), xs)
        return tuple(fl(y.reshape(R, LANES)) for y in ys)

    return jax.jit(run)


def _bwd_multi_chunk_kernel(bw, W, CR, Lh, b, wi, x, wo):
    body = _bwd_multi_body(bw, W, Lh, b, x)
    wo[...] = jax.lax.fori_loop(0, CR, body, wi[...])


@functools.lru_cache(maxsize=None)
def bwd_multi_chunked_fn(d: int, bw: int, m_tiles: int, tile: int = 512,
                         cr: int = CHUNK_ROWS, interpret: bool = False):
    """Chunk-streamed f32 multi-RHS backward solve (sampling)."""
    W, R = plan_rows_chunked(d, bw, cr)
    nc = R // cr
    out = [jax.ShapeDtypeStruct((cr, tile), jnp.float32),
           jax.ShapeDtypeStruct((W, tile), jnp.float32)]
    kern = functools.partial(_bwd_multi_chunk_kernel, bw, W, cr)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )

    def run(Lh, b):
        fl = lambda a: jnp.flip(a, axis=0)
        Lx = fl(Lh).reshape(nc, cr, LANES)
        bf = fl(b)
        z = jnp.zeros((W, tile), jnp.float32)
        outs = []
        for i in range(m_tiles):
            bx = bf[:, i * tile:(i + 1) * tile].reshape(nc, cr, tile)
            _, ys = jax.lax.scan(_chunked_call(call, 1), (z,), (Lx, bx))
            outs.append(ys[0].reshape(R, tile))
        return fl(jnp.concatenate(outs, axis=1))

    return jax.jit(run)


def _takahashi_chunk_kernel(bw, W, CR, Lh, zi, Z, zo):
    body = _takahashi_body(bw, W, Lh, Z)
    zo[...] = jax.lax.fori_loop(0, CR, body, zi[...])


@functools.lru_cache(maxsize=None)
def takahashi_chunked_fn(d: int, bw: int, cr: int = CHUNK_ROWS,
                         interpret: bool = False):
    W, R = plan_rows_chunked(d, bw, cr)
    nc = R // cr
    out = [jax.ShapeDtypeStruct((cr, LANES), jnp.float32),
           jax.ShapeDtypeStruct((W, LANES), jnp.float32)]
    kern = functools.partial(_takahashi_chunk_kernel, bw, W, cr)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )

    def run(Lh):
        fl = lambda a: jnp.flip(a, axis=0)
        Lx = fl(Lh).reshape(nc, cr, LANES)
        z = jnp.zeros((W, LANES), jnp.float32)
        _, ys = jax.lax.scan(_chunked_call(call, 1), (z,), (Lx,))
        return fl(ys[0].reshape(R, LANES))

    return jax.jit(run)


# ---------------------------------------------------------------------------
# host-side layout helpers (plain XLA, f64 allowed)
# ---------------------------------------------------------------------------

def pack_band(band64, d: int, bw: int, R: int = None):
    """(bw+1, >=d) f64 lower-band -> ((R,128) hi, lo) kernel layout.
    Columns beyond d (callers pad with identity) and the leading window
    are identity rows."""
    W, Rp = plan_rows(d, bw)
    R = Rp if R is None else R
    rows = jnp.zeros((R, LANES), jnp.float64)
    bt = band64[:, :d].T                                   # (d, bw+1)
    rows = rows.at[W:W + d, :bw + 1].set(bt)
    eye_rows = jnp.concatenate([
        jnp.arange(W), W + d + jnp.arange(R - W - d)])
    rows = rows.at[eye_rows, 0].set(1.0)
    return dd.from_f64(rows)


def pack_rhs(rhs64, d: int, bw: int, R: int = None):
    """(d,) or (d, r<=128) f64 -> ((R,128) hi, lo)."""
    W, Rp = plan_rows(d, bw)
    R = Rp if R is None else R
    if rhs64.ndim == 1:
        rhs64 = rhs64[:, None]
    r = rhs64.shape[1]
    rows = jnp.zeros((R, LANES), jnp.float64)
    rows = rows.at[W:W + d, :r].set(rhs64)
    return dd.from_f64(rows)


def unpack(rows_pair, d: int, bw: int, r: int = None):
    """((R,128) hi, lo) -> (d,) or (d, r) f64."""
    W, _ = plan_rows(d, bw)
    out = dd.to_f64(rows_pair)[W:W + d]
    if r is None:
        return out[:, 0]
    return out[:, :r]
