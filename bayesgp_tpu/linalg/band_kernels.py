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


def plan_rows(d: int, bw: int):
    """(W, R): window size and padded row count for a d-column band."""
    W = 8
    while W < bw + 1:
        W *= 2
    if W > 32:
        raise ValueError(f"bandwidth {bw} too large for the band kernels")
    R = -(-(W + d) // 8) * 8
    return W, R


# ---------------------------------------------------------------------------
# factor: band -> L (+ 1/Ljj stash), Y = L^{-1} C, half log-det
# ---------------------------------------------------------------------------

def _factor_kernel(bw, W, R, bh, bl, ch, cl, Lh, Ll, yh, yl, misc):
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
        dpair = (acc[0][0, 0], acc[1][0, 0])
        rs = dd.rsqrt(dpair)
        Lcol = dd.mul(acc, rs)
        Lcol = (jnp.where(band_mask, Lcol[0], f0),
                jnp.where(band_mask, Lcol[1], f0))
        ynew = dd.mul(yacc, rs)
        ldh, ldl = dd.add((ldh, ldl), dd.log(dpair))
        Lh[pl.ds(j, 1), :] = (Lcol[0]
                              + jnp.where(lane == bw + 1, rs[0], f0)
                              + jnp.where(lane == bw + 2, rs[1], f0))
        Ll[pl.ds(j, 1), :] = Lcol[1]
        yh[pl.ds(j, 1), :] = ynew[0]
        yl[pl.ds(j, 1), :] = ynew[1]
        wh = jnp.roll(wh, -1, axis=0).at[W - 1].set(Lcol[0][0])
        wl = jnp.roll(wl, -1, axis=0).at[W - 1].set(Lcol[1][0])
        ywh = jnp.roll(ywh, -1, axis=0).at[W - 1].set(ynew[0][0])
        ywl = jnp.roll(ywl, -1, axis=0).at[W - 1].set(ynew[1][0])
        return wh, wl, ywh, ywl, ldh, ldl

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

def _fwd_kernel(bw, W, R, Lh, Ll, bh, bl, xh, xl):
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
        lwh = jnp.roll(lwh, -1, axis=0).at[W - 1].set(Lrow[0][0])
        lwl = jnp.roll(lwl, -1, axis=0).at[W - 1].set(Lrow[1][0])
        ywh = jnp.roll(ywh, -1, axis=0).at[W - 1].set(ynew[0][0])
        ywl = jnp.roll(ywl, -1, axis=0).at[W - 1].set(ynew[1][0])
        return lwh, lwl, ywh, ywl

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
    def body(i, carry):
        xwh, xwl = carry
        j = R - 1 - i
        Lrow = (Lh[pl.ds(j, 1), :], Ll[pl.ds(j, 1), :])
        rs = (Lrow[0][0, bw + 1], Lrow[0][0, bw + 2])
        acc = (bh[pl.ds(j, 1), :], bl[pl.ds(j, 1), :])
        for t in range(1, bw + 1):
            s = (Lrow[0][0, t], Lrow[1][0, t])     # L[j+t, j]
            acc = dd.sub(acc, dd.mul((xwh[t - 1:t, :], xwl[t - 1:t, :]), s))
        xnew = dd.mul(acc, rs)
        xh[pl.ds(j, 1), :] = xnew[0]
        xl[pl.ds(j, 1), :] = xnew[1]
        xwh = jnp.roll(xwh, 1, axis=0).at[0].set(xnew[0][0])
        xwl = jnp.roll(xwl, 1, axis=0).at[0].set(xnew[1][0])
        return xwh, xwl

    z = jnp.zeros((W, LANES), jnp.float32)
    jax.lax.fori_loop(0, R, body, (z, z))


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
    return jax.jit(call)


# ---------------------------------------------------------------------------
# backward solve, plain f32, many RHS tiled over the lane axis (sampling:
# Monte-Carlo accuracy only — factor stays dd, arithmetic here is f32)
# ---------------------------------------------------------------------------

def _bwd_multi_kernel(bw, W, R, Lh, b, x):
    def body(i, xw):
        j = R - 1 - i
        Lrow = Lh[pl.ds(j, 1), :]
        rs = Lrow[0, bw + 1]
        acc = b[pl.ds(j, 1), :]
        for t in range(1, bw + 1):
            acc = acc - Lrow[0, t] * xw[t - 1:t, :]
        xnew = acc * rs
        x[pl.ds(j, 1), :] = xnew
        return jnp.roll(xw, 1, axis=0).at[0].set(xnew[0])

    tile = b.shape[-1]
    jax.lax.fori_loop(0, R, body, jnp.zeros((W, tile), jnp.float32))


@functools.lru_cache(maxsize=None)
def bwd_multi_fn(d: int, bw: int, m_tiles: int, tile: int = 512,
                 interpret: bool = False):
    W, R = plan_rows(d, bw)
    kern = functools.partial(_bwd_multi_kernel, bw, W, R)
    call = pl.pallas_call(
        kern,
        grid=(m_tiles,),
        out_shape=jax.ShapeDtypeStruct((R, m_tiles * tile), jnp.float32),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return jax.jit(call)


# ---------------------------------------------------------------------------
# Takahashi selected inverse: band of H^{-1} from L (f32 — feeds only
# gradients; the equilibrated system keeps it well-conditioned)
# ---------------------------------------------------------------------------

def _takahashi_kernel(bw, W, R, Lh, Z):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    f0 = jnp.float32(0.0)
    col_mask = jnp.logical_and(lane >= 1, lane <= bw)

    def body(i, zblk):
        j = R - 1 - i
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
        zblk = jnp.roll(jnp.roll(zblk, 1, axis=0), 1, axis=1)
        zblk = zblk.at[0:1, :].set(outrow)
        for r in range(1, bw + 1):
            zblk = zblk.at[r, 0].set(zc[0, r])
        return zblk

    jax.lax.fori_loop(0, R, body, jnp.zeros((W, LANES), jnp.float32))


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
    return jax.jit(call)


# ---------------------------------------------------------------------------
# host-side layout helpers (plain XLA, f64 allowed)
# ---------------------------------------------------------------------------

def pack_band(band64, d: int, bw: int):
    """(bw+1, >=d) f64 lower-band -> ((R,128) hi, lo) kernel layout.
    Columns beyond d (callers pad with identity) and the leading window
    are identity rows."""
    W, R = plan_rows(d, bw)
    rows = jnp.zeros((R, LANES), jnp.float64)
    bt = band64[:, :d].T                                   # (d, bw+1)
    rows = rows.at[W:W + d, :bw + 1].set(bt)
    eye_rows = jnp.concatenate([
        jnp.arange(W), W + d + jnp.arange(R - W - d)])
    rows = rows.at[eye_rows, 0].set(1.0)
    return dd.from_f64(rows)


def pack_rhs(rhs64, d: int, bw: int):
    """(d,) or (d, r<=128) f64 -> ((R,128) hi, lo)."""
    W, R = plan_rows(d, bw)
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
