"""Lane-packed MULTI-REPLICATE banded Cholesky kernels (double-float).

The scalar band kernels (band_kernels.py) use only bw+3 of the 128 VPU
lanes (band offsets + the 1/Ljj stash); at the headline bandwidth bw=3
that is ~6% lane utilization while the factorization's sequential
column recurrence sets the wall-clock. These kernels pack NR = 128/G
independent systems side by side in lane GROUPS of G lanes (G = the
smallest power of two >= max(2*bw+1, bw+3)) so the ~d sequential steps
advance ALL replicates at once — near-NR x throughput for replicate
fits on ONE chip (the per-chip half of BASELINE.json's stretch
configuration; the reference's only analogue is a PSOCK process pool,
R/02_model_fit.R:754-769, one process per replicate).

Per-column scalars of the scalar kernels (the pivot, the band
multipliers L[j+t, j], the 1/Ljj stash) become PER-GROUP scalars,
broadcast across their group's lanes with masked roll-doubling
(log2(G) shifted adds — Mosaic has no lane gather, and rolls by static
amounts lower cleanly). Group-local band offsets never cross group
boundaries: rolled window reads touch lanes o+t <= 2*bw <= G-1.

Layout ((R, 128) float32 arrays, as band_kernels.py):
  - group r occupies lanes [r*G, (r+1)*G); within a group, lane o of
    band row j = H_r[j+o, j] (o = 0..bw), lanes bw+1/bw+2 stash
    (hi, lo) of 1/L_r[j,j] after factorization.
  - RHS kernels put each replicate's m <= G right-hand-side columns on
    its group's lanes 0..m-1.
All kernels share band_kernels.plan_rows geometry (identical W, R).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dd
from .band_kernels import plan_rows, LANES, _push, _push_front


def group_size(bw: int, m_rhs: int = 0) -> int:
    """Lanes per replicate group: power of two covering the band rolls
    (2*bw+1), the 1/Ljj stash (bw+3) and m_rhs RHS columns."""
    need = max(2 * bw + 1, bw + 3, m_rhs)
    G = 8
    while G < need:
        G *= 2
    if G > LANES:
        raise ValueError(f"bandwidth {bw} / m_rhs {m_rhs} too large")
    return G


def _glane(G):
    """(1, LANES) iota of WITHIN-group lane offsets (lane mod G; G is a
    power of two so the mod is a lowerable bitwise and)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    return jnp.bitwise_and(lane, G - 1)


def _bcast(row, t: int, G: int, glane):
    """Per-group broadcast: the value at within-group lane t of each
    group -> all lanes of that group. Masked roll-doubling; pre-roll
    nonzeros sit at lanes r*G (+ widths < shift), so wraparound never
    crosses into group 0."""
    v = jnp.roll(row, -t, axis=1) if t else row
    v = jnp.where(glane == 0, v, jnp.float32(0.0))
    sh = 1
    while sh < G:
        v = v + jnp.roll(v, sh, axis=1)
        sh *= 2
    return v


def _bcast_dd(pair, t: int, G: int, glane):
    return (_bcast(pair[0], t, G, glane), _bcast(pair[1], t, G, glane))


# ---------------------------------------------------------------------------
# batched factor: NR bands -> NR L factors (+ stash) + per-group logdets
# ---------------------------------------------------------------------------

def _bfactor_kernel(bw, G, W, R, bh, bl, Lh, Ll, misc):
    glane = _glane(G)
    band_mask = glane <= bw
    f0 = jnp.float32(0.0)

    def body(j, carry):
        wh, wl, ldh, ldl = carry
        acc = (bh[pl.ds(j, 1), :], bl[pl.ds(j, 1), :])
        for t in range(1, bw + 1):
            r = W - t
            s = _bcast_dd((wh[r:r + 1, :], wl[r:r + 1, :]), t, G, glane)
            rolled = (jnp.roll(wh[r:r + 1, :], -t, axis=1),
                      jnp.roll(wl[r:r + 1, :], -t, axis=1))
            acc = dd.sub(acc, dd.mul(rolled, s))
        piv = _bcast_dd(acc, 0, G, glane)
        # |pivot| clamp (modified Cholesky) — see
        # band_kernels._factor_body; healthy pivots pass through
        # bit-identically
        badp = piv[0] < jnp.float32(1e-12)
        piv = (jnp.where(badp, jnp.maximum(jnp.abs(piv[0]),
                                           jnp.float32(1e-12)), piv[0]),
               jnp.where(badp, jnp.where(piv[0] < f0, -piv[1], f0),
                         piv[1]))
        on0 = glane == 0
        acc = (jnp.where(on0, piv[0], acc[0]),
               jnp.where(on0, piv[1], acc[1]))
        rs = dd.rsqrt(piv)
        Lcol = dd.mul(acc, rs)
        Lcol = (jnp.where(band_mask, Lcol[0], f0),
                jnp.where(band_mask, Lcol[1], f0))
        # magnitude cap — bit-identity on healthy factors (|L| <= 1);
        # see band_kernels._factor_body
        bigc = jnp.abs(Lcol[0]) > jnp.float32(1e3)
        Lcol = (jnp.clip(Lcol[0], jnp.float32(-1e3), jnp.float32(1e3)),
                jnp.where(bigc, f0, Lcol[1]))
        # per-group pivot log accumulated on the group's lane 0 (other
        # lanes' "logs" are garbage and masked out before the add)
        lp = dd.log_precise(acc)
        ldh, ldl = dd.add((ldh, ldl), (jnp.where(on0, lp[0], f0),
                                       jnp.where(on0, lp[1], f0)))
        Lh[pl.ds(j, 1), :] = (Lcol[0]
                              + jnp.where(glane == bw + 1, rs[0], f0)
                              + jnp.where(glane == bw + 2, rs[1], f0))
        Ll[pl.ds(j, 1), :] = Lcol[1]
        wh = _push(wh, Lcol[0])
        wl = _push(wl, Lcol[1])
        return wh, wl, ldh, ldl

    z = jnp.zeros((W, LANES), jnp.float32)
    zr = jnp.zeros((1, LANES), jnp.float32)
    *_, ldh, ldl = jax.lax.fori_loop(0, R, body, (z, z, zr, zr))
    misc[pl.ds(0, 1), :] = ldh
    misc[pl.ds(1, 1), :] = ldl


@functools.lru_cache(maxsize=None)
def bfactor_fn(d: int, bw: int, G: int, interpret: bool = False):
    W, R = plan_rows(d, bw)
    out = [jax.ShapeDtypeStruct((R, LANES), jnp.float32)] * 2 \
        + [jax.ShapeDtypeStruct((8, LANES), jnp.float32)]
    kern = functools.partial(_bfactor_kernel, bw, G, W, R)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        interpret=interpret,
    )
    return jax.jit(call)


# ---------------------------------------------------------------------------
# batched forward solve: L_r y_r = b_r, m RHS columns per group
# ---------------------------------------------------------------------------

def _bfwd_kernel(bw, G, W, R, Lh, Ll, bh, bl, xh, xl):
    glane = _glane(G)

    def body(j, carry):
        lwh, lwl, ywh, ywl = carry
        Lrow = (Lh[pl.ds(j, 1), :], Ll[pl.ds(j, 1), :])
        rs = (_bcast(Lrow[0], bw + 1, G, glane),
              _bcast(Lrow[0], bw + 2, G, glane))
        acc = (bh[pl.ds(j, 1), :], bl[pl.ds(j, 1), :])
        for t in range(1, bw + 1):
            r = W - t
            s = _bcast_dd((lwh[r:r + 1, :], lwl[r:r + 1, :]), t, G, glane)
            acc = dd.sub(acc, dd.mul((ywh[r:r + 1, :], ywl[r:r + 1, :]), s))
        ynew = dd.mul(acc, rs)
        xh[pl.ds(j, 1), :] = ynew[0]
        xl[pl.ds(j, 1), :] = ynew[1]
        lwh = _push(lwh, Lrow[0])
        lwl = _push(lwl, Lrow[1])
        ywh = _push(ywh, ynew[0])
        ywl = _push(ywl, ynew[1])
        return lwh, lwl, ywh, ywl

    z = jnp.zeros((W, LANES), jnp.float32)
    jax.lax.fori_loop(0, R, body, (z, z, z, z))


@functools.lru_cache(maxsize=None)
def bfwd_fn(d: int, bw: int, G: int, interpret: bool = False):
    W, R = plan_rows(d, bw)
    out = [jax.ShapeDtypeStruct((R, LANES), jnp.float32)] * 2
    kern = functools.partial(_bfwd_kernel, bw, G, W, R)
    call = pl.pallas_call(
        kern,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )
    return jax.jit(call)


# ---------------------------------------------------------------------------
# batched backward solve: L_r^T x_r = y_r (forward loop on flipped rows,
# see band_kernels._bwd_kernel for the Mosaic index rationale)
# ---------------------------------------------------------------------------

def _bbwd_kernel(bw, G, W, R, Lh, Ll, bh, bl, xh, xl):
    glane = _glane(G)

    def body(j, carry):
        xwh, xwl = carry
        Lrow = (Lh[pl.ds(j, 1), :], Ll[pl.ds(j, 1), :])
        rs = (_bcast(Lrow[0], bw + 1, G, glane),
              _bcast(Lrow[0], bw + 2, G, glane))
        acc = (bh[pl.ds(j, 1), :], bl[pl.ds(j, 1), :])
        for t in range(1, bw + 1):
            r = W - t
            s = _bcast_dd(Lrow, t, G, glane)       # L_r[orig+t, orig]
            acc = dd.sub(acc, dd.mul((xwh[r:r + 1, :], xwl[r:r + 1, :]), s))
        xnew = dd.mul(acc, rs)
        xh[pl.ds(j, 1), :] = xnew[0]
        xl[pl.ds(j, 1), :] = xnew[1]
        xwh = _push(xwh, xnew[0])
        xwl = _push(xwl, xnew[1])
        return xwh, xwl

    z = jnp.zeros((W, LANES), jnp.float32)
    jax.lax.fori_loop(0, R, body, (z, z))


@functools.lru_cache(maxsize=None)
def bbwd_fn(d: int, bw: int, G: int, interpret: bool = False):
    W, R = plan_rows(d, bw)
    out = [jax.ShapeDtypeStruct((R, LANES), jnp.float32)] * 2
    kern = functools.partial(_bbwd_kernel, bw, G, W, R)
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
# batched Takahashi selected inverse (f32): per-group band of H_r^{-1}
# ---------------------------------------------------------------------------

def _btakahashi_kernel(bw, G, W, R, Lh, Z):
    glane = _glane(G)
    f0 = jnp.float32(0.0)
    col_mask = jnp.logical_and(glane >= 1, glane <= bw)
    rr = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
    cc = jnp.bitwise_and(
        jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 1), G - 1)
    row0 = rr == 0
    col0 = jnp.logical_and(cc == 0,
                           jnp.logical_and(rr >= 1, rr <= bw))
    keep = jnp.logical_not(jnp.logical_or(row0, col0))
    onehot = [jnp.logical_and(rr == r, cc == 0) for r in range(1, bw + 1)]

    def body(j, zblk):
        Lrow = Lh[pl.ds(j, 1), :]
        rs = _bcast(Lrow, bw + 1, G, glane)
        m = jnp.zeros((1, LANES), jnp.float32)
        for t in range(1, bw + 1):
            m = m + (_bcast(Lrow, t, G, glane) * rs) * zblk[t - 1:t, :]
        zc = jnp.where(col_mask, -jnp.roll(m, 1, axis=1), f0)
        zjj = rs * rs
        for t in range(1, bw + 1):
            zjj = zjj + (_bcast(Lrow, t, G, glane) * rs) \
                * _bcast(m, t - 1, G, glane)
        outrow = jnp.where(glane == 0, zjj, zc)
        Z[pl.ds(j, 1), :] = outrow
        zero_row = jnp.zeros((1, LANES), jnp.float32)
        shifted = jnp.roll(_push_front(zblk, zero_row), 1, axis=1)
        new = jnp.where(keep, shifted, f0)
        new = new + jnp.where(row0, outrow, f0)
        for r in range(1, bw + 1):
            new = new + jnp.where(onehot[r - 1],
                                  _bcast(zc, r, G, glane), f0)
        return new

    jax.lax.fori_loop(0, R, body, jnp.zeros((W, LANES), jnp.float32))


@functools.lru_cache(maxsize=None)
def btakahashi_fn(d: int, bw: int, G: int, interpret: bool = False):
    W, R = plan_rows(d, bw)
    kern = functools.partial(_btakahashi_kernel, bw, G, W, R)
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
# layout helpers (plain XLA, f64 allowed)
# ---------------------------------------------------------------------------

def pack_band_batched(bands64, d: int, bw: int, G: int):
    """(NR, bw+1, >=d) f64 lower-bands -> ((R, 128) hi, lo), group r on
    lanes [r*G, r*G+bw]; identity rows get 1 on each group's lane 0."""
    NR = bands64.shape[0]
    if NR * G > LANES:
        raise ValueError(f"NR={NR} groups of {G} lanes exceed {LANES}")
    W, R = plan_rows(d, bw)
    bt = jnp.transpose(bands64[:, :, :d], (2, 0, 1))       # (d, NR, bw+1)
    bt = jnp.pad(bt, ((0, 0), (0, 0), (0, G - (bw + 1))))
    rows = jnp.zeros((R, LANES), jnp.float64)
    rows = rows.at[W:W + d, :NR * G].set(bt.reshape(d, NR * G))
    eye_rows = np.concatenate([np.arange(W), W + d + np.arange(R - W - d)])
    eye_lanes = G * np.arange(NR)
    rows = rows.at[np.ix_(eye_rows, eye_lanes)].set(1.0)
    return dd.from_f64(rows)


def pack_rhs_batched(rhs64, d: int, bw: int, G: int):
    """(NR, d) or (NR, d, m<=G) f64 -> ((R, 128) hi, lo), replicate r's
    m columns on lanes [r*G, r*G+m)."""
    if rhs64.ndim == 2:
        rhs64 = rhs64[:, :, None]
    NR, _, m = rhs64.shape
    if m > G or NR * G > LANES:
        raise ValueError(f"m={m} RHS / NR={NR} do not fit groups of {G}")
    W, R = plan_rows(d, bw)
    bt = jnp.pad(jnp.transpose(rhs64, (1, 0, 2)), ((0, 0), (0, 0),
                                                   (0, G - m)))
    rows = jnp.zeros((R, LANES), jnp.float64)
    rows = rows.at[W:W + d, :NR * G].set(bt.reshape(d, NR * G))
    return dd.from_f64(rows)


def unpack_batched(rows_pair, d: int, bw: int, G: int, NR: int,
                   m: int = None):
    """((R, 128) hi, lo) -> (NR, d) or (NR, d, m) f64."""
    W, _ = plan_rows(d, bw)
    out = dd.to_f64(rows_pair)[W:W + d, :NR * G].reshape(d, NR, G)
    if m is None:
        return jnp.transpose(out[:, :, 0], (1, 0))
    return jnp.transpose(out[:, :, :m], (1, 0, 2))
