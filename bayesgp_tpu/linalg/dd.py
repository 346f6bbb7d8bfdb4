"""Double-float ("df32" / double-word) arithmetic on float32 pairs.

TPU has no native float64 ALU: XLA emulates f64 per-op, and on this
part each emulated op inside a sequential loop costs ~50-100 us of
dispatch/serialization — the measured bottleneck of the banded
factorization path (see BENCH_NOTES.md). Pallas kernels cannot use f64
at all. These helpers implement value ~= hi + lo arithmetic with
|lo| <= ulp(hi)/2 using error-free transformations (Knuth two-sum,
Dekker split/two-prod), giving ~2^-48 relative accuracy out of plain
f32 vector ops — MXU/VPU-speed inside Pallas kernels.

All functions take/return (hi, lo) tuples of same-shape f32 arrays and
are ordinary traceable JAX ops (usable inside Pallas kernels and in
plain jitted code alike). No torch, no f64 anywhere.

Reference for the role these play: the reference package delegates its
sparse factorization to TMB/CHOLMOD in C (SURVEY.md L0); this is the
numeric core of the TPU-native equivalent.
"""
from __future__ import annotations

import jax.numpy as jnp

# Dekker split constant for float32: 2^12 + 1 (24-bit mantissa).
_SPLIT = 4097.0


def two_sum(a, b):
    """Error-free a + b (Knuth): s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b| (Dekker)."""
    s = a + b
    return s, b - (s - a)


def split(a):
    """Dekker split: a == hi + lo with hi, lo 12-bit mantissas."""
    t = a * _SPLIT
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b: p + e == a*b exactly (Dekker, no FMA needed)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# -- pair ops ----------------------------------------------------------------

def add(x, y):
    """(hi,lo) + (hi,lo), ~2^-48 relative (sloppy dd add — fine for the
    diagonally-dominant, equilibrated systems this is used on)."""
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return fast_two_sum(s, e)


def neg(x):
    return -x[0], -x[1]


def sub(x, y):
    return add(x, neg(y))


def mul(x, y):
    """(hi,lo) * (hi,lo)."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def from_f32(a):
    return a, jnp.zeros_like(a)


def to_f64(x):
    """Recombine OUTSIDE kernels (f64 allowed there)."""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def from_f64(a64):
    """Split an f64 array into an f32 pair OUTSIDE kernels."""
    hi = a64.astype(jnp.float32)
    lo = (a64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def rsqrt(x):
    """1/sqrt(x) for x > 0, one dd Newton step off the f32 estimate:
    r' = r + r*(1 - x r^2)/2; error ~ 1.5 * (eps32)^2 ~ 2e-14 rel."""
    r0 = jnp.float32(1.0) / jnp.sqrt(x[0])
    r2 = mul(from_f32(r0), from_f32(r0))
    xr2 = mul(x, r2)
    e_hi, e_lo = sub(from_f32(jnp.float32(1.0)), xr2)
    corr = r0 * (jnp.float32(0.5) * (e_hi + e_lo))
    return fast_two_sum(r0, corr)


def recip(x):
    """1/x, one dd Newton step: r' = r + r*(1 - x r)."""
    r0 = jnp.float32(1.0) / x[0]
    xr = mul(x, from_f32(r0))
    e_hi, e_lo = sub(from_f32(jnp.float32(1.0)), xr)
    corr = r0 * (e_hi + e_lo)
    return fast_two_sum(r0, corr)


def log(x):
    """log(x) to ~f32 accuracy in hi with the lo-correction folded in:
    log(hi+lo) = log(hi) + log1p(lo/hi) ~= log(hi) + lo/hi. The absolute
    error is the f32 log's (~1e-7) — error-free ACCUMULATION of many
    such terms is what the dd pair buys (see band_kernels hld)."""
    return two_sum(jnp.log(x[0]), x[1] / x[0])
