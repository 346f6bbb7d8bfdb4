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

import jax
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
    """1/x to ~2^-48 relative, DIVISION-FREE.

    The obvious `r0 = 1/x[0]` is corrupted under jit: XLA's algebraic
    simplifier rewrites the mul(x, divide(1, x)) inside the Newton
    residual to 1, silently destroying the error-free correction
    (measured: 3e-8 relative under jit vs 7e-15 eager).
    `lax.optimization_barrier` would block that but has no Mosaic
    lowering, and these helpers must run inside Pallas kernels — so the
    seed comes from the classic exponent bit-hack instead, followed by
    three f32 Newton steps (quadratic: ~0.03 -> ~eps32) and one dd
    Newton step (squares eps32 to ~2^-48). No divide op anywhere, so
    no pattern for the simplifier to pair.
    """
    x0 = x[0]
    bits = jax.lax.bitcast_convert_type(jnp.abs(x0), jnp.int32)
    r0 = jax.lax.bitcast_convert_type(
        jnp.int32(0x7EF311C3) - bits, jnp.float32)
    r0 = jnp.where(x0 < 0, -r0, r0)
    for _ in range(3):
        r0 = r0 * (jnp.float32(2.0) - x0 * r0)
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


def _f64_pair(v: float):
    """Python-float (hi, lo) of a double constant — compile-time scalars
    (Pallas kernels cannot capture array constants, but immediates are
    fine)."""
    import numpy as _np
    hi = _np.float32(v)
    return float(hi), float(_np.float64(v) - _np.float64(hi))


_LN2 = _f64_pair(0.6931471805599453094)
# atanh-series coefficients 1/(2k+1), k = 0..9, as dd immediates
_ATANH_C = [_f64_pair(1.0 / (2 * k + 1)) for k in range(10)]


def log_precise(x):
    """log(x) to ~2^-45 absolute for positive normal x = (hi, lo).

    Exponent-extraction form: x = 2^e * m with m in [0.75, 1.5) after a
    half-shift, so log x = e*ln2 + 2*atanh(u/(2+u)) with u = m-1 EXACT
    (Sterbenz). e*ln2 uses an error-free two_prod against the dd ln2
    constant; the atanh series runs in dd Horner form (|v^2| <= 0.04,
    10 terms reach ~5e-16 relative truncation). The lo input folds in
    as lo/hi (error (lo/hi)^2/2 ~ 2^-49).

    Replaces the plain f32 `log` in the band factor kernel's half
    log-det accumulation (~1e-7 absolute PER PIVOT there, accumulating
    over the d ~ 2000 columns of the headline factorization).
    Integer bit ops only (bitcast/shift/and) — Mosaic-lowerable.
    """
    hi, lo = x
    bits = jax.lax.bitcast_convert_type(hi, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F800000, jnp.float32)      # [1, 2)
    big = m > jnp.float32(1.5)
    m = jnp.where(big, jnp.float32(0.5) * m, m)             # [0.75, 1.5)
    e = e + big.astype(jnp.int32)
    ef = e.astype(jnp.float32)

    u = m - jnp.float32(1.0)                                # exact
    # r = 1/(2+u) WITHOUT ever forming the dd pair of (2+u):
    # two_sum(2.0, u) is destroyed under jit by XLA's constant
    # reassociation (sub(add(u, 2), 2) -> u kills the residual; found
    # via HLO dump). Seed an f32 reciprocal of the rounded denominator,
    # then one dd Newton step whose residual expands to 1 - 2r - u*r —
    # every piece exact or a safe var-var EFT, so the simplifier has
    # nothing to cancel (1 - 2r is Sterbenz-exact: 2r ~ 1).
    den0 = u + jnp.float32(2.0)
    bits_d = jax.lax.bitcast_convert_type(den0, jnp.int32)
    r0 = jax.lax.bitcast_convert_type(
        jnp.int32(0x7EF311C3) - bits_d, jnp.float32)
    for _ in range(3):
        r0 = r0 * (jnp.float32(2.0) - den0 * r0)
    ur = mul(from_f32(u), from_f32(r0))
    e_r = sub(sub(from_f32(jnp.float32(1.0)),
                  (jnp.float32(2.0) * r0, jnp.float32(0.0) * r0)), ur)
    r = fast_two_sum(r0, r0 * (e_r[0] + e_r[1]))
    v = mul(from_f32(u), r)
    w = mul(v, v)
    ch, cl = _ATANH_C[-1]
    P = (jnp.full_like(m, ch), jnp.full_like(m, cl))
    for ch, cl in reversed(_ATANH_C[:-1]):
        P = add(mul(P, w), (jnp.full_like(m, ch), jnp.full_like(m, cl)))
    logm = mul(P, (jnp.float32(2.0) * v[0], jnp.float32(2.0) * v[1]))

    e_ln2 = add(two_prod(ef, jnp.float32(_LN2[0])),
                from_f32(ef * jnp.float32(_LN2[1])))
    return add(add(e_ln2, logm), from_f32(lo / hi))
