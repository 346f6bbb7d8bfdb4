"""Pallas band-kernel tests (interpret mode on CPU) + engine parity.

Covers the TPU-native replacement of the reference's TMB/CHOLMOD
sparse Cholesky (SURVEY.md §2.2): double-float banded factorization,
forward/backward solves, f32 multi-RHS sampling solve, Takahashi
selected inverse, and the arrow-level custom-VJP half log-det.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayesgp_tpu.linalg import band_arrow as ba
from bayesgp_tpu.linalg import band_kernels as bk


def _spd_band(rng, d, bw, cond=1.0):
    """Banded SPD matrix (through its exact lower-band Cholesky)."""
    L0 = cond * 0.4 * np.tril(rng.normal(size=(d, d)), -1)
    L0 *= np.abs(np.arange(d)[:, None] - np.arange(d)[None, :]) <= bw
    np.fill_diagonal(L0, 1.5 + rng.uniform(0, 1, d))
    A = L0 @ L0.T
    s = 1.0 / np.sqrt(np.diag(A))
    A = A * s[:, None] * s[None, :]          # equilibrated, like callers do
    band = np.zeros((bw + 1, d))
    for o in range(bw + 1):
        band[o, :d - o] = np.diag(A, -o)
    return A, band


@pytest.mark.parametrize("d,bw", [(64, 3), (40, 2), (96, 7)])
def test_factor_solves_vs_numpy(d, bw):
    rng = np.random.default_rng(0)
    A, band = _spd_band(rng, d, bw)
    q = 4
    C = rng.normal(size=(d, q))
    Lnp = np.linalg.cholesky(A)

    bh, bl = bk.pack_band(jnp.asarray(band), d, bw)
    ch, cl = bk.pack_rhs(jnp.asarray(C), d, bw)
    Lh, Ll, Yh, Yl, misc = bk.factor_fn(d, bw, interpret=True)(
        bh, bl, ch, cl)
    W, _ = bk.plan_rows(d, bw)

    Lrows = np.asarray(jnp.asarray(Lh, jnp.float64)
                       + jnp.asarray(Ll, jnp.float64))[W:W + d]
    for o in range(bw + 1):
        col = Lrows[:d - o, o] if o else Lrows[:, 0]
        np.testing.assert_allclose(col, np.diag(Lnp, -o), atol=1e-12)

    hld = 0.5 * (float(misc[0, 0]) + float(misc[0, 1]))
    # dd.log_precise keeps the accumulated pivot logs at ~2^-45 absolute
    assert abs(hld - np.sum(np.log(np.diag(Lnp)))) < 1e-11

    Y = np.asarray(bk.unpack((Yh, Yl), d, bw, q))
    np.testing.assert_allclose(Y, np.linalg.solve(Lnp, C), atol=1e-10)

    b = rng.normal(size=(d, 3))
    rh, rl = bk.pack_rhs(jnp.asarray(b), d, bw)
    y = np.asarray(bk.unpack(
        bk.fwd_solve_fn(d, bw, interpret=True)(Lh, Ll, rh, rl), d, bw, 3))
    np.testing.assert_allclose(y, np.linalg.solve(Lnp, b), atol=1e-10)
    x = np.asarray(bk.unpack(
        bk.bwd_solve_fn(d, bw, interpret=True)(Lh, Ll, rh, rl), d, bw, 3))
    np.testing.assert_allclose(x, np.linalg.solve(Lnp.T, b), atol=1e-10)


def test_multi_rhs_and_takahashi():
    rng = np.random.default_rng(1)
    d, bw = 64, 3
    A, band = _spd_band(rng, d, bw)
    Lnp = np.linalg.cholesky(A)
    bh, bl = bk.pack_band(jnp.asarray(band), d, bw)
    z = jnp.zeros_like(bh)
    Lh, Ll, *_ = bk.factor_fn(d, bw, interpret=True)(bh, bl, z, z)
    W, R = bk.plan_rows(d, bw)

    M = 256
    B = rng.normal(size=(d, M)).astype(np.float32)
    Bp = np.zeros((R, M), np.float32)
    Bp[W:W + d] = B
    X = np.asarray(bk.bwd_multi_fn(d, bw, 2, tile=128, interpret=True)(
        Lh, jnp.asarray(Bp)))[W:W + d]
    np.testing.assert_allclose(X, np.linalg.solve(Lnp.T, B),
                               rtol=2e-4, atol=2e-5)

    Z = np.asarray(bk.takahashi_fn(d, bw, interpret=True)(Lh))[W:W + d]
    Hinv = np.linalg.inv(A)
    for o in range(bw + 1):
        np.testing.assert_allclose(Z[:d - o, o], np.diag(Hinv, -o),
                                   atol=3e-5)


@pytest.mark.parametrize("d,bw,cr", [(64, 3, 16), (100, 7, 24),
                                     (90, 40, 48)])
def test_chunked_kernels_match_numpy(d, bw, cr):
    """HBM-streaming chunked kernels (round-14 VMEM-envelope fix): the
    lax.scan-carried window must reproduce the single-call recurrence
    exactly — including wide bands (bw > 31) the single-call kernels
    refuse. Chunk lengths chosen so several chunks per factorization
    exercise the carry hand-off."""
    rng = np.random.default_rng(7)
    A, band = _spd_band(rng, d, bw)
    Lnp = np.linalg.cholesky(A)
    q = 5
    C = rng.normal(size=(d, q))

    W, R = bk.plan_rows_chunked(d, bw, cr)
    assert R % cr == 0 and R >= W + d
    bh, bl = bk.pack_band(jnp.asarray(band), d, bw, R)
    ch, cl = bk.pack_rhs(jnp.asarray(C), d, bw, R)
    Lh, Ll, Yh, Yl, misc = bk.factor_chunked_fn(d, bw, cr, True)(
        bh, bl, ch, cl)

    Lrows = np.asarray(jnp.asarray(Lh, jnp.float64)
                       + jnp.asarray(Ll, jnp.float64))[W:W + d]
    for o in range(bw + 1):
        col = Lrows[:d - o, o] if o else Lrows[:, 0]
        np.testing.assert_allclose(col, np.diag(Lnp, -o), atol=1e-11)
    hld = 0.5 * (float(misc[0, 0]) + float(misc[0, 1]))
    assert abs(hld - np.sum(np.log(np.diag(Lnp)))) < 1e-10
    Y = np.asarray(bk.unpack((Yh, Yl), d, bw, q))
    np.testing.assert_allclose(Y, np.linalg.solve(Lnp, C), atol=1e-9)

    b = rng.normal(size=(d, 3))
    rh, rl = bk.pack_rhs(jnp.asarray(b), d, bw, R)
    y = np.asarray(bk.unpack(
        bk.fwd_solve_chunked_fn(d, bw, cr, True)(Lh, Ll, rh, rl),
        d, bw, 3))
    np.testing.assert_allclose(y, np.linalg.solve(Lnp, b), atol=1e-9)
    x = np.asarray(bk.unpack(
        bk.bwd_solve_chunked_fn(d, bw, cr, True)(Lh, Ll, rh, rl),
        d, bw, 3))
    np.testing.assert_allclose(x, np.linalg.solve(Lnp.T, b), atol=1e-9)

    M = 96
    B = rng.normal(size=(d, M)).astype(np.float32)
    Bp = np.zeros((R, M), np.float32)
    Bp[W:W + d] = B
    X = np.asarray(bk.bwd_multi_chunked_fn(d, bw, 2, 48, cr, True)(
        Lh, jnp.asarray(Bp)))[W:W + d]
    np.testing.assert_allclose(X, np.linalg.solve(Lnp.T, B),
                               rtol=4e-4, atol=4e-4)

    Z = np.asarray(bk.takahashi_chunked_fn(d, bw, cr, True)(Lh))[W:W + d]
    Hinv = np.linalg.inv(A)
    for o in range(bw + 1):
        np.testing.assert_allclose(Z[:d - o, o], np.diag(Hinv, -o),
                                   atol=5e-5)


def _arrow_problem(rng, d, bw, q):
    A, band = _spd_band(rng, d, bw)
    C = 0.1 * rng.normal(size=(d, q))
    Hq = rng.normal(size=(q, q))
    Hd = Hq @ Hq.T + np.eye(q) + C.T @ np.linalg.solve(A, C)
    Hfull = np.zeros((d + q, d + q))
    Hfull[:d, :d] = A
    Hfull[:d, d:] = C
    Hfull[d:, :d] = C.T
    Hfull[d:, d:] = Hd
    return A, band, C, Hd, Hfull


@pytest.mark.parametrize("q", [0, 5])
def test_engine_parity(q):
    rng = np.random.default_rng(2)
    d, bw, s = 64, 3, 8
    A, band, C, Hd, Hfull = _arrow_problem(rng, d, bw, max(q, 1))
    if q == 0:
        C, Hd, Hfull = np.zeros((d, 0)), np.zeros((0, 0)), A

    eng_p = ba.make_engine(d, bw, q, s, force="pallas_interpret")
    eng_b = ba.make_engine(d, bw, q, s, force="block")
    args = (jnp.asarray(band), jnp.asarray(C), jnp.asarray(Hd))
    fp, fb = eng_p.factor(*args), eng_b.factor(*args)

    hld_ref = 0.5 * np.linalg.slogdet(Hfull)[1]
    assert abs(float(eng_p.half_logdet(fp)) - hld_ref) < 1e-9
    assert abs(float(eng_b.half_logdet(fb)) - hld_ref) < 1e-8

    rb, rd = rng.normal(size=d), rng.normal(size=q)
    zb, zd = eng_p.solve(fp, jnp.asarray(rb), jnp.asarray(rd))
    zref = np.linalg.solve(Hfull, np.concatenate([rb, rd]))
    np.testing.assert_allclose(np.asarray(zb), zref[:d], atol=1e-10)
    np.testing.assert_allclose(np.asarray(zd), zref[d:], atol=1e-10)

    # custom-VJP gradient vs autodiff through the block scan
    g_p = jax.grad(lambda *a: eng_p.arrow_half_logdet(*a),
                   argnums=(0, 1, 2))(*args)
    g_b = jax.grad(lambda *a: eng_b.arrow_half_logdet(*a),
                   argnums=(0, 1, 2))(*args)
    for gp, gb in zip(g_p, g_b):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gb),
                                   atol=2e-5)

    # precision sampling agrees across engines given the same noise
    zbn = rng.normal(size=(d, 32))
    zdn = rng.normal(size=(q, 32))
    xbp, xdp = eng_p.sample_multi(fp, jnp.asarray(zbn), jnp.asarray(zdn))
    xbb, xdb = eng_b.sample_multi(fb, jnp.asarray(zbn), jnp.asarray(zdn))
    np.testing.assert_allclose(np.asarray(xbp), np.asarray(xbb), atol=1e-4)
    np.testing.assert_allclose(np.asarray(xdp), np.asarray(xdb), atol=1e-8)


@pytest.mark.parametrize("q", [0, 5, 140])
def test_chunked_engine_parity(q):
    """Chunked PallasEngine vs BlockEngine on the full arrow API,
    including a tail wider than 128 (q=140 exercises the lane-tiled
    C / Y path that unblocks the s=3 two-smooth on-chip config)."""
    rng = np.random.default_rng(8)
    d, bw, s = 96, 5, 12
    A, band, C, Hd, Hfull = _arrow_problem(rng, d, bw, max(q, 1))
    if q == 0:
        C, Hd, Hfull = np.zeros((d, 0)), np.zeros((0, 0)), A

    eng_p = ba.PallasEngine(d, bw, q, interpret=True, chunk=32)
    eng_b = ba.make_engine(d, bw, q, s, force="block")
    args = (jnp.asarray(band), jnp.asarray(C), jnp.asarray(Hd))
    fp, fb = eng_p.factor(*args), eng_b.factor(*args)

    hld_ref = 0.5 * np.linalg.slogdet(Hfull)[1]
    assert abs(float(eng_p.half_logdet(fp)) - hld_ref) < 1e-8
    assert abs(float(eng_b.half_logdet(fb)) - hld_ref) < 1e-7

    rb, rd = rng.normal(size=d), rng.normal(size=q)
    zb, zd = eng_p.solve(fp, jnp.asarray(rb), jnp.asarray(rd))
    zref = np.linalg.solve(Hfull, np.concatenate([rb, rd]))
    np.testing.assert_allclose(np.asarray(zb), zref[:d], atol=1e-9)
    np.testing.assert_allclose(np.asarray(zd), zref[d:], atol=1e-9)

    g_p = jax.grad(lambda *a: eng_p.arrow_half_logdet(*a),
                   argnums=(0, 1, 2))(*args)
    g_b = jax.grad(lambda *a: eng_b.arrow_half_logdet(*a),
                   argnums=(0, 1, 2))(*args)
    for gp, gb in zip(g_p, g_b):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gb),
                                   atol=2e-5)

    zbn = rng.normal(size=(d, 16))
    zdn = rng.normal(size=(q, 16))
    xbp, xdp = eng_p.sample_multi(fp, jnp.asarray(zbn), jnp.asarray(zdn))
    xbb, xdb = eng_b.sample_multi(fb, jnp.asarray(zbn), jnp.asarray(zdn))
    np.testing.assert_allclose(np.asarray(xbp), np.asarray(xbb),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(xdp), np.asarray(xdb),
                               atol=1e-7)


def test_dd_arithmetic():
    from bayesgp_tpu.linalg import dd
    rng = np.random.default_rng(3)
    a64 = rng.normal(size=128) * 10.0 ** rng.integers(-3, 3, 128)
    b64 = rng.normal(size=128) * 10.0 ** rng.integers(-3, 3, 128)
    a = dd.from_f64(jnp.asarray(a64))
    b = dd.from_f64(jnp.asarray(b64))
    np.testing.assert_allclose(np.asarray(dd.to_f64(dd.add(a, b))),
                               a64 + b64, rtol=5e-14)
    np.testing.assert_allclose(np.asarray(dd.to_f64(dd.mul(a, b))),
                               a64 * b64, rtol=5e-14)
    pos = np.abs(a64) + 0.1
    p = dd.from_f64(jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(dd.to_f64(dd.rsqrt(p))),
                               1.0 / np.sqrt(pos), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(dd.to_f64(dd.recip(p))),
                               1.0 / pos, rtol=1e-13)


def test_dd_under_jit():
    """REGRESSION: XLA's algebraic simplifier can silently destroy
    error-free transformations under jit — measured failures were
    mul(x, divide(1, x)) -> 1 inside the old recip's Newton residual
    and sub(add(u, 2), 2) -> u inside a constant-first two_sum (see
    dd.recip / dd.log_precise docstrings). Everything here must hold
    COMPILED, not just eager."""
    from bayesgp_tpu.linalg import dd
    rng = np.random.default_rng(4)
    x64 = np.abs(rng.normal(size=2048)) * 10.0 ** rng.uniform(-6, 6, 2048)
    p = dd.from_f64(jnp.asarray(x64))
    out = np.asarray(dd.to_f64(jax.jit(dd.log_precise)(p)))
    np.testing.assert_allclose(out, np.log(x64), atol=2e-13, rtol=0)

    r = np.asarray(dd.to_f64(jax.jit(dd.recip)(p)))
    np.testing.assert_allclose(r, 1.0 / x64, rtol=1e-13)
    rs = np.asarray(dd.to_f64(jax.jit(dd.rsqrt)(p)))
    np.testing.assert_allclose(rs, 1.0 / np.sqrt(x64), rtol=1e-13)

    mixed = rng.normal(size=2048) * 10.0 ** rng.uniform(-6, 6, 2048)
    q = dd.from_f64(jnp.asarray(mixed))
    rm = np.asarray(dd.to_f64(jax.jit(dd.recip)(q)))
    np.testing.assert_allclose(rm, 1.0 / mixed, rtol=1e-13)

    out2 = np.asarray(dd.to_f64(jax.jit(
        lambda a, b: dd.mul(dd.add(a, b), b))(p, q)))
    np.testing.assert_allclose(out2, (x64 + mixed) * mixed, rtol=5e-13)


def test_arrow_half_logdet_given_matches():
    """arrow_half_logdet_given (precomputed-factor variant used by the
    nll custom VJP) must return the same value AND the same cotangents
    as arrow_half_logdet."""
    rng = np.random.default_rng(5)
    d, bw, q = 64, 3, 5
    A, band, C, Hd, Hfull = _arrow_problem(rng, d, bw, q)
    eng = ba.make_engine(d, bw, q, 8, force="pallas_interpret")
    args = (jnp.asarray(band), jnp.asarray(C), jnp.asarray(Hd))
    f = eng.factor(*args)

    v0 = float(eng.arrow_half_logdet(*args))
    v1 = float(eng.arrow_half_logdet_given(*args, f))
    assert abs(v0 - v1) < 1e-12

    g0 = jax.grad(lambda *a: eng.arrow_half_logdet(*a),
                  argnums=(0, 1, 2))(*args)
    g1 = jax.grad(lambda *a: eng.arrow_half_logdet_given(*a, f),
                  argnums=(0, 1, 2))(*args)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-10)
