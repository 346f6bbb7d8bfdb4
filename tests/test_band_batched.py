"""Lane-packed multi-replicate band kernels (interpret mode on CPU).

Each batched kernel must reproduce, for every packed replicate, exactly
what the scalar band kernels / numpy produce for that replicate's
system (same dd accuracy targets as test_band_kernels.py).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from bayesgp_tpu.linalg import band_batched as bb
from bayesgp_tpu.linalg import band_kernels as bk

from test_band_kernels import _spd_band


def _problems(rng, NR, d, bw):
    As, bands = [], []
    for _ in range(NR):
        A, band = _spd_band(rng, d, bw)
        As.append(A)
        bands.append(band)
    return np.stack(As), np.stack(bands)


@pytest.mark.parametrize("d,bw,NR", [(64, 3, 16), (40, 2, 3), (48, 1, 8)])
def test_batched_factor_and_solves(d, bw, NR):
    rng = np.random.default_rng(0)
    As, bands = _problems(rng, NR, d, bw)
    G = bb.group_size(bw)
    assert NR * G <= bb.LANES
    W, _ = bk.plan_rows(d, bw)

    bh, bl = bb.pack_band_batched(jnp.asarray(bands), d, bw, G)
    Lh, Ll, misc = bb.bfactor_fn(d, bw, G, interpret=True)(bh, bl)

    Lband = np.asarray(bb.unpack_batched((Lh, Ll), d, bw, G, NR, bw + 1))
    misc = np.asarray(misc, np.float64)
    for r in range(NR):
        Lnp = np.linalg.cholesky(As[r])
        for o in range(bw + 1):
            col = Lband[r, :d - o, o] if o else Lband[r, :, 0]
            np.testing.assert_allclose(col, np.diag(Lnp, -o), atol=1e-12)
        hld = 0.5 * (misc[0, r * G] + misc[1, r * G])
        assert abs(hld - np.sum(np.log(np.diag(Lnp)))) < 1e-11

    # m RHS per replicate through fwd + bwd solves
    m = min(3, G)
    B = rng.normal(size=(NR, d, m))
    rh, rl = bb.pack_rhs_batched(jnp.asarray(B), d, bw, G)
    y = np.asarray(bb.unpack_batched(
        bb.bfwd_fn(d, bw, G, interpret=True)(Lh, Ll, rh, rl),
        d, bw, G, NR, m))
    x = np.asarray(bb.unpack_batched(
        bb.bbwd_fn(d, bw, G, interpret=True)(Lh, Ll, rh, rl),
        d, bw, G, NR, m))
    for r in range(NR):
        Lnp = np.linalg.cholesky(As[r])
        np.testing.assert_allclose(y[r], np.linalg.solve(Lnp, B[r]),
                                   atol=1e-10)
        np.testing.assert_allclose(x[r], np.linalg.solve(Lnp.T, B[r]),
                                   atol=1e-10)


def test_batched_takahashi():
    rng = np.random.default_rng(1)
    d, bw, NR = 48, 3, 16
    As, bands = _problems(rng, NR, d, bw)
    G = bb.group_size(bw)
    W, _ = bk.plan_rows(d, bw)

    bh, bl = bb.pack_band_batched(jnp.asarray(bands), d, bw, G)
    Lh, Ll, _ = bb.bfactor_fn(d, bw, G, interpret=True)(bh, bl)
    Z = np.asarray(bb.btakahashi_fn(d, bw, G, interpret=True)(Lh))
    Zg = Z[W:W + d].reshape(d, NR, G)
    for r in range(NR):
        Hinv = np.linalg.inv(As[r])
        for o in range(bw + 1):
            np.testing.assert_allclose(Zg[:d - o, r, o], np.diag(Hinv, -o),
                                       atol=3e-5)


def test_batched_matches_scalar_kernels():
    """The batched factor at group r equals the scalar kernel run on
    system r alone to dd accuracy (bit-identity is NOT attainable:
    lax.rsqrt's initial estimate differs between scalar and vector
    shapes, so the Newton-polished dd pivot can differ in the last
    ~2^-48 bit)."""
    rng = np.random.default_rng(2)
    d, bw, NR = 40, 3, 4
    _, bands = _problems(rng, NR, d, bw)
    G = bb.group_size(bw)

    bh, bl = bb.pack_band_batched(jnp.asarray(bands), d, bw, G)
    Lh, Ll, misc = bb.bfactor_fn(d, bw, G, interpret=True)(bh, bl)
    Lband = np.asarray(bb.unpack_batched((Lh, Ll), d, bw, G, NR, bw + 1))
    misc = np.asarray(misc, np.float64)

    for r in range(NR):
        sh, sl = bk.pack_band(jnp.asarray(bands[r]), d, bw)
        z = jnp.zeros_like(sh)
        Lh1, Ll1, _, _, m1 = bk.factor_fn(d, bw, interpret=True)(
            sh, sl, z, z)
        W, _ = bk.plan_rows(d, bw)
        Ls = (np.asarray(Lh1, np.float64)
              + np.asarray(Ll1, np.float64))[W:W + d, :bw + 1]
        np.testing.assert_allclose(Lband[r], Ls, rtol=5e-12, atol=1e-13)
        hld_b = misc[0, r * G] + misc[1, r * G]
        hld_s = float(np.asarray(m1, np.float64)[0, 0]
                      + np.asarray(m1, np.float64)[0, 1])
        assert abs(hld_b - hld_s) < 1e-11


def test_batched_arrow_engine_vs_scalar():
    """PallasBatchedEngine == scalar PallasEngine per replicate: half
    log-dets, solves, and the Takahashi custom-VJP cotangents."""
    import jax
    from bayesgp_tpu.linalg import band_arrow as ba
    from bayesgp_tpu.linalg.band_arrow_batched import PallasBatchedEngine
    from test_band_kernels import _arrow_problem

    rng = np.random.default_rng(3)
    d, bw, q, NR = 48, 3, 5, 4
    probs = [_arrow_problem(rng, d, bw, q) for _ in range(NR)]
    bands = jnp.asarray(np.stack([p[1] for p in probs]))
    Cs = jnp.asarray(np.stack([p[2] for p in probs]))
    Hds = jnp.asarray(np.stack([p[3] for p in probs]))

    be = PallasBatchedEngine(d, bw, q, NR, interpret=True)
    fb = be.factor(bands, Cs, Hds)
    hlds = np.asarray(be.half_logdet(fb))

    rb = rng.normal(size=(NR, d))
    rd = rng.normal(size=(NR, q))
    zb, zd = be.solve(fb, jnp.asarray(rb), jnp.asarray(rd))

    gb = jax.grad(lambda *a: jnp.sum(be.arrow_half_logdet(*a)),
                  argnums=(0, 1, 2))(bands, Cs, Hds)

    for r in range(NR):
        Hfull = probs[r][4]
        assert abs(hlds[r] - 0.5 * np.linalg.slogdet(Hfull)[1]) < 1e-9
        zr = np.linalg.solve(Hfull, np.concatenate([rb[r], rd[r]]))
        np.testing.assert_allclose(np.asarray(zb)[r], zr[:d], atol=1e-9)
        np.testing.assert_allclose(np.asarray(zd)[r], zr[d:], atol=1e-9)

        eng = ba.make_engine(d, bw, q, 8, force="pallas_interpret")
        gs = jax.grad(lambda *a: eng.arrow_half_logdet(*a),
                      argnums=(0, 1, 2))(bands[r], Cs[r], Hds[r])
        for a, b in zip((gb[0][r], gb[1][r], gb[2][r]), gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    # the precomputed-factor variant: same values, same cotangents
    v0 = np.asarray(be.arrow_half_logdet(bands, Cs, Hds))
    v1 = np.asarray(be.arrow_half_logdet_given(bands, Cs, Hds, fb))
    np.testing.assert_allclose(v0, v1, atol=1e-12)
    g1 = jax.grad(lambda *a: jnp.sum(be.arrow_half_logdet_given(*a, fb)),
                  argnums=(0, 1, 2))(bands, Cs, Hds)
    for a, b in zip(gb, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-10)


def test_batched_arrow_engine_q0():
    from bayesgp_tpu.linalg.band_arrow_batched import PallasBatchedEngine

    rng = np.random.default_rng(4)
    d, bw, NR = 40, 2, 6
    As, bands = _problems(rng, NR, d, bw)
    be = PallasBatchedEngine(d, bw, 0, NR, interpret=True)
    C = jnp.zeros((NR, d, 0))
    Hd = jnp.zeros((NR, 0, 0))
    fb = be.factor(jnp.asarray(bands), C, Hd)
    hlds = np.asarray(be.half_logdet(fb))
    rb = rng.normal(size=(NR, d))
    zb, _ = be.solve(fb, jnp.asarray(rb), jnp.zeros((NR, 0)))
    for r in range(NR):
        assert abs(hlds[r] - 0.5 * np.linalg.slogdet(As[r])[1]) < 1e-10
        np.testing.assert_allclose(np.asarray(zb)[r],
                                   np.linalg.solve(As[r], rb[r]),
                                   atol=1e-9)
