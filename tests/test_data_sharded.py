"""Observation-axis (data-parallel) sharding of ONE fit.

Validates parallel/data_sharded.py on the virtual 8-device CPU mesh:
chunk padding is exact, the GSPMD-sharded fused AGHQ program matches
the single-device program, and the gather-path guard fires. (The
reference has no single-fit parallelism at all — SURVEY.md §2.3.)
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.fast.iwp import build_fast_iwp
from bayesgp_tpu.parallel import data_sharded as DS


def _chunked_backend(n=6000, k=40, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 100.0, n))
    y = rng.poisson(np.exp(1.0 + 0.5 * np.sin(x / 5))).astype(np.float64)
    inst = T.build_iwp_term("x", x, order=3, k=k)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson")
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    be = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data)
    assert be.chunks is not None, "test needs the MXU chunked design"
    return be


def test_pad_chunks_exact():
    """Zero-padded chunks are bit-transparent: same nll and gradient."""
    be = _chunked_backend()
    ck8 = DS.pad_chunks(be.chunks, 8)
    assert ck8.nc == 8 and ck8.nc_real == be.chunks.nc
    # padded chunks excluded from the overlap-add coloring
    covered = sorted(c for r in ck8.rounds for c in r)
    assert covered == list(range(be.chunks.nc))
    be8 = dataclasses.replace(be, chunks=ck8)
    th = jnp.asarray([1.0])
    v, g = jax.value_and_grad(be.nll)(th)
    v8, g8 = jax.value_and_grad(be8.nll)(th)
    np.testing.assert_allclose(float(v8), float(v), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g), rtol=1e-12)


def test_sharded_fused_fit_matches_single_device():
    """The GSPMD data-sharded fused s=1 AGHQ fit (with in-program
    posterior draws) matches the unsharded program to reduction-order
    noise."""
    assert len(jax.devices()) >= 8
    from bayesgp_tpu.inference.aghq import fused_fit_1d

    be = _chunked_backend()
    key = jax.random.PRNGKey(7)
    # packed_opt=False: compare identical scalar-march programs (packed
    # FD/node phases still on, on BOTH sides) — this test isolates GSPMD
    # reduction-order noise from ladder-vs-march optimizer differences
    mode, H, nodes, nlls, _, idx, samps = fused_fit_1d(
        be, k=4, sample=(key, 16), packed_opt=False)

    mesh = DS.data_mesh(jax.devices()[:8])
    bes = DS.shard_backend_data(be, mesh)
    assert bes.chunks.nc == 8 and bes.chunks.nc_real == be.chunks.nc
    mode_s, H_s, nodes_s, nlls_s, _, idx_s, samps_s = fused_fit_1d(
        bes, k=4, sample=(key, 16), packed_opt=False)

    # per-shard partial sums + psum reorder the O(n) reductions; the
    # secant/Newton trajectory amplifies that slightly through the mode
    np.testing.assert_allclose(mode_s, mode, atol=1e-7)
    np.testing.assert_allclose(H_s, H, rtol=1e-6)
    np.testing.assert_allclose(nodes_s, nodes, atol=1e-7)
    np.testing.assert_allclose(nlls_s, nlls, rtol=1e-9)
    np.testing.assert_array_equal(idx_s, idx)
    np.testing.assert_allclose(samps_s, samps, atol=1e-5)


def test_sharded_ladder_matches_single_device():
    """The opt-in lane-packed theta ladder (+ packed FD/node phases)
    under GSPMD: the batched engine consumes the same
    NamedSharding-carrying chunk arrays as the scalar one, so the
    packed program shards transparently too. (The ladder is opt-in
    since round 11 — measured slower than the march on-chip — but its
    sharding path stays covered here.)"""
    assert len(jax.devices()) >= 8
    from bayesgp_tpu.inference.aghq import fused_fit_1d

    be = _chunked_backend()
    mode, H, nodes, nlls, _ = fused_fit_1d(be, k=4, packed_opt=True)
    bes = DS.shard_backend_data(be, DS.data_mesh(jax.devices()[:8]))
    mode_s, H_s, nodes_s, nlls_s, _ = fused_fit_1d(bes, k=4,
                                                   packed_opt=True)
    np.testing.assert_allclose(mode_s, mode, atol=1e-7)
    np.testing.assert_allclose(H_s, H, rtol=1e-6)
    np.testing.assert_allclose(nlls_s, nlls, rtol=1e-8)


def test_sharded_fused_nd_matches_single_device():
    """Data sharding through the s>1 two-dispatch fused fit (BFGS
    program + warm-chained node program + marginal re-adaptations):
    full aghq_fit parity on the 8-device mesh."""
    assert len(jax.devices()) >= 8
    from bayesgp_tpu.fast.banded import build_banded_backend
    from bayesgp_tpu.inference.aghq import aghq_fit

    n = 3000
    rng = np.random.default_rng(2)
    x = np.sort(rng.uniform(0.0, 10.0, n))
    g = rng.integers(0, 5, n)
    eta = 0.5 * np.sin(x) + 0.2 * g + 0.5
    y = rng.poisson(np.exp(eta)).astype(np.float64)
    t1 = T.build_iwp_term("x", x, order=2, k=15)
    t2 = T.build_iid_term("g", g)
    dmf = [np.ones((n, 1))]
    bf_prec = np.array([0.01])
    bf_mean = np.zeros(1)
    md = B.build_model_data([t1, t2], dmf, y, "Poisson",
                            control_fixed_prec=bf_prec,
                            control_fixed_mean=bf_mean)
    be = build_banded_backend([t1, t2], md, dmf, bf_prec, bf_mean)
    assert be.chunks is not None and be.n_theta == 2
    fit = aghq_fit(be, k=3)

    bes = DS.shard_backend_data(be, DS.data_mesh(jax.devices()[:8]))
    fit_s = aghq_fit(bes, k=3)

    assert abs(fit_s.lognormconst - fit.lognormconst) < 1e-8
    np.testing.assert_allclose(fit_s.mode, fit.mode, atol=1e-6)
    np.testing.assert_allclose(fit_s.hessian, fit.hessian, rtol=1e-5)
    for mf, ms in zip(fit.marginals, fit_s.marginals):
        np.testing.assert_allclose(ms["theta"], mf["theta"], atol=1e-6)
        np.testing.assert_allclose(ms["logmargpost"], mf["logmargpost"],
                                   atol=1e-6)


def test_sharded_sgp_sparse_driver():
    """Data sharding over the sparse-sGP banded driver (windows built
    O(n) from x, never materializing the dense design). The FD outer
    Hessian amplifies reduction-order noise in the implicit gradient
    (~1e-7 absolute at this scale / h_fd), so the adapted nodes — and
    with them lognormconst — agree to quadrature-adaptation tolerance,
    not fp tolerance; the mode is noise-robust."""
    assert len(jax.devices()) >= 8
    from bayesgp_tpu.fast.banded import build_banded_backend
    from bayesgp_tpu.inference.aghq import aghq_fit

    n = 4000
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0.0, 20.0, n))
    y = rng.poisson(np.exp(1.0 + 0.6 * np.sin(2 * np.pi * x / 5))
                    ).astype(float)
    t1 = T.build_sgp_term("x", x, period=5.0, k=30, m=1,
                          materialize_B=False)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([t1], dmf, y, "Poisson", dense_design=False)
    be = build_banded_backend([t1], md, dmf, np.array([0.01]), np.zeros(1))
    assert be.chunks is not None
    fit = aghq_fit(be, k=3)
    bes = DS.shard_backend_data(be, DS.data_mesh(jax.devices()[:8]))
    fit_s = aghq_fit(bes, k=3)
    np.testing.assert_allclose(fit_s.mode, fit.mode, atol=1e-5)
    assert abs(fit_s.lognormconst - fit.lognormconst) < 5e-3


def test_model_fit_data_mesh():
    """data_mesh= plumbs observation sharding through the public API."""
    assert len(jax.devices()) >= 8
    import bayesgp_tpu as bg

    n = 3000
    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(0.0, 50.0, n))
    y = rng.poisson(np.exp(1.0 + 0.4 * np.sin(x / 4))).astype(np.float64)
    data = {"y": y, "x": x}
    kw = dict(data=data, family="Poisson", method="aghq",
              engine="banded", M=50, seed=3)
    f0 = bg.model_fit("y ~ f(x, model='IWP', order=2, k=20)", **kw)
    f1 = bg.model_fit("y ~ f(x, model='IWP', order=2, k=20)",
                      data_mesh=DS.data_mesh(jax.devices()[:8]), **kw)
    # both fits run the default lane-packed ladder program; agreement is
    # GSPMD reduction-order noise through the optimizer trajectory
    assert abs(f1.mod.lognormconst - f0.mod.lognormconst) < 1e-6
    np.testing.assert_allclose(f1.mod.mode, f0.mod.mode, atol=2e-4)

    # dense backend (tiny model) has no chunked design -> clear error
    small = {"y": y[:100], "x": x[:100]}
    with pytest.raises(ValueError, match="chunked"):
        bg.model_fit("y ~ f(x, model='IWP', order=2, k=8)", data=small,
                     family="Poisson", data_mesh="auto", M=10)
    with pytest.raises(ValueError, match="aghq"):
        bg.model_fit("y ~ f(x, model='IWP', order=2, k=8)", data=small,
                     family="Poisson", method="MCMC", data_mesh="auto")


def test_shard_requires_chunked_design():
    """Clustered x wide enough to defeat the 64-column window falls back
    to the gather path, which shard_backend_data refuses."""
    n, k = 2100, 200
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0.0, 100.0, n))
    y = rng.poisson(np.exp(1.0), size=n).astype(np.float64)
    inst = T.build_iwp_term("x", x, order=3, k=k)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson")
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    be = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data)
    assert be.chunks is None
    with pytest.raises(ValueError, match="chunked"):
        DS.shard_backend_data(be, DS.data_mesh(jax.devices()[:8]))
