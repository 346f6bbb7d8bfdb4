"""Batched (multi-replicate) fast backend vs the scalar backend.

Every replicate's Laplace nll, implicit gradient, Newton solution and
Hessian factorization through BatchedFastIWP must match running the
scalar FastIWPBackend.with_y(y_r) alone (CPU f64, block engines).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.fast.iwp import build_fast_iwp
from bayesgp_tpu.fast.batched import build_batched, max_replicates


def _problem(n=400, k=12, R=5, seed=0, family="Poisson"):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 6.0, n))
    f_true = 0.8 * np.sin(x) + 1.0
    inst = T.build_iwp_term("x", x, order=3, k=k, materialize_B=False)
    dmf = [np.ones((n, 1)), rng.normal(size=(n, 1))]
    y0 = rng.poisson(np.exp(f_true)).astype(np.float64)
    md = B.build_model_data([inst], dmf, y0, family, dense_design=False)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    base = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data)
    ys = np.stack([rng.poisson(np.exp(f_true)).astype(np.float64)
                   for _ in range(R)])
    return base, ys


def test_batched_nll_and_grad_vs_scalar():
    base, ys = _problem()
    R = ys.shape[0]
    bb = build_batched(base, ys, force_engine="block_vmap")

    theta = jnp.asarray(np.linspace(-0.5, 1.5, R))
    vals, (V, tail) = bb.nll_warm(theta, bb.init_state())
    grads = jax.grad(lambda th: jnp.sum(bb.nll_warm(th, bb.init_state())[0])
                     )(theta)

    for r in range(R):
        br = base.with_y(ys[r])
        th_r = jnp.asarray([float(theta[r])])
        (v_r, st_r), g_r = jax.value_and_grad(
            br.nll_warm, has_aux=True)(th_r, br.init_state())
        assert abs(float(vals[r]) - float(v_r)) < 1e-7, \
            (r, float(vals[r]), float(v_r))
        assert abs(float(grads[r]) - float(g_r[0])) < 1e-6
        np.testing.assert_allclose(np.asarray(V)[r], np.asarray(st_r[0]),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(tail)[r],
                                   np.asarray(st_r[1]), atol=1e-7)


def test_batched_laplace_eval_full():
    base, ys = _problem(R=3, seed=1)
    bb = build_batched(base, ys, force_engine="block_vmap")
    theta = jnp.asarray([0.2, 0.2, 0.2])
    val, (V, tail), factor = bb.laplace_eval_full(theta, bb.init_state())
    # same theta, different responses -> different values
    assert len(set(np.round(np.asarray(val), 6))) == 3
    # solve_H against composed solve: H z = g reproduced per replicate
    gV = jnp.asarray(np.random.default_rng(2).normal(size=V.shape))
    gt = jnp.asarray(np.random.default_rng(3).normal(size=tail.shape))
    zb, zd = bb.solve_H(factor, gV, gt)
    for r in range(3):
        br = base.with_y(ys[r])
        f_r = br.hessian_factor(V[r], tail[r], jnp.asarray([0.2]))
        zb_r, zd_r = br.solve_H(f_r, gV[r], gt[r])
        np.testing.assert_allclose(np.asarray(zb)[r], np.asarray(zb_r),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(zd)[r], np.asarray(zd_r),
                                   rtol=1e-9, atol=1e-10)


def test_batched_interpret_engine_small():
    """The lane-packed Pallas engine (interpret mode) agrees with the
    block-vmap engine inside the full batched Laplace eval."""
    base, ys = _problem(n=150, k=8, R=3, seed=4)
    bbk = build_batched(base, ys, force_engine="pallas_interpret")
    bbv = build_batched(base, ys, force_engine="block_vmap")
    theta = jnp.asarray([0.1, 0.4, -0.3])
    v1, _, _ = bbk.laplace_eval_full(theta, bbk.init_state())
    v2, _, _ = bbv.laplace_eval_full(theta, bbv.init_state())
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-9, atol=1e-8)


def test_max_replicates():
    assert max_replicates(3) == 16
    assert max_replicates(2) == 16
    assert max_replicates(4) == 8


def _replicate_ys(base_seed, f_true, R):
    rng = np.random.default_rng(base_seed)
    return np.stack([rng.poisson(np.exp(f_true)).astype(np.float64)
                     for _ in range(R)])


def test_packed_fused_fits_match_scalar():
    """replicate_fits_packed == per-replicate scalar fused AGHQ fits."""
    from bayesgp_tpu.inference import aghq
    from bayesgp_tpu.parallel.replicates import replicate_fits_packed

    base, ys = _problem(n=400, k=12, R=3, seed=7)
    modes, lncs = replicate_fits_packed(base, ys, k=4,
                                        force_engine="block_vmap")
    for r in range(3):
        br = base.with_y(jnp.asarray(ys[r]))
        fit = aghq.aghq_fit(br, k=4)
        # packed replicate programs run the batched-twin march; single
        # fits use the lane-packed theta ladder (optimizer tolerance)
        assert abs(float(modes[r]) - float(fit.mode[0])) < 2e-4, r
        assert abs(float(lncs[r]) - fit.lognormconst) < 1e-5, r


def test_packed_grouping_beyond_capacity():
    """The single-chip grouping path (pad-to-group + one compiled
    program reused per group) agrees with the lax.map reference path."""
    from bayesgp_tpu.parallel.replicates import (replicate_fits,
                                                 replicate_fits_packed)

    base, ys = _problem(n=300, k=10, R=5, seed=9)
    m_p, l_p = replicate_fits_packed(base, ys, k=3,
                                     force_engine="block_vmap")
    m_s, l_s = replicate_fits(base, ys, k=3)
    np.testing.assert_allclose(m_p, m_s, atol=2e-5)
    np.testing.assert_allclose(l_p, l_s, atol=2e-5)


def test_packed_sharded_over_mesh():
    from bayesgp_tpu.parallel.replicates import replicate_fits_packed

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = jax.sharding.Mesh(np.asarray(devs[:4]), ("fits",))
    base, ys = _problem(n=300, k=10, R=8, seed=11)
    m_m, l_m = replicate_fits_packed(base, ys, k=3, mesh=mesh,
                                     force_engine="block_vmap")
    m_1, l_1 = replicate_fits_packed(base, ys, k=3,
                                     force_engine="block_vmap")
    np.testing.assert_allclose(m_m, m_1, atol=1e-8)
    np.testing.assert_allclose(l_m, l_1, atol=1e-8)


def test_batched_binomial_vs_scalar():
    """The fam=2 batched likelihood/weights path matches the scalar
    backend per replicate."""
    rng = np.random.default_rng(21)
    n, k, R = 300, 10, 3
    x = np.sort(rng.uniform(0.0, 6.0, n))
    pr = jax.nn.sigmoid(0.8 * np.sin(x))
    size = np.full(n, 4.0)
    inst = T.build_iwp_term("x", x, order=2, k=k, materialize_B=False)
    dmf = [np.ones((n, 1))]
    y0 = rng.binomial(4, pr).astype(np.float64)
    md = B.build_model_data([inst], dmf, y0, "Binomial",
                            dense_design=False, size=size)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    base = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt),
                          inst.x_data)
    ys = np.stack([rng.binomial(4, pr).astype(np.float64)
                   for _ in range(R)])
    bb = build_batched(base, ys, force_engine="block_vmap")
    theta = jnp.asarray([0.3, -0.2, 0.9])
    vals, _ = bb.nll_warm(theta, bb.init_state())
    grads = jax.grad(lambda th: jnp.sum(bb.nll_warm(th, bb.init_state())[0])
                     )(theta)
    for r in range(R):
        br = base.with_y(ys[r])
        (v_r, _), g_r = jax.value_and_grad(br.nll_warm, has_aux=True)(
            jnp.asarray([float(theta[r])]), br.init_state())
        assert abs(float(vals[r]) - float(v_r)) < 1e-7
        assert abs(float(grads[r]) - float(g_r[0])) < 1e-6
